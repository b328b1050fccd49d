"""Sinks (SURVEY.md §2.8 SK1-SK3): foreachBatch JDBC (append + upsert),
console, memory (tests), parquet."""
