"""Streaming layer (SURVEY.md §2.4, §2.6, §7 phases 2-3): watermarks,
windowed streaming aggregation, stateful Top-N, streaming dedup."""
