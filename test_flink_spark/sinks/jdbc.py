"""JDBC sink (SURVEY.md §2.8 SK1).

Reference: ``MySqlSink`` (HotMediaTrack.java:98-131) — one synchronous
INSERT per record, autocommit, no batching, not idempotent (append-only, no
key).  That is both the throughput ceiling (BASELINE.md) and an
at-least-once correctness hole.

Spark-first replacement: ``foreachBatch`` + set-oriented ``df.write.jdbc``
— the whole micro-batch ships as batched inserts from executors in parallel,
no per-row round trips.  Exactly-once upgrade (SURVEY.md §4.3): stage the
batch, then one atomic MERGE keyed on the natural key (time, appid, type) —
replayed batches upsert the same rows instead of duplicating them.

Untestable in this container (no JDBC database / driver jar); the logic is
exercised through the memory/parquet sinks which share the foreachBatch
mechanics (sinks/memory.py, tests/test_streaming.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def jdbc_append_writer(
    url: str, table: str, properties: dict[str, str]
) -> Callable[[DataFrame, int], None]:
    """At-least-once append — semantics of the reference sink, minus the
    per-row round trips."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.jdbc(url=url, table=table, mode="append", properties=properties)

    return write


def upsert_statement(
    table: str, staging: str, cols: list[str], key_cols: list[str], dialect: str
) -> str:
    """One set-oriented upsert statement for the staged batch.

    ``mysql`` (the reference's target, HotMediaTrack.java:104) has no MERGE —
    use INSERT … SELECT … ON DUPLICATE KEY UPDATE (requires a UNIQUE key on
    ``key_cols``); every other dialect gets ANSI MERGE.
    """
    ins_cols = ", ".join(cols)
    if dialect == "mysql":
        sets = ", ".join(f"{c} = VALUES({c})" for c in cols if c not in key_cols)
        return (
            f"INSERT INTO {table} ({ins_cols}) SELECT {ins_cols} FROM {staging} "
            f"ON DUPLICATE KEY UPDATE {sets}"
        )
    on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
    sets = ", ".join(f"t.{c} = s.{c}" for c in cols if c not in key_cols)
    ins_vals = ", ".join(f"s.{c}" for c in cols)
    return (
        f"MERGE INTO {table} t USING {staging} s ON {on} "
        f"WHEN MATCHED THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
    )


def jdbc_upsert_writer(
    url: str,
    table: str,
    key_cols: list[str],
    properties: dict[str, str],
    staging_table: str | None = None,
    dialect: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """Effectively-exactly-once upsert: append the batch to a staging table,
    then issue ONE set-oriented upsert into the target keyed on ``key_cols``.
    Idempotent under micro-batch replay (the deliberate improvement over the
    reference noted in SURVEY.md §4.3).  Dialect inferred from the JDBC URL
    unless given."""
    staging = staging_table or f"{table}__staging"
    if dialect is None:
        dialect = "mysql" if url.startswith("jdbc:mysql") else "ansi"

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.jdbc(url=url, table=staging, mode="overwrite", properties=properties)
        stmt = upsert_statement(table, staging, batch_df.columns, key_cols, dialect)
        spark = batch_df.sparkSession
        jvm = spark._sc._jvm  # one statement per batch — not per row
        conn = jvm.java.sql.DriverManager.getConnection(
            url, properties.get("user", ""), properties.get("password", "")
        )
        try:
            conn.createStatement().executeUpdate(stmt)
        finally:
            conn.close()

    return write
