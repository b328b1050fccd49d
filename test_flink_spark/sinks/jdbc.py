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

No JDBC driver jar ships in this container, so the wire path is exercised
three ways short of a live database: foreachBatch mechanics through the
memory/parquet sinks (tests/test_streaming.py), statement generation per
dialect (tests/test_sinks.py), and REAL execution of the postgres-dialect
statement against DuckDB (same ON CONFLICT dialect) proving
insert/update/replay-idempotence semantics.
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


_IDENT_QUOTE = {"mysql": "`", "postgres": '"', "ansi": '"'}


def infer_dialect(url: str) -> str:
    if url.startswith("jdbc:mysql"):
        return "mysql"
    if url.startswith(("jdbc:postgresql", "jdbc:duckdb")):
        return "postgres"
    return "ansi"


def quote_ident(name: str, dialect: str) -> str:
    """Dialect identifier quoting — reserved words (``count``, ``type``,
    ``time`` are all in the reference's target table, HotMediaTrack.java:104)
    and mixed-case names must survive every dialect.  Embedded quote chars
    are doubled per SQL standard."""
    q = _IDENT_QUOTE[dialect]
    return f"{q}{name.replace(q, q * 2)}{q}"


def upsert_statement(
    table: str, staging: str, cols: list[str], key_cols: list[str], dialect: str
) -> str:
    """One set-oriented upsert statement for the staged batch.

    ``mysql`` (the reference's target, HotMediaTrack.java:104) has no MERGE —
    INSERT … SELECT … ON DUPLICATE KEY UPDATE (requires a UNIQUE key on
    ``key_cols``).  ``postgres`` gets INSERT … ON CONFLICT (also DuckDB's
    dialect, which is how tests execute this path for real).  Everything
    else gets ANSI MERGE.

    Key-only tables (every column is a key) degrade to insert-if-absent:
    MySQL updates a key to its own arriving value (a no-op), postgres emits
    DO NOTHING, and MERGE drops its WHEN MATCHED clause.
    """
    if not key_cols:
        raise ValueError("upsert requires at least one key column")
    missing = [k for k in key_cols if k not in cols]
    if missing:
        raise ValueError(f"key columns not in cols: {missing}")
    qi = lambda c: quote_ident(c, dialect)  # noqa: E731
    ins_cols = ", ".join(qi(c) for c in cols)
    val_cols = [c for c in cols if c not in key_cols]
    qt, qs = qi(table), qi(staging)
    if dialect == "mysql":
        # key-only: assign the first key its own arriving value (no-op)
        sets = ", ".join(
            f"{qi(c)} = VALUES({qi(c)})" for c in (val_cols or key_cols[:1])
        )
        return (
            f"INSERT INTO {qt} ({ins_cols}) SELECT {ins_cols} FROM {qs} "
            f"ON DUPLICATE KEY UPDATE {sets}"
        )
    if dialect == "postgres":
        conflict = ", ".join(qi(k) for k in key_cols)
        action = (
            "DO UPDATE SET "
            + ", ".join(f"{qi(c)} = EXCLUDED.{qi(c)}" for c in val_cols)
            if val_cols
            else "DO NOTHING"
        )
        return (
            f"INSERT INTO {qt} ({ins_cols}) SELECT {ins_cols} FROM {qs} "
            f"ON CONFLICT ({conflict}) {action}"
        )
    on = " AND ".join(f"t.{qi(k)} = s.{qi(k)}" for k in key_cols)
    matched = (
        "WHEN MATCHED THEN UPDATE SET "
        + ", ".join(f"t.{qi(c)} = s.{qi(c)}" for c in val_cols)
        + " "
        if val_cols
        else ""
    )
    ins_vals = ", ".join(f"s.{qi(c)}" for c in cols)
    return (
        f"MERGE INTO {qt} t USING {qs} s ON {on} "
        f"{matched}"
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
        dialect = infer_dialect(url)

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
