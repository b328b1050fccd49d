"""Skew handling (SURVEY.md 'Partitioning & shuffle' scale rule): salted
two-phase aggregation.

A hot grouping key sends all its rows to one reducer; at 100 TB a single
key can be 10% of the table and that reducer runs for hours.  Salting
splits each key into ``salt_buckets`` sub-keys for the first (parallel)
partial aggregation, then a second tiny aggregation merges the partials.
Results are identical for any algebraic aggregate (count/sum/min/max).

AQE's skew-join splitting handles JOIN skew automatically; aggregation skew
still benefits from explicit salting because the partial agg itself is the
bottleneck.  The salt is derived deterministically from a caller-named
column (never rand() — retries/speculative tasks must produce identical
rows)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame,
    keys: Sequence[str],
    salt_col: str,
    salt_buckets: int = 16,
    count_as: str = "cnt",
) -> DataFrame:
    """count(*) per keys via salt → partial count → merge.  Equal to a plain
    groupBy().count() for every input (the oracle checks exactly that)."""
    salt = F.pmod(F.hash(F.col(salt_col)), F.lit(salt_buckets)).alias("__salt")
    partial = df.groupBy(*[F.col(k) for k in keys], salt).agg(
        F.count(F.lit(1)).alias("__partial")
    )
    return partial.groupBy(*[F.col(k) for k in keys]).agg(
        F.sum("__partial").alias(count_as)
    )


def salted_sum(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    salt_col: str,
    salt_buckets: int = 16,
    sum_as: str = "total",
) -> DataFrame:
    salt = F.pmod(F.hash(F.col(salt_col)), F.lit(salt_buckets)).alias("__salt")
    partial = df.groupBy(*[F.col(k) for k in keys], salt).agg(
        F.sum(value_col).alias("__partial")
    )
    return partial.groupBy(*[F.col(k) for k in keys]).agg(
        F.sum("__partial").alias(sum_as)
    )


def key_skew_report(
    df: DataFrame,
    key_col: str,
    topk: int = 10,
) -> DataFrame:
    """Join/agg-key skew diagnosis: the top-``topk`` heaviest keys with
    their integer-ppm skew ratio vs the mean key weight —
    ``(key, cnt, skew_ppm)`` where skew_ppm = floor(1e6·cnt·n_keys /
    total_rows) (1e6 = a perfectly uniform key; 10e6 = this key carries
    10x its fair share).  The number an engineer reads before choosing a
    salt factor or trusting AQE's skew split — and the cross-multiplied
    integer form of it, so the report itself is differential-testable.

    Shuffle profile: one groupBy on the key with map-side partials, then
    two tiny scalars folded via a single-row aggregate joined broadcast
    (no driver collect needed for correctness, but the per-key table is
    |keys| rows — the bounded artifact).  The top-k cut is orderBy+limit
    on that bounded table."""
    per_key = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = F.broadcast(
        per_key.agg(
            F.sum("cnt").alias("total_rows"), F.count(F.lit(1)).alias("n_keys")
        )
    )
    return (
        per_key.crossJoin(totals)
        .select(
            "key",
            F.col("cnt").cast("long").alias("cnt"),
            F.expr("(1000000 * cnt * n_keys) div total_rows").alias("skew_ppm"),
        )
        .orderBy(F.col("cnt").desc(), F.col("key").asc())
        .limit(topk)
    )


def key_skew_oracle_sql(table: str, key_expr: str, topk: int = 10) -> str:
    """DuckDB replay of key_skew_report."""
    return f"""
WITH per_key AS (
    SELECT {key_expr} AS key, COUNT(*) AS cnt FROM {table} GROUP BY 1
), totals AS (
    SELECT SUM(cnt) AS total_rows, COUNT(*) AS n_keys FROM per_key
)
SELECT key, CAST(cnt AS BIGINT) AS cnt,
       CAST((1000000 * cnt * n_keys) // total_rows AS BIGINT) AS skew_ppm
FROM per_key, totals
ORDER BY cnt DESC, key ASC
LIMIT {topk}
"""
