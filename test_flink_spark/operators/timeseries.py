"""Time-series gap-fill with last-observation-carried-forward (LOCF) —
the hypertable ``time_bucket_gapfill`` + ``locf`` operator: densify a
per-key time series onto a regular bucket grid and carry the last
observed aggregate through the gaps.

Semantics (deterministic, engine-reproducible):
- observations are bucketed to ``floor(ts_ms / bucket_ms)`` and aggregated
  per (key, bucket) as an integer-exact sum (fixed-point cents — float
  sums are fold-order-sensitive across engines, int64 sums are not);
- the grid per key spans that key's own [min_bucket, max_bucket] (no
  global range — a key that appears for one day densifies one day);
- missing buckets get n_events = 0, is_gap = true, and the LOCF value of
  the nearest earlier observed bucket (the first bucket per key is always
  observed by construction, so LOCF never reads before the series start).

Scale design:
- the heavy input collapses to (key, bucket) aggregates FIRST — map-side
  partial sums mean the exchange carries one row per key-bucket, never
  the event body;
- the grid explode is bounded by time-range/bucket per key, independent
  of event volume (at 100 TB the aggregate table is the small side);
- LOCF is a running ``last(ignorenulls)`` window partitioned BY KEY —
  an in-partition scan after one hash exchange, no global window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bucket_gapfill_locf(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_ms_col: str,
    value_cents_col: str,
    bucket_ms: int,
) -> DataFrame:
    """Densified per-key series: ``(*key_cols, bucket_ms, n_events,
    sum_cents_locf, is_gap)`` with one row for EVERY bucket between each
    key's first and last observation."""
    if bucket_ms <= 0:
        raise ValueError(f"bucket_ms must be positive, got {bucket_ms}")
    keys = [F.col(c) for c in key_cols]
    # integer division, not double-divide-and-cast: exact for any int64
    b = F.expr(f"{ts_ms_col} div {bucket_ms}")
    obs = (
        df.select(*keys, b.alias("b"), F.col(value_cents_col).alias("cents"))
        .groupBy(*key_cols, "b")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("s"),
        )
    )
    rng = obs.groupBy(*key_cols).agg(
        F.min("b").alias("b0"), F.max("b").alias("b1")
    )
    grid = rng.select(
        *keys, F.explode(F.sequence(F.col("b0"), F.col("b1"))).alias("b")
    )
    j = grid.join(obs, [*key_cols, "b"], "left_outer")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        *keys,
        (F.col("b") * F.lit(bucket_ms)).alias("bucket_ms"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.last("s", ignorenulls=True).over(w).alias("sum_cents_locf"),
        F.col("n_events").isNull().alias("is_gap"),
    )


def trailing_range_sums(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_ms_col: str,
    value_cents_col: str,
    range_ms: int,
    carry_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-row trailing time-RANGE aggregates: for every event, the count
    and integer-cent sum of the same key's events in the closed interval
    ``[ts - range_ms, ts]`` — the rolling-feature primitive (trailing
    7-day spend, velocity checks) that ROW frames cannot express when
    events are irregularly spaced.

    RANGE frames include ties (same key, same ts) identically in Spark
    and DuckDB, so the output is deterministic without a tie-break.
    Shuffle profile: one hash exchange on the key + in-partition sort;
    the frame scan is the engine's sliding-accumulator, not a self-join
    (the naive equivalent — a range self-join per row — shuffles the
    table twice and blows up on dense keys)."""
    if range_ms <= 0:
        raise ValueError(f"range_ms must be positive, got {range_ms}")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_ms_col).asc())
        .rangeBetween(-range_ms, 0)
    )
    return df.select(
        *[F.col(c) for c in key_cols],
        *[F.col(c) for c in carry_cols],
        F.col(ts_ms_col),
        F.count(F.lit(1)).over(w).cast("long").alias("n_trailing"),
        F.sum(value_cents_col).over(w).cast("long").alias("cents_trailing"),
    )
