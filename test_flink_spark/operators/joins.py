"""Join operators (SURVEY.md §2.10 — absent from the reference; engine
superset).  Plain equi/semi/anti/range joins are Catalyst pass-throughs used
directly at call sites; this module adds the strategies that need engine
code: broadcast-hinted dimension joins and the as-of join.

Scale notes: Catalyst already picks broadcast vs sort-merge vs shuffled-hash
by size, and AQE re-plans at runtime (skew splitting).  We hint explicitly
where WE know the side is dimension-sized — statistics at 100 TB are often
missing or stale for freshly-written data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def broadcast_dim_join(
    fact: DataFrame, dim: DataFrame, on: Sequence[str] | Column, how: str = "inner"
) -> DataFrame:
    """Fact ⋈ broadcast(dim).  At 100 TB the fact side never moves: the dim
    table ships to every executor and the join is a local hash probe inside
    whole-stage codegen — zero shuffle."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    tolerance_ms: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, attach the matching right row per key
    (DuckDB/kdb ASOF JOIN semantics; pandas ``merge_asof`` directions):

    - ``backward`` (default): latest right row with ``right.ts <= left.ts``
    - ``forward``: earliest right row with ``right.ts >= left.ts``
    - ``nearest``: whichever of the two is closer in time (tie → backward,
      matching pandas)

    Spark-first implementation — NOT a per-key Python loop: tag both sides,
    union, and run ``last(match_struct, ignorenulls)`` over a window ordered
    by (ts, side) per key, where ``match_struct`` packs the right row's
    timestamp AND all its values and is non-null exactly for right-side rows.
    Matching is therefore on the *row*, not per-value — a right row whose
    value column is legitimately NULL still wins over an older non-null row
    (pandas ``merge_asof`` / DuckDB ASOF row semantics).  One shuffle + one
    sort per key, fully distributed, no cross join, no state on the driver.
    Ordering puts the right side BEFORE the left at equal timestamps, so
    ties are inclusive (<=).

    ``tolerance_ms`` optionally voids matches older than the tolerance
    (pandas merge_asof ``tolerance``).
    """
    lcols = left.columns
    sel_l = [F.col(c) for c in lcols]
    sel_l += [F.lit(None).cast(dict(right.dtypes)[v]).alias(f"__r_{v}") for v in right_values]
    sel_l += [
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("timestamp").alias("__rt"),
    ]
    tagged_l = left.select(*sel_l)

    sel_r = [F.col(k) for k in keys]
    sel_r += [F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols if c not in keys]
    sel_r += [F.col(v).alias(f"__r_{v}") for v in right_values]
    sel_r += [
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__rt"),
    ]
    tagged_r = right.select(*sel_r)

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
    unioned = tagged_l.unionByName(tagged_r.select(*tagged_l.columns))
    # backward: frame = everything up to (and incl.) this row, right rows
    # sorted BEFORE left at equal ts → ties inclusive; forward: the mirror
    # (frame from this row onward, right rows AFTER left at equal ts).
    w_back = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col("__t").asc(), F.col("__side").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    # Non-null exactly for right rows: carries the matched row atomically so
    # NULL values inside a matched row survive (never skipped for older rows).
    match_struct = F.when(
        F.col("__side") == 0,
        F.struct(
            F.col("__rt").alias("__mt"),
            *[F.col(f"__r_{v}").alias(f"__r_{v}") for v in right_values],
        ),
    )
    matches = []
    if direction in ("backward", "nearest"):
        matches.append(F.last(match_struct, ignorenulls=True).over(w_back).alias("__mb"))
    if direction in ("forward", "nearest"):
        matches.append(F.first(match_struct, ignorenulls=True).over(w_fwd).alias("__mf"))
    filled = unioned.select(
        *[F.col(c) for c in lcols],
        F.col("__side"),
        F.col("__t"),
        *matches,
    )

    # tolerance voids each candidate BEFORE the nearest-choice (pandas
    # semantics: a backward match outside tolerance must not shadow a
    # forward match within it)
    def _within(m: Column) -> Column:
        if tolerance_ms is None:
            return m
        dist = F.abs(F.unix_millis(F.col("__t")) - F.unix_millis(m["__mt"]))
        return F.when(dist <= F.lit(tolerance_ms), m)

    if direction == "backward":
        filled = filled.withColumn("__m", _within(F.col("__mb")))
    elif direction == "forward":
        filled = filled.withColumn("__m", _within(F.col("__mf")))
    else:
        mb, mf = _within(F.col("__mb")), _within(F.col("__mf"))
        d_back = F.unix_millis(F.col("__t")) - F.unix_millis(mb["__mt"])
        d_fwd = F.unix_millis(mf["__mt"]) - F.unix_millis(F.col("__t"))
        filled = filled.withColumn(
            "__m",
            F.when(mb.isNull(), mf)
            .when(mf.isNull(), mb)
            .when(d_fwd < d_back, mf)
            .otherwise(mb),  # tie → backward (pandas semantics)
        )
    return filled.filter(F.col("__side") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"__m.__r_{v}").alias(v) for v in right_values],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    equi_keys: Sequence[str],
    range_cond: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi + range-predicate join.  With equi keys present Catalyst plans a
    sort-merge/hash join on the keys with the range condition as a post-join
    filter — no nested-loop blowup.  Pure range joins (no equi key) should
    bucket the range dimension first at 100 TB — that path is
    ``banded_interval_join``."""
    cond = range_cond
    for k in equi_keys:
        cond = (left[k] == right[k]) & cond
    return left.join(right, cond, how)


def banded_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    band_ms: int,
    how: str = "inner",
) -> DataFrame:
    """Pure range join (NO equi key) as an equality join on time bands —
    the scale path a nested-loop product cannot provide.

    Matches every (left, right) pair with ``start <= point < end`` (all
    columns epoch-millis BIGINT).  Each right interval explodes to the
    bands it overlaps; each left point lives in exactly ONE band, so every
    qualifying pair meets in exactly one band — exact join, NO dedup
    shuffle.  The equality join on ``__band`` hash-partitions both sides;
    communication is O(rows x interval_width/band_ms) instead of |L|x|R|.

    ``band_ms`` is the classic fan-out-vs-selectivity knob: pick it near
    the typical interval width so most intervals explode to <= 2 bands
    while bands stay selective.
    """
    if band_ms <= 0:
        raise ValueError(f"band_ms must be positive, got {band_ms}")
    if how != "inner":
        raise ValueError(
            "banded_interval_join is inner-only (outer semantics would need "
            "anti-join reconstruction over the band explosion)"
        )
    # integer div per house rule (double division corrupts int64 at nanos)
    lb = left.withColumn("__band", F.expr(f"{left_point} div {band_ms}"))
    # empty/inverted intervals yield no bands — also guards Spark's
    # DESCENDING sequence(a, b) when b < a
    bands = F.when(
        F.col(right_end) > F.col(right_start),
        F.sequence(
            F.expr(f"{right_start} div {band_ms}"),
            F.expr(f"({right_end} - 1) div {band_ms}"),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    rb = right.withColumn("__band", F.explode(bands))
    joined = lb.join(rb, "__band", how).filter(
        (F.col(left_point) >= F.col(right_start))
        & (F.col(left_point) < F.col(right_end))
    )
    return joined.drop("__band")
