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


HW_SCALE = 10**6  # fixed-point scale for smoothing state
HW_ALPHA = (3, 10)  # level smoothing 0.3 as an exact integer ratio
HW_BETA = (1, 10)  # trend smoothing 0.1


def double_exponential_forecast(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    n_days: int = 14,
) -> DataFrame:
    """Holt's double-exponential smoothing (level + trend, no seasonality)
    over per-key DAILY event counts, in int64 fixed-point — the
    forecasting sibling of the fleet's other fixed-iteration operators
    (PageRank/LPA/IVF discipline): a FIXED horizon of ``n_days`` days from
    the dataset's anchor date unrolls the recurrence into ``n_days``
    projections, so the result replays bit-for-bit as an unrolled CTE
    chain in the oracle.

        l_0 = x_0·S               b_0 = (x_1 − x_0)·S
        l_t = (3·x_t·S + 7·(l_{t−1} + b_{t−1})) div 10       (alpha 0.3)
        b_t = ((l_t − l_{t−1}) + 9·b_{t−1}) div 10           (beta 0.1)

    ``div`` truncates toward zero in BOTH Spark and DuckDB (verified
    including negative trends), so no floor/truncation divergence exists.
    Returns one row per key: ``(*key_cols, level_fp, trend_fp,
    forecast_fp)`` with forecast_fp = l_last + b_last (the 1-step-ahead
    forecast in S units).

    Scale shape: ONE pass builds per-key day counts as ``n_days``
    conditional aggregates (map-side partials, no pivot shuffle); the
    recurrence is ``n_days`` narrow column projections over the
    |keys|-row aggregate — iteration cost is independent of event count.
    The anchor date is a sanctioned tiny-scalar collect (IVF-centroid
    precedent); at 100 TB callers pass a known calendar anchor instead.
    """
    anchor = df.select(F.min(F.to_date(F.col(ts_col))).alias("d")).first()["d"]
    idx = F.datediff(F.to_date(F.col(ts_col)), F.lit(anchor))
    base = df.filter((idx >= 0) & (idx < n_days)).groupBy(*key_cols).agg(
        *[
            F.coalesce(
                F.sum(F.when(idx == i, F.lit(1)).otherwise(F.lit(0))), F.lit(0)
            )
            .cast("long")
            .alias(f"x{i}")
            for i in range(n_days)
        ]
    )
    S = HW_SCALE
    an, ad = HW_ALPHA
    bn, bd = HW_BETA
    # ONE nested-subquery SQL analyzed in a single pass (the
    # holt_winters_forecast treatment, r13, guide §1): the old form
    # issued ~4 withColumn calls per unrolled step, each a py4j round
    # trip + an analysis pass over the deepening plan.  l_t substitutes
    # textually into b_t (prior-step references only, constant expression
    # size); identical int64 arithmetic, oracle-replayed unchanged.
    carried = [f"`{c}`" for c in key_cols] + [f"x{i}" for i in range(n_days)]
    q = (
        "SELECT *, "
        + f"CAST(x0 * {S} AS BIGINT) AS l, "
        + f"CAST((x1 - x0) * {S} AS BIGINT) AS b "
        + "FROM {base}"
    )
    cols = carried + ["l", "b"]
    for t in range(1, n_days):
        ln = f"CAST(({an} * (x{t} * {S}) + {ad - an} * (l + b)) div {ad} AS BIGINT)"
        keep = [c for c in cols if c not in ("l", "b")]
        q = (
            "SELECT "
            + ", ".join(keep)
            + f", {ln} AS l"
            + f", CAST(({bn} * ({ln} - l) + {bd - bn} * b) div {bd} AS BIGINT) AS b"
            + " FROM ("
            + q
            + ")"
        )
        cols = keep + ["l", "b"]
    cur = df.sparkSession.sql(q, base=base)
    return cur.select(
        *key_cols,
        F.col("l").alias("level_fp"),
        F.col("b").alias("trend_fp"),
        (F.col("l") + F.col("b")).cast("long").alias("forecast_fp"),
    )


def double_exp_oracle_sql(
    table: str,
    key_cols: list[str],
    ts_col: str = "ts",
    n_days: int = 14,
) -> str:
    """Unrolled-CTE replay of ``double_exponential_forecast`` — identical
    anchor, day indexing, conditional counts, and div-truncation
    recurrence."""
    keys = ", ".join(key_cols)
    an, ad = HW_ALPHA
    bn, bd = HW_BETA
    xs = ",\n         ".join(
        f"COALESCE(SUM(CASE WHEN datediff('day', a.anchor, CAST({ts_col} AS DATE))"
        f" = {i} THEN 1 ELSE 0 END), 0)::BIGINT AS x{i}"
        for i in range(n_days)
    )
    ctes = [
        f"a AS (SELECT MIN(CAST({ts_col} AS DATE)) AS anchor FROM {table})",
        f"""s0 AS (
  SELECT {keys},
         {xs}
  FROM {table}, a
  WHERE datediff('day', a.anchor, CAST({ts_col} AS DATE)) >= 0
    AND datediff('day', a.anchor, CAST({ts_col} AS DATE)) < {n_days}
  GROUP BY {keys}
)""",
        f"r0 AS (SELECT *, (x0 * {HW_SCALE})::BIGINT AS l,"
        f" ((x1 - x0) * {HW_SCALE})::BIGINT AS b FROM s0)",
    ]
    for t in range(1, n_days):
        prev = f"r{t - 1}"
        ctes.append(
            f"""r{t} AS (
  SELECT * EXCLUDE (l, b, ln),
         ln AS l,
         (({bn} * (ln - l) + {bd - bn} * b) // {bd})::BIGINT AS b
  FROM (SELECT *,
          (({an} * (x{t} * {HW_SCALE}) + {ad - an} * (l + b)) // {ad})::BIGINT AS ln
        FROM {prev})
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT {keys}, l AS level_fp, b AS trend_fp, (l + b)::BIGINT AS forecast_fp
FROM r{n_days - 1}
"""
    )


def cusum_changepoints(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    baseline_days: int = 7,
    n_days: int = 30,
    threshold_pct: int = 50,
) -> DataFrame:
    """CUSUM drift detection over per-key daily counts, all-integer: the
    baseline is the first ``baseline_days`` days' total B (so the daily
    mean is the rational B/baseline_days, never materialized as a float);
    each day's deviation is cross-multiplied, dev_t = baseline_days·x_t −
    B, and the running sum flags drift when |cusum_t| exceeds
    threshold_pct% of B — i.e. |cusum| · 100 > threshold_pct · B, again
    cross-multiplied.  One row per (key, day): ``(*key_cols, day_idx,
    n_events, cusum, drifted)``.

    The ops question this answers — 'did this event type's volume drift
    from its launch-week baseline, and when?' — as a checked query, the
    skew/anomaly-report discipline.  Shape: one conditional-count
    aggregate per (key, day) with map-side partials, a cumulative window
    ordered by day WITHIN each key partition (bounded frame, no global
    sort), and a broadcast-sized baseline join."""
    anchor = df.select(F.min(F.to_date(F.col(ts_col))).alias("d")).first()["d"]
    idx = F.datediff(F.to_date(F.col(ts_col)), F.lit(anchor))
    daily = (
        df.filter((idx >= 0) & (idx < n_days))
        # cast: fleet convention is BIGINT day indices (matches the
        # oracle's int64 and every sibling query's schema)
        .groupBy(*key_cols, idx.cast("long").alias("day_idx"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    base = (
        daily.filter(F.col("day_idx") < baseline_days)
        .groupBy(*key_cols)
        .agg(F.sum("n_events").cast("long").alias("b_total"))
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("day_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dev = F.lit(baseline_days) * F.col("n_events") - F.col("b_total")
    scored = (
        daily.join(F.broadcast(base), key_cols)
        .withColumn("cusum", F.sum(dev).over(w).cast("long"))
        .withColumn(
            "drifted",
            F.abs(F.col("cusum")) * 100 > F.lit(threshold_pct) * F.col("b_total"),
        )
    )
    return scored.select(*key_cols, "day_idx", "n_events", "cusum", "drifted")


def cusum_oracle_sql(
    table: str,
    key_cols: list[str],
    ts_col: str = "ts",
    baseline_days: int = 7,
    n_days: int = 30,
    threshold_pct: int = 50,
) -> str:
    keys = ", ".join(key_cols)
    return f"""
WITH a AS (SELECT MIN(CAST({ts_col} AS DATE)) AS anchor FROM {table}),
daily AS (
  SELECT {keys},
         datediff('day', a.anchor, CAST({ts_col} AS DATE)) AS day_idx,
         COUNT(*)::BIGINT AS n_events
  FROM {table}, a
  WHERE datediff('day', a.anchor, CAST({ts_col} AS DATE)) >= 0
    AND datediff('day', a.anchor, CAST({ts_col} AS DATE)) < {n_days}
  GROUP BY {keys}, day_idx
),
base AS (
  SELECT {keys}, SUM(n_events)::BIGINT AS b_total
  FROM daily WHERE day_idx < {baseline_days} GROUP BY {keys}
)
SELECT d.{keys.replace(', ', ', d.')}, d.day_idx, d.n_events,
       (SUM({baseline_days} * d.n_events - b.b_total) OVER (
          PARTITION BY d.{keys.replace(', ', ', d.')}
          ORDER BY d.day_idx
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cusum,
       abs(SUM({baseline_days} * d.n_events - b.b_total) OVER (
          PARTITION BY d.{keys.replace(', ', ', d.')}
          ORDER BY d.day_idx
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100
         > {threshold_pct} * b.b_total AS drifted
FROM daily d JOIN base b USING ({keys})
"""


HW_GAMMA = (2, 10)  # seasonal smoothing 0.2


def holt_winters_forecast(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    n_days: int = 28,
    period: int = 7,
) -> DataFrame:
    """Additive Holt-Winters (level + trend + weekly seasonality) over
    per-key daily counts, int64 fixed-point, FIXED 28-day horizon — the
    seasonal completion of ``double_exponential_forecast`` and the same
    replayability discipline: classic two-week initialization
    (m = (B·S) div 7 over week one; s_i = x_i·S − m; b = (W2−W1)·S div 49)
    then 21 unrolled smoothing steps, each updating one rotating seasonal
    slot:

        l_t = (3·(x_t·S − s_{t−7}) + 7·(l+b)) div 10
        b_t = ((l_t − l) + 9·b) div 10
        s_t = (2·(x_t·S − l_t) + 8·s_{t−7}) div 10

    Output per key: ``(*key_cols, level_fp, trend_fp, season_next_fp,
    forecast_fp)`` with forecast_fp = l + b + s_{n_days mod period} (the
    1-step-ahead seasonal forecast).  Same scale shape as the double-exp
    operator: one conditional-aggregate pass, then per-key projections
    whose count is the horizon, not the data volume."""
    if n_days < 2 * period:
        raise ValueError(f"need >= {2 * period} days for init, got {n_days}")
    anchor = df.select(F.min(F.to_date(F.col(ts_col))).alias("d")).first()["d"]
    idx = F.datediff(F.to_date(F.col(ts_col)), F.lit(anchor))
    base = df.filter((idx >= 0) & (idx < n_days)).groupBy(*key_cols).agg(
        *[
            F.coalesce(
                F.sum(F.when(idx == i, F.lit(1)).otherwise(F.lit(0))), F.lit(0)
            )
            .cast("long")
            .alias(f"x{i}")
            for i in range(n_days)
        ]
    )
    S = HW_SCALE
    an, ad = HW_ALPHA
    bn, bd = HW_BETA
    gn, gd = HW_GAMMA
    w1 = " + ".join(f"x{i}" for i in range(period))
    w2 = " + ".join(f"x{i}" for i in range(period, 2 * period))
    # The 21 unrolled smoothing steps are assembled as ONE nested-subquery
    # SQL string and analyzed in ONE pass (r13, guide §1: fn()
    # construction was 1.8 s of this query's 2.5 s — the old form issued
    # ~90 withColumn calls, each a py4j round trip plus a Catalyst
    # analysis pass over the ever-deeper plan, quadratic total work; a
    # single spark.sql() analyzes the whole 22-level tree once, and the
    # optimizer collapses the nested Projects to the identical physical
    # plan).  Each step's l_t is substituted textually into its b_t/s_t
    # expressions (it references only prior-step columns, so one level of
    # substitution suffices and expression size stays constant per
    # step); every value is the same int64 arithmetic, oracle-replayed
    # unchanged.
    carried = [f"`{c}`" for c in key_cols] + [f"x{i}" for i in range(n_days)]
    q = (
        "SELECT *, "
        + f"CAST((({w1}) * {S}) div {period} AS BIGINT) AS m "
        + "FROM {base}"
    )
    sc_init = ", ".join(
        f"CAST(x{i} * {S} - m AS BIGINT) AS sc{i}" for i in range(period)
    )
    q = (
        "SELECT *, "
        + sc_init
        + ", CAST(m AS BIGINT) AS l"
        + f", CAST(((({w2}) - ({w1})) * {S}) div {period * period} AS BIGINT) AS b"
        + " FROM ("
        + q
        + ")"
    )
    cols = carried + ["m"] + [f"sc{i}" for i in range(period)] + ["l", "b"]
    for t in range(period, n_days):
        k = t % period
        ln = (
            f"CAST(({an} * (x{t} * {S} - sc{k}) + {ad - an} * (l + b)) "
            f"div {ad} AS BIGINT)"
        )
        keep = [c for c in cols if c not in ("l", "b", f"sc{k}")]
        q = (
            "SELECT "
            + ", ".join(keep)
            + f", {ln} AS l"
            + f", CAST(({bn} * ({ln} - l) + {bd - bn} * b) div {bd} AS BIGINT) AS b"
            + f", CAST(({gn} * (x{t} * {S} - {ln}) + {gd - gn} * sc{k}) div {gd}"
            + f" AS BIGINT) AS sc{k}"
            + " FROM ("
            + q
            + ")"
        )
        cols = keep + ["l", "b", f"sc{k}"]
    cur = df.sparkSession.sql(q, base=base)
    nk = n_days % period
    return cur.select(
        *key_cols,
        F.col("l").alias("level_fp"),
        F.col("b").alias("trend_fp"),
        F.col(f"sc{nk}").alias("season_next_fp"),
        (F.col("l") + F.col("b") + F.col(f"sc{nk}")).cast("long").alias("forecast_fp"),
    )


def holt_winters_oracle_sql(
    table: str,
    key_cols: list[str],
    ts_col: str = "ts",
    n_days: int = 28,
    period: int = 7,
) -> str:
    keys = ", ".join(key_cols)
    S = HW_SCALE
    an, ad = HW_ALPHA
    bn, bd = HW_BETA
    gn, gd = HW_GAMMA
    xs = ",\n         ".join(
        f"COALESCE(SUM(CASE WHEN datediff('day', a.anchor, CAST({ts_col} AS DATE))"
        f" = {i} THEN 1 ELSE 0 END), 0)::BIGINT AS x{i}"
        for i in range(n_days)
    )
    w1 = " + ".join(f"x{i}" for i in range(period))
    w2 = " + ".join(f"x{i}" for i in range(period, 2 * period))
    scs = ",\n         ".join(
        f"(x{i} * {S} - (({w1}) * {S}) // {period})::BIGINT AS sc{i}"
        for i in range(period)
    )
    ctes = [
        f"a AS (SELECT MIN(CAST({ts_col} AS DATE)) AS anchor FROM {table})",
        f"""s0 AS (
  SELECT {keys},
         {xs}
  FROM {table}, a
  WHERE datediff('day', a.anchor, CAST({ts_col} AS DATE)) >= 0
    AND datediff('day', a.anchor, CAST({ts_col} AS DATE)) < {n_days}
  GROUP BY {keys}
)""",
        f"""r{period - 1} AS (
  SELECT *,
         {scs},
         ((({w1}) * {S}) // {period})::BIGINT AS l,
         (((({w2}) - ({w1})) * {S}) // {period * period})::BIGINT AS b
  FROM s0
)""",
    ]
    for t in range(period, n_days):
        k = t % period
        prev = f"r{t - 1}"
        ctes.append(
            f"""r{t} AS (
  SELECT * EXCLUDE (l, b, sc{k}, ln),
         ln AS l,
         (({bn} * (ln - l) + {bd - bn} * b) // {bd})::BIGINT AS b,
         (({gn} * (x{t} * {S} - ln) + {gd - gn} * sc{k}) // {gd})::BIGINT AS sc{k}
  FROM (SELECT *,
          (({an} * (x{t} * {S} - sc{k}) + {ad - an} * (l + b)) // {ad})::BIGINT AS ln
        FROM {prev})
)"""
        )
    nk = n_days % period
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT {keys}, l AS level_fp, b AS trend_fp, sc{nk} AS season_next_fp,
       (l + b + sc{nk})::BIGINT AS forecast_fp
FROM r{n_days - 1}
"""
    )


# ---------------------------------------------------------------------------
# Time-weighted average (the hypertable ``time_weight('LOCF', ...)``
# aggregate): the mean of a step function that holds each observation's
# value until the next observation — what "average sensor reading" must
# mean for irregularly-sampled series (an arithmetic mean over-weights
# bursts of samples).
# ---------------------------------------------------------------------------


def time_weighted_avg(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_ms_col: str,
    value_cents_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-key LOCF time-weighted average:
    ``(key..., n_events, span_ms, twa_cents)``.

    twa = Σ value_i · (t_{i+1} − t_i) / (t_n − t_1) over the observation
    span, i.e. the integral of the LOCF step function divided by its
    length.  The last observation spans zero time (integral to the last
    KNOWN instant — extending past t_n would invent data).  A key with
    one observation (span 0) reports its own value.

    Exactness: value·gap products and their sum are int64 (cents ×
    epoch-ms gaps; worst case 10⁶ cents × 10¹¹ ms span keeps Σ below
    ~10¹⁷ < 2⁶³); the ONLY float op is the final sum/span division,
    identical one-op IEEE in both engines, then ROUND to 4 — the
    cross-engine float discipline every timeseries op here follows.

    Ties: with two observations at the same (key, ts), the zero gaps
    between tied rows contribute nothing — but the LAST tied row carries
    the entire gap to the next distinct timestamp, so WHICH row sorts
    last changes twa_cents.  ``tiebreak_col`` (e.g. an event id) makes
    that ordering deterministic and must be mirrored in the oracle's
    LEAD ... ORDER BY; without it the operator is only deterministic on
    tie-free input.

    Shape: one hash exchange on the key, lead() in-partition, one
    partial-aggregated groupBy — the cusum/gapfill profile."""
    order = [F.col("__t").asc()]
    extra = []
    if tiebreak_col is not None:
        extra = [F.col(tiebreak_col).alias("__tb")]
        order.append(F.col("__tb").asc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    gapped = df.select(
        *key_cols,
        F.col(ts_ms_col).alias("__t"),
        F.col(value_cents_col).alias("__v"),
        *extra,
    ).withColumn("__gap", F.lead("__t").over(w) - F.col("__t"))
    agg = gapped.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.max("__t") - F.min("__t")).cast("long").alias("span_ms"),
        F.sum(F.col("__v") * F.coalesce(F.col("__gap"), F.lit(0)))
        .cast("long")
        .alias("__wsum"),
        F.min(F.struct(F.col("__t"), F.col("__v"))).alias("__first"),
    )
    return agg.select(
        *key_cols,
        "n_events",
        "span_ms",
        F.when(F.col("span_ms") > 0, F.round(F.col("__wsum") / F.col("span_ms"), 4))
        .otherwise(F.col("__first.__v").cast("double"))
        .alias("twa_cents"),
    )


def time_weighted_avg_oracle_sql(
    table: str,
    key_cols: Sequence[str],
    ts_ms_expr: str,
    value_cents_expr: str,
    tiebreak_expr: str | None = None,
) -> str:
    """DuckDB replay of time_weighted_avg (same int64 integral, same
    single rounded division).  ``tiebreak_expr`` mirrors the operator's
    tiebreak_col: the last-sorted row among timestamp ties carries the
    gap to the next distinct timestamp, so the LEAD ordering must match
    the Spark window exactly for tied input to hash-agree."""
    keys = ", ".join(key_cols)
    tb_sel = f", {tiebreak_expr} AS tb" if tiebreak_expr is not None else ""
    tb_ord = ", tb ASC" if tiebreak_expr is not None else ""
    return f"""
WITH s AS (
    SELECT {keys}, {ts_ms_expr} AS t, {value_cents_expr} AS v{tb_sel}
    FROM {table}
), g AS (
    SELECT {keys}, t, v,
           LEAD(t) OVER (PARTITION BY {keys} ORDER BY t ASC{tb_ord}) - t AS gap
    FROM s
), a AS (
    SELECT {keys},
           COUNT(*) AS n_events,
           MAX(t) - MIN(t) AS span_ms,
           CAST(SUM(v * COALESCE(gap, 0)) AS BIGINT) AS wsum,
           MIN(struct_pack(t := t, v := v)) AS first_tv
    FROM g GROUP BY {keys}
)
SELECT {keys},
       CAST(n_events AS BIGINT) AS n_events,
       CAST(span_ms AS BIGINT) AS span_ms,
       CASE WHEN span_ms > 0 THEN ROUND(wsum / span_ms, 4)
            ELSE CAST(first_tv.v AS DOUBLE) END AS twa_cents
FROM a
"""


# ---------------------------------------------------------------------------
# Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013) — the
# standard viz/retention downsampler (Timescale/Grafana): keep ~n_out
# points per series while preserving the visual shape, by choosing from
# each bucket the point forming the largest triangle with its neighbor
# buckets.
# ---------------------------------------------------------------------------


def lttb_downsample(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_ms_col: str,
    value_cents_col: str,
    n_out: int = 20,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-key LTTB downsample to ``n_out`` points:
    ``(*key_cols, ord, ts_ms, cents)``.

    Parallel-deterministic variant: classic LTTB anchors each bucket's
    triangle on the PREVIOUSLY SELECTED point — an inherently sequential
    scan.  This operator anchors on the previous bucket's AVERAGE (the
    same simplification the original paper evaluates as
    "LTTB-with-fixed-anchors"), which makes every bucket's argmax
    independent → fully parallel, engine-replayable, and within a few
    percent of sequential LTTB's visual error on real series.

    Exactness: the triangle area comparison is an INTEGER cross product.
    With A = prev-bucket average, C = next-bucket average, B a candidate,
    area ∝ |(A−B) × (C−B)|; multiplying through by the bucket counts
    clears the rational averages:
        v1 = (sa_t − t·ca, sa_y − y·ca),  v2 = (sc_t − t·cc, sc_y − y·cc)
        score = |v1.x·v2.y − v1.y·v2.x|
    Timestamps are normalized to the key's own origin so components stay
    ~1e13; the cross product still exceeds int64, so it is computed in
    decimal(38,0) (Spark) / HUGEINT (DuckDB) — exact in both.  Ties:
    smaller timestamp, then position.

    First/last points are always kept (ord 0 and n_out−1); middle points
    split into n_out−2 equal-COUNT buckets by rank.  Keys with ≤ n_out
    points pass through unchanged (ord = position).  Shape: one hash
    exchange on the key; ranks/bucket sums/argmax all ride that one
    partitioning (windows + a bucket-sum groupBy + one bucket-keyed
    join of candidates to neighbor sums).
    """
    if n_out < 3:
        raise ValueError(f"n_out must be >= 3, got {n_out}")
    tb = [F.col(tiebreak_col).asc()] if tiebreak_col else []
    w = Window.partitionBy(*key_cols).orderBy(F.col("t").asc(), *tb)
    base = (
        df.select(
            *key_cols,
            F.col(ts_ms_col).alias("t"),
            F.col(value_cents_col).alias("y"),
            *([F.col(tiebreak_col)] if tiebreak_col else []),
        )
        .withColumn("pos", F.row_number().over(w) - 1)
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy(*key_cols)))
        .withColumn("t0", F.min("t").over(Window.partitionBy(*key_cols)))
        .withColumn("tn", F.col("t") - F.col("t0"))
    )
    small = base.filter(F.col("n") <= n_out).select(
        *key_cols,
        F.col("pos").cast("long").alias("ord"),
        F.col("t").alias("ts_ms"),
        F.col("y").alias("cents"),
    )
    big = base.filter(F.col("n") > n_out)
    nb = n_out - 2
    # bucket −1 = the first point, buckets 0..nb−1 = middle, bucket nb =
    # the last point; middle split by RANK into equal-count buckets
    bucket = (
        F.when(F.col("pos") == 0, F.lit(-1))
        .when(F.col("pos") == F.col("n") - 1, F.lit(nb))
        # `div`, not `/`+cast: Spark casts double→int by truncation but
        # DuckDB CAST rounds — integer division sidesteps the divergence
        .otherwise(F.expr(f"((pos - 1) * {nb}) div (n - 2)").cast("int"))
    )
    bt = big.withColumn("bucket", bucket)
    # sum in decimal(38,0): DuckDB's SUM(BIGINT) is HUGEINT, and an
    # int64 Σtn wraps at per-key n ~1e9 (5e7 rows × 1e11 ms ≈ 2^62·5)
    sums = bt.groupBy(*key_cols, "bucket").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(F.col("tn").cast("decimal(38,0)")).alias("st"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
    )
    wb = Window.partitionBy(*key_cols).orderBy("bucket")
    nbrs = sums.select(
        *key_cols,
        "bucket",
        F.lag("c").over(wb).alias("ca"),
        F.lag("st").over(wb).alias("sa_t"),
        F.lag("sy").over(wb).alias("sa_y"),
        F.lead("c").over(wb).alias("cc"),
        F.lead("st").over(wb).alias("sc_t"),
        F.lead("sy").over(wb).alias("sc_y"),
    ).filter((F.col("bucket") >= 0) & (F.col("bucket") < nb))
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    cand = bt.filter((F.col("bucket") >= 0) & (F.col("bucket") < nb)).join(
        nbrs, [*key_cols, "bucket"]
    )
    # Cast the FACTORS to decimal(38,0) before the inner multiply —
    # DuckDB computes tn*ca / sa_t in HUGEINT throughout (SUM of BIGINT
    # is HUGEINT), so an int64 inner product on the Spark side would
    # silently wrap at per-key n ~1e9 (tn ~1e11 ms × ca ~5e7 > 2^63)
    # while the oracle does not.  Matching HUGEINT-throughout keeps the
    # exactness claim true in exactly the regime it targets.
    score = F.abs(
        (d(F.col("sa_t")) - d(F.col("tn")) * d(F.col("ca")))
        * (d(F.col("sc_y")) - d(F.col("y")) * d(F.col("cc")))
        - (d(F.col("sa_y")) - d(F.col("y")) * d(F.col("ca")))
        * (d(F.col("sc_t")) - d(F.col("tn")) * d(F.col("cc")))
    )
    wr = Window.partitionBy(*key_cols, "bucket").orderBy(
        score.desc(), F.col("t").asc(), F.col("pos").asc()
    )
    winners = (
        cand.withColumn("__rn", F.row_number().over(wr))
        .filter(F.col("__rn") == 1)
        .select(
            *key_cols,
            (F.col("bucket") + 1).cast("long").alias("ord"),
            F.col("t").alias("ts_ms"),
            F.col("y").alias("cents"),
        )
    )
    ends = bt.filter(F.col("bucket").isin(-1, nb)).select(
        *key_cols,
        F.when(F.col("bucket") == -1, F.lit(0))
        .otherwise(F.lit(n_out - 1))
        .cast("long")
        .alias("ord"),
        F.col("t").alias("ts_ms"),
        F.col("y").alias("cents"),
    )
    return small.unionByName(ends).unionByName(winners)


def lttb_oracle_sql(
    table: str,
    key_cols: Sequence[str],
    ts_ms_expr: str,
    value_cents_expr: str,
    n_out: int = 20,
    tiebreak_expr: str | None = None,
) -> str:
    """DuckDB replay of lttb_downsample (same rank bucketing, same
    HUGEINT cross-product scores, same tie order)."""
    keys = ", ".join(key_cols)
    nb = n_out - 2
    tb_sel = f", {tiebreak_expr} AS tb" if tiebreak_expr else ""
    tb = ", tb ASC" if tiebreak_expr else ""
    return f"""
WITH s AS (
    SELECT {keys}, {ts_ms_expr} AS t, {value_cents_expr} AS y{tb_sel}
    FROM {table}
), base AS (
    SELECT {keys}, t, y,
           ROW_NUMBER() OVER (PARTITION BY {keys} ORDER BY t ASC{tb}) - 1 AS pos,
           COUNT(*) OVER (PARTITION BY {keys}) AS n,
           t - MIN(t) OVER (PARTITION BY {keys}) AS tn
    FROM s
), small AS (
    SELECT {keys}, CAST(pos AS BIGINT) AS "ord", t AS ts_ms, y AS cents
    FROM base WHERE n <= {n_out}
), bt AS (
    SELECT *,
           CASE WHEN pos = 0 THEN -1
                WHEN pos = n - 1 THEN {nb}
                ELSE CAST(((pos - 1) * {nb}) // (n - 2) AS INT) END AS bucket
    FROM base WHERE n > {n_out}
), sums AS (
    SELECT {keys}, bucket, COUNT(*) AS c, SUM(tn) AS st, SUM(y) AS sy
    FROM bt GROUP BY {keys}, bucket
), nbrs AS (
    SELECT {keys}, bucket,
           LAG(c)  OVER w AS ca, LAG(st)  OVER w AS sa_t, LAG(sy)  OVER w AS sa_y,
           LEAD(c) OVER w AS cc, LEAD(st) OVER w AS sc_t, LEAD(sy) OVER w AS sc_y
    FROM sums
    WINDOW w AS (PARTITION BY {keys} ORDER BY bucket)
    QUALIFY bucket >= 0 AND bucket < {nb}
), cand AS (
    SELECT bt.*, ca, sa_t, sa_y, cc, sc_t, sc_y,
           abs(CAST(sa_t - tn * ca AS HUGEINT) * CAST(sc_y - y * cc AS HUGEINT)
             - CAST(sa_y - y * ca AS HUGEINT) * CAST(sc_t - tn * cc AS HUGEINT))
             AS score
    FROM bt JOIN nbrs USING ({keys}, bucket)
    WHERE bt.bucket >= 0 AND bt.bucket < {nb}
), winners AS (
    SELECT {keys}, CAST(bucket + 1 AS BIGINT) AS "ord", t AS ts_ms, y AS cents
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY {keys}, bucket
                                       ORDER BY score DESC, t ASC, pos ASC) AS rn
          FROM cand)
    WHERE rn = 1
), ends AS (
    SELECT {keys},
           CAST(CASE WHEN bucket = -1 THEN 0 ELSE {n_out - 1} END AS BIGINT)
             AS "ord",
           t AS ts_ms, y AS cents
    FROM bt WHERE bucket IN (-1, {nb})
)
SELECT * FROM small
UNION ALL SELECT * FROM ends
UNION ALL SELECT * FROM winners
"""


# ---------------------------------------------------------------------------
# Robust trend: Theil–Sen median slope + the Mann–Kendall S statistic over
# per-key daily counts — the outlier-resistant replacement for OLS trend
# (one anomalous day cannot move a median-of-slopes the way it moves a
# least-squares fit).
# ---------------------------------------------------------------------------


def robust_trend(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    n_days: int = 30,
) -> DataFrame:
    """Per-key robust trend over daily event counts:
    ``(*key_cols, n_days_obs, mk_s, sen_slope_x2_q4)``.

    - ``mk_s``: Mann–Kendall S = Σ_{i<j} sign(c_j − c_i) — positive S
      means rising, |S| near the pair count means monotone; an exact
      integer.
    - ``sen_slope_x2_q4``: Theil–Sen estimator — the MEDIAN of all
      pairwise slopes (c_j − c_i)/(j − i) — as fixed-point: each slope
      is floored to 1e-4 units (integer ``div``), and the median is
      reported ×2 (sum of the two middle order statistics for even pair
      counts, 2× the middle one for odd) so no final halving /
      float division exists anywhere.

    Bounded pair fan-out: days are aggregated FIRST, so the self-join is
    |keys| · n_days²/2 pairs (435 per key at 30 days) regardless of
    event volume — the pair stage reads aggregates, never events.  The
    per-key median runs a window over those ≤435 rows, partitioned by
    key.  The day anchor is the dataset min date (the forecasting-family
    scalar convention)."""
    anchor = df.select(F.min(F.to_date(F.col(ts_col))).alias("d")).first()["d"]
    idx = F.datediff(F.to_date(F.col(ts_col)), F.lit(anchor))
    daily = (
        df.filter((idx >= 0) & (idx < n_days))
        .groupBy(*key_cols, idx.cast("long").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    a = daily.select(
        *key_cols, F.col("day").alias("di"), F.col("c").alias("ci")
    )
    b = daily.select(
        *key_cols, F.col("day").alias("dj"), F.col("c").alias("cj")
    )
    pairs = a.join(b, list(key_cols)).filter(F.col("di") < F.col("dj"))
    slopes = pairs.select(
        *key_cols,
        F.signum(F.col("cj") - F.col("ci")).cast("long").alias("sgn"),
        F.expr("((cj - ci) * 10000) div (dj - di)").alias("s_q4"),
    )
    w = Window.partitionBy(*key_cols).orderBy(F.col("s_q4").asc())
    ranked = slopes.select(
        *key_cols,
        "sgn",
        "s_q4",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy(*key_cols)).alias("np"),
    )
    # median ×2: even np → rn ∈ {np/2, np/2+1}; odd → the middle twice
    mid = ranked.filter(
        F.expr(
            "(np % 2 = 0 AND (rn = np div 2 OR rn = np div 2 + 1))"
            " OR (np % 2 = 1 AND rn = (np + 1) div 2)"
        )
    )
    med = mid.groupBy(*key_cols).agg(
        F.when(F.max("np") % 2 == 1, F.sum("s_q4") * 2)
        .otherwise(F.sum("s_q4"))
        .cast("long")
        .alias("sen_slope_x2_q4")
    )
    agg = slopes.groupBy(*key_cols).agg(
        F.sum("sgn").cast("long").alias("mk_s"),
    )
    days = daily.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_days_obs")
    )
    return (
        days.join(agg, list(key_cols))
        .join(med, list(key_cols))
        .select(*key_cols, "n_days_obs", "mk_s", "sen_slope_x2_q4")
    )


def robust_trend_oracle_sql(
    table: str,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    n_days: int = 30,
) -> str:
    """DuckDB replay of robust_trend (anchor recomputed in SQL; identical
    integer slope fixed-point and median-×2 convention)."""
    keys = ", ".join(key_cols)
    return f"""
WITH anchor AS (SELECT MIN(CAST({ts_col} AS DATE)) AS d0 FROM {table}),
e AS (
    SELECT {keys},
           datediff('day', (SELECT d0 FROM anchor), CAST({ts_col} AS DATE))
             AS day
    FROM {table}
), daily AS (
    SELECT {keys}, CAST(day AS BIGINT) AS day, COUNT(*) AS c
    FROM e WHERE day >= 0 AND day < {n_days}
    GROUP BY {keys}, day
), pairs AS (
    SELECT a.{keys.replace(', ', ', a.')},
           sign(b.c - a.c)::BIGINT AS sgn,
           ((b.c - a.c) * 10000) // (b.day - a.day) AS s_q4
    FROM daily a JOIN daily b
      ON {' AND '.join(f'a.{k} = b.{k}' for k in key_cols)}
     AND a.day < b.day
), ranked AS (
    SELECT *,
           ROW_NUMBER() OVER (PARTITION BY {keys} ORDER BY s_q4 ASC) AS rn,
           COUNT(*) OVER (PARTITION BY {keys}) AS np
    FROM pairs
), med AS (
    SELECT {keys},
           CAST(CASE WHEN MAX(np) % 2 = 1 THEN SUM(s_q4) * 2
                     ELSE SUM(s_q4) END AS BIGINT) AS sen_slope_x2_q4
    FROM ranked
    WHERE (np % 2 = 0 AND rn IN (np // 2, np // 2 + 1))
       OR (np % 2 = 1 AND rn = (np + 1) // 2)
    GROUP BY {keys}
), agg AS (
    SELECT {keys}, CAST(SUM(sgn) AS BIGINT) AS mk_s
    FROM pairs GROUP BY {keys}
), days AS (
    SELECT {keys}, COUNT(*)::BIGINT AS n_days_obs FROM daily GROUP BY {keys}
)
SELECT d.{keys.replace(', ', ', d.')}, d.n_days_obs, agg.mk_s,
       med.sen_slope_x2_q4
FROM days d
JOIN agg USING ({keys})
JOIN med USING ({keys})
"""


def ohlc_bars(
    df: DataFrame,
    key_cols: Sequence[str],
    day_col: str = "day",
    ts_ms_col: str = "ts_ms",
    tiebreak_col: str = "event_id",
    cents_col: str = "cents",
) -> DataFrame:
    """Daily OHLC candlestick bars per key: ``(*key_cols, day, open,
    high, low, close, n_events)``.

    Open/close are the first/last value by (ts, tiebreak) inside the
    bucket, expressed as min/max over (ts, tiebreak, value) STRUCTS —
    pure map-side combinable aggregates, which is exactly why the SAME
    expression runs unchanged as a streaming update-mode aggregation
    (structs are orderable, so min/max merge across micro-batches like
    any other partial aggregate; pinned by the streaming-vs-batch
    convergence test).  One exchange on (key, day), no window sort."""
    tv = F.struct(F.col(ts_ms_col), F.col(tiebreak_col), F.col(cents_col))
    return df.groupBy(*key_cols, day_col).agg(
        F.min(tv).getField(cents_col).alias("open"),
        F.max(cents_col).alias("high"),
        F.min(cents_col).alias("low"),
        F.max(tv).getField(cents_col).alias("close"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Offline changepoint detection — binary segmentation, depth 1 (Scott &
# Knott / CUSUM-style SSE split): the companion to cusum_drift (which
# DETECTS drift online) — this LOCATES the single best level-shift point
# in a completed series, the standard first step of binary-segmentation
# changepoint trees.
# ---------------------------------------------------------------------------


def changepoint_binseg(
    df: DataFrame,
    key_cols: Sequence[str],
    ord_col: str,
    value_col: str,
) -> DataFrame:
    """Best single split per key: the position minimizing two-segment SSE
    (equivalently maximizing between-segment variance reduction).

    Exact integer form: for a split after position L of n (R = n − L),
        gain·(L·R·n) = (R·S_L − L·S_R)²
    so candidates are ranked by (R·S_L − L·S_R)² · 10⁶ div (L·R) — a
    common factor n drops out — computed in decimal(38,0) / HUGEINT in
    BOTH engines (the LTTB arithmetic rule: int64 would wrap once
    n·V ≳ 2³¹·√n).  Both engines rank IDENTICAL integers, so the argmax
    (ties → earliest split) is engine-invariant; the reported ``gain``
    is the floored SSE reduction (R·S_L − L·S_R)² div (L·R·n), back in
    int64 (bounded by n·V², the series' own magnitude).

    Shape: ONE exchange on the key; prefix sums and the argmax rank are
    stacked same-partition windows (the winnowing discipline).  Returns
    ``(*key_cols, n_points, split_ord, left_n, left_sum, right_sum,
    gain)`` — split_ord is the LAST ordinate of the left segment; keys
    with n < 2 produce no row (no split exists).
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col("__o").asc())
    wall = Window.partitionBy(*key_cols)
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    pre = df.select(
        *key_cols,
        F.col(ord_col).alias("__o"),
        F.col(value_col).cast("long").alias("__v"),
    ).select(
        *key_cols,
        "__o",
        F.row_number().over(w).alias("__pos"),
        F.sum("__v").over(w).alias("__sl"),
        F.sum("__v").over(wall).alias("__s"),
        F.count(F.lit(1)).over(wall).alias("__n"),
    )
    cand = pre.filter(F.col("__pos") < F.col("__n")).select(
        *key_cols,
        "__o",
        "__pos",
        "__sl",
        "__s",
        "__n",
        (F.col("__n") - F.col("__pos")).alias("__r"),
    )
    num = (d(F.col("__r")) * d(F.col("__sl"))
           - d(F.col("__pos")) * d(F.col("__s") - F.col("__sl")))

    # Exact decimal floor-division: `a div b` on decimals returns BIGINT
    # and silently WRAPS past 2⁶³ (verified), and plain `/` rounds
    # HALF_UP at scale 6 — floor-after-round is NOT the exact floor
    # DuckDB's `//` computes.  Subtracting the remainder first makes the
    # quotient exactly representable, so the division cannot round.
    def _fdiv(a, b):
        return ((a - a % b) / b).cast("decimal(38,0)")

    num2s = num * num * F.lit(1_000_000).cast("decimal(38,0)")
    den = d(F.col("__pos")) * d(F.col("__r"))
    scored = cand.withColumn("__score", _fdiv(num2s, den)).withColumn(
        "__num2", num * num
    )
    wr = Window.partitionBy(*key_cols).orderBy(
        F.col("__score").desc(), F.col("__pos").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(wr))
        .filter(F.col("__rn") == 1)
        .select(
            *key_cols,
            F.col("__n").cast("long").alias("n_points"),
            F.col("__o").alias("split_ord"),
            F.col("__pos").cast("long").alias("left_n"),
            F.col("__sl").cast("long").alias("left_sum"),
            (F.col("__s") - F.col("__sl")).cast("long").alias("right_sum"),
            _fdiv(
                F.col("__num2"),
                d(F.col("__pos")) * d(F.col("__r")) * d(F.col("__n")),
            )
            .cast("long")
            .alias("gain"),
        )
    )


def changepoint_binseg_oracle_sql(
    table: str,
    key_cols: Sequence[str],
    ord_expr: str,
    value_expr: str,
) -> str:
    """DuckDB replay of changepoint_binseg — HUGEINT throughout, same
    floored score at 10⁶ scale, same earliest-split tie-break."""
    keys = ", ".join(key_cols)
    return f"""
WITH s AS (
    SELECT {keys}, {ord_expr} AS o, CAST({value_expr} AS BIGINT) AS v
    FROM {table}
), pre AS (
    SELECT {keys}, o,
           ROW_NUMBER() OVER (PARTITION BY {keys} ORDER BY o ASC) AS pos,
           CAST(SUM(v) OVER (PARTITION BY {keys} ORDER BY o ASC
                ROWS UNBOUNDED PRECEDING) AS HUGEINT) AS sl,
           CAST(SUM(v) OVER (PARTITION BY {keys}) AS HUGEINT) AS s,
           COUNT(*) OVER (PARTITION BY {keys}) AS n
    FROM s
), cand AS (
    SELECT {keys}, o, pos, sl, s, n, r,
           (CAST(r AS HUGEINT) * sl - CAST(pos AS HUGEINT) * (s - sl)) AS num
    FROM (SELECT *, n - pos AS r FROM pre WHERE pos < n)
), ranked AS (
    SELECT *,
           ROW_NUMBER() OVER (
               PARTITION BY {keys}
               ORDER BY (num * num * 1000000::HUGEINT)
                        // (CAST(pos AS HUGEINT) * CAST(r AS HUGEINT)) DESC,
                        pos ASC) AS rn
    FROM cand
)
SELECT {keys},
       CAST(n AS BIGINT) AS n_points,
       o AS split_ord,
       CAST(pos AS BIGINT) AS left_n,
       CAST(sl AS BIGINT) AS left_sum,
       CAST(s - sl AS BIGINT) AS right_sum,
       CAST((num * num) // (CAST(pos AS HUGEINT) * CAST(r AS HUGEINT)
            * CAST(n AS HUGEINT)) AS BIGINT) AS gain
FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Additive seasonal decomposition (STL-lite) over hourly buckets.
# ---------------------------------------------------------------------------


def seasonal_decompose_hod(
    df: DataFrame, key_col: str, ms_col: str
) -> DataFrame:
    """Hour-of-day seasonal profile per key over epoch-ms events, x1000
    fixed point: hourly counts -> per-(key, day) mean removal -> per-
    (key, hod) seasonal average -> residual energy.  All arithmetic is
    truncating integer division (Spark ``div`` == DuckDB ``//`` for the
    negative deviations: both truncate toward zero).  Emits ``(key, hod,
    n_days, seasonal_x1000, mean_abs_resid_x1000)``.

    One groupBy on (key, day, hod) with map-side partials, two windows
    partitioned by (key, day) / (key, hod), and a 24*|keys|-row final
    aggregate — exchanges are keyed by the series key plus a bounded
    calendar component, never global.  Composes over any epoch-ms
    column, so the streaming accumulate-recompute harness drives the
    exact batch operator."""
    cells = (
        df.select(
            F.col(key_col),
            F.expr(f"({ms_col} div 3600000) div 24").alias("day_idx"),
            F.expr(f"({ms_col} div 3600000) % 24").alias("hod"),
        )
        .groupBy(key_col, "day_idx", "hod")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    wday = Window.partitionBy(key_col, "day_idx")
    dev = cells.select(
        key_col,
        "day_idx",
        "hod",
        F.expr("c * 1000").alias("c_x1000"),
        F.sum("c").over(wday).alias("day_sum"),
        F.count(F.lit(1)).over(wday).alias("day_cells"),
    ).select(
        key_col,
        "day_idx",
        "hod",
        F.expr("c_x1000 - (day_sum * 1000 div day_cells)").alias("dev_x1000"),
    )
    whod = Window.partitionBy(key_col, "hod")
    sea = dev.select(
        key_col,
        "hod",
        "dev_x1000",
        F.expr("sum(dev_x1000)").over(whod).alias("hod_sum"),
        F.count(F.lit(1)).over(whod).alias("n_days"),
    ).select(
        key_col,
        "hod",
        "dev_x1000",
        "n_days",
        F.expr("hod_sum div n_days").alias("sea_x1000"),
    )
    return sea.groupBy(key_col, "hod").agg(
        F.max("n_days").cast("long").alias("n_days"),
        F.max("sea_x1000").cast("long").alias("seasonal_x1000"),
        F.expr("sum(abs(dev_x1000 - sea_x1000)) div count(1)")
        .cast("long")
        .alias("mean_abs_resid_x1000"),
    )
