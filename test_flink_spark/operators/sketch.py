"""Mergeable approximate-aggregate sketches with exact algorithm-replay
oracles: HyperLogLog distinct counting, KMV (bottom-k) distinct counting,
and a count-min sketch for heavy-hitter frequency estimation.

Why hand-rolled sketches when Spark ships ``approx_count_distinct``?
Two reasons.  (1) Spark's sketches are engine-specific binaries — the one
query in this repo without a value-hash oracle (`approx_aggregates`) is
exactly the built-in-sketch query.  These implementations are built from
the repo's engine-portable md5 hash and pure int64 arithmetic, so DuckDB
replays the ENTIRE algorithm bit-for-bit and the driver's hash gate
checks estimator output, not just row counts.  (2) At 100 TB the sketch
is the product: a mergeable 256-register HLL or a 4x1024 count-min table
is what a pipeline persists per partition/day and folds over arbitrary
spans without re-scanning the corpus.  Every aggregation here has
bounded output cardinality (registers/buckets), so the shuffle volume is
O(groups x sketch size), never O(rows).

Reference surface being generalized: the reference's only aggregates are
windowed COUNT/AVG (HotItemAnalysis.java:126-160); this module is the
§2.10 superset path for distinct/frequency analytics at scales where
exact groupBy-per-key is the bottleneck.

Determinism notes (the repo-wide discipline):
- hashes: 60-bit ``('0x'||substr(md5(salt:x),1,15))`` exactly as in
  operators/sampling.py — identical in Spark (`conv(...,16,10)`) and
  DuckDB.
- HLL rank uses length(bin(x)) — integer log2, no float log (the
  lm_score.py trick).  The harmonic sum is scaled by 2^41 so it stays
  int64 (<= 256 * 2^41 = 2^49); the raw estimate is one integer
  division.  The linear-counting branch (est <= 2.5m with empty
  registers) needs ln(m/V); that is precomputed in Python as a 256-entry
  integer lookup table embedded as an array literal in BOTH dialects, so
  no runtime transcendental is ever evaluated by either engine.
- KMV's estimate divides 2^60 by the k-th smallest hash.  The product
  (k-1) * (2^60 mod h_k) can exceed int64 when h_k is large (tiny
  groups), so the estimate uses IEEE double division instead: a single
  exactly-rounded divide + one exactly-rounded multiply on identical
  operands is bit-identical across engines (IEEE 754 guarantees each op
  is correctly rounded; both expressions are written with identical
  shape/association), then floor() to an integer — the same argument as
  the IVF distance quantization, applied to one division.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Shared 60-bit engine-portable hash (same contract as sampling.hash_bucket).
# ---------------------------------------------------------------------------


def h60(col: Column, salt: str) -> Column:
    """60-bit non-negative hash of ``salt ':' value`` — Spark side."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), col.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def h60_sql(expr: str, salt: str) -> str:
    """The identical hash in DuckDB SQL."""
    return f"(('0x' || substr(md5('{salt}:' || {expr}), 1, 15))::BIGINT)"


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007), p=8 -> m=256 registers, rsd ~6.5%.
# ---------------------------------------------------------------------------

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers
_RANK_BITS = 40  # rank source bits (of the 60-bit hash); max rank 41
_ALPHA_NUM = 47073  # floor(0.7213/(1+1.079/m) * m^2 + 0.5) for m=256
_LC_TABLE = [0] + [math.floor(HLL_M * math.log(HLL_M / v)) for v in range(1, HLL_M)]
# _LC_TABLE[v] = floor(m * ln(m/v)): linear-counting estimate with v empty
# registers, precomputed so neither engine evaluates ln at runtime.


def hll_register_rank(col: Column, salt: str = "hll") -> tuple[Column, Column]:
    """(register, rank) for one value: register = top p bits of the 60-bit
    hash, rank = 41 - bit_length(low 40 bits) (all-zero suffix -> 41)."""
    h = h60(col, salt)
    reg = (h / F.lit(1 << 52)).cast("long")  # top 8 of 60 bits
    suffix = h % F.lit(1 << _RANK_BITS)
    rank = F.when(suffix == 0, F.lit(_RANK_BITS + 1)).otherwise(
        F.lit(_RANK_BITS + 1) - F.length(F.bin(suffix))
    )
    return reg, rank


def hll_registers(
    df: DataFrame, value_col: str, group_cols: list[str], salt: str = "hll"
) -> DataFrame:
    """The mergeable sketch itself: per-(group, register) max rank.
    Union register tables from any partitioning of the data and re-max to
    fold spans — max is associative/commutative/idempotent, so any merge
    tree gives the identical table (pinned by the merge-rollup test)."""
    reg, rank = hll_register_rank(F.col(value_col), salt)
    return (
        df.select(*group_cols, reg.alias("reg"), rank.alias("rank"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rank").alias("m_rank"))
    )


def hll_fold_registers(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Estimator fold over a register table: ``group_cols +
    (registers_used, hll_est)`` — the read side of the persisted sketch."""
    scale = F.lit(1 << (_RANK_BITS + 1)).cast("long")  # 2^41
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("used"),
        F.sum(
            # F.shiftleft only takes a literal shift — SQL form for a column
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_RANK_BITS + 1} - m_rank)")
        ).alias("s_present"),
    )
    # Spark `/` on longs is double division — `div` keeps it integer:
    agg = agg.withColumn(
        "s_total", F.col("s_present") + (F.lit(HLL_M) - F.col("used")) * scale
    ).withColumn(
        "est_raw",
        F.expr(
            f"(CAST({_ALPHA_NUM} AS BIGINT) * CAST({1 << (_RANK_BITS + 1)} AS BIGINT))"
            " div s_total"
        ),
    )
    lc_arr = F.array(*[F.lit(v) for v in _LC_TABLE])
    v_empty = F.lit(HLL_M) - F.col("used")
    lc = F.element_at(lc_arr, (v_empty + 1).cast("int"))  # 1-based; [v] at index v+1
    est = (
        F.when((F.col("est_raw") <= F.lit(int(2.5 * HLL_M))) & (v_empty > 0), lc)
        .otherwise(F.col("est_raw"))
        .cast("long")
    )
    return agg.select(
        *group_cols,
        F.col("used").cast("long").alias("registers_used"),
        est.alias("hll_est"),
    )


def hll_distinct(
    df: DataFrame, value_col: str, group_cols: list[str], salt: str = "hll"
) -> DataFrame:
    """Per-group HLL distinct estimate: ``group_cols + (registers_used,
    hll_est)``.  Two bounded aggregations: (group, register) -> max rank
    [shuffle out <= |groups| * 256 rows, map-side partial max], then the
    per-group estimator fold."""
    return hll_fold_registers(
        hll_registers(df, value_col, group_cols, salt), group_cols
    )


def hll_oracle_sql(
    table: str, value_expr: str, group_cols: list[str], salt: str = "hll"
) -> str:
    """DuckDB replay of hll_distinct — identical hash, rank, harmonic sum,
    integer division, and the same embedded linear-counting table."""
    g = ", ".join(group_cols)
    h = h60_sql(value_expr, salt)
    lc_list = "[" + ", ".join(str(v) for v in _LC_TABLE) + "]"
    scale = 1 << (_RANK_BITS + 1)
    return f"""
WITH hashed AS (
  SELECT {g}, {h} AS h FROM {table}
),
regs AS (
  SELECT {g}, h // {1 << 52} AS reg,
         MAX(CASE WHEN h % {1 << _RANK_BITS} = 0 THEN {_RANK_BITS + 1}
                  ELSE {_RANK_BITS + 1} - length(bin(h % {1 << _RANK_BITS})) END)
           AS m_rank
  FROM hashed GROUP BY {g}, reg
),
folded AS (
  SELECT {g}, COUNT(*) AS used,
         SUM((1::BIGINT << ({_RANK_BITS + 1} - m_rank)))::BIGINT AS s_present
  FROM regs GROUP BY {g}
),
est AS (
  SELECT {g}, used,
         ({_ALPHA_NUM}::BIGINT * {scale}::BIGINT)
           // (s_present + ({HLL_M} - used) * {scale}::BIGINT) AS est_raw
  FROM folded
)
SELECT {g}, used::BIGINT AS registers_used,
       (CASE WHEN est_raw <= {int(2.5 * HLL_M)} AND used < {HLL_M}
             THEN ({lc_list})[{HLL_M} - used + 1]
             ELSE est_raw END)::BIGINT AS hll_est
FROM est
"""


def hll_merge_oracle_sql(
    table: str, value_expr: str, group_col: str, all_label: str, salt: str = "hll"
) -> str:
    """DuckDB replay of the merge rollup: per-group register tables, the
    max-merged ``all_label`` register table, and the SAME estimator fold
    over their union — byte-identical arithmetic to hll_oracle_sql."""
    h = h60_sql(value_expr, salt)
    lc_list = "[" + ", ".join(str(v) for v in _LC_TABLE) + "]"
    scale = 1 << (_RANK_BITS + 1)
    return f"""
WITH hashed AS (
  SELECT {group_col}, {h} AS h FROM {table}
),
regs AS (
  SELECT {group_col}, h // {1 << 52} AS reg,
         MAX(CASE WHEN h % {1 << _RANK_BITS} = 0 THEN {_RANK_BITS + 1}
                  ELSE {_RANK_BITS + 1} - length(bin(h % {1 << _RANK_BITS})) END)
           AS m_rank
  FROM hashed GROUP BY {group_col}, reg
),
merged AS (
  SELECT '{all_label}' AS {group_col}, reg, MAX(m_rank) AS m_rank
  FROM regs GROUP BY reg
),
unioned AS (
  SELECT * FROM regs UNION ALL SELECT * FROM merged
),
folded AS (
  SELECT {group_col}, COUNT(*) AS used,
         SUM((1::BIGINT << ({_RANK_BITS + 1} - m_rank)))::BIGINT AS s_present
  FROM unioned GROUP BY {group_col}
),
est AS (
  SELECT {group_col}, used,
         ({_ALPHA_NUM}::BIGINT * {scale}::BIGINT)
           // (s_present + ({HLL_M} - used) * {scale}::BIGINT) AS est_raw
  FROM folded
)
SELECT {group_col}, used::BIGINT AS registers_used,
       (CASE WHEN est_raw <= {int(2.5 * HLL_M)} AND used < {HLL_M}
             THEN ({lc_list})[{HLL_M} - used + 1]
             ELSE est_raw END)::BIGINT AS hll_est
FROM est
"""


# ---------------------------------------------------------------------------
# KMV / bottom-k distinct sketch (Bar-Yossef et al. 2002), k=64.
# ---------------------------------------------------------------------------

KMV_K = 64


def kmv_distinct(
    df: DataFrame, value_col: str, group_cols: list[str], salt: str = "kmv"
) -> DataFrame:
    """Per-group bottom-k distinct estimate: ``group_cols + (kth_hash,
    kmv_est)``.  Groups with < k distinct values fall back to the exact
    distinct-hash count (the sketch IS exact below k).

    Scale shape: the k smallest distinct hashes of a union are contained
    in the union of each part's k smallest — so a 100 TB run folds
    per-partition bottom-k candidate lists (bounded k rows out per
    partition) before this final aggregation.  At test scale the
    candidate pass is the straightforward distinct + per-group sort; the
    merge theorem is what makes the operator cluster-safe, and the
    bounded variant reuses it unchanged (see tests for the fold proof).
    The per-group state here is one sorted k-slice, never the full
    distinct set: ObjectHashAggregate keeps collect_set spill-safe and
    the slice bounds what survives."""
    h = h60(F.col(value_col), salt)
    distinct = df.select(*group_cols, h.alias("h")).distinct()
    # bottom-k per group without a skewed sort-window: slice the sorted
    # distinct-hash set. (At 100 TB: pre-fold per-partition bottom-k first.)
    agg = distinct.groupBy(*group_cols).agg(
        F.slice(F.sort_array(F.collect_set("h")), 1, KMV_K).alias("bottom"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
    kth = F.element_at(F.col("bottom"), KMV_K)
    est = F.floor(
        F.lit(float(KMV_K - 1)) * (F.lit(float(1 << 60)) / kth.cast("double"))
    ).cast("long")
    return agg.select(
        *group_cols,
        F.when(F.col("n_distinct") >= KMV_K, kth).otherwise(F.lit(None)).alias("kth_hash"),
        F.when(F.col("n_distinct") >= KMV_K, est)
        .otherwise(F.col("n_distinct"))
        .cast("long")
        .alias("kmv_est"),
    )


def kmv_oracle_sql(
    table: str, value_expr: str, group_cols: list[str], salt: str = "kmv"
) -> str:
    g = ", ".join(group_cols)
    h = h60_sql(value_expr, salt)
    return f"""
WITH hashed AS (
  SELECT DISTINCT {g}, {h} AS h FROM {table}
),
ranked AS (
  SELECT {g}, h, ROW_NUMBER() OVER (PARTITION BY {g} ORDER BY h) AS rn,
         COUNT(*) OVER (PARTITION BY {g}) AS n_distinct
  FROM hashed
)
SELECT {g},
       CASE WHEN n_distinct >= {KMV_K} THEN h END AS kth_hash,
       (CASE WHEN n_distinct >= {KMV_K}
             THEN FLOOR({float(KMV_K - 1)} * ({float(1 << 60)} / h))
             ELSE n_distinct END)::BIGINT AS kmv_est
FROM ranked
WHERE rn = {KMV_K} OR (n_distinct < {KMV_K} AND rn = 1)
"""


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005), d=4 rows x w=1024.
# ---------------------------------------------------------------------------

CMS_D = 4
CMS_W = 1024


def cms_build(df: DataFrame, value_col: str) -> DataFrame:
    """Build the sketch: ``(row_i, bucket, cnt)`` — at most d*w = 4096 rows
    regardless of input size (THE selling point at 100 TB: one bounded
    groupBy with map-side partials replaces a per-key frequency table).
    Mergeable: union + re-sum."""
    buckets = F.array(
        *[h60(F.col(value_col), f"cms{i}") % CMS_W for i in range(CMS_D)]
    )
    return (
        df.select(F.posexplode(buckets).alias("row_i", "bucket"))
        .groupBy("row_i", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, candidates: DataFrame, value_col: str) -> DataFrame:
    """Point-query the sketch for each candidate value: est = min over the
    d rows of the addressed counter.  candidates is small (top-N) — the
    probe join broadcasts it against the 4096-row sketch."""
    probes = candidates.select(
        value_col,
        F.posexplode(
            F.array(*[h60(F.col(value_col), f"cms{i}") % CMS_W for i in range(CMS_D)])
        ).alias("row_i", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row_i", "bucket"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


def cms_oracle_sql(table: str, value_expr: str, top_n: int) -> str:
    """Replay: sketch CTE + exact top-n candidates + probe-min, with the
    deterministic (count DESC, value ASC) candidate tie-break."""
    hashes = ", ".join(
        f"{h60_sql(value_expr, f'cms{i}')} % {CMS_W} AS b{i}" for i in range(CMS_D)
    )
    probe_union = " UNION ALL ".join(
        f"SELECT v, exact_cnt, {i} AS row_i, b{i} AS bucket FROM cand"
        for i in range(CMS_D)
    )
    sketch_union = " UNION ALL ".join(
        f"SELECT {i} AS row_i, {h60_sql(value_expr, f'cms{i}')} % {CMS_W} AS bucket"
        f" FROM {table}"
        for i in range(CMS_D)
    )
    return f"""
WITH sketch AS (
  SELECT row_i, bucket, COUNT(*) AS cnt
  FROM ({sketch_union}) GROUP BY row_i, bucket
),
cand AS (
  SELECT {value_expr} AS v, COUNT(*) AS exact_cnt, {hashes}
  FROM {table} GROUP BY {value_expr}
  ORDER BY COUNT(*) DESC, {value_expr} ASC LIMIT {top_n}
),
probes AS ({probe_union})
SELECT p.v AS {value_expr}, MAX(p.exact_cnt)::BIGINT AS exact_cnt,
       MIN(COALESCE(s.cnt, 0))::BIGINT AS cms_est
FROM probes p LEFT JOIN sketch s USING (row_i, bucket)
GROUP BY p.v
"""


# ---------------------------------------------------------------------------
# Fixed-width histogram quantile sketch (the checked percentile_approx twin).
# ---------------------------------------------------------------------------

HIST_B = 1024


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lo: float,
    hi: float,
    probs: tuple[float, ...] = (0.5, 0.9),
) -> DataFrame:
    """Per-group quantile estimates from a B-bucket equi-width histogram:
    ``group_cols + (n, q_50, q_90, ...)`` with each estimate = the upper
    edge of the first bucket whose running count crosses p*n.  Error is
    bounded by one bucket width — the mergeable fixed-size shape (the
    histogram is a (group, bucket, cnt) table, <= |groups|*B rows, re-sum
    to fold) that replaces per-group sorts at 100 TB.  ``lo``/``hi`` are
    fixed domain bounds supplied by the caller (schema knowledge or a
    prior scan); values are clamped into [lo, hi].

    Determinism: the bucket index floor(((v - lo) * B) / (hi - lo)) is
    three correctly-rounded IEEE ops written with identical shape in both
    dialects; the crossing test cross-multiplies (cum * denom >= p_num * n)
    so no float cumulative fractions exist."""
    b = F.floor(
        ((F.col(value_col) - F.lit(lo)) * F.lit(float(HIST_B))) / F.lit(hi - lo)
    ).cast("long")
    bucket = F.least(F.greatest(b, F.lit(0)), F.lit(HIST_B - 1))
    hist = (
        df.select(*group_cols, bucket.alias("bucket"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w)).join(
        F.broadcast(
            hist.groupBy(*group_cols).agg(F.sum("cnt").alias("n"))
        ),
        group_cols,
    )
    width = (hi - lo) / HIST_B
    aggs = [F.max("n").cast("long").alias("n")]
    for p in probs:
        p_num = int(round(p * 100))
        edge = F.lit(lo) + (F.col("bucket") + 1).cast("double") * F.lit(width)
        aggs.append(
            F.round(
                F.min(F.when(F.col("cum") * 100 >= F.lit(p_num) * F.col("n"), edge)),
                4,
            ).alias(f"q_{p_num}")
        )
    return cum.groupBy(*group_cols).agg(*aggs)


def histogram_quantiles_oracle_sql(
    table: str,
    value_expr: str,
    group_cols: list[str],
    lo: float,
    hi: float,
    probs: tuple[float, ...] = (0.5, 0.9),
) -> str:
    g = ", ".join(group_cols)
    width = (hi - lo) / HIST_B
    qs = []
    for p in probs:
        p_num = int(round(p * 100))
        qs.append(
            f"ROUND(MIN(CASE WHEN cum * 100 >= {p_num} * n "
            f"THEN {lo} + (bucket + 1)::DOUBLE * {width!r} END), 4) AS q_{p_num}"
        )
    return f"""
WITH hist AS (
  SELECT {g},
         LEAST(GREATEST(FLOOR((({value_expr} - {lo}) * {float(HIST_B)!r})
                              / {hi - lo!r})::BIGINT, 0), {HIST_B - 1}) AS bucket,
         COUNT(*) AS cnt
  FROM {table} GROUP BY ALL
),
cum AS (
  SELECT {g}, bucket, cnt,
         SUM(cnt) OVER (PARTITION BY {g} ORDER BY bucket
                        ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER (PARTITION BY {g}) AS n
  FROM hist
)
SELECT {g}, MAX(n)::BIGINT AS n, {", ".join(qs)}
FROM cum GROUP BY {g}
"""


# ---------------------------------------------------------------------------
# Sliding-window distinct via pane-merged HLL sketches.
# ---------------------------------------------------------------------------


def hll_sliding_distinct(
    df: DataFrame,
    value_col: str,
    ts_ms_col: str,
    pane_ms: int,
    panes_per_window: int,
    salt: str = "hll",
) -> DataFrame:
    """Sliding-window distinct count the way a 100 TB stream does it:
    build ONE register table per tumbling pane, then assemble each
    sliding window by max-merging its ``panes_per_window`` pane sketches
    — every event is sketched exactly once, and the explode/fan-out
    happens on the O(panes × 256)-row SKETCH table, never on the raw
    events (the pane-merge trick that makes sliding distinct affordable;
    re-counting each overlapping window scans the data panes_per_window
    times).  Window id ``w`` covers panes [w−(n−1) .. w]; leading /
    trailing partial windows are emitted (deterministic, mirrored by the
    oracle).

    Returns (w, registers_used, hll_est) per window."""
    base = df.withColumn("__pane", F.expr(f"{ts_ms_col} div {pane_ms}"))
    regs = hll_registers(base, value_col, ["__pane"], salt)
    offs = F.array(*[F.lit(i) for i in range(panes_per_window)])
    win_regs = (
        regs.select("__pane", "reg", "m_rank", F.explode(offs).alias("__i"))
        .select(
            (F.col("__pane") + F.col("__i")).alias("w"), "reg", "m_rank"
        )
        .groupBy("w", "reg")
        .agg(F.max("m_rank").alias("m_rank"))
    )
    return hll_fold_registers(win_regs, ["w"])


def hll_sliding_oracle_sql(
    table: str,
    value_expr: str,
    ts_ms_expr: str,
    pane_ms: int,
    panes_per_window: int,
    salt: str = "hll",
) -> str:
    """DuckDB replay of hll_sliding_distinct joined with the EXACT
    per-window distinct (the estimator-error exhibit): per window,
    (w, hll_est, exact_distinct, err_bp)."""
    h = h60_sql(value_expr, salt)
    lc_list = "[" + ", ".join(str(v) for v in _LC_TABLE) + "]"
    scale = 1 << (_RANK_BITS + 1)
    n = panes_per_window
    return f"""
WITH base AS (
  SELECT {value_expr} AS v, {ts_ms_expr} // {pane_ms} AS pane, {h} AS h
  FROM {table}
),
regs AS (
  SELECT pane, h // {1 << 52} AS reg,
         MAX(CASE WHEN h % {1 << _RANK_BITS} = 0 THEN {_RANK_BITS + 1}
                  ELSE {_RANK_BITS + 1} - length(bin(h % {1 << _RANK_BITS})) END)
           AS m_rank
  FROM base GROUP BY pane, reg
),
win_regs AS (
  SELECT pane + i AS w, reg, MAX(m_rank) AS m_rank
  FROM regs, range(0, {n}) r(i)
  GROUP BY 1, 2
),
folded AS (
  SELECT w, COUNT(*) AS used,
         SUM((1::BIGINT << ({_RANK_BITS + 1} - m_rank)))::BIGINT AS s_present
  FROM win_regs GROUP BY w
),
est AS (
  SELECT w, used,
         ({_ALPHA_NUM}::BIGINT * {scale}::BIGINT)
           // (s_present + ({HLL_M} - used) * {scale}::BIGINT) AS est_raw
  FROM folded
),
hll AS (
  SELECT w, used::BIGINT AS registers_used,
         (CASE WHEN est_raw <= {int(2.5 * HLL_M)} AND used < {HLL_M}
               THEN ({lc_list})[{HLL_M} - used + 1]
               ELSE est_raw END)::BIGINT AS hll_est
  FROM est
),
exact AS (
  SELECT pane + i AS w, COUNT(DISTINCT v)::BIGINT AS exact_distinct
  FROM base, range(0, {n}) r(i)
  GROUP BY 1
)
SELECT h.w::BIGINT AS w, h.registers_used, h.hll_est, e.exact_distinct,
       CAST(abs(h.hll_est - e.exact_distinct) * 10000 // e.exact_distinct
            AS BIGINT) AS err_bp
FROM hll h JOIN exact e ON h.w = e.w
"""
