"""Deterministic sampling / dataset-split operators for training-data
pipelines.

Random splits are the wrong tool at 100 TB: ``rand()`` is neither stable
across retries (a re-run reassigns documents, poisoning train/test
hygiene) nor reproducible across engines.  Everything here buckets on an
md5-derived hash of the document id + a salt, so:

- assignment is a pure, shuffle-free projection (codegen-fused — the split
  of a 100 TB corpus costs one narrow pass);
- re-running, re-partitioning, or scaling the cluster never moves a
  document between splits;
- the DuckDB oracle reproduces every assignment bit-for-bit
  (``('0x' || substr(md5(x), 1, 15))::BIGINT``).

Changing ``salt`` produces an independent re-split (the knob for k-fold
style experiments).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 10_000


def hash_bucket(col: Column, salt: str, buckets: int = N_BUCKETS) -> Column:
    """Uniform bucket in [0, buckets) from md5(salt ':' value) — 60 bits of
    the digest, far above the bucket count, so bias is negligible."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), col.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % buckets


def train_val_test_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[float, float, float] = (0.9, 0.05, 0.05),
    salt: str = "split",
) -> DataFrame:
    """Assign each row to train/val/test by hash bucket — deterministic,
    stratification-free (hashing is independent of every feature, so each
    stratum is split at the same rates in expectation; see the per-``lang``
    balance check in the corpus mix report)."""
    if abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {weights}")
    b = hash_bucket(F.col(id_col), salt)
    train_hi = round(weights[0] * N_BUCKETS)
    val_hi = train_hi + round(weights[1] * N_BUCKETS)
    split = (
        F.when(b < train_hi, F.lit("train"))
        .when(b < val_hi, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def deterministic_sample(
    df: DataFrame, rate: float, id_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Keep a ``rate`` fraction of rows by hash threshold.  Unlike
    ``DataFrame.sample`` this is stable under retries and re-partitioning,
    and composable: samples at rates r1 < r2 with the same salt are nested
    (the r1 sample is a subset of the r2 sample)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(hash_bucket(F.col(id_col), salt) < round(rate * N_BUCKETS))


def split_oracle_sql(
    id_col: str = "doc_id",
    weights: tuple[float, float, float] = (0.9, 0.05, 0.05),
    salt: str = "split",
) -> str:
    """DuckDB expression reproducing ``train_val_test_split`` assignments."""
    train_hi = round(weights[0] * N_BUCKETS)
    val_hi = train_hi + round(weights[1] * N_BUCKETS)
    bucket = (
        f"(('0x' || substr(md5('{salt}:' || {id_col}), 1, 15))::BIGINT"
        f" % {N_BUCKETS})"
    )
    return (
        f"CASE WHEN {bucket} < {train_hi} THEN 'train' "
        f"WHEN {bucket} < {val_hi} THEN 'val' ELSE 'test' END"
    )


# ---------------------------------------------------------------------------
# Domain-temperature mixing
# ---------------------------------------------------------------------------
#
# Pretraining corpora are mixed by sampling each source at a rate
# proportional to count**alpha (alpha < 1 up-weights small domains —
# "temperature sampling", the standard mix-rebalancing step; cf. the
# exponentially-smoothed multilingual sampling of XLM-R / mBERT and the
# domain-weight tuning literature, e.g. DoReMi).  The
# arithmetic here is deliberately INTEGER-EXACT at alpha = 0.5:
# w = floor(1000 * sqrt(n)) (sqrt is IEEE correctly-rounded in both the
# JVM and DuckDB, the *1000.0 multiply is a single correctly-rounded IEEE
# op, floor makes it an integer), and every subsequent step is bigint
# multiply / integral divide — so per-source thresholds, and therefore
# every sampled document, reproduce bit-for-bit across engines with no
# float fold-order hazard.
#
# Why the 1000x scale (round-3 defect, caught by the Hypothesis property
# test): with w = floor(sqrt(n)) the realized rate w/n jumps UP at every
# perfect square (n=100 -> 10/100 = 0.100 > 9/91 = 0.0989), so a LARGER
# source could sample at a HIGHER rate than a smaller one — the opposite
# of alpha<1 flattening.  Scaling to w = floor(1000*sqrt(n)) bounds the
# quantization to 1e-3 relative: w/n is provably non-increasing for all
# n <= 250_000 (floor(S*sqrt(n))/n can only invert once n > (S/2)^2) and
# within 1/1000 relative beyond.  The scale also respects int64: the
# widest product is t_total*weight <= (total/2) * 1000*sqrt(n_max), which
# stays under 2^63 for corpora up to ~7e10 documents (100 TB at ~2 KB/doc
# is ~5e10 — inside the envelope).  At 100 TB the plan is: one tiny
# per-source aggregate (|sources| rows), a broadcast join of the
# thresholds back onto the corpus, and a shuffle-free hash-threshold
# filter — the corpus itself is touched by exactly one narrow pass.


def temperature_thresholds(
    df: DataFrame,
    source_col: str = "source",
    target_frac: float = 0.5,
    buckets: int = N_BUCKETS,
) -> DataFrame:
    """Per-source sampling plan: ``(source, n_docs, weight, target_docs,
    threshold)``.  ``weight = floor(1000 * sqrt(n_docs))`` (temperature
    alpha=0.5, 1000x-scaled so w/n is monotone non-increasing — see module
    note); ``target_docs = (T * weight) div W`` where
    ``T = floor(target_frac * total)`` and ``W = sum(weight)``;
    ``threshold = min(buckets, (target_docs * buckets) div n_docs)`` is the
    hash-bucket cutoff that realizes the target rate."""
    if not 0.0 < target_frac <= 1.0:
        raise ValueError(f"target_frac must be in (0, 1], got {target_frac}")
    from pyspark.sql import Window

    counts = df.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    # |sources| rows — the single-partition window reads post-aggregation
    # input, never the corpus (same bounded shape as corpus_mix_report)
    w = Window.partitionBy()
    return (
        counts.withColumn(
            "weight",
            F.floor(F.lit(1000.0) * F.sqrt(F.col("n_docs"))).cast("long"),
        )
        .withColumn("w_total", F.sum("weight").over(w))
        .withColumn(
            "t_total",
            F.floor(F.lit(target_frac) * F.sum("n_docs").over(w)).cast("long"),
        )
        .selectExpr(
            source_col,
            "n_docs",
            "weight",
            "(t_total * weight) div w_total AS target_docs",
            f"least(CAST({buckets} AS BIGINT),"
            f" (((t_total * weight) div w_total) * {buckets}) div n_docs)"
            " AS threshold",
        )
    )


def temperature_sample(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    target_frac: float = 0.5,
    salt: str = "temp",
) -> DataFrame:
    """Sample each source at its temperature rate — deterministic (hash
    threshold, stable under retries) and engine-reproducible.  Thresholds
    are |sources| rows, broadcast onto the corpus; the filter is a narrow
    codegen-fused pass."""
    from pyspark.sql.functions import broadcast

    th = temperature_thresholds(df, source_col, target_frac)
    return (
        df.join(
            broadcast(th.select(source_col, "threshold")), on=source_col, how="inner"
        )
        .filter(hash_bucket(F.col(id_col), salt) < F.col("threshold"))
        .drop("threshold")
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    salt: str = "strat",
) -> DataFrame:
    """Explicit-rate stratified sampling: keep each stratum at its own
    rate (strata absent from ``rates`` use ``default_rate``) — the
    hand-tuned-mix counterpart to the data-driven ``temperature_sample`` /
    ``epoch_upsample``.  Same deterministic hash-threshold machinery:
    stable under retries and re-partitioning, nested across rates, and a
    pure shuffle-free projection (the rates map inlines as a literal
    CASE — no join at all)."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {s!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    cutoff = F.lit(round(default_rate * N_BUCKETS))
    for s in sorted(rates):
        cutoff = F.when(
            F.col(strata_col) == s, F.lit(round(rates[s] * N_BUCKETS))
        ).otherwise(cutoff)
    return df.filter(hash_bucket(F.col(id_col), salt) < cutoff)


def stratified_oracle_pred(
    rates: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
    salt: str = "strat",
) -> str:
    """DuckDB WHERE-clause predicate reproducing ``stratified_sample``."""
    branches = "".join(
        f"WHEN {strata_col} = '{s}' THEN {round(rates[s] * N_BUCKETS)} "
        for s in sorted(rates)
    )
    cutoff = f"CASE {branches}ELSE {round(default_rate * N_BUCKETS)} END"
    return (
        f"(('0x' || substr(md5('{salt}:' || {id_col}), 1, 15))::BIGINT"
        f" % {N_BUCKETS}) < ({cutoff})"
    )


def epoch_upsample(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    max_epochs: float = 4.0,
    salt: str = "epoch",
) -> DataFrame:
    """Balance-to-largest upsampling — the complement of
    ``temperature_sample``: each source is repeated until it matches the
    LARGEST source's document count, capped at ``max_epochs`` (the standard
    guard against degenerate repetition of tiny domains; repeating data
    beyond a few epochs measurably degrades models — cf. the data-
    constrained scaling literature, e.g. Muennighoff et al. 2023).

    Integer-exact plan: per-source ``epochs_milli = min(max_epochs*1000,
    (n_max * 1000) div n)`` (thousandths of an epoch); every doc gets
    ``epochs_milli div 1000`` full copies, plus one extra iff its hash
    bucket (mod 1000) falls under ``epochs_milli % 1000`` — deterministic,
    retry-stable, engine-reproducible.  Output: one row per (doc, epoch)
    with a 0-based ``epoch`` index.

    Scale: one tiny per-source aggregate (|sources| rows) broadcast back,
    then a narrow explode — the corpus is scanned once; output volume is
    the deliberate product of the mix plan (bounded by max_epochs)."""
    if max_epochs < 1.0:
        raise ValueError(f"max_epochs must be >= 1, got {max_epochs}")
    cap_milli = round(max_epochs * 1000)
    # The per-source plan is |sources| rows: collect it (sanctioned
    # tiny-scalar pattern, cf. the IVF codebook / temperature cutoffs) and
    # inline the milli-epoch counts as a literal map — pure Python integer
    # arithmetic is exact and identical to the oracle's bigint `//`, and
    # the corpus-side plan stays a narrow windowless explode.
    counts = {
        r[source_col]: r["n"]
        for r in df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_max = max(counts.values())
    milli = {s: min(cap_milli, (n_max * 1000) // n) for s, n in counts.items()}
    milli_map = F.create_map(
        *[F.lit(v) for s in sorted(milli) for v in (s, milli[s])]
    )
    em = milli_map[F.col(source_col)].cast("long")
    n_copies = F.floor(em / F.lit(1000)).cast("long") + (
        hash_bucket(F.col(id_col), salt, 1000) < em % 1000
    ).cast("long")
    # generators can't be nested in expressions — emit the 0-based epoch
    # index directly from the sequence (n_copies >= 1 always: the largest
    # source has ratio 1.0 -> epochs_milli >= 1000)
    return df.withColumn(
        "epoch", F.explode(F.sequence(F.lit(0), (n_copies - 1).cast("int")))
    ).withColumn("epoch", F.col("epoch").cast("long"))


def epoch_oracle_cte(
    source_col: str = "source",
    id_col: str = "doc_id",
    max_epochs: float = 4.0,
    salt: str = "epoch",
    table: str = "documents",
) -> str:
    """DuckDB CTE body reproducing ``epoch_upsample`` bit-for-bit (defines
    ``up`` with one row per (doc, epoch))."""
    cap_milli = round(max_epochs * 1000)
    return f"""
ec AS (SELECT {source_col}, CAST(COUNT(*) AS BIGINT) AS n_docs
       FROM {table} GROUP BY 1),
eplan AS (SELECT {source_col},
                 LEAST(CAST({cap_milli} AS BIGINT),
                       (n_docs_max * 1000) // n_docs) AS epochs_milli
          FROM (SELECT {source_col}, n_docs,
                       MAX(n_docs) OVER () AS n_docs_max FROM ec)),
up AS (
    SELECT d.*, CAST(g.epoch AS BIGINT) AS epoch
    FROM {table} d
    JOIN eplan ON d.{source_col} = eplan.{source_col}
    CROSS JOIN LATERAL (
        SELECT unnest(range(0,
            (epochs_milli // 1000)
            + CASE WHEN (('0x' || substr(md5('{salt}:' || d.{id_col}), 1, 15))::BIGINT
                         % 1000) < epochs_milli % 1000
                   THEN 1 ELSE 0 END)) AS epoch
    ) g
)"""


def temperature_oracle_cte(
    source_col: str = "source",
    id_col: str = "doc_id",
    target_frac: float = 0.5,
    salt: str = "temp",
    table: str = "documents",
    buckets: int = N_BUCKETS,
) -> str:
    """DuckDB CTE body reproducing ``temperature_thresholds`` +
    ``temperature_sample`` counts bit-for-bit (defines ``th`` with the
    per-source plan and ``sampled`` with the surviving rows)."""
    return f"""
c AS (SELECT {source_col}, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM {table} GROUP BY 1),
t AS (SELECT {source_col}, n_docs,
             CAST(floor(1000.0 * sqrt(n_docs)) AS BIGINT) AS weight,
             CAST(SUM(CAST(floor(1000.0 * sqrt(n_docs)) AS BIGINT)) OVER ()
                  AS BIGINT) AS w_total,
             CAST(floor({target_frac} * SUM(n_docs) OVER ()) AS BIGINT) AS t_total
      FROM c),
th AS (SELECT {source_col}, n_docs, weight,
              CAST((t_total * weight) // w_total AS BIGINT) AS target_docs,
              CAST(LEAST(CAST({buckets} AS BIGINT),
                    (((t_total * weight) // w_total) * {buckets}) // n_docs)
                  AS BIGINT) AS threshold
       FROM t),
sampled AS (
    SELECT d.* FROM {table} d
    JOIN th ON d.{source_col} = th.{source_col}
    WHERE (('0x' || substr(md5('{salt}:' || d.{id_col}), 1, 15))::BIGINT
           % {buckets}) < th.threshold
)"""


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (sequential Poisson / Ohlsson 1998)
# ---------------------------------------------------------------------------
#
# Fixed-size-k samples with inclusion probability ~ a weight column:
# priority(i) = u_i / w_i with u_i uniform, keep the k smallest priorities.
# Sequential Poisson is the standard large-scale approximation of
# probability-proportional-to-size sampling (exact pps-without-replacement
# needs sequential draws — inherently serial); it is one projection + one
# top-k, which is why it is THE shape for 100 TB corpus subsampling.
#
# Integer-exact: u_i is the 60-bit md5 hash, priority = u_i div w_i
# (integer division, identical in Spark `div` and DuckDB `//`), and the
# k-smallest cut runs as TakeOrderedAndProject (per-partition top-k +
# merge, never a full sort).  Deterministic tie-break (priority, id).


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """k rows sampled with probability ~ ``weight_col``: input columns +
    ``priority``.  Non-positive-weight rows are excluded (zero inclusion
    mass).  Deterministic: same salt -> same sample under any
    partitioning, retries included."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    u60 = F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__u", u60)
        .withColumn("priority", F.expr(f"__u div {weight_col}"))
        .drop("__u")
        .orderBy(F.col("priority").asc(), F.col(id_col).asc())
        .limit(k)
    )


def weighted_sample_oracle_sql(
    table: str,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsample",
    select: str = "*",
) -> str:
    """DuckDB replay of ``weighted_sample`` (same hash, integer division,
    tie-break)."""
    u = f"(('0x' || substr(md5('{salt}:' || {id_col}), 1, 15))::BIGINT)"
    return f"""
SELECT {select}, {u} // {weight_col} AS priority
FROM {table}
WHERE {weight_col} > 0
ORDER BY priority ASC, {id_col} ASC
LIMIT {k}
"""
