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
