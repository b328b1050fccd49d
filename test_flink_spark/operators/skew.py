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
