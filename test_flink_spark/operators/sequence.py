"""Event-sequence mining: Markov transition matrices and frequent
fixed-length paths over per-key ordered event streams — the behavioral
analytics siblings of the funnel/retention family (what follows what,
and which multi-step paths dominate).

Semantics (deterministic, engine-reproducible):
- each key's events are totally ordered by (ts, tiebreak) — unique by
  construction, so lead() is unambiguous; NULL states are dropped BEFORE
  sequencing (a null event type is a malformed row, not a step — and
  concat_ws would silently skip it mid-path while SQL's || propagates
  NULL, an engine-divergence trap);
- path keys join states with '>' and assume separator-free state names
  (event-type vocabularies; guard upstream if states can contain '>');
- transitions are adjacent pairs within a key (never across keys);
  ``p_ppm`` = floor(1e6 · n / row_total) per from-state — integer
  division, no float probability anywhere;
- paths are sliding windows of ``n`` consecutive states within a key,
  counted globally and top-k'ed with full tie-breaks.

Scale design:
- lead() is a per-key window: one hash exchange on the key + in-partition
  sort — the same shuffle a sessionization pass already pays, and the
  n-gram projection adds zero additional exchange (lead(i) reuses the
  SAME sorted window, Spark computes all offsets in one pass);
- counting is a groupBy on (from, to) / the path string with map-side
  partials — output cardinality is |states|² / |distinct paths|, not
  event volume."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PPM = 1_000_000


def transition_matrix(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    state_col: str,
) -> DataFrame:
    """Per-(from, to) adjacent-transition counts and integer probabilities:
    ``(from_state, to_state, n, row_total, p_ppm)``."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).asc() for c in order_cols])
    df = df.filter(F.col(state_col).isNotNull())
    trans = (
        df.select(
            F.col(state_col).alias("from_state"),
            F.lead(state_col).over(w).alias("to_state"),
        )
        .filter(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    totals = trans.groupBy("from_state").agg(F.sum("n").alias("row_total"))
    return (
        trans.join(F.broadcast(totals), "from_state")
        .select(
            "from_state",
            "to_state",
            "n",
            F.col("row_total").cast("long").alias("row_total"),
            F.expr(f"({PPM} * n) div row_total").alias("p_ppm"),
        )
    )


def frequent_paths(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    state_col: str,
    n: int = 3,
    topk: int = 15,
) -> DataFrame:
    """Top-k most frequent ``n``-step paths: ``(path, n_occurrences,
    rank)`` with path = 'a>b>c' and ties broken by path ascending."""
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).asc() for c in order_cols])
    df = df.filter(F.col(state_col).isNotNull())
    steps = [F.col(state_col)] + [F.lead(state_col, i).over(w) for i in range(1, n)]
    grams = df.select(F.concat_ws(">", *steps).alias("path"), steps[-1].alias("_last"))
    # concat_ws skips nulls silently: a tail window shorter than n would
    # collapse to a shorter path — the explicit last-step null gate drops it
    counted = (
        grams.filter(F.col("_last").isNotNull())
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
    )
    wr = Window.orderBy(F.col("n_occurrences").desc(), F.col("path").asc())
    # bounded input: |distinct paths| <= |states|^n rows reach this point,
    # so the global rank window runs on a tiny aggregate, not the corpus
    return (
        counted.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= topk)
        .select("path", "n_occurrences", F.col("rank").cast("long").alias("rank"))
    )
