"""Fuzzy record linkage: approximate string matching with blocking — the
entity-resolution primitive (dedupe near-identical names/titles across
catalogs) that no exact-hash dedup family covers.

Semantics (deterministic, engine-reproducible):
- candidates are generated ONLY within blocks — a pair is considered when
  the two names share at least one blocking key (first token OR last
  token: classic multi-pass blocking, catches both 'hot widget'~'new
  widget' and 'hot widget'~'hot gizmo');
- a pair matches when levenshtein(name_a, name_b) <= max_dist (unit edit
  costs; Spark and DuckDB agree exactly — integer, no floats anywhere);
- output is canonical (name_a < name_b) with the distance and each
  name's record count (the linkage weight a resolution pass clusters on).

Scale design:
- never all-pairs: the self-join key is the blocking token, so cost is
  Σ block² over DISTINCT names, not records² — names dedup first
  (groupBy + count), which at 100 TB collapses the record table to the
  name vocabulary before any quadratic work;
- multi-pass blocking is a union of two equality joins + dropDuplicates
  on the pair key — both hash joins, no cartesian;
- levenshtein runs JVM-side (whole-stage codegen) on the block-bounded
  candidate set only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_name_pairs(
    df: DataFrame,
    name_col: str,
    max_dist: int = 3,
) -> DataFrame:
    """Near-matching name pairs ``(name_a, name_b, dist, n_a, n_b)`` over
    the distinct-name vocabulary, blocked on first/last token."""
    if max_dist < 1:
        raise ValueError(f"max_dist must be >= 1, got {max_dist}")
    names = df.groupBy(F.col(name_col).alias("name")).agg(
        F.count(F.lit(1)).alias("n")
    )
    toks = F.split(F.trim(F.col("name")), r"\s+")
    keyed = names.select(
        "name",
        "n",
        F.explode(
            F.array_distinct(
                F.array(F.element_at(toks, 1), F.element_at(toks, -1))
            )
        ).alias("blk"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk")) & (F.col("a.name") < F.col("b.name")),
        )
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
        .dropDuplicates(["name_a", "name_b"])
    )
    return cand.select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").cast("long").alias("dist"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
    ).filter(F.col("dist") <= max_dist)
