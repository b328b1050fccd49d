"""Training-data decontamination: flag training documents whose word
n-grams overlap a benchmark/eval suite (the n-gram containment check used
by LLM data pipelines to keep test sets out of training corpora).

Scale design (100 TB corpus vs a small eval suite):
- the benchmark side is reduced to a DISTINCT set of 60-bit shingle hashes
  (16 bytes/shingle → a few MB for a typical eval suite) and broadcast, so
  the corpus-side scan never shuffles on document text;
- the corpus side streams through one explode + hash projection; the only
  shuffle is the per-doc count aggregation on (doc_id), with map-side
  partial counts;
- when the "benchmark" is itself huge, pass ``broadcast_bench=False`` and
  the same plan runs as a shuffle equi-join on the shingle hash — the
  inverted-index shape shared with dedup.ngram_jaccard_pairs.

Joining on the md5-derived 60-bit hash (not the shingle string) keeps the
broadcast/shuffle payload fixed-width; collisions at 2^-60 are noise, and
the DuckDB oracle reproduces the identical hashing so the differential test
is exact, not approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_hashes


def ngram_containment(
    train_df: DataFrame,
    bench_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    flag_threshold: float = 0.2,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per training document: how many of its distinct word ``n``-grams
    appear anywhere in the benchmark corpus.

    Returns ``(id_col, n_shingles, n_matched, containment, contaminated)``
    for EVERY training doc (zero-match docs included — the common case, and
    the left-join semantics a pipeline filters on).  ``containment`` is
    matched/total rounded to 4 (docs with < n words have no shingles →
    containment 0.0)."""
    # shingle_hashes computes per-doc distinct 60-bit hashes map-side: no
    # n-gram string ever shuffles (dedup.py docstring has the rationale).
    bench_sh = (
        shingle_hashes(bench_df, text_col, id_col, n)
        .select(F.col("h").alias("bench_h"))
        .distinct()
    )
    if broadcast_bench:
        bench_sh = F.broadcast(bench_sh)
    train_sh = shingle_hashes(train_df, text_col, id_col, n)
    totals = train_df.select(F.col(id_col)).join(
        train_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles")),
        id_col,
        "left_outer",
    )
    matched = (
        train_sh.join(bench_sh, train_sh.h == bench_sh.bench_h)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    out = (
        totals.join(matched, id_col, "left_outer")
        .select(
            F.col(id_col),
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
            F.when(
                F.coalesce("n_shingles", F.lit(0)) > 0,
                F.round(
                    F.coalesce("n_matched", F.lit(0))
                    / F.col("n_shingles").cast("double"),
                    4,
                ),
            )
            .otherwise(0.0)
            .alias("containment"),
        )
    )
    return out.withColumn(
        "contaminated", (F.col("containment") >= flag_threshold).cast("boolean")
    )
