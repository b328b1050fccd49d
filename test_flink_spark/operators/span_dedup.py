"""Cross-document exact span deduplication: find fixed-length token spans
(contiguous word n-grams, stride 1) that occur in more than one document
and score each document by how much of it is span-duplicated elsewhere —
the distributed approximation of suffix-array substring dedup
("Deduplicating Training Data Makes Language Models Better", Lee et al.
2022: exact duplicated substrings, not whole-document near-dups, dominate
web corpora).  A true distributed suffix array is unnecessary for the
pipeline use case: fixed ``span_words`` windows at stride 1 detect every
duplicated substring of >= span_words tokens, which is the actionable
signal (the paper itself thresholds at a minimum match length).

Semantics (deterministic, engine-reproducible):
- a doc's span set = DISTINCT hashes of its ``span_words``-token windows;
- a span's owner  = the MINIMUM doc_id among docs containing it;
- a span is "duplicated" in doc d iff some OTHER doc shares it; d gets to
  keep the spans it owns (first-occurrence-keeps semantics, matching
  ``exact_dedup``'s canonical-id convention, extended to substrings);
- per doc: ``dup_frac`` = borrowed spans / total spans; the pipeline drops
  or trims docs above a threshold.

Scale design (the whole point at 100 TB):
- spans are hashed to 60-bit ints BEFORE the shuffle — the exchange
  carries (doc_id, 8-byte hash), never span text;
- ownership is ONE groupBy on the span hash with map-side partial
  min/count (duplicated spans — the thing being measured — collapse to
  one row per map partition before crossing the network);
- the join back to docs is an equality join on the hash (inverted-index
  shape shared with ``ngram_jaccard_pairs`` / ``ngram_containment``),
  then one per-doc count aggregation.  Nothing is ever all-pairs and no
  document body crosses the network.

Reference parity: extends test-flink's analytics surface with the
training-data-pipeline dedup family (SURVEY.md §2 LLM-data ops); no
counterpart file in /root/reference (the reference has no text ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_hashes


def span_ownership(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 8,
    flag_threshold: float = 0.5,
) -> DataFrame:
    """Per-document duplicated-span stats: ``(id_col, n_spans, n_dup_spans,
    dup_frac, flagged)`` for EVERY input doc (docs shorter than
    ``span_words`` have no spans -> dup_frac 0.0, never flagged).

    ``n_dup_spans`` counts this doc's distinct spans that also appear in
    at least one other document AND are not owned (min doc_id) by this doc
    — so of k copies of a duplicated span, k-1 are charged and the
    earliest doc keeps it."""
    if span_words < 2:
        raise ValueError(f"span_words must be >= 2, got {span_words}")
    if not 0.0 < flag_threshold <= 1.0:
        raise ValueError(f"flag_threshold must be in (0, 1], got {flag_threshold}")
    # Per-doc distinct span HASHES, computed map-side (shingle_hashes):
    # the previous form reused ``shingles()``, whose dropDuplicates
    # shuffles the full span strings — ~50 bytes/span of text crossing the
    # network before any hashing, exactly what this module's scale contract
    # forbids.  Distinct-within-array costs no exchange at all, and deduping
    # on the 60-bit hash (not the string) is what the oracle's
    # ``SELECT DISTINCT id, h`` does anyway.  Measured at sf0.1: 5.9 s ->
    # 1.4-1.8 s warm (see docs/DESIGN_DECISIONS.md round 5).
    sp = shingle_hashes(df, text_col, id_col, n=span_words)
    own = sp.groupBy("h").agg(
        F.min(id_col).alias("owner"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    per_doc = (
        sp.join(own, "h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum(
                ((F.col("n_docs") > 1) & (F.col("owner") != F.col(id_col))).cast("long")
            )
            .cast("long")
            .alias("n_dup_spans"),
        )
    )
    out = df.select(F.col(id_col)).join(per_doc, id_col, "left_outer").select(
        F.col(id_col),
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
        F.when(
            F.coalesce("n_spans", F.lit(0)) > 0,
            F.round(F.coalesce("n_dup_spans", F.lit(0)) / F.col("n_spans"), 4),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_frac"),
    )
    return out.withColumn(
        "flagged", (F.col("dup_frac") >= flag_threshold).cast("boolean")
    )


def span_ownership_oracle_sql(
    span_words: int = 8,
    flag_threshold: float = 0.5,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB SQL reproducing ``span_ownership`` bit-for-bit (same md5
    span hashing, same min-owner attribution)."""
    n = span_words
    gram = " || ' ' || ".join(f"w[i+{j}]" for j in range(n)).replace("w[i+0]", "w[i]")
    return f"""
WITH ws AS (
    SELECT {id_col}, string_split_regex(trim({text_col}), '\\s+') AS w FROM {table}
), sp AS (
    SELECT DISTINCT {id_col},
           ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
    FROM (
        SELECT {id_col},
               unnest(list_transform(range(1, greatest(len(w) - {n - 2}, 1)),
                                     i -> {gram})) AS s
        FROM ws) WHERE s IS NOT NULL AND s <> ''
), own AS (
    SELECT h, MIN({id_col}) AS owner, COUNT(*) AS n_docs FROM sp GROUP BY 1
), per_doc AS (
    SELECT sp.{id_col},
           COUNT(*) AS n_spans,
           SUM(CASE WHEN own.n_docs > 1 AND own.owner <> sp.{id_col}
                    THEN 1 ELSE 0 END) AS n_dup_spans
    FROM sp JOIN own USING (h) GROUP BY 1
)
SELECT d.{id_col},
       CAST(COALESCE(n_spans, 0) AS BIGINT) AS n_spans,
       CAST(COALESCE(n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
       CASE WHEN COALESCE(n_spans, 0) > 0
            THEN ROUND(COALESCE(n_dup_spans, 0) * 1.0 / n_spans, 4)
            ELSE 0.0 END AS dup_frac,
       (CASE WHEN COALESCE(n_spans, 0) > 0
             THEN ROUND(COALESCE(n_dup_spans, 0) * 1.0 / n_spans, 4)
             ELSE 0.0 END) >= {flag_threshold} AS flagged
FROM {table} d
LEFT JOIN per_doc USING ({id_col})
"""
