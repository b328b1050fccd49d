"""Model-based corpus scoring: a hashed-feature linear quality classifier
and DSIR-style importance weights.

Two standard "learned filter" stages of a pretraining-data pipeline,
re-expressed as deterministic Spark plans:

1. `linear_quality_scores` — the fastText-shaped quality classifier used by
   CCNet/GPT-3-style curation: tokens are hashed into a fixed feature space
   (hashing trick), each bucket carries a weight from a shipped model table,
   and a document's score is the mean bucket weight of its tokens.  Here the
   weight table is *synthesized deterministically from md5* (the container
   has no model artifact) — the plumbing (hashing, weight lookup, normalized
   score, sign label) is the real thing and the arithmetic is integer-exact
   until one final rounded division.

2. `dsir_weights` — Data Selection with Importance Resampling (Xie et al.,
   2023): per-token log-likelihood ratio between a target distribution
   (here: the `lang = 'en'` slice) and the raw corpus, both unigram models
   with add-one smoothing; a document's weight is the sum of its tokens'
   ratios.  The per-term ratio is FIXED-POINT QUANTIZED (floor(x * 1e6 +
   0.5)) immediately after the two ln() calls, so every aggregation is an
   order-free bigint sum — cross-engine float summation noise is impossible
   by construction (same discipline as the IVF / temperature-mix oracles).

100 TB posture: both operators are explode → groupBy(doc_id) with map-side
partial aggregation — a document's tokens live in one input split, so the
shuffle moves ~one row per document, not per token.  The DSIR term table is
vocabulary-sized and broadcast; its two corpus passes (scalar totals, then
the weighted join) mirror text_tfidf_top_terms' tf/df passes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import words

N_FEATURES = 1024
_W_SPAN = 2001  # weights in [-1000, 1000]


def feature_bucket(term: Column, n_features: int = N_FEATURES) -> Column:
    """Hashing-trick feature id in [0, n_features) — 60 md5 bits (the
    shared engine-portable hash, operators/dedup.py::_h60)."""
    from .dedup import _h60

    return _h60(term) % n_features


def bucket_weight(bucket: Column) -> Column:
    """Deterministic pseudo-weight in [-1000, 1000] for a feature bucket
    (stands in for a trained model's weight vector; md5-derived so the
    DuckDB oracle reproduces it bit-for-bit)."""
    h = F.md5(F.concat(F.lit("w:"), bucket.cast("string")))
    return (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % _W_SPAN - 1000
    )


def linear_quality_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document hashed-linear score: mean bucket weight over tokens.

    Returns (doc_id, n_tokens, score_sum, score, label) where
    score = round(score_sum / n_tokens, 4) and label = score_sum > 0.
    """
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(words(F.col(text_col))).alias("term"),
        )
        .filter(F.col("term") != "")
        .select("doc_id", bucket_weight(feature_bucket(F.col("term"))).alias("wgt"))
    )
    return toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("wgt").cast("long").alias("score_sum"),
    ).select(
        "doc_id",
        "n_tokens",
        "score_sum",
        F.round(F.col("score_sum") * F.lit(1.0) / F.col("n_tokens"), 4).alias("score"),
        (F.col("score_sum") > 0).alias("label"),
    )


LINEAR_QUALITY_SQL = rf"""
WITH toks AS (
    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
    FROM documents
),
wg AS (
    SELECT doc_id,
           ('0x' || substr(md5('w:' ||
                (('0x' || substr(md5(term), 1, 15))::BIGINT % {N_FEATURES})),
                1, 15))::BIGINT % {_W_SPAN} - 1000 AS wgt
    FROM toks WHERE term <> ''
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(wgt) AS BIGINT) AS score_sum,
       ROUND(SUM(wgt) * 1.0 / COUNT(*), 4) AS score,
       SUM(wgt) > 0 AS label
FROM wg GROUP BY 1
"""


def dsir_weights(
    docs: DataFrame,
    target_pred: Column | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance weight per document vs. a target slice.

    lambda(t) = ln((c_tgt(t) + 1) / (T + V)) - ln((c_raw(t) + 1) / (R + V)),
    fixed-point quantized to lam_fp = floor(lambda * 1e6 + 0.5); the document
    weight is the bigint sum of n_t(d) * lam_fp(t).

    Returns (doc_id, lang, n_tokens, dsir_fp, dsir_weight).
    """
    if target_pred is None:
        target_pred = F.col("lang") == "en"

    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col("lang"),
            target_pred.cast("long").alias("is_tgt"),
            F.explode(words(F.col(text_col))).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    term_stats = toks.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("c_raw"),
        F.sum("is_tgt").cast("long").alias("c_tgt"),
    )
    # Scalar totals: raw/target token counts and vocabulary size.  One tiny
    # collect over the vocabulary-sized aggregate (recomputed once more by
    # the final plan — same two-pass shape as tfidf's tf/df).
    tot = term_stats.agg(
        F.sum("c_raw").alias("r"), F.sum("c_tgt").alias("t"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    t_denom = float(tot["t"] + tot["v"])
    r_denom = float(tot["r"] + tot["v"])

    lam = term_stats.select(
        "term",
        F.floor(
            (
                F.log((F.col("c_tgt") + F.lit(1.0)) / F.lit(t_denom))
                - F.log((F.col("c_raw") + F.lit(1.0)) / F.lit(r_denom))
            )
            * F.lit(1000000.0)
            + F.lit(0.5)
        ).cast("long").alias("lam_fp"),
    )
    dt = toks.groupBy("doc_id", "lang", "term").agg(
        F.count(F.lit(1)).cast("long").alias("n_t")
    )
    return (
        dt.join(F.broadcast(lam), "term")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("n_t").cast("long").alias("n_tokens"),
            F.sum(F.col("n_t") * F.col("lam_fp")).cast("long").alias("dsir_fp"),
        )
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            "dsir_fp",
            F.round(F.col("dsir_fp") / F.lit(1000000.0), 6).alias("dsir_weight"),
        )
    )


def dsir_oracle_sql(target_lang: str = "en") -> str:
    """DuckDB replica of dsir_weights over the `documents` view.  The totals
    are computed in-SQL (bigint-exact, then one double division path written
    with the same literal forms as the Spark plan)."""
    return rf"""
WITH toks AS (
    SELECT doc_id, lang,
           CASE WHEN lang = '{target_lang}' THEN 1 ELSE 0 END AS is_tgt,
           unnest(string_split_regex(trim(text), '\s+')) AS term
    FROM documents
),
tk AS (SELECT * FROM toks WHERE term <> ''),
ts AS (
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS c_raw,
           CAST(SUM(is_tgt) AS BIGINT) AS c_tgt
    FROM tk GROUP BY 1
),
sc AS (
    SELECT CAST(SUM(c_raw) + COUNT(*) AS DOUBLE) AS r_denom,
           CAST(SUM(c_tgt) + COUNT(*) AS DOUBLE) AS t_denom
    FROM ts
),
lam AS (
    SELECT term,
           CAST(floor((ln((c_tgt + 1.0) / t_denom)
                       - ln((c_raw + 1.0) / r_denom))
                      * 1000000.0 + 0.5) AS BIGINT) AS lam_fp
    FROM ts CROSS JOIN sc
),
dt AS (
    SELECT doc_id, lang, term, CAST(COUNT(*) AS BIGINT) AS n_t
    FROM tk GROUP BY 1, 2, 3
)
SELECT dt.doc_id, dt.lang,
       CAST(SUM(dt.n_t) AS BIGINT) AS n_tokens,
       CAST(SUM(dt.n_t * lam.lam_fp) AS BIGINT) AS dsir_fp,
       ROUND(SUM(dt.n_t * lam.lam_fp) / 1000000.0, 6) AS dsir_weight
FROM dt JOIN lam USING (term)
GROUP BY 1, 2
"""
