"""Unigram language-model quality scoring — the CCNet-style "perplexity
filter" (Wenzek et al. 2020: score each document by LM loss against a
clean reference corpus; high loss = gibberish/spam, suspiciously low
loss = boilerplate).  A full KenLM is out of scope for a SQL engine; the
distributed form here is the unigram cross-entropy, which is the
dominant term of the filter's discriminative power and — unlike a
5-gram LM — needs no model artifact beyond a vocabulary aggregate.

Engine-exact quantization (the design problem): cross-entropy sums
``-log2 P(w)`` floats, and neither ``ln`` nor float sum fold order is
bit-identical across engines.  Instead each word's surprisal is
quantized to its INTEGER log2 bucket:

    bucket(w) = floor(log2(total_tokens div count(w)))
              = length(bin(total_tokens div count(w))) - 1

computed via binary-string length — pure int64 arithmetic that Spark's
``bin()`` and DuckDB's ``bin()`` reproduce bit-for-bit (no float log
anywhere).  A word covering 1/2^k of the reference corpus scores ~k
bits; out-of-vocabulary words score the maximum bucket + 1.  The
document score is the mean bucket (exact integer sum / count, rounded
like every ratio in this repo), i.e. cross-entropy in bits quantized to
integer bits per word — the same ranking signal, differentially
testable.

Scale design:
- the reference vocabulary is ONE groupBy over the (bounded) reference
  slice; its total is a 1-row scalar (sanctioned tiny collect);
- scoring is one corpus pass: explode -> broadcast (or shuffle) join on
  the word -> per-doc sum/count with map-side partials.  With a huge
  reference vocabulary pass ``broadcast_vocab=False`` and the same plan
  runs as a shuffle equi-join on the word — the inverted-index shape
  shared with decontam/jaccard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import words


def unigram_surprisal_scores(
    score_df: DataFrame,
    ref_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    flag_high: float = 14.0,
    broadcast_vocab: bool = True,
    include_empty_docs: bool = True,
) -> DataFrame:
    """Score every doc in ``score_df`` against the unigram LM of
    ``ref_df``: ``(id_col, n_tokens, n_oov, sum_bits, mean_bits,
    flagged)``.  ``mean_bits`` is the quantized unigram cross-entropy in
    bits/word; docs above ``flag_high`` are flagged (the gibberish tail).
    Token-less docs score 0 and are never flagged.

    ``include_empty_docs`` re-joins the input so zero-token docs appear in
    the output; on a STREAMING ``score_df`` that re-join is a stream-stream
    self-join (unsupported with the aggregation) — pass ``False`` and run
    the per-doc aggregation in complete/update mode instead (token-bearing
    docs only, which is every doc of a real corpus)."""
    ref_words = ref_df.select(F.explode(words(F.col(text_col))).alias("w")).filter(
        F.col("w") != ""
    )
    vocab = ref_words.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    # 1-row scalar (sanctioned tiny collect, cf. IVF codebook / temperature
    # cutoffs): the reference total, inlined as a literal so the scoring
    # plan is a single pass.  Counted from ref_words directly — a plain
    # count, no groupBy — so the vocab aggregation runs exactly once (in
    # the scoring join); deriving it from `vocab` would re-execute the
    # reference explode+groupBy a second time.
    total = ref_words.count()
    if total == 0:
        raise ValueError("reference corpus has no tokens")
    # floor(log2(total div cnt)) via binary-string length — int64-exact in
    # both engines; OOV = max bucket + 1 (rarer than everything seen)
    bucket = (
        F.length(F.bin(F.expr(f"CAST({total} AS BIGINT) div cnt"))) - 1
    ).cast("long")
    oov_bucket = total.bit_length() - 1  # floor(log2(total)), exact int
    if broadcast_vocab:
        vocab = F.broadcast(vocab)
    toks = score_df.select(
        F.col(id_col), F.explode(words(F.col(text_col))).alias("w")
    ).filter(F.col("w") != "")
    scored = (
        toks.join(vocab, "w", "left_outer")
        .select(
            F.col(id_col),
            F.coalesce(bucket, F.lit(oov_bucket + 1)).alias("bits"),
            F.col("cnt").isNull().cast("long").alias("is_oov"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("is_oov").cast("long").alias("n_oov"),
            F.sum("bits").cast("long").alias("sum_bits"),
        )
    )
    if include_empty_docs:
        # re-join the input so zero-token docs appear (coalesce to 0)
        scored = score_df.select(F.col(id_col)).join(scored, id_col, "left_outer").select(
            F.col(id_col),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
            F.coalesce("sum_bits", F.lit(0)).cast("long").alias("sum_bits"),
        )
    # ONE shaping path for both modes, so rounding scale / zero-token
    # default / flag semantics can never diverge between the batch and
    # streaming (include_empty_docs=False) forms
    return scored.select(
        F.col(id_col),
        "n_tokens",
        "n_oov",
        "sum_bits",
        F.when(
            F.col("n_tokens") > 0,
            F.round(F.col("sum_bits") / F.col("n_tokens"), 4),
        )
        .otherwise(F.lit(0.0))
        .alias("mean_bits"),
    ).withColumn("flagged", (F.col("mean_bits") > flag_high).cast("boolean"))


def unigram_surprisal_oracle_sql(
    ref_filter: str,
    flag_high: float = 14.0,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB SQL reproducing ``unigram_surprisal_scores`` bit-for-bit when
    the reference slice is ``SELECT * FROM table WHERE ref_filter``.  Uses
    the identical bin()-length bucket arithmetic — no float logs."""
    return f"""
WITH lw AS (
    SELECT {id_col},
           unnest(string_split_regex(trim({text_col}), '\\s+')) AS w
    FROM {table}
), ref_w AS (
    SELECT w FROM lw WHERE w <> '' AND {id_col} IN
        (SELECT {id_col} FROM {table} WHERE {ref_filter})
), vocab AS (
    SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM ref_w GROUP BY 1
), tot AS (
    SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM vocab
), scored AS (
    SELECT lw.{id_col},
           COUNT(*) AS n_tokens,
           SUM(CASE WHEN vocab.cnt IS NULL THEN 1 ELSE 0 END) AS n_oov,
           SUM(CASE WHEN vocab.cnt IS NULL
                    THEN length(bin(tot.total))
                    ELSE length(bin(tot.total // vocab.cnt)) - 1 END) AS sum_bits
    FROM lw CROSS JOIN tot
    LEFT JOIN vocab ON lw.w = vocab.w
    WHERE lw.w <> ''
    GROUP BY 1
)
SELECT d.{id_col},
       CAST(COALESCE(n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(n_oov, 0) AS BIGINT) AS n_oov,
       CAST(COALESCE(sum_bits, 0) AS BIGINT) AS sum_bits,
       CASE WHEN COALESCE(n_tokens, 0) > 0
            THEN ROUND(COALESCE(sum_bits, 0) * 1.0 / n_tokens, 4)
            ELSE 0.0 END AS mean_bits,
       (CASE WHEN COALESCE(n_tokens, 0) > 0
             THEN ROUND(COALESCE(sum_bits, 0) * 1.0 / n_tokens, 4)
             ELSE 0.0 END) > {flag_high} AS flagged
FROM {table} d
LEFT JOIN scored USING ({id_col})
"""


def bigram_surprisal_scores(
    score_df: DataFrame,
    ref_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    backoff_bits: int = 2,
    flag_high: float = 14.0,
) -> DataFrame:
    """Bigram LM scoring with stupid backoff — one order up from
    ``unigram_surprisal_scores``, catching word-salad documents whose
    unigram profile looks clean but whose transitions are noise.

    Per-token surprisal, all integer log2 buckets (bin()-length trick):
    - seen bigram:  floor(log2(ctx_count(prev) div bigram_count(prev,w)))
      — the conditional -log2 P(w|prev), quantized;
    - unseen bigram (known prev): unigram bucket + ``backoff_bits``
      (stupid backoff: alpha = 2^-backoff_bits);
    - doc-initial token or OOV prev: plain unigram bucket;
    - OOV word: max unigram bucket + 1 (+ backoff when prev was known).

    Scale: the reference aggregates are ONE pass over the ref slice
    (bigram counts via the lag projection, unigram via explode); scoring
    is one corpus pass with a lag window per doc (the ordering exchange
    is per-document and would already be paid by any chunking stage) and
    two broadcast joins.  Output: ``(id_col, n_tokens, n_bigram_hits,
    sum_bits, mean_bits, flagged)``."""
    from pyspark.sql import Window

    def _tok_pairs(df: DataFrame) -> DataFrame:
        toks = df.select(
            F.col(id_col), F.posexplode(words(F.col(text_col))).alias("pos", "w")
        ).filter(F.col("w") != "")
        w = Window.partitionBy(id_col).orderBy("pos")
        return toks.withColumn("prev", F.lag("w").over(w))

    ref_pairs = _tok_pairs(ref_df)
    vocab = ref_pairs.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    bigrams = (
        ref_pairs.filter(F.col("prev").isNotNull())
        .groupBy("prev", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("big_cnt"))
    )
    # context totals: occurrences of `prev` AS A CONTEXT (i.e. bigrams
    # starting with it), so P(w|prev) sums to 1 over seen continuations
    ctx = bigrams.groupBy("prev").agg(F.sum("big_cnt").cast("long").alias("ctx_cnt"))
    total = ref_pairs.count()  # 1-row scalar, same sanction as unigram
    if total == 0:
        raise ValueError("reference corpus has no tokens")
    oov_bucket = total.bit_length() - 1

    uni_bits = F.length(F.bin(F.expr(f"CAST({total} AS BIGINT) div cnt"))) - 1
    big_bits = F.length(F.bin(F.expr("ctx_cnt div big_cnt"))) - 1

    scored_toks = (
        _tok_pairs(score_df)
        .join(F.broadcast(vocab), "w", "left_outer")
        .join(F.broadcast(bigrams), ["prev", "w"], "left_outer")
        .join(
            F.broadcast(ctx.withColumnRenamed("prev", "prev")), "prev", "left_outer"
        )
        .select(
            F.col(id_col),
            F.when(F.col("big_cnt").isNotNull(), big_bits)
            .when(  # known context, unseen continuation: back off
                F.col("ctx_cnt").isNotNull(),
                F.coalesce(uni_bits, F.lit(oov_bucket + 1)) + F.lit(backoff_bits),
            )
            .otherwise(  # doc-initial or unknown context: plain unigram
                F.coalesce(uni_bits, F.lit(oov_bucket + 1))
            )
            .cast("long")
            .alias("bits"),
            F.col("big_cnt").isNotNull().cast("long").alias("is_hit"),
        )
    )
    agg = scored_toks.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("is_hit").cast("long").alias("n_bigram_hits"),
        F.sum("bits").cast("long").alias("sum_bits"),
    )
    out = score_df.select(F.col(id_col)).join(agg, id_col, "left_outer").select(
        F.col(id_col),
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce("n_bigram_hits", F.lit(0)).cast("long").alias("n_bigram_hits"),
        F.coalesce("sum_bits", F.lit(0)).cast("long").alias("sum_bits"),
    )
    return out.select(
        id_col,
        "n_tokens",
        "n_bigram_hits",
        "sum_bits",
        F.when(
            F.col("n_tokens") > 0, F.round(F.col("sum_bits") / F.col("n_tokens"), 4)
        )
        .otherwise(F.lit(0.0))
        .alias("mean_bits"),
    ).withColumn("flagged", (F.col("mean_bits") > flag_high).cast("boolean"))


def bigram_surprisal_oracle_sql(
    ref_filter: str,
    backoff_bits: int = 2,
    flag_high: float = 14.0,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB replay of ``bigram_surprisal_scores`` — identical lag
    pairing, integer buckets, backoff arithmetic."""
    return f"""
WITH lw AS (
    SELECT {id_col}, pos, w, LAG(w) OVER (PARTITION BY {id_col} ORDER BY pos) AS prev
    FROM (
        SELECT {id_col},
               generate_subscripts(string_split_regex(trim({text_col}), '\\s+'), 1) AS pos,
               unnest(string_split_regex(trim({text_col}), '\\s+')) AS w
        FROM {table})
    WHERE w <> ''
), ref AS (
    SELECT * FROM lw WHERE {id_col} IN
        (SELECT {id_col} FROM {table} WHERE {ref_filter})
), vocab AS (
    SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM ref GROUP BY 1
), bigrams AS (
    SELECT prev, w, CAST(COUNT(*) AS BIGINT) AS big_cnt
    FROM ref WHERE prev IS NOT NULL GROUP BY 1, 2
), ctx AS (
    SELECT prev, CAST(SUM(big_cnt) AS BIGINT) AS ctx_cnt FROM bigrams GROUP BY 1
), tot AS (
    SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM vocab
), scored AS (
    SELECT lw.{id_col},
           COUNT(*) AS n_tokens,
           SUM(CASE WHEN b.big_cnt IS NOT NULL THEN 1 ELSE 0 END) AS n_bigram_hits,
           SUM(CASE
               WHEN b.big_cnt IS NOT NULL
                 THEN length(bin(c.ctx_cnt // b.big_cnt)) - 1
               WHEN c.ctx_cnt IS NOT NULL
                 THEN (CASE WHEN v.cnt IS NULL THEN length(bin(tot.total))
                            ELSE length(bin(tot.total // v.cnt)) - 1 END)
                      + {backoff_bits}
               ELSE (CASE WHEN v.cnt IS NULL THEN length(bin(tot.total))
                          ELSE length(bin(tot.total // v.cnt)) - 1 END)
               END) AS sum_bits
    FROM lw CROSS JOIN tot
    LEFT JOIN vocab v ON lw.w = v.w
    LEFT JOIN bigrams b ON lw.prev = b.prev AND lw.w = b.w
    LEFT JOIN ctx c ON lw.prev = c.prev
    GROUP BY 1
)
SELECT d.{id_col},
       CAST(COALESCE(n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(n_bigram_hits, 0) AS BIGINT) AS n_bigram_hits,
       CAST(COALESCE(sum_bits, 0) AS BIGINT) AS sum_bits,
       CASE WHEN COALESCE(n_tokens, 0) > 0
            THEN ROUND(COALESCE(sum_bits, 0) * 1.0 / n_tokens, 4)
            ELSE 0.0 END AS mean_bits,
       (CASE WHEN COALESCE(n_tokens, 0) > 0
             THEN ROUND(COALESCE(sum_bits, 0) * 1.0 / n_tokens, 4)
             ELSE 0.0 END) > {flag_high} AS flagged
FROM {table} d
LEFT JOIN scored USING ({id_col})
"""
