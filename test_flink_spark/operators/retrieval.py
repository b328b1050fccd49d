"""BM25 keyword retrieval over the document corpus.

Okapi BM25 (k1 = 1.2, b = 0.75) with the Lucene-style non-negative idf
``ln(1 + (N - df + 0.5) / (df + 0.5))`` — the standard first-stage sparse
retriever a training-data pipeline pairs with the embedding ANN path
(operators/similarity.py / ivf.py) for hybrid search and hard-negative
mining.

Spark-first shape and 100 TB posture:
    - ONE corpus pass tokenizes and immediately filters to the query
      vocabulary (`isin` on a literal set — codegen'd, pushes ahead of the
      explode's output), so everything downstream is proportional to
      *matching* (doc, term) pairs, not corpus size.
    - Document length is computed in the same projection and carried
      through the explode, so no second corpus scan and no doc-length
      join: the per-(doc, term) groupBy recovers it with max(dl).
    - N and avgdl are two scalars (one tiny agg, sanctioned collect —
      cf. corpus_vocab_coverage); df is a per-term count over the already
      tiny tf table, broadcast back.
    - Ranking happens on the ROUNDED score with doc_id as tie-break, so
      cross-engine float noise in ln()/division cannot reorder rows (same
      convention as text_tfidf_top_terms).

The paired DuckDB oracle (bm25_oracle_sql) reproduces the exact arithmetic:
every float expression is written with identical literal forms and
parenthesization in both dialects.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import words

K1 = 1.2
B = 0.75


def _dl_expr(text_col: str):
    """Document length = count of non-empty whitespace tokens."""
    return F.size(
        F.filter(words(F.col(text_col)), lambda w: w != F.lit(""))
    ).cast("long")


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents per query term by BM25 score.

    Returns (term, doc_id, tf, dl, score, rank) with rank <= k per term.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")

    # Corpus scalars: N docs and average document length.  sum/count are
    # exact bigints; the single Python float division is the same
    # correctly-rounded IEEE op the oracle performs.
    stats = docs.agg(
        F.count(F.lit(1)).alias("n"), F.sum(_dl_expr(text_col)).alias("s")
    ).collect()[0]
    if not stats["n"]:
        raise ValueError("docs must be non-empty (avgdl is undefined)")
    n_docs, avgdl = int(stats["n"]), stats["s"] / stats["n"]

    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            _dl_expr(text_col).alias("dl"),
            F.explode(words(F.col(text_col))).alias("term"),
        )
        .filter(F.col("term").isin(list(query_terms)))
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        F.max("dl").alias("dl"),
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))

    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(K1) * (
        F.lit(1.0 - B) + F.lit(B) * (F.col("dl") / F.lit(avgdl))
    )
    scored = tf.join(F.broadcast(df_), "term").select(
        "term",
        "doc_id",
        "tf",
        "dl",
        F.round(idf * ((F.col("tf") * F.lit(K1 + 1.0)) / denom), 4).alias("score"),
    )
    w = Window.partitionBy("term").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("term", "doc_id", "tf", "dl", "score", "rank")
    )


def bm25_oracle_sql(query_terms: Sequence[str], k: int = 10) -> str:
    """DuckDB replica of bm25_topk over the `documents` view — identical
    literal forms and parenthesization so doubles match bit-for-bit."""
    # SQL-escape: the Spark side takes terms verbatim, so the oracle must
    # survive quotes in a term too.
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    return rf"""
WITH dl AS (
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                w -> w <> '')) AS BIGINT) AS dl,
           string_split_regex(trim(text), '\s+') AS ws
    FROM documents
),
stats AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
           CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
    FROM dl
),
toks AS (
    SELECT doc_id, dl, unnest(ws) AS term FROM dl
),
tf AS (
    SELECT doc_id, term,
           CAST(COUNT(*) AS BIGINT) AS tf,
           CAST(MAX(dl) AS BIGINT) AS dl
    FROM toks WHERE term IN ({in_list}) GROUP BY 1, 2
),
df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
scored AS (
    SELECT tf.term, tf.doc_id, tf.tf, tf.dl,
           ROUND(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                 * ((tf * {K1 + 1.0}) / (tf + {K1} * ({1.0 - B} + {B} * (dl / avgdl)))),
                 4) AS score
    FROM tf JOIN df USING (term) CROSS JOIN stats
),
ranked AS (
    SELECT term, doc_id, tf, dl, score,
           CAST(ROW_NUMBER() OVER (PARTITION BY term
                                   ORDER BY score DESC, doc_id ASC) AS BIGINT)
               AS rank
    FROM scored
)
SELECT term, doc_id, tf, dl, score, rank FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion (hybrid retrieval ensemble)
# ---------------------------------------------------------------------------

RRF_K = 60


def rrf_fuse(
    a: DataFrame,
    b: DataFrame,
    topk: int = 5,
    k_const: int = RRF_K,
    key_cols: Sequence[str] = ("query_id", "neighbor_id"),
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of two rankers (Cormack et al., 2009):
    score(q, d) = sum over rankers of 1 / (k + rank_r(d)), the standard
    score-free way to ensemble a sparse and a dense retriever (or any two
    rankers) — ranks are comparable where raw scores are not.

    Exactly two contributions feed each (query, doc) pair and they are added
    with one explicit `+` (no groupBy sum), so the double arithmetic is
    order-free by construction.  Both inputs are already top-k tables —
    everything here is post-retrieval and tiny; the full-outer join keeps
    docs surfaced by only one ranker.

    Returns (query_id, neighbor_id, rrf_score, rank) with rank <= topk.
    """
    keys = list(key_cols)
    if len(keys) < 2:
        raise ValueError("key_cols needs (query keys..., doc key)")
    ar = a.select(*keys, F.col(rank_col).alias("rank_a"))
    br = b.select(*keys, F.col(rank_col).alias("rank_b"))
    fused = ar.join(br, on=keys, how="full_outer")
    contrib_a = F.when(
        F.col("rank_a").isNotNull(),
        F.lit(1.0) / (F.col("rank_a") + F.lit(k_const)),
    ).otherwise(F.lit(0.0))
    contrib_b = F.when(
        F.col("rank_b").isNotNull(),
        F.lit(1.0) / (F.col("rank_b") + F.lit(k_const)),
    ).otherwise(F.lit(0.0))
    scored = fused.select(
        *keys, F.round(contrib_a + contrib_b, 6).alias("rrf_score")
    )
    # Partition by every query key, tie-break on the doc key — determinism
    # holds for composite query keys too, not just the default pair.
    w = Window.partitionBy(*keys[:-1]).orderBy(
        F.col("rrf_score").desc(), F.col(keys[-1]).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= topk)
    )


def rrf_oracle_sql(
    a_sql: str, b_sql: str, topk: int = 5, k_const: int = RRF_K
) -> str:
    """Compose two rankers' full oracle queries (each its own WITH..SELECT,
    nested as CTE bodies) into the RRF fusion — the fused oracle replays
    BOTH retrieval algorithms end-to-end, then the same coalesce/round
    arithmetic as rrf_fuse."""
    return f"""
WITH ranker_a AS ({a_sql}),
ranker_b AS ({b_sql}),
fused AS (
    SELECT COALESCE(a.query_id, b.query_id) AS query_id,
           COALESCE(a.neighbor_id, b.neighbor_id) AS neighbor_id,
           ROUND(COALESCE(1.0 / (a.rank + {k_const}), 0.0)
                 + COALESCE(1.0 / (b.rank + {k_const}), 0.0), 6) AS rrf_score
    FROM ranker_a a FULL JOIN ranker_b b
      ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
),
ranked AS (
    SELECT query_id, neighbor_id, rrf_score,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY rrf_score DESC, neighbor_id ASC)
                AS BIGINT) AS rank
    FROM fused
)
SELECT query_id, neighbor_id, rrf_score, rank FROM ranked WHERE rank <= {topk}
"""


# ---------------------------------------------------------------------------
# Sparse lexical cosine top-k (the classic IR VSM baseline — the sparse
# sibling of similarity.py's embedding_cosine_topk, and the second leg a
# hybrid retriever fuses with RRF).
# ---------------------------------------------------------------------------


def sparse_cosine_topk(
    docs: DataFrame,
    query_salt: str = "sparseq",
    query_rate_bp: int = 100,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
    max_df_bp: int | None = None,
) -> DataFrame:
    """Top-``k`` most lexically similar documents per query document under
    tf·idf cosine: ``(query_id, doc_id, cos_bp, rank)``.

    Determinism/scale design:
    - idf is the INTEGER log2 floor ``length(bin(N div df)) - 1`` (the
      lm_score bin()-trick) — no float log.  The weight is
      ``tf · (1 + idf2)``: ubiquitous terms keep base tf weight (pure
      pruning would blank out corpora with flat df profiles, like this
      synthetic one), informative terms get boosted 2-5x.  The posting-
      list cap — the stop-term knob shared with ngram_jaccard_pairs —
      comes in two forms: ``max_df`` (absolute) and ``max_df_bp``
      (basis points of corpus size, so the cap scales with the data).
      The registered plan defaults ``max_df_bp=9000``: terms appearing
      in >90% of documents are dropped before the index join.  On a
      Zipfian corpus that removes exactly the stop terms whose posting
      lists make the join quadratic; this synthetic corpus's flat df
      profile (all terms ~80%) sits under the cap by design, so the
      oracle hash is unchanged while the guard is live.
    - norms ``Σw²`` are joined back by PLAIN shuffle hash joins, never
      broadcast: norms has one row per document, so broadcasting it is
      O(corpus) on the driver — the scale bug class
      tests/test_plans.py's broadcast-growth gate now rejects.  ``dots``
      is already hashed on (query_id, doc_id); the two norm joins reuse
      that shuffle.  The only broadcast left is the per-term idf map,
      which is vocabulary-sized (bounded here; Heaps-law sublinear on
      real text).
    - weights and norms ``Σw²`` are exact int64; the
      only doubles are the final ``dot / (sqrt(na)·sqrt(nb))`` — sqrt,
      multiply, divide are IEEE correctly-rounded single ops written with
      identical shape in both dialects (the KMV argument), then one
      exactly-rounded ``·10⁴`` and floor to basis points.
    - queries are a deterministic md5-bucket sample (``query_rate_bp`` of
      10⁴); candidate generation is the inverted-index join on the term,
      never all-pairs, and the postings the join touches are only the
      idf>0 (informative) ones.
    """
    toks = docs.select(
        F.col(id_col), F.explode(words(F.col(text_col))).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.select(id_col).distinct().count()  # scalar (BM25 precedent)
    idf = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn("idf2", F.length(F.bin(F.expr(f"{n_docs} div df"))) - 1)
        .select("term", "idf2", "df")
    )
    if max_df is not None:
        idf = idf.filter(F.col("df") <= max_df)
    if max_df_bp is not None:
        # Fractional stop-term cap: integer floor of bp·N/10⁴, replayed
        # bit-for-bit by the oracle's `df <= n_docs * bp // 10000`.
        idf = idf.filter(F.col("df") <= (n_docs * max_df_bp) // 10000)
    wtd = tf.join(F.broadcast(idf.select("term", "idf2")), "term").select(
        F.col(id_col),
        "term",
        (F.col("tf") * (F.lit(1) + F.col("idf2"))).cast("long").alias("w"),
    )
    norms = wtd.groupBy(id_col).agg(F.sum(F.col("w") * F.col("w")).alias("n2"))
    from .sampling import hash_bucket

    q = wtd.filter(hash_bucket(F.col(id_col), query_salt) < query_rate_bp).select(
        F.col(id_col).alias("query_id"), "term", F.col("w").alias("wq")
    )
    dots = (
        q.join(wtd, "term")
        .filter(F.col("query_id") != F.col(id_col))
        .groupBy("query_id", id_col)
        .agg(F.sum(F.col("wq") * F.col("w")).alias("dot"))
    )
    # norms is one row PER DOCUMENT — O(corpus).  Shuffle hash joins only;
    # an F.broadcast here ships the whole corpus's norms to every executor
    # and materializes it on the driver (found+fixed in round 5; the plan
    # gate's broadcast-growth canary keeps it out).
    na = norms.select(F.col(id_col).alias("query_id"), F.col("n2").alias("na"))
    nb = norms.select(F.col(id_col).alias(id_col), F.col("n2").alias("nb"))
    scored = (
        dots.join(na, "query_id")
        .join(nb, id_col)
        .select(
            "query_id",
            id_col,
            F.expr("CAST(FLOOR(10000 * (dot / (sqrt(na) * sqrt(nb)))) AS BIGINT)").alias(
                "cos_bp"
            ),
        )
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("cos_bp").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cos_bp", F.col("rank").cast("long").alias("rank"))
    )


def sparse_cosine_oracle_sql(
    query_salt: str = "sparseq",
    query_rate_bp: int = 100,
    k: int = 5,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_bp: int | None = None,
) -> str:
    """DuckDB replay of sparse_cosine_topk — identical tokenization, integer
    idf, int64 dots/norms, the same fractional stop-term cap, and the same
    exactly-rounded cosine shape."""
    df_cap = (
        f"WHERE df <= (SELECT n_docs FROM nd) * {max_df_bp} // 10000"
        if max_df_bp is not None
        else ""
    )
    return rf"""
WITH toks AS (
    SELECT {id_col}, unnest(string_split_regex(trim({text_col}), '\s+')) AS term
    FROM {table}
), tf AS (
    SELECT {id_col}, term, COUNT(*) AS tf
    FROM toks WHERE term <> '' GROUP BY 1, 2
), nd AS (SELECT COUNT(DISTINCT {id_col}) AS n_docs FROM {table}),
idf AS (
    SELECT term, length(bin((SELECT n_docs FROM nd) // df)) - 1 AS idf2
    FROM (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1)
    {df_cap}
), wtd AS (
    SELECT {id_col}, tf.term, CAST(tf * (1 + idf2) AS BIGINT) AS w
    FROM tf JOIN idf ON tf.term = idf.term
), norms AS (
    SELECT {id_col}, SUM(w * w) AS n2 FROM wtd GROUP BY 1
), q AS (
    SELECT {id_col} AS query_id, term, w AS wq FROM wtd
    WHERE ('0x' || substr(md5('{query_salt}:' || {id_col}), 1, 15))::BIGINT % 10000
          < {query_rate_bp}
), dots AS (
    SELECT q.query_id, wtd.{id_col}, SUM(q.wq * wtd.w) AS dot
    FROM q JOIN wtd ON q.term = wtd.term
    WHERE q.query_id <> wtd.{id_col}
    GROUP BY 1, 2
), scored AS (
    SELECT query_id, d.{id_col},
           CAST(FLOOR(10000 * (dot / (sqrt(na.n2) * sqrt(nb.n2)))) AS BIGINT)
             AS cos_bp
    FROM dots d
    JOIN norms na ON d.query_id = na.{id_col}
    JOIN norms nb ON d.{id_col} = nb.{id_col}
), ranked AS (
    SELECT query_id, {id_col}, cos_bp,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cos_bp DESC, {id_col} ASC) AS rank
    FROM scored
)
SELECT query_id, {id_col}, cos_bp, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""
