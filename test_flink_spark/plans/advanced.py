"""Round-5 query assemblies: mergeable sketches (HLL / KMV / count-min),
each registered with a FULL algorithm-replay DuckDB oracle — the sketch
estimators themselves are value-hash-checked, closing the gap that kept
`approx_aggregates` (Spark's built-in engine-specific sketches) as the
fleet's one rows-only row.  `approx_aggregates` stays registered as the
built-in-sketch demo; these are the checked, mergeable, 100 TB-shaped
equivalents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import bpe
from ..operators import graph as gr
from ..operators import sampling
from ..operators import sketch as sk
from .relational import _t

# ---------------------------------------------------------------------------
# HyperLogLog distinct users per event type.
# ---------------------------------------------------------------------------


def sketch_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """256-register HLL per event_type.  Shuffle out is <= |types| * 256
    register rows with map-side partial max — the register table is the
    mergeable artifact a 100 TB pipeline persists per day/partition.
    Accuracy (rsd ~6.5%) is pinned against exact counts in pytest, not
    here: an exact countDistinct column would reintroduce the O(distinct)
    shuffle the sketch exists to avoid."""
    ev = _t(spark, sf_dir, "events")
    return sk.hll_distinct(ev, "user_id", ["event_type"])


_HLL_SQL = sk.hll_oracle_sql("events", "user_id", ["event_type"])


# ---------------------------------------------------------------------------
# KMV bottom-k distinct users per event type.
# ---------------------------------------------------------------------------


def sketch_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-64 KMV distinct estimate per event_type; exact below k."""
    ev = _t(spark, sf_dir, "events")
    return sk.kmv_distinct(ev, "user_id", ["event_type"])


_KMV_SQL = sk.kmv_oracle_sql("events", "user_id", ["event_type"])


# ---------------------------------------------------------------------------
# Count-min heavy hitters.
# ---------------------------------------------------------------------------

_CMS_TOP_N = 10


def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a 4x1024 count-min sketch over event user_ids (bounded 4096-row
    aggregate) and point-query it for the top-10 exact heavy hitters:
    ``(user_id, exact_cnt, cms_est)`` with cms_est >= exact_cnt by
    construction (pinned in pytest).  The exact candidate pass exists to
    exhibit estimator error in the checked output; a 100 TB deployment
    queries the sketch for externally-supplied keys instead."""
    ev = _t(spark, sf_dir, "events")
    sketch = sk.cms_build(ev, "user_id")
    cand = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), F.col("user_id").asc())
        .limit(_CMS_TOP_N)
    )
    est = sk.cms_estimate(sketch, cand.select("user_id"), "user_id")
    return cand.join(F.broadcast(est), "user_id").select(
        "user_id", F.col("exact_cnt").cast("long").alias("exact_cnt"), "cms_est"
    )


_CMS_SQL = sk.cms_oracle_sql("events", "user_id", _CMS_TOP_N)


# ---------------------------------------------------------------------------
# PageRank over the supplier<->customer trade graph.
# ---------------------------------------------------------------------------

_PR_ITERATIONS = 5


def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (5 power iterations, fixed-point int64) over the symmetrized
    bipartite supplier<->customer graph: an edge per distinct
    (l_suppkey, o_custkey) trading pair from lineitem ⋈ orders.
    Symmetrization guarantees out-degree >= 1 everywhere (no dangling
    mass).  The edge build is the fact-fact sort-merge join; each
    iteration is one ranks->edges equi-join + one partial-agg groupBy —
    see operators/graph.py for the 100 TB iteration shape."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    base = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .select(
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias("s"),
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias("c"),
        )
        .distinct()
    )
    edges = base.select(F.col("s").alias("src"), F.col("c").alias("dst")).unionAll(
        base.select(F.col("c").alias("src"), F.col("s").alias("dst"))
    )
    return gr.pagerank(edges, _PR_ITERATIONS)


_PR_EDGES_SQL = """
WITH base AS (
  SELECT DISTINCT 'S' || l_suppkey AS s, 'C' || o_custkey AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT s AS src, c AS dst FROM base
UNION ALL
SELECT c AS src, s AS dst FROM base
"""

_PAGERANK_SQL = (
    "WITH "
    + gr.pagerank_oracle_cte(_PR_EDGES_SQL, _PR_ITERATIONS)
    + f"\nSELECT node, rank_fp FROM r{_PR_ITERATIONS}"
)


# ---------------------------------------------------------------------------
# BPE merge learning over the documents corpus.
# ---------------------------------------------------------------------------

_BPE_MERGES = 3


def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 3 BPE merges learned from the documents corpus (word-type
    weighted pair counting, canonical left-to-right application) — see
    operators/bpe.py for the wrapped-symbol replace trick and scale
    shape."""
    docs = _t(spark, sf_dir, "documents")
    return bpe.bpe_learn(spark, docs, "text", _BPE_MERGES)


_BPE_SQL = bpe.bpe_oracle_sql("documents", "text", _BPE_MERGES)


# ---------------------------------------------------------------------------
# Weighted sampling: 200 docs with inclusion probability ~ length.
# ---------------------------------------------------------------------------

_WSAMPLE_K = 200


def corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-Poisson pps sample (operators/sampling.py): priority =
    hash div n_chars, keep the k smallest — one narrow projection + a
    TakeOrderedAndProject top-k, the deterministic length-weighted
    subsampling shape for 100 TB corpora."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return sampling.weighted_sample(docs, _WSAMPLE_K, "n_chars")


_WSAMPLE_SQL = sampling.weighted_sample_oracle_sql(
    "documents", _WSAMPLE_K, "n_chars", select="doc_id, n_chars"
)


QUERIES = {
    "sketch_hll_distinct_users": sketch_hll_distinct_users,
    "sketch_kmv_distinct_users": sketch_kmv_distinct_users,
    "sketch_cms_heavy_hitters": sketch_cms_heavy_hitters,
    "graph_pagerank_trade": graph_pagerank_trade,
    "text_bpe_merges": text_bpe_merges,
    "corpus_weighted_sample": corpus_weighted_sample,
}

ORACLES = {
    "corpus_weighted_sample": _WSAMPLE_SQL,
    "graph_pagerank_trade": _PAGERANK_SQL,
    "text_bpe_merges": _BPE_SQL,
    "sketch_hll_distinct_users": _HLL_SQL,
    "sketch_kmv_distinct_users": _KMV_SQL,
    "sketch_cms_heavy_hitters": _CMS_SQL,
}
