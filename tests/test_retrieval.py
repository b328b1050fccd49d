"""Behavior tests for BM25 retrieval (operators/retrieval.py) and the
model-based scorers (operators/importance.py).

The oracle sweep (tools/check_oracle.py) pins the arithmetic bit-for-bit
against DuckDB; these tests pin the SEMANTICS on constructed corpora where
the right answer is known by inspection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, lang STRING, text STRING")


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------

def test_bm25_tf_monotone_at_equal_length(spark):
    """Same doc length, same term: more occurrences -> higher score."""
    from test_flink_spark.operators.retrieval import bm25_topk

    docs = _docs(
        spark,
        [
            (1, "en", "cat cat cat dog bird fish"),
            (2, "en", "cat dog dog bird fish wolf"),
            (3, "en", "dog dog dog bird fish wolf"),
        ],
    )
    out = bm25_topk(docs, ["cat"], k=10).collect()
    by_doc = {r["doc_id"]: r for r in out}
    assert set(by_doc) == {1, 2}  # doc 3 has no 'cat'
    assert by_doc[1]["tf"] == 3 and by_doc[2]["tf"] == 1
    assert by_doc[1]["score"] > by_doc[2]["score"]
    assert by_doc[1]["rank"] == 1 and by_doc[2]["rank"] == 2


def test_bm25_length_normalization_penalizes_long_docs(spark):
    """Equal tf: the longer document scores lower (b > 0)."""
    from test_flink_spark.operators.retrieval import bm25_topk

    docs = _docs(
        spark,
        [
            (1, "en", "cat dog"),
            (2, "en", "cat dog bird fish wolf bear lion tiger"),
            (3, "en", "dog bird fish wolf"),
        ],
    )
    out = {r["doc_id"]: r for r in bm25_topk(docs, ["cat"], k=10).collect()}
    assert out[1]["tf"] == out[2]["tf"] == 1
    assert out[1]["dl"] == 2 and out[2]["dl"] == 8
    assert out[1]["score"] > out[2]["score"]


def test_bm25_rarer_term_has_higher_idf(spark):
    """tf=1 everywhere: the term appearing in fewer docs outranks on score."""
    from test_flink_spark.operators.retrieval import bm25_topk

    docs = _docs(
        spark,
        [
            (1, "en", "common rare x y"),
            (2, "en", "common a b c"),
            (3, "en", "common d e f"),
            (4, "en", "common g h i"),
        ],
    )
    out = bm25_topk(docs, ["common", "rare"], k=10)
    doc1 = {r["term"]: r["score"] for r in out.filter(F.col("doc_id") == 1).collect()}
    assert doc1["rare"] > doc1["common"]


def test_bm25_rank_is_dense_and_capped(spark):
    from test_flink_spark.operators.retrieval import bm25_topk

    docs = _docs(
        spark, [(i, "en", "cat " + "pad " * (i % 3)) for i in range(1, 8)]
    )
    out = bm25_topk(docs, ["cat"], k=3).collect()
    assert sorted(r["rank"] for r in out) == [1, 2, 3]
    assert all(r["term"] == "cat" for r in out)


def test_bm25_empty_query_terms_raises(spark):
    from test_flink_spark.operators.retrieval import bm25_topk

    with pytest.raises(ValueError):
        bm25_topk(_docs(spark, [(1, "en", "a")]), [])


# ---------------------------------------------------------------------------
# Hashed linear quality classifier
# ---------------------------------------------------------------------------

def test_linear_quality_scores_shape_and_consistency(spark):
    from test_flink_spark.operators.importance import linear_quality_scores

    docs = _docs(
        spark,
        [(1, "en", "alpha beta gamma"), (2, "en", "alpha alpha"), (3, "zh", "  ")],
    )
    rows = {r["doc_id"]: r for r in linear_quality_scores(docs).collect()}
    # doc 3 is whitespace-only: no tokens -> no row (same as the oracle).
    assert set(rows) == {1, 2}
    assert rows[1]["n_tokens"] == 3 and rows[2]["n_tokens"] == 2
    for r in rows.values():
        assert r["label"] == (r["score_sum"] > 0)
        assert abs(r["score"] - r["score_sum"] / r["n_tokens"]) < 1e-3
    # Repeated token contributes the same weight twice.
    assert rows[2]["score_sum"] % 2 == 0


def test_linear_quality_weights_are_bounded_and_deterministic(spark):
    from test_flink_spark.operators.importance import (
        bucket_weight,
        feature_bucket,
        N_FEATURES,
    )

    df = spark.range(0, 200).select(
        feature_bucket(F.col("id").cast("string")).alias("b")
    )
    w = df.select("b", bucket_weight(F.col("b")).alias("w")).collect()
    assert all(0 <= r["b"] < N_FEATURES for r in w)
    assert all(-1000 <= r["w"] <= 1000 for r in w)
    again = df.select("b", bucket_weight(F.col("b")).alias("w")).collect()
    assert sorted(map(tuple, w)) == sorted(map(tuple, again))


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------

def test_dsir_upweights_target_like_documents(spark):
    """Docs written in the target slice's vocabulary get strictly higher
    weights than docs in the out-of-target vocabulary."""
    from test_flink_spark.operators.importance import dsir_weights

    rows = [(i, "en", "alpha alpha beta") for i in range(10)]
    rows += [(100 + i, "zh", "gamma gamma delta") for i in range(10)]
    # One doc per side written in the OTHER side's vocabulary.
    rows += [(200, "zh", "alpha alpha beta"), (201, "en", "gamma gamma delta")]
    out = {r["doc_id"]: r for r in dsir_weights(_docs(spark, rows)).collect()}
    # Target-vocabulary text scores higher than raw-vocabulary text
    # regardless of the doc's own lang tag (DSIR scores CONTENT).
    assert out[200]["dsir_weight"] > out[201]["dsir_weight"]
    assert out[0]["dsir_weight"] > out[100]["dsir_weight"]
    # And the weight is a pure function of the text.
    assert out[0]["dsir_fp"] == out[200]["dsir_fp"]
    assert out[100]["dsir_fp"] == out[201]["dsir_fp"]


def test_dsir_fixed_point_is_order_free(spark):
    """Repartitioning cannot change the bigint fixed-point sums."""
    from test_flink_spark.operators.importance import dsir_weights

    rows = [(i, "en" if i % 3 else "zh", f"w{i % 7} w{i % 5} w{i % 11} common")
            for i in range(60)]
    docs = _docs(spark, rows)
    a = {r["doc_id"]: r["dsir_fp"] for r in dsir_weights(docs).collect()}
    b = {
        r["doc_id"]: r["dsir_fp"]
        for r in dsir_weights(docs.repartition(7)).collect()
    }
    assert a == b


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion
# ---------------------------------------------------------------------------

def _ranks(spark, rows):
    return spark.createDataFrame(
        rows, "query_id BIGINT, neighbor_id BIGINT, rank BIGINT"
    )


def test_rrf_consensus_beats_single_ranker(spark):
    """A doc ranked by BOTH rankers outranks a doc that tops only one:
    1/61 + 1/62 > 1/61 + 0."""
    from test_flink_spark.operators.retrieval import rrf_fuse

    a = _ranks(spark, [(1, 10, 1), (1, 11, 2)])
    b = _ranks(spark, [(1, 10, 2), (1, 12, 1)])
    out = {r["neighbor_id"]: r for r in rrf_fuse(a, b, topk=5).collect()}
    assert out[10]["rank"] == 1  # consensus doc wins
    assert out[10]["rrf_score"] > out[12]["rrf_score"]
    assert out[10]["rrf_score"] > out[11]["rrf_score"]
    # single-ranker docs keep their one contribution
    assert abs(out[12]["rrf_score"] - round(1.0 / 61, 6)) < 1e-9
    assert abs(out[11]["rrf_score"] - round(1.0 / 62, 6)) < 1e-9


def test_rrf_topk_cap_and_tiebreak(spark):
    from test_flink_spark.operators.retrieval import rrf_fuse

    a = _ranks(spark, [(1, n, n) for n in range(1, 8)])
    b = _ranks(spark, [(1, n, n) for n in range(1, 8)])
    out = rrf_fuse(a, b, topk=3).collect()
    assert sorted(r["rank"] for r in out) == [1, 2, 3]
    # equal input ranks -> equal scores; neighbor_id ascending breaks ties
    a2 = _ranks(spark, [(1, 20, 1), (1, 10, 1)])
    b2 = _ranks(spark, [(2, 99, 1)])
    out2 = rrf_fuse(a2.union(b2), b2.union(a2), topk=5).collect()
    q1 = sorted(
        (r for r in out2 if r["query_id"] == 1), key=lambda r: r["rank"]
    )
    assert [r["neighbor_id"] for r in q1] == [10, 20]


def test_rrf_registered_query_fuses_component_rankers(spark):
    """Fleet-level sanity at smoke SF: every fused row's contributions are
    explainable from the two component rankers' output."""
    from test_flink_spark.plans.llm_data import (
        embedding_cosine_topk,
        embedding_hybrid_rrf,
        embedding_ivf_ann,
    )

    sf = "/root/testdata/sf0.001"
    dense = {
        (r["query_id"], r["neighbor_id"]): r["rank"]
        for r in embedding_cosine_topk(spark, sf).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"]): r["rank"]
        for r in embedding_ivf_ann(spark, sf).collect()
    }
    fused = embedding_hybrid_rrf(spark, sf).collect()
    assert fused
    for r in fused:
        key = (r["query_id"], r["neighbor_id"])
        expect = 0.0
        if key in dense:
            expect += 1.0 / (60 + dense[key])
        if key in ivf:
            expect += 1.0 / (60 + ivf[key])
        assert key in dense or key in ivf
        assert abs(r["rrf_score"] - round(expect, 6)) < 1e-9
