"""BPE merge-learning contracts (operators/bpe.py): canonical
left-to-right chaining on same-symbol runs (the wrapped-symbol replace
trick) and a hand-computed merge sequence on a tiny corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from test_flink_spark.operators import bpe


def test_run_chaining_is_canonical(spark):
    """'aaaa' + merge(a,a) must become 'aa aa' — a naive single-space
    representation eats the separator and stops at 'aa a a'."""
    df = spark.createDataFrame([("aaaa",)], "word STRING").withColumn(
        "seq", F.regexp_replace("word", "(.)", " $1 ")
    )
    merged = bpe._apply_merge(df, "a a").collect()[0]["seq"]
    assert merged == " aa  aa "


def test_learned_merges_match_hand_computation(spark):
    # word types: 'aaab' x2, 'ab' x1
    docs = spark.createDataFrame(
        [(1, "aaab aaab"), (2, "ab")], "doc_id BIGINT, text STRING"
    )
    rows = bpe.bpe_learn(spark, docs, "text", n_merges=3).collect()
    got = [(r["merge_round"], r["pair"], r["pair_count"]) for r in rows]
    # r1: 'a a' appears 2x in 'aaab' (x2 words) = 4;  'a b' = 2+1 = 3
    # r2: after 'aaab'->'aa a b': 'a b' = 2+1 = 3 beats 'aa a' = 2
    # r3: after 'aaab'->'aa ab', 'ab'->'ab': 'aa ab' = 2
    assert got == [(1, "a a", 4), (2, "a b", 3), (3, "aa ab", 2)]


def test_non_ascii_and_case_normalization(spark):
    # uppercase folds in; non-[a-z] tokens are excluded from the alphabet
    docs = spark.createDataFrame(
        [(1, "ABBA abba 123 ab-ba")], "doc_id BIGINT, text STRING"
    )
    rows = bpe.bpe_learn(spark, docs, "text", n_merges=1).collect()
    # only word type 'abba' (x2) survives: pairs 'a b','b b','b a' each 2
    # -> tie broken by pair ASC: 'a b'
    assert [(r["pair"], r["pair_count"]) for r in rows] == [("a b", 2)]
