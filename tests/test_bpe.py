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


def test_bpe_encode_hand_example_and_passthrough(spark):
    """Encoding with an explicit merge list must chain runs left-to-right
    (aaaa + merge(a,a) -> [aa, aa]), apply later merges over earlier
    outputs, pass non-alphabetic words through unsplit, and report the
    order-sensitive sequence hash."""
    import hashlib

    from test_flink_spark.operators.bpe import bpe_encode

    df = spark.createDataFrame(
        [(1, "aaaa abab x9 zz")], "doc_id LONG, text STRING"
    )
    # merge 1: 'a a' -> 'aa'; merge 2: 'aa aa' -> 'aaaa'
    out = bpe_encode(df, ["a a", "aa aa"]).collect()[0]
    # 'aaaa' -> [aa, aa] -> [aaaa]; 'abab' -> a b a b (no 'a a' adjacency);
    # 'x9' fails ^[a-z]+$ -> opaque token; 'zz' -> z z (no merge learned)
    toks = ["aaaa", "a", "b", "a", "b", "x9", "z", "z"]
    assert out["n_bpe_tokens"] == len(toks)
    assert out["enc_md5"] == hashlib.md5("|".join(toks).encode()).hexdigest()


def test_bpe_encode_uses_learned_merges_consistently(spark):
    """text_bpe_encode must encode with EXACTLY the merges text_bpe_merges
    reports (shared memoized learning)."""
    from test_flink_spark.operators.bpe import bpe_encode
    from test_flink_spark.plans.advanced import text_bpe_encode, text_bpe_merges
    from test_flink_spark.schemas import load_table

    sf = "/root/testdata/sf0.001"
    merges = [
        r["pair"]
        for r in sorted(
            text_bpe_merges(spark, sf).collect(), key=lambda r: r["merge_round"]
        )
    ]
    docs = load_table(spark, sf, "documents")
    direct = {
        (r["doc_id"], r["n_bpe_tokens"], r["enc_md5"])
        for r in bpe_encode(docs, merges).collect()
    }
    via_query = {
        (r["doc_id"], r["n_bpe_tokens"], r["enc_md5"])
        for r in text_bpe_encode(spark, sf).collect()
    }
    assert direct == via_query
