"""Dataset-assembly operator tests: deterministic splits/samples, repetition
scoring, token-window chunking (the differential oracle covers parity with
DuckDB; these pin the operator CONTRACTS on constructed inputs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from test_flink_spark.operators.sampling import (
    deterministic_sample,
    train_val_test_split,
)
from test_flink_spark.operators.text import chunk_token_windows, repetition_scores


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_split_is_deterministic_and_partitioning_invariant(spark):
    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    a = train_val_test_split(df).select("doc_id", "split")
    b = train_val_test_split(df.repartition(7)).select("doc_id", "split")
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0
    # rates land near the configured weights (hash uniformity)
    frac = {
        r["split"]: r["n"] / 2000
        for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert abs(frac["train"] - 0.9) < 0.03
    assert abs(frac.get("val", 0) - 0.05) < 0.02
    assert abs(frac.get("test", 0) - 0.05) < 0.02
    # splits partition the input: every row exactly one split
    assert a.count() == 2000


def test_split_rejects_bad_weights(spark):
    df = spark.range(10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        train_val_test_split(df, weights=(0.5, 0.2, 0.2))


def test_samples_are_nested_and_stable(spark):
    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    s10 = set(r["doc_id"] for r in deterministic_sample(df, 0.10).collect())
    s25 = set(r["doc_id"] for r in deterministic_sample(df, 0.25).collect())
    assert s10 <= s25  # threshold sampling nests by construction
    assert abs(len(s10) / 2000 - 0.10) < 0.03
    # a different salt draws an (essentially) independent sample
    other = set(
        r["doc_id"] for r in deterministic_sample(df, 0.10, salt="fold2").collect()
    )
    assert other != s10


def test_repetition_scores_on_constructed_docs(spark):
    df = _docs(
        spark,
        [
            (1, "a b a b a b"),       # bigrams: ab ba ab ba ab -> top 'a b' 3/5
            (2, "w x y z"),           # all distinct
            (3, "solo"),              # <2 words: no row
        ],
    )
    got = {r["doc_id"]: r for r in repetition_scores(df).collect()}
    assert set(got) == {1, 2}
    assert got[1]["n_bigrams"] == 5
    assert got[1]["n_distinct_bigrams"] == 2
    assert got[1]["top_bigram_share"] == pytest.approx(0.6)
    assert got[2]["distinct_bigram_ratio"] == pytest.approx(1.0)


def test_chunk_token_windows_exact_layout(spark):
    # 10 tokens, size 4, stride 3 -> chunks at 0,3,6 cover token 10? last
    # window must REACH the final token: 1 + ceil((10-4)/3) = 3 chunks,
    # starts 0,3,6 -> covers tokens 1..10
    text = " ".join(f"t{i}" for i in range(1, 11))
    df = _docs(spark, [(1, text)])
    rows = sorted(
        (r["chunk_idx"], r["chunk_text"], r["n_chunk_tokens"])
        for r in chunk_token_windows(df, chunk_size=4, stride=3).collect()
    )
    assert rows == [
        (0, "t1 t2 t3 t4", 4),
        (1, "t4 t5 t6 t7", 4),
        (2, "t7 t8 t9 t10", 4),
    ]
    # short doc: one (short) chunk
    short = chunk_token_windows(_docs(spark, [(2, "a b")]), 4, 3).collect()
    assert [(r["chunk_idx"], r["chunk_text"], r["n_chunk_tokens"]) for r in short] == [
        (0, "a b", 2)
    ]
    with pytest.raises(ValueError):
        chunk_token_windows(df, chunk_size=4, stride=5)


def test_chunk_token_windows_is_shuffle_free(spark):
    """Chunking must stay map-side: no Exchange in the plan."""
    import contextlib
    import io

    from test_flink_spark.schemas import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        chunk_token_windows(docs).explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_pack_by_token_budget_semantics(spark):
    """Packs are contiguous in order, never split a chunk, and only exceed
    the budget by a straddling chunk's tail (overflow-at-boundary)."""
    from test_flink_spark.operators.text import pack_by_token_budget

    chunks = spark.createDataFrame(
        [(1, 0, 60), (1, 1, 60), (2, 0, 60), (2, 1, 10), (3, 0, 120)],
        "doc_id long, chunk_idx long, n_chunk_tokens long",
    )
    rows = sorted(
        (r["doc_id"], r["chunk_idx"], r["pack_id"])
        for r in pack_by_token_budget(chunks, budget=100).collect()
    )
    # exclusive cumsums: 0,60,120,180,190 -> packs 0,0,1,1,1
    assert rows == [(1, 0, 0), (1, 1, 0), (2, 0, 1), (2, 1, 1), (3, 0, 1)]
    # pack ids are non-decreasing along the order (contiguity)
    ids = [p for _, _, p in rows]
    assert ids == sorted(ids)
    with pytest.raises(ValueError):
        pack_by_token_budget(chunks, budget=0)


def test_temperature_mix_flattens_skew(spark):
    """alpha=0.5 weighting must sample the dominant domain at a LOWER
    rate than the rare one, while keeping the total near target_frac."""
    from test_flink_spark.operators.sampling import (
        temperature_sample,
        temperature_thresholds,
    )

    rows = [(f"d{i}", "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id STRING, source STRING")
    th = {r["source"]: r.asDict() for r in temperature_thresholds(df).collect()}
    # 1000x-scaled weights: big=30000, small=10000 -> targets 375/900 vs
    # 125/100 (capped); thresholds unchanged vs the unscaled form
    assert th["big"]["weight"] == 30_000 and th["small"]["weight"] == 10_000
    assert th["small"]["threshold"] == 10_000  # rare domain fully kept
    assert th["big"]["threshold"] < 5_000  # dominant domain down-sampled
    sampled = temperature_sample(df)
    by_src = {
        r["source"]: r["n"]
        for r in sampled.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src["small"] == 100  # threshold 10000 keeps everything
    # realized big-domain rate tracks its threshold (hash noise ~ +-2%)
    assert abs(by_src["big"] / 900 - th["big"]["threshold"] / 10_000) < 0.05


def test_temperature_sample_is_deterministic_and_subset(spark):
    from test_flink_spark.operators.sampling import temperature_sample

    rows = [(f"d{i}", f"s{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id STRING, source STRING")
    a = {r["doc_id"] for r in temperature_sample(df).collect()}
    b = {r["doc_id"] for r in temperature_sample(df.repartition(7)).collect()}
    assert a == b  # stable under re-partitioning
    assert a <= {r[0] for r in rows}


def test_dedup_blocks_drops_repeats_preserves_order(spark):
    from test_flink_spark.operators.text import dedup_blocks

    a = " ".join(f"w{i}" for i in range(8))
    b = " ".join(f"x{i}" for i in range(8))
    rows = [
        (1, f"{a} {b} {a}"),          # block A repeated -> dropped
        (2, f"{b} {a}"),              # no repeats -> untouched
        (3, "short text"),            # single partial block
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r["doc_id"]: r for r in dedup_blocks(df).collect()}
    assert out[1]["n_blocks"] == 3 and out[1]["n_unique_blocks"] == 2
    assert out[1]["clean_text"] == f"{a} {b}"  # first occurrences, in order
    assert out[2]["clean_text"] == f"{b} {a}"
    assert out[3]["n_blocks"] == 1 and out[3]["clean_text"] == "short text"
    assert abs(out[1]["dropped_ratio"] - round(1 - 2 / 3, 4)) < 1e-9


def test_epoch_upsample_balances_to_largest(spark):
    from test_flink_spark.operators.sampling import epoch_upsample, hash_bucket

    rows = [(i, "big" if i < 100 else "small") for i in range(140)]
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING")
    up = epoch_upsample(df, max_epochs=4.0)
    per_doc = {
        (r["doc_id"]): r["n"]
        for r in up.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    # big source (the largest): exactly one epoch each
    assert all(per_doc[i] == 1 for i in range(100))
    # small source: 100_000 div 40 = 2500 milli-epochs -> 2 copies + 50% extra
    extra = {
        r["doc_id"]
        for r in df.filter("source = 'small'")
        .filter(hash_bucket(F.col("doc_id"), "epoch", 1000) < 500)
        .collect()
    }
    for i in range(100, 140):
        assert per_doc[i] == (3 if i in extra else 2)
    # epoch indices are contiguous from 0
    eps = up.filter("doc_id = 120").select("epoch").collect()
    assert sorted(r["epoch"] for r in eps) == list(range(per_doc[120]))


def test_epoch_upsample_cap_and_determinism(spark):
    from test_flink_spark.operators.sampling import epoch_upsample

    rows = [(i, "big" if i < 1000 else "tiny") for i in range(1004)]
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING")
    up = epoch_upsample(df, max_epochs=2.5)
    n_tiny = up.filter("source = 'tiny'").count()
    # uncapped ratio would be 250 epochs; the cap holds at <= 2.5 per doc
    assert n_tiny <= 3 * 4 and n_tiny >= 2 * 4
    a = sorted(up.collect())
    b = sorted(epoch_upsample(df.repartition(5), max_epochs=2.5).collect())
    assert a == b
    with pytest.raises(ValueError):
        epoch_upsample(df, max_epochs=0.5)


# ---------------------------------------------------------------------------
# Weighted sampling (sequential Poisson)
# ---------------------------------------------------------------------------


def test_weighted_sample_is_length_biased_and_deterministic(spark):
    from test_flink_spark.operators.sampling import weighted_sample
    from test_flink_spark.schemas import load_table

    docs = load_table(spark, "/root/testdata/sf0.01", "documents").select(
        "doc_id", "n_chars"
    )
    k = 200
    s1 = weighted_sample(docs, k, "n_chars")
    assert s1.count() == k
    # deterministic under re-evaluation and repartitioning
    s2 = weighted_sample(docs.repartition(7), k, "n_chars")
    assert s1.exceptAll(s2).count() == 0 and s2.exceptAll(s1).count() == 0
    # inclusion probability ~ length -> sampled docs are longer on average
    import pyspark.sql.functions as F

    mean_all = docs.agg(F.avg("n_chars")).collect()[0][0]
    mean_sample = s1.agg(F.avg("n_chars")).collect()[0][0]
    assert mean_sample > mean_all * 1.1, (mean_sample, mean_all)


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from test_flink_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 10), (2, 0), (3, -5), (4, 7)], "doc_id BIGINT, w BIGINT"
    )
    rows = weighted_sample(df, 10, "w").collect()
    assert sorted(r["doc_id"] for r in rows) == [1, 4]
