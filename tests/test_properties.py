"""Property-based spot checks (SURVEY.md §5.2 item 5, hypothesis): window
assignment invariants and aggregation algebra over random event sets."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from test_flink_spark.operators.windows import sliding_count, tumbling_count

events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=0, max_value=7_200_000),  # 0..2h in ms
    ),
    min_size=1,
    max_size=40,
)


def _df(spark, rows):
    df = spark.createDataFrame(rows, "key STRING, t BIGINT")
    return df.select("key", F.timestamp_millis(F.col("t")).alias("ts"))


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=events_strategy)
def test_tumbling_partitions_events_exactly_once(spark, rows):
    # Σ window counts == #events (every event in exactly one tumbling window)
    out = tumbling_count(_df(spark, rows), "ts", ["key"], "30 seconds").collect()
    assert sum(r["cnt"] for r in out) == len(rows)
    # each event's window end is the next 30 s boundary after it
    for key, t in rows:
        end = (t // 30_000 + 1) * 30_000
        assert any(r["key"] == key and r["window_end"] == end for r in out)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=events_strategy)
def test_sliding_multiplicity_is_size_over_slide(spark, rows):
    # Σ window counts == #events × (size/slide)
    out = sliding_count(_df(spark, rows), "ts", ["key"], "1 hour", "5 minutes").collect()
    assert sum(r["cnt"] for r in out) == len(rows) * 12


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=events_strategy)
def test_count_union_equals_sum_of_counts(spark, rows):
    df = _df(spark, rows)
    half = len(rows) // 2
    a, b = _df(spark, rows[:half] or [("a", 0)]), _df(spark, rows[half:] or [("a", 0)])
    total = a.unionByName(b).groupBy("key").count().collect()
    ca = {r["key"]: r["count"] for r in a.groupBy("key").count().collect()}
    cb = {r["key"]: r["count"] for r in b.groupBy("key").count().collect()}
    for r in total:
        assert r["count"] == ca.get(r["key"], 0) + cb.get(r["key"], 0)


asof_events = st.lists(
    st.tuples(st.sampled_from(["u", "v"]), st.integers(min_value=0, max_value=10_000)),
    min_size=1,
    max_size=25,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(left_rows=asof_events, right_rows=asof_events)
def test_asof_join_matches_pandas_merge_asof(spark, left_rows, right_rows):
    """operators/joins.py::asof_join ≡ pandas merge_asof(by=key,
    direction='backward') on arbitrary inputs (modulo duplicate-timestamp
    ties, which pandas resolves by position — deduplicate to avoid)."""
    import pandas as pd

    from test_flink_spark.operators.joins import asof_join

    # dedupe (key, ts) on both sides: tie order is engine-defined otherwise
    left_rows = list({(k, t): None for k, t in left_rows})
    right_rows = list({(k, t): None for k, t in right_rows})
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)], "id LONG, k STRING, t BIGINT"
    ).select("id", "k", F.timestamp_millis(F.col("t")).alias("ts"))
    # every 7th timestamp carries a NULL value: row-matching semantics must
    # surface the matched row's NULL, not skip to an older non-null row
    def _v(t):
        return None if t % 7 == 0 else float(t)

    right = spark.createDataFrame(
        [(k, t, _v(t)) for k, t in right_rows], "k STRING, t BIGINT, v DOUBLE"
    ).select("k", F.timestamp_millis(F.col("t")).alias("ts"), "v")

    got = {
        r["id"]: r["v"]
        for r in asof_join(left, right, ["k"], "ts", "ts", ["v"]).collect()
    }

    lp = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)], columns=["id", "k", "t"]
    ).sort_values("t", kind="mergesort")
    rp = pd.DataFrame(
        [(k, t, _v(t)) for k, t in right_rows], columns=["k", "t", "v"]
    ).sort_values("t", kind="mergesort")
    exp_df = pd.merge_asof(lp, rp, on="t", by="k", direction="backward")
    exp = {int(r.id): (None if pd.isna(r.v) else float(r.v)) for r in exp_df.itertuples()}
    assert got == exp


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n_tokens=st.integers(min_value=0, max_value=120),
    chunk_size=st.integers(min_value=1, max_value=40),
    stride_frac=st.floats(min_value=0.1, max_value=1.0),
)
def test_chunk_windows_cover_every_token(spark, n_tokens, chunk_size, stride_frac):
    """Invariants of token-window chunking for ANY (size, stride<=size):
    chunk 0 starts at token 0; consecutive chunks advance by exactly
    stride; the final chunk reaches the last token; every token appears in
    >= 1 chunk; non-final chunks are full-size."""
    from test_flink_spark.operators.text import chunk_token_windows

    stride = max(1, int(chunk_size * stride_frac))
    toks = [f"t{i}" for i in range(n_tokens)]
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    rows = sorted(
        (r["chunk_idx"], r["chunk_text"], r["n_chunk_tokens"])
        for r in chunk_token_windows(df, chunk_size=chunk_size, stride=stride).collect()
    )
    assert rows, "at least one chunk always emitted"
    if n_tokens == 0:
        # documented wart shared with the oracle: split('') == [''] — one
        # chunk holding the single empty token
        assert rows == [(0, "", 1)]
        return
    covered = set()
    for idx, text, n in rows:
        start = idx * stride
        words = text.split()
        assert n == len(words)
        if idx < rows[-1][0]:
            assert n == chunk_size  # only the tail may be short
        assert words == toks[start : start + chunk_size]
        covered.update(range(start, start + len(words)))
    assert covered == set(range(n_tokens))


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    w=st.tuples(
        st.floats(min_value=0.05, max_value=0.9),
        st.floats(min_value=0.05, max_value=0.5),
    ).filter(lambda t: t[0] + t[1] < 0.99)
)
def test_split_weights_partition_exactly(spark, w):
    """For ANY valid weight vector: every row lands in exactly one split
    and observed rates track the weights (hash uniformity)."""
    from test_flink_spark.operators.sampling import train_val_test_split

    weights = (round(w[0], 2), round(w[1], 2), round(1 - w[0] - w[1], 2))
    if abs(sum(weights) - 1.0) > 1e-9:
        return  # rounding artifact — out of contract
    df = spark.range(3000).withColumnRenamed("id", "doc_id")
    out = train_val_test_split(df, weights=weights)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 3000
    for name, frac in zip(("train", "val", "test"), weights):
        assert abs(counts.get(name, 0) / 3000 - frac) < 0.05


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    left_rows=asof_events,
    right_rows=asof_events,
    direction=st.sampled_from(["forward", "nearest"]),
    tol=st.sampled_from([None, 500, 2000]),
)
def test_asof_join_directions_match_pandas(spark, left_rows, right_rows, direction, tol):
    """forward/nearest (optionally with tolerance) ≡ pandas merge_asof on
    arbitrary inputs — including per-side tolerance voiding before the
    nearest-choice."""
    import pandas as pd

    from test_flink_spark.operators.joins import asof_join

    left_rows = list({(k, t): None for k, t in left_rows})
    right_rows = list({(k, t): None for k, t in right_rows})
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)], "id LONG, k STRING, t BIGINT"
    ).select("id", "k", F.timestamp_millis(F.col("t")).alias("ts"))
    right = spark.createDataFrame(
        right_rows, "k STRING, t BIGINT"
    ).select("k", F.timestamp_millis(F.col("t")).alias("ts"), F.col("t").cast("double").alias("v"))

    got = {
        r["id"]: r["v"]
        for r in asof_join(
            left, right, ["k"], "ts", "ts", ["v"], tolerance_ms=tol, direction=direction
        ).collect()
    }

    lp = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)], columns=["id", "k", "t"]
    ).sort_values("t", kind="mergesort")
    rp = pd.DataFrame(
        [(k, t, float(t)) for k, t in right_rows], columns=["k", "t", "v"]
    ).sort_values("t", kind="mergesort")
    kwargs = {"tolerance": tol} if tol is not None else {}
    exp_df = pd.merge_asof(lp, rp, on="t", by="k", direction=direction, **kwargs)
    exp = {int(r.id): (None if pd.isna(r.v) else float(r.v)) for r in exp_df.itertuples()}
    assert got == exp


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    counts=st.lists(st.integers(min_value=1, max_value=400), min_size=2, max_size=6)
)
def test_temperature_thresholds_invariants(spark, counts):
    """For ANY source-size multiset: Σ target_docs never exceeds the
    budget T; per-source target rates are monotone DECREASING in source
    size (alpha<1 flattening); thresholds stay within [0, buckets]."""
    from test_flink_spark.operators.sampling import temperature_thresholds

    rows = [
        (f"d{s}_{i}", f"s{s}") for s, n in enumerate(counts) for i in range(n)
    ]
    df = spark.createDataFrame(rows, "doc_id STRING, source STRING")
    th = {r["source"]: r for r in temperature_thresholds(df, target_frac=0.5).collect()}
    total = sum(counts)
    t_budget = int(0.5 * total)
    assert sum(r["target_docs"] for r in th.values()) <= t_budget
    for r in th.values():
        assert 0 <= r["threshold"] <= 10_000
    # alpha=0.5: target rate m/n ~ 1/sqrt(n) -> bigger sources get smaller
    # rates (ties in weight can equalize, so compare only strictly-bigger
    # sources whose isqrt weights actually differ)
    rates = sorted(
        ((r["n_docs"], r["weight"], r["target_docs"] / r["n_docs"]) for r in th.values())
    )
    for (n1, w1, r1), (n2, w2, r2) in zip(rates, rates[1:]):
        if n2 > n1 and w2 > w1:
            # the IDEAL rate w/(W·n)·t is non-increasing in n (weights are
            # 1000x-scaled so weight quantization can't invert it for any
            # n <= 250k), but realized target_docs = (t·w) div W floors —
            # each side can lose up to one document, so the realized rate
            # may wobble by 1/n.  Hypothesis found counts=[97,99]: ideal
            # 0.49492 vs 0.49497 from a single floored doc.  Assert
            # flattening up to that integer-doc quantization bound.
            assert r2 <= r1 + 1.0 / n1 + 1.0 / n2 + 1e-9, (
                f"rate not flattening: n={n1}->{n2}, rate={r1}->{r2}"
            )
            # and the ideal (un-floored) rates must be strictly monotone
            ideal1, ideal2 = w1 / n1, w2 / n2
            assert ideal2 <= ideal1 + 1e-12, (
                f"ideal rate inverted: n={n1}->{n2}, w/n={ideal1}->{ideal2}"
            )


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.lists(st.sampled_from(list("abcd")), min_size=1, max_size=12).map(
            lambda ws: " ".join(ws)
        ),
        min_size=2,
        max_size=10,
    )
)
def test_span_ownership_invariants(spark, texts):
    """For every random corpus: span counts bound dup counts; dup_frac in
    [0,1]; identical texts are fully charged to exactly one owner (the
    min id); and the span-less short docs never flag."""
    from test_flink_spark.operators.span_dedup import span_ownership

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r["doc_id"]: r.asDict() for r in span_ownership(df, span_words=3).collect()}
    assert set(out) == set(range(len(texts)))  # every doc present
    first_by_text: dict[str, int] = {}
    for i, t in enumerate(texts):
        norm = " ".join(t.split())
        first_by_text.setdefault(norm, i)
    for i, t in enumerate(texts):
        r = out[i]
        assert 0 <= r["n_dup_spans"] <= r["n_spans"]
        assert 0.0 <= r["dup_frac"] <= 1.0
        n_words = len(t.split())
        if n_words < 3:
            assert r["n_spans"] == 0 and not r["flagged"]
        norm = " ".join(t.split())
        if first_by_text[norm] == i:
            continue
        # exact copy of an earlier doc: every span is borrowed
        if r["n_spans"] > 0:
            assert r["n_dup_spans"] == r["n_spans"] and r["dup_frac"] == 1.0


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-8.0, max_value=8.0, allow_nan=False, allow_infinity=False,
                width=32,
            ),
            min_size=4,
            max_size=4,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_quantize_int8_invariants(spark, vecs):
    """Codes stay in [-127,127]; the max-|component| hits ±127 unless the
    vector is all-zero; grid error never exceeds half a code."""
    from test_flink_spark.operators.quantize import (
        dequantize_error_stats,
        quantize_int8,
    )

    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    q = {r["vec_id"]: r.asDict() for r in quantize_int8(df).collect()}
    e = {r["vec_id"]: r.asDict() for r in dequantize_error_stats(df).collect()}
    for i, v in enumerate(vecs):
        codes = q[i]["codes"]
        assert all(-127 <= c <= 127 for c in codes)
        if any(x != 0.0 for x in v):
            assert max(abs(c) for c in codes) == 127
        else:
            assert codes == [0] * len(v)
        assert e[i]["max_abs_err_q"] <= 0.5


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    counts=st.lists(st.integers(min_value=1, max_value=60), min_size=2, max_size=4),
    cap=st.sampled_from([1.0, 1.5, 2.5, 4.0]),
)
def test_epoch_upsample_invariants(spark, counts, cap):
    """Per-doc copies are within [floor(e), ceil(e)] of the source's
    milli-epoch plan; the largest source gets exactly 1 copy per doc; and
    output never exceeds cap x input per source."""
    from test_flink_spark.operators.sampling import epoch_upsample

    rows = []
    base = 0
    for s, n in enumerate(counts):
        rows += [(base + j, f"s{s}") for j in range(n)]
        base += n
    df = spark.createDataFrame(rows, "doc_id LONG, source STRING")
    up = epoch_upsample(df, max_epochs=cap)
    per_source = {
        r["source"]: r["n"]
        for r in up.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    n_max = max(counts)
    for s, n in enumerate(counts):
        milli = min(round(cap * 1000), (n_max * 1000) // n)
        # every doc independently gets floor(e) or ceil(e) copies — the
        # per-SOURCE bound is n*floor(e)..n*ceil(e), not ceil(n*e)
        lo = (milli // 1000) * n
        hi = (milli // 1000 + (1 if milli % 1000 else 0)) * n
        assert lo <= per_source[f"s{s}"] <= hi
        if n == n_max:
            assert per_source[f"s{s}"] == n


# random word-salad docs over a tiny vocab: high collision probability, so
# both dup and non-dup cases are exercised
docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta"]),
        min_size=3,
        max_size=8,
    ),
    min_size=2,
    max_size=14,
)
split_strategy = st.integers(min_value=0, max_value=13)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(word_lists=docs_strategy, split=split_strategy)
def test_incremental_dedup_consistent_with_batch_for_any_split(
    spark, word_lists, split
):
    """For ANY corpus/shard split point, incremental_lsh_dedup over the
    corpus band index must flag exactly the shard docs that batch
    minhash_lsh_pairs (full set) pairs with a corpus doc or an earlier
    shard doc — and dup_of must be the smallest such match."""
    from test_flink_spark.operators.dedup import (
        incremental_lsh_dedup,
        lsh_band_keys,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(word_lists)]
    split = min(split, len(rows) - 1)
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    corpus = docs.filter(F.col("doc_id") < split)
    shard = docs.filter(F.col("doc_id") >= split)
    index = lsh_band_keys(minhash_signatures(corpus))
    inc = incremental_lsh_dedup(index, shard).collect()
    shard_ids = {r for r, _ in rows if r >= split}
    want: dict[int, int] = {}
    for r in minhash_lsh_pairs(docs).collect():
        a, b = r["id_a"], r["id_b"]  # a < b; ids ARE arrival order here
        if b in shard_ids:
            want[b] = min(want.get(b, a), a)
    got = {r["doc_id"]: r["dup_of"] for r in inc if r["is_dup"]}
    assert got == want
    assert {r["doc_id"] for r in inc} == shard_ids


@settings(deadline=None, max_examples=12, suppress_health_check=list(HealthCheck))
@given(
    words_a=st.lists(st.sampled_from("ab cd ef gh ij kl mn".split()), min_size=8, max_size=24),
    words_b=st.lists(st.sampled_from("pq rs tu vw xy".split()), min_size=8, max_size=24),
    overlap_at=st.integers(min_value=0, max_value=6),
)
def test_winnowing_shared_substring_guarantee(spark, words_a, words_b, overlap_at):
    """The winnowing THEOREM (Schleimer et al. 2003): two documents
    sharing a substring of >= w + k - 1 tokens share at least one
    fingerprint.  Plant a 6-token run (w=4, k=3 → guarantee length 6)
    from doc A inside doc B at an arbitrary offset and assert a
    fingerprint-set intersection — the property that makes winnowed
    fingerprints a sound dedup/plagiarism signal."""
    from test_flink_spark.operators.span_dedup import winnowing_fingerprints
    from pyspark.sql import functions as F

    shared = words_a[:6]
    assume_ok = len(shared) == 6
    if not assume_ok:
        return
    b_words = words_b[:overlap_at] + shared + words_b[overlap_at:]
    df = spark.createDataFrame(
        [(1, " ".join(words_a)), (2, " ".join(b_words))],
        "doc_id LONG, text STRING",
    )
    # raw fingerprint SETS (not the md5 digest): re-derive via the same
    # operator internals by asking for per-doc fps through a tiny shim
    from test_flink_spark.operators.dedup import _h60
    from test_flink_spark.operators.text import words as words_expr
    from pyspark.sql import Window

    k, w = 3, 4
    ws = words_expr(F.col("text"))
    idx = F.when(F.size(ws) >= k, F.sequence(F.lit(1), F.size(ws) - (k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(ws, i, k)))
    posed = df.select(
        F.col("doc_id"), F.posexplode(F.transform(grams, _h60)).alias("pos", "h")
    )
    by_pos = Window.partitionBy("doc_id").orderBy("pos")
    sel = (
        posed.withColumn("wmin", F.min("h").over(by_pos.rowsBetween(-(w - 1), 0)))
        .withColumn("selmax", F.max("wmin").over(by_pos.rowsBetween(0, w - 1)))
        .filter(F.col("h") == F.col("selmax"))
        .select("doc_id", "h")
        .distinct()
        .collect()
    )
    fps = {1: set(), 2: set()}
    for r in sel:
        fps[r["doc_id"]].add(r["h"])
    assert fps[1] & fps[2], (
        f"no shared fingerprint despite a {len(shared)}-token shared run "
        f"(>= w+k-1 = {w + k - 1})"
    )
    # and the summary operator agrees with the raw sets
    summary = {
        r["doc_id"]: r["n_fps"]
        for r in winnowing_fingerprints(df, k=k, w=w).collect()
    }
    assert summary[1] == len(fps[1]) and summary[2] == len(fps[2])


def test_lttb_matches_reference_implementation(spark):
    """The distributed LTTB must equal a direct single-machine reference
    implementation of the SAME fixed-anchor variant (prev/next bucket
    averages, rank bucketing, integer cross-product scores, t-then-pos
    ties) on a nontrivial series — pinning the whole selection pipeline,
    not just endpoints."""
    from test_flink_spark.operators.timeseries import lttb_downsample

    import random

    rng = random.Random(42)
    pts = [(i, i * 7 + 1000, rng.randrange(0, 10_000)) for i in range(200)]
    df = spark.createDataFrame(
        [("s", e, t, y) for e, t, y in pts],
        "k STRING, eid LONG, ts_ms LONG, cents LONG",
    )
    n_out = 12
    got = sorted(
        [
            (r["ord"], r["ts_ms"], r["cents"])
            for r in lttb_downsample(
                df, ["k"], "ts_ms", "cents", n_out=n_out, tiebreak_col="eid"
            ).collect()
        ]
    )

    # reference: same algorithm, plain python
    srt = sorted(pts, key=lambda p: (p[1], p[0]))
    n = len(srt)
    t0 = min(p[1] for p in srt)
    nb = n_out - 2
    buckets: dict[int, list[tuple[int, int, int, int]]] = {}
    for pos, (e, t, y) in enumerate(srt):
        if pos == 0:
            bkt = -1
        elif pos == n - 1:
            bkt = nb
        else:
            bkt = (pos - 1) * nb // (n - 2)
        buckets.setdefault(bkt, []).append((pos, e, t - t0, y))
    want = [(0, srt[0][1], srt[0][2]), (n_out - 1, srt[-1][1], srt[-1][2])]
    for b in range(nb):
        prev = buckets[b - 1]
        nxt = buckets[b + 1]
        ca, sa_t, sa_y = len(prev), sum(p[2] for p in prev), sum(p[3] for p in prev)
        cc, sc_t, sc_y = len(nxt), sum(p[2] for p in nxt), sum(p[3] for p in nxt)
        best = None
        for pos, e, tn, y in buckets[b]:
            score = abs(
                (sa_t - tn * ca) * (sc_y - y * cc)
                - (sa_y - y * ca) * (sc_t - tn * cc)
            )
            key = (-score, tn, pos)
            if best is None or key < best[0]:
                best = (key, (b + 1, tn + t0, y))
        want.append(best[1])
    assert got == sorted(want)


series_strategy = st.lists(
    st.tuples(
        st.sampled_from(["k1", "k2"]),
        st.integers(min_value=0, max_value=50),      # ordinate
        st.integers(min_value=-1000, max_value=1000),  # value
    ),
    min_size=2,
    max_size=30,
    unique_by=lambda t: (t[0], t[1]),  # one observation per (key, ord)
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=series_strategy)
def test_changepoint_binseg_matches_bruteforce(spark, rows):
    """The distributed binseg argmax must equal a driver-side exact
    brute force over every split: same split position (earliest on
    score ties at 10⁶ scale), same floored SSE-reduction gain."""
    from test_flink_spark.operators.timeseries import changepoint_binseg

    df = spark.createDataFrame(rows, "k STRING, o LONG, v LONG")
    got = {r["k"]: r for r in changepoint_binseg(df, ["k"], "o", "v").collect()}

    per_key: dict = {}
    for k, o, v in rows:
        per_key.setdefault(k, []).append((o, v))
    for k, series in per_key.items():
        series.sort()
        n = len(series)
        if n < 2:
            assert k not in got
            continue
        best = None  # (score_floored_1e6, -pos) maximized
        for pos in range(1, n):
            sl = sum(v for _, v in series[:pos])
            sr = sum(v for _, v in series[pos:])
            r_ = n - pos
            num = r_ * sl - pos * sr
            score = (num * num * 1_000_000) // (pos * r_)
            gain = (num * num) // (pos * r_ * n)
            if best is None or score > best[0]:
                best = (score, pos, gain, series[pos - 1][0], sl, sr)
        score, pos, gain, split_ord, sl, sr = best
        g = got[k]
        assert (g["split_ord"], g["left_n"], g["gain"]) == (split_ord, pos, gain), (
            k, dict(g.asDict()), best)
        assert g["left_sum"] == sl and g["right_sum"] == sr


docs_strategy = st.lists(
    st.text(alphabet=st.sampled_from("abcd "), min_size=0, max_size=60),
    min_size=2,
    max_size=8,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=docs_strategy)
def test_containment_matches_bruteforce_sets(spark, texts):
    """containment_pairs must equal the brute-force shingle-set
    computation: same pair set, same shared counts, same floored basis
    points — on arbitrary whitespace-soup documents (including empty
    and sub-3-word docs, which have no shingles and thus no pairs)."""
    import hashlib

    from test_flink_spark.operators.dedup import containment_pairs

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id LONG, text STRING")
    got = {
        (r["id_a"], r["id_b"]): (r["shared"], r["containment_bp"])
        for r in containment_pairs(df, threshold_bp=0).collect()
    }

    def shingle_set(text):
        w = text.strip().split()
        w = [x for x in w if x]
        grams = {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}
        return {
            int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams
        }

    sets = {i: shingle_set(t) for i, t in enumerate(texts)}
    expected = {}
    for a in sets:
        for b in sets:
            if a < b and sets[a] and sets[b]:
                inter = len(sets[a] & sets[b])
                if inter:
                    expected[(a, b)] = (
                        inter, inter * 10000 // min(len(sets[a]), len(sets[b]))
                    )
    assert got == expected, (got, expected)


intervals_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),       # doc id
        st.integers(min_value=1, max_value=40),      # start
        st.integers(min_value=0, max_value=15),      # length - 1
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(iv=intervals_strategy)
def test_merged_interval_length_matches_bruteforce(spark, iv):
    """merged_interval_length (the gaps-and-islands union behind span
    coverage and the incremental verdict maintainer) must equal the
    brute-force union size of the closed integer intervals, for any
    overlap/containment/touching geometry hypothesis generates."""
    from test_flink_spark.operators.span_dedup import merged_interval_length

    rows = [(d, s, s + l) for d, s, l in iv]
    df = spark.createDataFrame(rows, "doc_id LONG, s INT, e INT").distinct()
    got = {
        r["doc_id"]: r["covered_tokens"]
        for r in merged_interval_length(df).collect()
    }
    # brute force: per doc, union of integer point sets
    points: dict[int, set] = {}
    for d, s, e in {(d, s, s + l) for d, s, l in iv}:
        points.setdefault(d, set()).update(range(s, e + 1))
    want = {d: len(p) for d, p in points.items()}
    assert got == want, (got, want)


@settings(deadline=None, max_examples=60)
@given(n=st.integers(min_value=1, max_value=2500))
def test_ntile_closed_form_matches_duckdb_ntile(n):
    """The curriculum's closed-form NTILE/bucket-start arithmetic
    (llm_data._NTILE_BUCKET_SQL/_NTILE_START_SQL) must match DuckDB's own
    NTILE(10) for every rank at ANY corpus size n — including n < K, n a
    multiple of K, and every remainder class.  bucket_start must be the
    rank of each bucket's first element (so rwb = grank - start + 1 is a
    1-based within-bucket position)."""
    import duckdb

    from test_flink_spark.plans.llm_data import (
        _CURR_K,
        _NTILE_BUCKET_SQL,
        _NTILE_START_SQL,
    )

    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH r AS (SELECT range + 1 AS grank, {n}::BIGINT AS n_total
                   FROM range({n}))
        SELECT grank,
               {_NTILE_BUCKET_SQL} AS bucket,
               {_NTILE_START_SQL} AS start,
               NTILE({_CURR_K}) OVER (ORDER BY grank) AS want_bucket
        FROM r
        """
    ).fetchall()
    starts: dict[int, int] = {}
    for grank, bucket, start, want_bucket in rows:
        assert bucket == want_bucket, (n, grank, bucket, want_bucket)
        starts.setdefault(bucket, grank)
        assert start == starts[bucket], (n, grank, start, starts[bucket])


@settings(deadline=None, max_examples=60)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=10_000), min_size=1, max_size=60)
)
def test_compaction_bin_rule_invariants(sizes):
    """The running-sum compaction rule (layout_compaction_planner): bins
    are CONTIGUOUS slot ranges, conserve every byte/file, and no bin
    exceeds target + max_file (a bin only closes after crossing the
    target, so it can overshoot by at most one file)."""
    from test_flink_spark.plans.enterprise import _CP_MERGE_FACTOR

    total = sum(sizes)
    target = max(total // max(len(sizes) // _CP_MERGE_FACTOR, 1), 1)
    cum = 0
    bins: dict[int, list[int]] = {}
    for slot, b in enumerate(sizes):
        bins.setdefault(cum // target, []).append(slot)
        cum += b
    # contiguity: each bin's slots are consecutive, and bin ids ascend
    # in slot order
    flat = [s for _, ss in sorted(bins.items()) for s in ss]
    assert flat == list(range(len(sizes)))
    # conservation
    assert sum(len(ss) for ss in bins.values()) == len(sizes)
    # bounded overshoot
    for ss in bins.values():
        assert sum(sizes[s] for s in ss) <= target + max(sizes)
