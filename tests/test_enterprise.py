"""Semantic invariants for the CDC / gap-fill / co-occurrence / triangle /
fuzzy-linkage operators — properties the order-insensitive value-hash
oracle gate cannot see (idempotence, grid completeness, graph identities).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from test_flink_spark.operators.cdc import cdc_latest, scd2_history
from test_flink_spark.operators.cooccur import (
    item_pairs,
    knn_edges,
    topk_neighbors,
    triangle_counts,
)
from test_flink_spark.operators.linkage import fuzzy_name_pairs
from test_flink_spark.operators.timeseries import bucket_gapfill_locf

CDC_SCHEMA = "k INT, seq INT, op STRING, v STRING"


def _apply(spark, rows):
    df = spark.createDataFrame(rows, CDC_SCHEMA)
    return {
        r["k"]: (r["op"], r["v"], r["seq"])
        for r in cdc_latest(df, ["k"], ["seq"], "op", ["delete"]).collect()
    }


def test_cdc_latest_wins_and_tombstones(spark):
    rows = [
        (1, 1, "insert", "a"),
        (1, 3, "update", "c"),
        (1, 2, "update", "b"),  # out of arrival order; seq decides
        (2, 1, "insert", "x"),
        (2, 2, "delete", None),  # tombstone: key 2 absent
        (3, 5, "delete", None),
        (3, 6, "insert", "resurrected"),  # insert AFTER delete: present
    ]
    snap = _apply(spark, rows)
    assert snap[1] == ("update", "c", 3)
    assert 2 not in snap
    assert snap[3] == ("insert", "resurrected", 6)


def test_cdc_batch_associativity(spark):
    """Applying the changelog in one pass == applying batch 1, replaying
    its snapshot as upserts, then applying batch 2 — the property that
    makes incremental per-day CDC application safe."""
    batch1 = [(1, 1, "insert", "a"), (2, 1, "insert", "x"), (1, 2, "update", "b")]
    batch2 = [(2, 3, "delete", None), (3, 4, "insert", "z"), (1, 3, "update", "c")]
    full = _apply(spark, batch1 + batch2)
    snap1 = _apply(spark, batch1)
    replay = [(k, seq, op, v) for k, (op, v, seq) in snap1.items()]
    incremental = _apply(spark, replay + batch2)
    assert full == incremental


def test_snapshot_diff_roundtrip(spark):
    """diff(old, new) applied to old as a changelog must reproduce new —
    the defining property of snapshot reconciliation.  Covers inserts,
    updates, deletes, unchanged keys, and NULL-valued payloads."""
    from test_flink_spark.operators.cdc import snapshot_diff

    schema = "k INT, v STRING, w INT"
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", None), (3, "c", 30), (4, None, 40)], schema
    )
    new = spark.createDataFrame(
        [(1, "a", 10),          # unchanged -> no diff row
         (2, "b2", None),       # update (value change)
         (4, None, 41),         # update (NULL payload elsewhere unchanged)
         (5, "e", 50)],         # insert; key 3 deleted
        schema,
    )
    diff = snapshot_diff(old, new, ["k"], ["v", "w"]).collect()
    ops = {r["k"]: r["op"] for r in diff}
    assert ops == {2: "update", 3: "delete", 4: "update", 5: "insert"}
    # round-trip: old rows as seq-0 upserts + diff rows as seq-1 changes
    log = [(r["k"], 0, "upsert", r["v"], r["w"]) for r in old.collect()] + [
        (r["k"], 1, r["op"], r["v"], r["w"]) for r in diff
    ]
    log_df = spark.createDataFrame(log, "k INT, seq INT, op STRING, v STRING, w INT")
    rebuilt = {
        (r["k"], r["v"], r["w"])
        for r in cdc_latest(log_df, ["k"], ["seq"], "op", ["delete"])
        .select("k", "v", "w")
        .collect()
    }
    expected = {(r["k"], r["v"], r["w"]) for r in new.collect()}
    assert rebuilt == expected


def test_snapshot_diff_null_keys(spark):
    """NULL is a legitimate (eqNullSafe-joinable) key value: an unchanged
    NULL-keyed row must emit nothing, a changed one must classify
    correctly — presence detection cannot rely on key nullness."""
    from test_flink_spark.operators.cdc import snapshot_diff

    schema = "k INT, v STRING"
    old = spark.createDataFrame([(None, "x"), (1, "a")], schema)
    same = spark.createDataFrame([(None, "x"), (1, "a")], schema)
    assert snapshot_diff(old, same, ["k"], ["v"]).count() == 0
    changed = spark.createDataFrame([(None, "y"), (1, "a")], schema)
    d = snapshot_diff(old, changed, ["k"], ["v"]).collect()
    assert [(r["k"], r["op"], r["v"]) for r in d] == [(None, "update", "y")]
    gone = spark.createDataFrame([(1, "a")], schema)
    d2 = snapshot_diff(old, gone, ["k"], ["v"]).collect()
    assert [(r["k"], r["op"], r["v"]) for r in d2] == [(None, "delete", None)]


def test_scd2_intervals_chain_and_tombstones(spark):
    rows = [
        (1, 1, "insert", "a"),
        (1, 3, "update", "c"),
        (1, 2, "update", "b"),
        (2, 1, "insert", "x"),
        (2, 2, "delete", None),  # tombstone closes x's interval, emits nothing
        (3, 7, "insert", "z"),  # single-version key
    ]
    df = spark.createDataFrame(rows, CDC_SCHEMA)
    hist = scd2_history(df, ["k"], "seq", ["seq"], "op", ["delete"]).collect()
    by_key: dict[int, list] = {}
    for r in sorted(hist, key=lambda r: (r["k"], r["valid_from"])):
        by_key.setdefault(r["k"], []).append(r)
    v1 = by_key[1]
    assert [(r["v"], r["valid_from"], r["valid_to"]) for r in v1] == [
        ("a", 1, 2), ("b", 2, 3), ("c", 3, None)
    ]
    assert [r["is_current"] for r in v1] == [False, False, True]
    # key 2: one version, interval CLOSED by the tombstone, nothing current
    v2 = by_key[2]
    assert [(r["v"], r["valid_from"], r["valid_to"], r["is_current"]) for r in v2] == [
        ("x", 1, 2, False)
    ]
    assert [(r["valid_to"], r["is_current"]) for r in by_key[3]] == [(None, True)]
    # global invariant: at most one current version per key
    for vs in by_key.values():
        assert sum(r["is_current"] for r in vs) <= 1


def test_scd2_current_matches_cdc_latest(spark):
    """The is_current slice of the SCD2 history IS the cdc_latest snapshot
    — the two operators must agree on what 'now' looks like."""
    rows = [
        (1, 1, "insert", "a"), (1, 2, "update", "b"),
        (2, 1, "insert", "x"), (2, 2, "delete", None),
        (3, 1, "insert", "z"),
    ]
    df = spark.createDataFrame(rows, CDC_SCHEMA)
    snap = {
        (r["k"], r["v"])
        for r in cdc_latest(df, ["k"], ["seq"], "op", ["delete"]).collect()
    }
    cur = {
        (r["k"], r["v"])
        for r in scd2_history(df, ["k"], "seq", ["seq"], "op", ["delete"])
        .filter("is_current")
        .collect()
    }
    assert snap == cur


def test_gapfill_grid_complete_and_locf(spark):
    df = spark.createDataFrame(
        [
            ("a", 1000, 5),
            ("a", 3500, 7),  # bucket 3; buckets 1 and 2 are gaps
            ("a", 3600, 9),  # same bucket as above -> summed
            ("b", 100, 1),  # single-bucket series: no gaps
        ],
        "k STRING, ts_ms LONG, cents LONG",
    )
    out = bucket_gapfill_locf(df, ["k"], "ts_ms", "cents", bucket_ms=1000)
    rows = {(r["k"], r["bucket_ms"]): r for r in out.collect()}
    assert set(rows) == {("a", 1000), ("a", 2000), ("a", 3000), ("b", 0)}
    assert rows[("a", 1000)]["n_events"] == 1 and not rows[("a", 1000)]["is_gap"]
    assert rows[("a", 1000)]["sum_cents_locf"] == 5
    assert rows[("a", 2000)]["n_events"] == 0 and rows[("a", 2000)]["is_gap"]
    assert rows[("a", 2000)]["sum_cents_locf"] == 5  # carried forward
    assert rows[("a", 3000)]["sum_cents_locf"] == 16  # 7 + 9, observed
    assert rows[("b", 0)]["sum_cents_locf"] == 1
    # first bucket per key is observed by construction -> LOCF never null
    assert all(r["sum_cents_locf"] is not None for r in rows.values())


def test_cooccurrence_counts_and_cap(spark):
    # users 1,2 share items (10, 20); user 3 brings 20-30; user 4's basket
    # exceeds the cap of 2 -> only its two LOWEST items (5, 10) pair up
    rows = [
        (1, 10), (1, 20),
        (2, 10), (2, 20), (2, 20),  # duplicate interaction: basket is distinct
        (3, 20), (3, 30),
        (4, 5), (4, 10), (4, 99),
    ]
    df = spark.createDataFrame(rows, "user_id INT, item INT")
    pairs = {
        (r["item_a"], r["item_b"]): r["n_co"]
        for r in item_pairs(df, "user_id", "item", max_items_per_user=2).collect()
    }
    assert pairs[(10, 20)] == 2  # users 1 and 2; duplicates don't inflate
    assert pairs[(20, 30)] == 1
    assert pairs[(5, 10)] == 1  # capped user keeps lowest two items
    assert (10, 99) not in pairs and (5, 99) not in pairs  # 99 fell to the cap


def test_topk_neighbors_rank_and_tiebreak(spark):
    rows = [(u, i) for u in range(4) for i in (1, 2)] + [(9, 1), (9, 3)]
    df = spark.createDataFrame(rows, "user_id INT, item INT")
    top = topk_neighbors(item_pairs(df, "user_id", "item", 64), k=1)
    by_item = {r["item"]: r for r in top.collect()}
    # item 1 co-occurs with 2 (x4) and 3 (x1): top neighbor is 2
    assert by_item[1]["neighbor"] == 2 and by_item[1]["n_co"] == 4
    assert by_item[3]["neighbor"] == 1  # item 3's only neighbor


def test_triangle_counts_on_known_graph(spark):
    # 4-clique on {1,2,3,4} plus pendant edge (4,5): C(4,3)=4 triangles,
    # each clique vertex in exactly 3, vertex 5 in none
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)] + [(4, 5)]
    df = spark.createDataFrame(edges, "a INT, b INT")
    tri = {r["item"]: r["n_tri"] for r in triangle_counts(df).collect()}
    assert tri == {1: 3, 2: 3, 3: 3, 4: 3}


def test_knn_edges_union_semantics(spark):
    # hub item 1 pairs with 2,3,4 (counts 3,2,1); with k=1 only (1,2) is
    # mutual-top, but union semantics keep (1,3)/(1,4) because 3 and 4
    # each rank 1 as THEIR top neighbor
    rows = (
        [(u, i) for u in (10, 11, 12) for i in (1, 2)]
        + [(u, i) for u in (20, 21) for i in (1, 3)]
        + [(30, 1), (30, 4)]
    )
    df = spark.createDataFrame(rows, "user_id INT, item INT")
    edges = {
        (r["a"], r["b"])
        for r in knn_edges(item_pairs(df, "user_id", "item", 64), k=1).collect()
    }
    assert edges == {(1, 2), (1, 3), (1, 4)}


def test_transition_matrix_counts_and_ppm(spark):
    from test_flink_spark.operators.sequence import transition_matrix

    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "c"),
        (2, 1, "a"), (2, 2, "b"),
        (3, 9, "z"),  # single event: no transitions
    ]
    df = spark.createDataFrame(rows, "u INT, t INT, s STRING")
    out = {
        (r["from_state"], r["to_state"]): (r["n"], r["row_total"], r["p_ppm"])
        for r in transition_matrix(df, ["u"], ["t"], "s").collect()
    }
    # a->b twice (users 1, 2), a->c once; row_total(a) = 3
    assert out[("a", "b")] == (2, 3, 666666)  # floor(2e6/3)
    assert out[("a", "c")] == (1, 3, 333333)
    assert out[("b", "a")] == (1, 1, 1000000)
    assert ("z", "a") not in out and not any(k[0] == "z" for k in out)
    # no cross-user transition: user 1's 'c' never leads to user 2's 'a'
    assert ("c", "a") not in out


def test_frequent_paths_windows_and_tiebreak(spark):
    from test_flink_spark.operators.sequence import frequent_paths

    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "a"),  # abc, bca
        (2, 1, "a"), (2, 2, "b"), (2, 3, "c"),               # abc
        (3, 1, "x"), (3, 2, "y"),                            # too short for n=3
    ]
    df = spark.createDataFrame(rows, "u INT, t INT, s STRING")
    got = [
        (r["path"], r["n_occurrences"], r["rank"])
        for r in frequent_paths(df, ["u"], ["t"], "s", n=3, topk=10).collect()
    ]
    assert got[0] == ("a>b>c", 2, 1)
    assert ("b>c>a", 1, 2) in got  # tie-broken by path asc among count-1
    assert all("x" not in p and "y" not in p for p, _, _ in got)
    # tail windows shorter than n emit nothing: no 2-step 'c>a' path
    assert all(p.count(">") == 2 for p, _, _ in got)


def test_bigram_surprisal_flags_word_salad(spark):
    """Two docs with IDENTICAL unigram profiles: the fluent one (matching
    the reference's transitions) must score strictly lower than the
    scrambled one — the signal the bigram order adds over unigram."""
    from test_flink_spark.operators.lm_score import bigram_surprisal_scores

    ref = spark.createDataFrame(
        [(100 + i, "the cat sat on the mat") for i in range(5)],
        "doc_id INT, text STRING",
    )
    score = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),   # fluent: all bigrams seen
            (2, "mat the on sat cat the"),   # same words, scrambled order
            (3, ""),                          # empty: 0 tokens, never flagged
        ],
        "doc_id INT, text STRING",
    )
    out = {r["doc_id"]: r for r in bigram_surprisal_scores(score, ref).collect()}
    assert out[1]["n_tokens"] == out[2]["n_tokens"] == 6
    assert out[1]["n_bigram_hits"] == 5  # every transition seen in ref
    assert out[2]["n_bigram_hits"] < 5
    assert out[1]["mean_bits"] < out[2]["mean_bits"]
    assert out[3]["n_tokens"] == 0 and not out[3]["flagged"]


def test_pruning_report_zorder_beats_time_layout(spark):
    """On real data, z-order blocks must prune the user-range scan that
    time-stripe blocks cannot — and both layouts must agree on the exact
    match count (pruning is lossless)."""
    from test_flink_spark.plans.enterprise import layout_pruning_report

    rows = {
        r["layout"]: r
        # sf0.01, not sf0.001: the smoke set has < 32 users, so the fixed
        # [32, 95] probe range would match nothing there
        for r in layout_pruning_report(spark, "/root/testdata/sf0.01").collect()
    }
    t, z = rows["by_time"], rows["zorder"]
    assert t["rows_matched"] == z["rows_matched"] > 0
    assert t["total_rows"] == z["total_rows"]
    # time stripes see every user -> no pruning; z blocks bound user too
    assert t["rows_scanned"] == t["total_rows"]
    assert z["rows_scanned"] < t["rows_scanned"]
    assert z["rows_scanned"] >= z["rows_matched"]  # zone maps never lose rows


def test_topic_labels_argmax_and_fallback(spark):
    from test_flink_spark.operators.labeling import topic_labels

    lex = {"food": ["apple", "bread"], "tech": ["cpu", "disk"]}
    rows = [
        (1, "apple bread apple"),      # food 3, tech 0
        (2, "cpu apple"),              # tie 1-1 -> 'food' (name asc)
        (3, "nothing matches here"),   # all-zero -> other
        (4, "disk disk cpu apple"),    # tech 3 > food 1
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    out = {r["doc_id"]: r for r in topic_labels(df, lex).collect()}
    assert out[1]["label"] == "food" and out[1]["label_score"] == 3
    assert out[2]["label"] == "food"  # ascending-name tie-break
    assert out[3]["label"] == "other" and out[3]["label_score"] == 0
    assert out[4]["label"] == "tech" and out[4]["score_food"] == 1


def test_sparse_cosine_ranks_topical_neighbors(spark):
    """Handcrafted corpus with real lexical structure: the query doc's
    nearest neighbor must be the doc sharing its rare terms, not the one
    sharing only ubiquitous filler."""
    from test_flink_spark.operators.retrieval import sparse_cosine_topk

    filler = "the a of and " * 3
    rows = [
        (1, filler + "zebra quark zebra"),
        (2, filler + "zebra quark"),          # shares both rare terms with 1
        (3, filler + "zebra plasma"),         # shares one rare term
        (4, filler + "plasma meson"),         # shares none
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    # every doc a query: rate 10000 selects all buckets
    out = sparse_cosine_topk(df, query_rate_bp=10_000, k=3).collect()
    top = {r["query_id"]: r["doc_id"] for r in out if r["rank"] == 1}
    assert top[1] == 2 and top[2] == 1
    by_q1 = {r["doc_id"]: r["cos_bp"] for r in out if r["query_id"] == 1}
    assert by_q1[2] > by_q1[3] > by_q1[4]
    assert all(0 <= r["cos_bp"] <= 10_000 for r in out)


def test_dedup_keep_best_prefers_longest(spark):
    from test_flink_spark.operators.text import words
    from test_flink_spark.plans.llm_data import _docs, _shared_clusters, dedup_keep_best

    sf = "/root/testdata/sf0.001"
    kept = {
        r["cluster_id"]: r for r in dedup_keep_best(spark, sf).collect()
    }
    assert kept  # non-empty
    # ground truth: cluster membership + token counts recomputed directly
    cl = {r["doc_id"]: r["cluster_id"] for r in _shared_clusters(spark, sf).collect()}
    tok = {
        r["doc_id"]: r["n"]
        for r in _docs(spark, sf)
        .select("doc_id", F.size(words(F.col("text"))).alias("n"))
        .collect()
    }
    members: dict[int, list[int]] = {}
    for d, c in cl.items():
        members.setdefault(c, []).append(d)
    assert set(kept) == set(members)  # one keeper per cluster, all clusters
    for c, docs in members.items():
        r = kept[c]
        assert r["cluster_size"] == len(docs)
        best = max(docs, key=lambda d: (tok[d], -d))
        assert r["keep_doc_id"] == best and r["n_tokens"] == tok[best]


def test_fuzzy_pairs_blocking_and_distance(spark):
    rows = (
        [("hot widget",)] * 3
        + [("new widget",)] * 2
        + [("cold widget",)]
        + [("hot gizmo",)]
        + [("unrelated thing",)]
    )
    df = spark.createDataFrame(rows, "name STRING")
    out = {
        (r["name_a"], r["name_b"]): (r["dist"], r["n_a"], r["n_b"])
        for r in fuzzy_name_pairs(df, "name", max_dist=3).collect()
    }
    # shared noun block: hot~new (dist 3); counts carried through
    assert out[("hot widget", "new widget")] == (3, 3, 2)
    # shared adjective block: widget~gizmo dist > 3 -> excluded
    assert ("hot gizmo", "hot widget") not in out
    # cold~hot dist 3 via noun block
    assert out[("cold widget", "hot widget")][0] == 3
    assert all(d <= 3 for d, _, _ in out.values())


def test_double_exp_forecast_hand_example(spark):
    """The smoothing recurrence must match a hand-rolled Python replay on a
    known series, including a DECLINING series (negative trend exercises
    div truncation parity) and a constant series (forecast == level ==
    x*S, zero trend)."""
    import datetime

    from test_flink_spark.operators.timeseries import (
        HW_SCALE,
        double_exponential_forecast,
    )

    rows = []
    base = datetime.datetime(2024, 3, 1)
    series = {"grow": [2, 4, 6, 8, 10, 12, 14], "flat": [5, 5, 5, 5, 5, 5, 5],
              "fall": [14, 12, 9, 7, 4, 2, 1]}
    for k, xs in series.items():
        for d, n in enumerate(xs):
            for _ in range(n):
                rows.append((k, base + datetime.timedelta(days=d)))
    df = spark.createDataFrame(rows, "event_type STRING, ts TIMESTAMP")
    got = {
        r["event_type"]: r.asDict()
        for r in double_exponential_forecast(df, ["event_type"], "ts", 7).collect()
    }

    def trunc_div(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    for k, xs in series.items():
        l, b = xs[0] * HW_SCALE, (xs[1] - xs[0]) * HW_SCALE
        for t in range(1, 7):
            ln = trunc_div(3 * xs[t] * HW_SCALE + 7 * (l + b), 10)
            b = trunc_div(1 * (ln - l) + 9 * b, 10)
            l = ln
        assert got[k]["level_fp"] == l, k
        assert got[k]["trend_fp"] == b, k
        assert got[k]["forecast_fp"] == l + b, k
    assert got["flat"]["trend_fp"] == 0
    assert got["flat"]["forecast_fp"] == 5 * HW_SCALE
    assert got["fall"]["trend_fp"] < 0 < got["grow"]["trend_fp"]


def test_cusum_drift_flags_planted_volume_shift(spark):
    """A key whose volume doubles mid-series must flag drift at/after the
    shift day and not before; a stable key must never flag."""
    import datetime

    from test_flink_spark.operators.timeseries import cusum_changepoints

    base = datetime.datetime(2024, 5, 1)
    rows = []
    for d in range(14):
        for _ in range(10):  # stable: 10/day throughout
            rows.append(("stable", base + datetime.timedelta(days=d)))
        n = 10 if d < 7 else 22  # shifted: baseline 10/day, then 22/day
        for _ in range(n):
            rows.append(("shifted", base + datetime.timedelta(days=d)))
    df = spark.createDataFrame(rows, "event_type STRING, ts TIMESTAMP")
    got = cusum_changepoints(
        df, ["event_type"], "ts", baseline_days=7, n_days=14, threshold_pct=50
    ).collect()
    by = {(r["event_type"], r["day_idx"]): r for r in got}
    assert all(not by[("stable", d)]["drifted"] for d in range(14))
    assert all(by[("stable", d)]["cusum"] == 0 for d in range(14))
    # shifted: dev = 7*22 - 70 = 84/day from day 7; cusum crosses
    # 50% of B (35) during day 7 (84 > 35) -> flagged from day 7 on
    assert not any(by[("shifted", d)]["drifted"] for d in range(7))
    assert all(by[("shifted", d)]["drifted"] for d in range(7, 14))


def test_holt_winters_hand_replay_and_seasonality(spark):
    """The seasonal recurrence must match a hand-rolled Python replay, and
    a perfectly weekly-periodic series must forecast (approximately) its
    seasonal pattern: the day-28 forecast must be far closer to the
    upcoming Monday's volume than the flat weekly mean is."""
    import datetime

    from test_flink_spark.operators.timeseries import (
        HW_SCALE,
        holt_winters_forecast,
    )

    base = datetime.datetime(2024, 6, 3)  # a Monday
    week = [30, 10, 10, 10, 10, 10, 10]  # Monday spike, period 7
    rows = []
    for d in range(28):
        for _ in range(week[d % 7]):
            rows.append(("spiky", base + datetime.timedelta(days=d)))
    df = spark.createDataFrame(rows, "event_type STRING, ts TIMESTAMP")
    got = holt_winters_forecast(df, ["event_type"], "ts", 28, 7).collect()[0]

    def trunc_div(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    xs = [week[d % 7] for d in range(28)]
    S = HW_SCALE
    B = sum(xs[:7])
    m = trunc_div(B * S, 7)
    sc = [xs[i] * S - m for i in range(7)]
    l, b = m, trunc_div((sum(xs[7:14]) - B) * S, 49)
    for t in range(7, 28):
        k = t % 7
        ln = trunc_div(3 * (xs[t] * S - sc[k]) + 7 * (l + b), 10)
        b = trunc_div(1 * (ln - l) + 9 * b, 10)
        sc[k] = trunc_div(2 * (xs[t] * S - ln) + 8 * sc[k], 10)
        l = ln
    assert got["level_fp"] == l
    assert got["trend_fp"] == b
    assert got["season_next_fp"] == sc[28 % 7]
    assert got["forecast_fp"] == l + b + sc[0]
    # day 28 is a Monday (spike, 30): the seasonal forecast must beat the
    # flat weekly mean (~90/7 ≈ 12.9) by a wide margin
    assert abs(got["forecast_fp"] - 30 * S) < abs(trunc_div(90 * S, 7) - 30 * S) // 3


def test_k_anonymity_flags_small_user_groups(spark, monkeypatch):
    """Groups backed by < 5 distinct users are at risk even when row count
    is large (one chatty user is still one person); >= 5 users clears."""
    import datetime

    from test_flink_spark.plans import enterprise as E

    t = datetime.datetime(2024, 7, 1, 12, 0)
    rows = []
    for _ in range(20):  # 20 rows, ONE user -> at risk
        rows.append((1, t, 100, "click", 42.0, "{}"))
    for u in range(6):  # 6 users, one row each -> clear
        rows.append((2, t, 200 + u, "view", 17.0, "{}"))
    ev = spark.createDataFrame(
        [(i, ts, u, et, v, p) for i, (x, ts, u, et, v, p) in enumerate(rows)],
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING",
    )
    monkeypatch.setattr(E, "_t", lambda s, sf, name: ev)
    got = {
        (r["event_type"], r["value_bucket"]): r.asDict()
        for r in E.events_k_anonymity(spark, "ignored").collect()
    }
    click = got[("click", 4)]
    assert click["n_rows"] == 20 and click["n_users"] == 1 and click["at_risk"]
    view = got[("view", 1)]
    assert view["n_users"] == 6 and not view["at_risk"]


def test_time_weighted_avg_semantics(spark):
    """TWA is the LOCF step-function mean: bursts of samples must NOT
    over-weight (the defining property vs the arithmetic mean), the last
    observation spans zero time, and a single-observation key reports its
    own value."""
    from test_flink_spark.operators.timeseries import time_weighted_avg

    rows = [
        # key a: value 100 holds for 9ms, then 10 burst samples of 200
        # within 1ms each, then final 0 at t=20 (spans nothing).
        *[("a", 0, 100)],
        *[("a", 9 + i, 200) for i in range(10)],
        ("a", 20, 0),
        ("b", 5, 777),  # single observation
    ]
    df = spark.createDataFrame(rows, "k STRING, ts_ms LONG, cents LONG")
    out = {
        r["k"]: r
        for r in time_weighted_avg(df, ["k"], "ts_ms", "cents").collect()
    }
    # integral: 100*9 + 200*(1*9 gaps) + 200*(20-18=2) + 0*0 = 900+1800+400
    # span 20 -> twa = 3100/20 = 155.0; arithmetic mean would be ~183
    assert out["a"]["span_ms"] == 20
    assert out["a"]["twa_cents"] == 155.0
    assert out["b"]["span_ms"] == 0 and out["b"]["twa_cents"] == 777.0


def test_lttb_keeps_endpooints_and_extremes(spark):
    """LTTB must always keep the first/last points, emit exactly n_out
    points for a long series, and a spike — the largest triangle in its
    bucket — must survive downsampling.  Short series pass through."""
    from test_flink_spark.operators.timeseries import lttb_downsample

    flat = [("s", i, i, 100) for i in range(100)]
    flat[37] = ("s", 37, 37, 9000)  # spike
    short = [("t", i, i, 50) for i in range(4)]
    df = spark.createDataFrame(
        flat + short, "k STRING, eid LONG, ts_ms LONG, cents LONG"
    )
    out = lttb_downsample(
        df, ["k"], "ts_ms", "cents", n_out=10, tiebreak_col="eid"
    ).collect()
    s = sorted([r for r in out if r["k"] == "s"], key=lambda r: r["ord"])
    t = sorted([r for r in out if r["k"] == "t"], key=lambda r: r["ord"])
    assert len(s) == 10
    assert (s[0]["ord"], s[0]["ts_ms"]) == (0, 0)
    assert (s[-1]["ord"], s[-1]["ts_ms"]) == (9, 99)
    assert any(r["cents"] == 9000 for r in s), "spike lost by downsampling"
    assert [(r["ts_ms"], r["cents"]) for r in t] == [(i, 50) for i in range(4)]


def test_time_weighted_avg_tiebreak_deterministic(spark):
    """Two observations at the same (key, ts) with different values: the
    LAST tied row (by tiebreak) carries the whole gap to the next
    distinct timestamp, so without a tiebreak twa is nondeterministic.
    With tiebreak_col the result is pinned: the higher event_id's value
    spans the gap — and matches the oracle's LEAD ordering."""
    import duckdb

    from test_flink_spark.operators.timeseries import (
        time_weighted_avg,
        time_weighted_avg_oracle_sql,
    )

    rows = [
        ("a", 0, 100, 1),
        ("a", 0, 900, 2),  # same ts, later event_id -> carries the gap
        ("a", 10, 0, 3),
    ]
    df = spark.createDataFrame(rows, "k STRING, ts_ms LONG, cents LONG, eid LONG")
    out = time_weighted_avg(
        df, ["k"], "ts_ms", "cents", tiebreak_col="eid"
    ).collect()[0]
    # integral: 100*0 (tied gap) + 900*10 + 0*0 = 9000; span 10 -> 900.0
    assert out["twa_cents"] == 900.0

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE obs AS SELECT * FROM (VALUES"
        " ('a', 0, 100, 1), ('a', 0, 900, 2), ('a', 10, 0, 3))"
        " t(k, ts_ms, cents, eid)"
    )
    sql = time_weighted_avg_oracle_sql(
        "obs", ["k"], "ts_ms", "cents", tiebreak_expr="eid"
    )
    assert con.execute(sql).fetchone()[3] == 900.0


def test_changepoint_binseg_finds_level_shift(spark):
    """A clean level shift (10,10,10,10 -> 50,50,50) must split exactly at
    the boundary; the gain equals the SSE reduction; a constant series
    yields zero gain wherever it splits; a 1-point key emits nothing."""
    from test_flink_spark.operators.timeseries import changepoint_binseg

    rows = (
        [("shift", t, 10) for t in range(4)]
        + [("shift", t, 50) for t in range(4, 7)]
        + [("flat", t, 7) for t in range(5)]
        + [("single", 0, 99)]
    )
    df = spark.createDataFrame(rows, "k STRING, t LONG, v LONG")
    out = {r["k"]: r for r in changepoint_binseg(df, ["k"], "t", "v").collect()}
    assert set(out) == {"shift", "flat"}
    s = out["shift"]
    assert s["split_ord"] == 3 and s["left_n"] == 4
    assert s["left_sum"] == 40 and s["right_sum"] == 150
    # SSE reduction: total mean 190/7; two-segment fit is exact ->
    # gain = L*R/n * (50-10)^2 = 4*3/7 * 1600 = 2742.85 -> floor 2742
    assert s["gain"] == 2742
    assert out["flat"]["gain"] == 0


def test_attribution_last_touch_lookback_and_ties(spark):
    """The purchase credits the most recent prior touch (same-ms ties
    broken by event_id), touches OUTSIDE the 7-day lookback fall to
    'none', and a touch-free purchase is 'none'."""
    from test_flink_spark.plans.enterprise import (
        events_attribution_last_touch,
    )
    import test_flink_spark.plans.enterprise as E

    day = 86_400_000

    rows = [
        # u1: click then view at the SAME ms (higher event_id wins=view),
        # purchase 1 day later -> view
        (1, 10, "click", 1_000, 5.0),
        (1, 11, "view", 1_000, 0.0),
        (1, 12, "purchase", 1_000 + day, 20.0),
        # u2: touch 8 days before purchase -> outside lookback -> none
        (2, 20, "view", 1_000, 0.0),
        (2, 21, "purchase", 1_000 + 8 * day, 30.0),
        # u3: no touches at all -> none
        (3, 30, "purchase", 500, 40.0),
    ]
    df = spark.createDataFrame(
        [(u, e, t, ms, v) for u, e, t, ms, v in rows],
        "user_id LONG, event_id LONG, event_type STRING, ms LONG, value DOUBLE",
    ).select(
        "user_id", "event_id", "event_type",
        F.timestamp_millis(F.col("ms")).alias("ts"), "value",
    )

    import unittest.mock as um

    with um.patch.object(E, "_t", lambda spark_, sf, name: df):
        got = {
            r["channel"]: (r["conversions"], r["revenue_cents"])
            for r in events_attribution_last_touch(spark, "ignored").collect()
        }
    assert got == {"view": (1, 2000), "none": (2, 7000)}


def test_gini_known_distributions(spark):
    """Gini of a perfectly equal distribution is 0; of full concentration
    (one user owns everything but the minimum) approaches the discrete
    maximum (n-1)/n; both computed through the distributed prefix-sum
    rank, validated against hand math."""
    import unittest.mock as um

    import test_flink_spark.plans.enterprise as E

    def run(counts):
        rows = [(u, None, "x", None, None) for u, c in counts for _ in range(c)]
        df = spark.createDataFrame(
            [(u, i) for i, (u, *_rest) in enumerate(rows)],
            "user_id LONG, event_id LONG",
        )
        with um.patch.object(E, "_t", lambda s, sf, name: df):
            return E.events_user_gini(spark, "ignored").collect()[0]

    eq = run([(1, 5), (2, 5), (3, 5), (4, 5)])
    assert eq["gini_bp"] == 0 and eq["n_users"] == 4

    # counts 1,1,1,97: G = (2*(1+2+3+4*97) - 5*100) / (4*100) = 288/400 = 0.72
    conc = run([(1, 1), (2, 1), (3, 1), (4, 97)])
    assert conc["gini_bp"] == 7200 and conc["total_events"] == 100


def test_cep_strict_contiguity_rejects_intervening_event(spark):
    """Flink-CEP next() semantics: view,click,purchase consecutive
    matches; view,click,OTHER,purchase does NOT (the relaxed
    followed-by would match it); the within() bound drops slow
    triples."""
    import unittest.mock as um

    import test_flink_spark.plans.enterprise as E

    day = 86_400_000
    rows = [
        # u1: strict match inside the bound
        (1, 1, "view", 0), (1, 2, "click", 1000), (1, 3, "purchase", 2000),
        # u2: intervening 'view' breaks contiguity
        (2, 4, "view", 0), (2, 5, "click", 1000), (2, 6, "view", 1500),
        (2, 7, "purchase", 2000),
        # u3: strict but outside the 7-day within() bound
        (3, 8, "view", 0), (3, 9, "click", 1000), (3, 10, "purchase", 8 * day),
    ]
    df = spark.createDataFrame(
        rows, "user_id LONG, event_id LONG, event_type STRING, ms LONG"
    ).select("user_id", "event_id", "event_type",
             F.timestamp_millis(F.col("ms")).alias("ts"))
    with um.patch.object(E, "_t", lambda s, sf, name: df):
        got = E.events_cep_strict_sequence(spark, "ignored").collect()
    assert len(got) == 1 and got[0]["matches"] == 1 and got[0]["users"] == 1


def test_wilson_lower_bound_dominated_by_raw_rate(spark):
    """The Wilson bound is a LOWER confidence bound: strictly below the
    raw proportion for every finite sample, never negative, and the
    output must arrive ranked by it."""
    from test_flink_spark.plans.enterprise import events_wilson_ctr_rank

    rows = events_wilson_ctr_rank(spark, "/root/testdata/sf0.01").collect()
    assert rows, "no items cleared the trials floor at sf0.01"
    lbs = [r["wilson_lb"] for r in rows]
    assert lbs == sorted(lbs, reverse=True)
    for r in rows:
        assert 0.0 <= r["wilson_lb"] < r["clicks"] / r["trials"] + 1e-9
        # shrinkage is material at these sample sizes, not a rounding haze
        assert r["wilson_lb"] < r["ctr_bp"] / 10000.0


def test_hhi_bounds_and_monopoly_limit(spark):
    """HHI lies in (0, 1e6]; a nation's top share can never exceed its
    HHI-implied maximum (top_share² <= sum of squared shares)."""
    from test_flink_spark.plans.advanced import nation_revenue_hhi

    rows = nation_revenue_hhi(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 < r["hhi_ppm"] <= 1_000_000
        # floor-div noise: each share loses < 1 ppm, n_suppliers of them
        assert (
            r["top_share_ppm"] ** 2 // 1_000_000 <= r["hhi_ppm"] + r["n_suppliers"]
        )
        # equal-split lower bound: hhi >= 1e6 / n (floor slack)
        assert r["hhi_ppm"] >= 1_000_000 // r["n_suppliers"] - r["n_suppliers"]


def test_linear_attribution_conserves_credit_and_revenue(spark):
    """Integer credit accounting must be exactly conservative: every
    purchase contributes exactly 1e6 ppm of credit and exactly its cents
    across the three channels (the remainder-to-click scheme)."""
    from pyspark.sql import functions as F

    from test_flink_spark.plans.enterprise import events_attribution_linear
    from test_flink_spark.schemas import load_table

    sf = "/root/testdata/sf0.01"
    out = events_attribution_linear(spark, sf).collect()
    ev = load_table(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents")
    )
    n_purch = purchases.count()
    total_cents = purchases.agg(F.sum("cents")).collect()[0][0]
    assert sum(r["credit_ppm"] for r in out) == 1_000_000 * n_purch
    assert sum(r["revenue_cents"] for r in out) == total_cents
    assert {r["channel"] for r in out} == {"view", "click", "none"}


def test_kaplan_meier_staircase_invariants(spark):
    """S(t) must be strictly decreasing in (0, 1), at-risk counts strictly
    decreasing, and the curve must replay exactly from the integer
    columns (the float path is just exp/ln bookkeeping)."""
    import math

    from test_flink_spark.plans.enterprise import events_kaplan_meier_retention

    rows = sorted(
        events_kaplan_meier_retention(spark, "/root/testdata/sf0.01").collect(),
        key=lambda r: r["hour"],
    )
    assert len(rows) > 5
    s_prev, n_prev = 1.0 + 1e-9, float("inf")
    acc = 1.0
    for r in rows:
        assert 0.0 < r["survival"] < s_prev
        assert r["n_at_risk"] < n_prev
        assert r["deaths"] >= 1
        s_prev, n_prev = r["survival"], r["n_at_risk"]
        acc *= (r["n_at_risk"] - r["deaths"]) / r["n_at_risk"]
        assert abs(acc - r["survival"]) < 5e-4  # ROUND(,4) tolerance


def test_ltv_curve_conserves_revenue_and_is_monotone(spark):
    from pyspark.sql import functions as F

    from test_flink_spark.plans.enterprise import events_cohort_ltv_curve
    from test_flink_spark.schemas import load_table

    sf = "/root/testdata/sf0.01"
    rows = events_cohort_ltv_curve(spark, sf).collect()
    ev = load_table(spark, sf, "events")
    total = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c")
        )
        .agg(F.sum("c"))
        .collect()[0][0]
    )
    # every purchase belongs to exactly one (cohort, age) cell
    assert sum(r["revenue_cents"] for r in rows) == total
    by_cohort = {}
    for r in sorted(rows, key=lambda r: (r["cohort_week"], r["age_week"])):
        prev = by_cohort.get(r["cohort_week"], 0)
        assert r["cum_revenue_cents"] == prev + r["revenue_cents"]
        by_cohort[r["cohort_week"]] = r["cum_revenue_cents"]


def test_partitioned_prefix_sums_multi_column(spark):
    """The multi-column prefix op must agree with a driver-side replay
    for every value column over one shared total order."""
    from pyspark.sql import functions as F

    from test_flink_spark.operators.prefix import partitioned_prefix_sums

    data = [(i, (i * 7) % 13, (i * 3) % 5) for i in range(200)]
    df = spark.createDataFrame(data, "k LONG, a LONG, b LONG")
    out, totals = partitioned_prefix_sums(
        df, ["a", "b"], [F.col("k").asc()], n_partitions=7
    )
    rows = sorted(out.collect(), key=lambda r: r["k"])
    ca = cb = 0
    for i, r in enumerate(rows, 1):
        ca += r["a"]
        cb += r["b"]
        assert (r["__cum_a"], r["__cum_b"], r["__rank"]) == (ca, cb, i)
    assert totals == {"a": ca, "b": cb}


def test_ks_drift_null_split_not_significant(spark):
    """Under the null (hash split of one population) the KS gate must not
    fire, and the statistic must be a small fraction of its n*m ceiling."""
    from test_flink_spark.plans.enterprise import events_ks_drift_test

    r = events_ks_drift_test(spark, "/root/testdata/sf0.01").collect()[0]
    assert r["significant"] == 0
    assert 0 <= r["d_num"] <= r["n_a"] * r["n_b"]
    assert r["d_bp"] < 2000  # D < 0.2 on a same-distribution split


def test_session_sweep_monotone_in_threshold(spark):
    """A larger inactivity gap can only MERGE sessions: session count and
    bounce share fall (weakly) as the threshold grows; events/session
    rises; ANOVA eta2 lies in [0, 10000]."""
    from test_flink_spark.plans.advanced import part_price_anova_by_brand
    from test_flink_spark.plans.enterprise import events_session_threshold_sweep

    rows = sorted(
        events_session_threshold_sweep(spark, "/root/testdata/sf0.01").collect(),
        key=lambda r: r["threshold_ms"],
    )
    assert len(rows) == 3
    for a, b in zip(rows, rows[1:]):
        assert b["n_sessions"] <= a["n_sessions"]
        assert b["events_per_session_milli"] >= a["events_per_session_milli"]

    r = part_price_anova_by_brand(spark, "/root/testdata/sf0.01").collect()[0]
    assert 0 <= r["eta2_bp"] <= 10_000
    assert r["ssb_n"] + r["ssw_n"] == r["sst_n"]
    assert r["ssw_n"] >= 0


def test_markov_absorption_hand_chain():
    """Hand-checkable absorption: START -> A (certain), A splits 50/50 to
    CONV/LOST.  v(A) = 500000 after one step, v(START) = 500000 once the
    A value propagates; removing A severs the only path (0); removing an
    absent channel changes nothing."""
    from test_flink_spark.plans.enterprise import _markov_absorption

    trans = {
        ("START", "A"): 1_000_000,
        ("A", "CONV"): 500_000,
        ("A", "LOST"): 500_000,
    }
    assert _markov_absorption(trans, ("A", "B")) == 500_000
    assert _markov_absorption(trans, ("A", "B"), removed="A") == 0
    assert _markov_absorption(trans, ("A", "B"), removed="B") == 500_000


def test_markov_absorption_self_loop_truncation():
    """A 50% self-loop halves its residual mass each step: after K=12
    truncated iterations v(START) is sum_{i=1..11} 5^i 10^{6-i} scaled —
    the same truncation the SQL replay performs (each step one floor
    div), pinned here against an independent per-step reference."""
    from test_flink_spark.plans.enterprise import _markov_absorption

    trans = {
        ("START", "A"): 1_000_000,
        ("A", "A"): 500_000,
        ("A", "CONV"): 500_000,
    }
    # reference: replay the exact same recurrence independently
    va = 0
    for _ in range(12):
        va_new = (500_000 * va + 500_000 * 1_000_000) // 1_000_000
        va = va_new
    # START lags A by one step: v(START) = value of A at step 11
    va11 = 0
    for _ in range(11):
        va11 = (500_000 * va11 + 500_000 * 1_000_000) // 1_000_000
    got = _markov_absorption(trans, ("A",))
    assert got == va11 and got > 990_000


def test_compaction_planner_conserves_manifest_and_packs_contiguously(spark):
    """The compaction plan must (a) conserve every manifest byte and file,
    (b) assign bins by the exact slot-ordered running-sum rule (python
    replay), and (c) actually merge small files (~MERGE_FACTOR per bin on
    a uniform day)."""
    import datetime as dt

    import unittest.mock as um

    import test_flink_spark.plans.enterprise as E

    # One synthetic day: 16 slots with varied sizes (one oversized file),
    # plus a second day with 3 uniform slots.
    rows = []
    base = dt.datetime(2024, 1, 5, 0, 0, 0)
    sizes = [1, 1, 1, 1, 8, 1, 1, 1, 1, 1, 1, 30, 1, 1, 1, 1]  # events per slot
    for slot, n in enumerate(sizes):
        for i in range(n):
            rows.append((base + dt.timedelta(minutes=15 * slot, seconds=i), "x" * 10))
    base2 = dt.datetime(2024, 1, 6, 0, 0, 0)
    for slot in range(3):
        for i in range(4):
            rows.append((base2 + dt.timedelta(minutes=15 * slot, seconds=i), "y" * 5))
    ev = spark.createDataFrame(rows, "ts TIMESTAMP, props STRING")
    with um.patch.object(E, "_t", lambda s, sf, name: ev):
        got = {
            (r["day"], r["bin_id"]): (r["n_files"], r["bytes_in"], r["target_bytes"])
            for r in E.layout_compaction_planner(spark, "ignored").collect()
        }

    # python replay of the running-sum rule
    def day_of(t):
        return int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1000) // 86400000

    from collections import defaultdict

    manifest = defaultdict(lambda: [0, 0])  # (day, slot) -> [n, plen_sum]
    for t, p in rows:
        mins = int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1000) // 60000
        manifest[(day_of(t), mins % 1440 // 15)][0] += 1
        manifest[(day_of(t), mins % 1440 // 15)][1] += len(p)
    files = {k: 64 * n + s for k, (n, s) in manifest.items()}
    expected = {}
    for day in sorted({d for d, _ in files}):
        day_files = sorted((sl, b) for (d, sl), b in files.items() if d == day)
        total = sum(b for _, b in day_files)
        target = max(total // max(len(day_files) // E._CP_MERGE_FACTOR, 1), 1)
        cum = 0
        for sl, b in day_files:
            bin_id = cum // target
            n, s, _ = expected.get((day, bin_id), (0, 0, target))
            expected[(day, bin_id)] = (n + 1, s + b, target)
            cum += b
    assert got == expected, (got, expected)
    # conservation + actual merging on the uniform day
    assert sum(v[1] for v in got.values()) == sum(files.values())
    assert sum(v[0] for v in got.values()) == len(files)
    d2 = day_of(base2)
    d2_bins = [v for (d, _), v in got.items() if d == d2]
    assert sum(n for n, _, _ in d2_bins) == 3 and len(d2_bins) <= 2


def test_count_windows_flink_semantics(spark):
    """Flink countWindow(5) parity: windows fire only when FULL (a
    trailing partial never emits), elements are assigned in (ts,
    event_id) order, and aggregates match the python replay."""
    import datetime as dt

    import unittest.mock as um

    import test_flink_spark.plans.enterprise as E

    base = dt.datetime(2024, 2, 1)
    rows = []
    # user 1: 12 events (2 full windows + trailing partial of 2)
    for i in range(12):
        rows.append((100 + i, base + dt.timedelta(seconds=i), 1, "view", float(i)))
    # user 2: exactly 5 events, two sharing a timestamp (event_id breaks tie)
    for i, (eid, sec) in enumerate([(201, 0), (202, 1), (203, 1), (204, 2), (205, 3)]):
        rows.append((eid, base + dt.timedelta(seconds=sec), 2, "view", 1.0))
    # user 3: 4 events -> no window fires
    for i in range(4):
        rows.append((300 + i, base + dt.timedelta(seconds=i), 3, "view", 1.0))
    ev = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"
    )
    with um.patch.object(E, "_t", lambda s, sf, name: ev):
        got = {
            (r["user_id"], r["window_id"]): (
                r["n_events"],
                r["value_cents"],
            )
            for r in E.events_count_windows(spark, "ignored").collect()
        }
    expected = {
        (1, 0): (5, sum(i * 100 for i in range(5))),
        (1, 1): (5, sum(i * 100 for i in range(5, 10))),
        (2, 0): (5, 500),
    }
    assert got == expected, (got, expected)


def test_dynamic_session_windows_gap_extractor_semantics(spark):
    """Flink withDynamicGap parity on a crafted stream: a purchase's
    30-min proposed window bridges a gap that the view gap (5 min) would
    split; transitive extension keeps the session alive through a chain;
    and the same spacing WITHOUT the purchase splits.  Python replay of
    the running-max rule confirms every session assignment."""
    import datetime as dt

    import unittest.mock as um

    import test_flink_spark.plans.enterprise as E

    base = dt.datetime(2024, 4, 1)

    def ev(eid, minute, typ, uid):
        return (eid, base + dt.timedelta(minutes=minute), uid, typ, 1.0)

    rows = [
        # user 1: view@0, purchase@4, view@20 — the purchase (30-min gap)
        # bridges minute 4 -> 20; a view-only stream would split at 5 min
        ev(1, 0, "view", 1),
        ev(2, 4, "purchase", 1),
        ev(3, 20, "view", 1),
        # then silence until minute 60 -> new session
        ev(4, 60, "view", 1),
        # user 2: same spacing, no purchase -> splits at each >5-min gap
        ev(10, 0, "view", 2),
        ev(11, 4, "view", 2),
        ev(12, 20, "view", 2),
    ]
    df = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"
    )
    with um.patch.object(E, "_t", lambda s, sf, name: df):
        got = {
            (r["user_id"], r["session_id"]): r["n_events"]
            for r in E.events_dynamic_session_windows(spark, "ignored").collect()
        }
    expected = {
        (1, 1): 3,  # view, purchase, view@20 (bridged by the purchase)
        (1, 2): 1,  # view@60
        (2, 1): 2,  # view@0 + view@4
        (2, 2): 1,  # view@20 (5-min gap can't bridge 16 min)
    }
    assert got == expected, (got, expected)
