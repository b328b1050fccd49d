"""Accuracy and mergeability contracts for the hand-rolled sketches
(operators/sketch.py).  The driver's oracle gate proves both engines
compute the SAME estimates; these tests prove the estimates are GOOD
(error bounds vs exact) and that the sketches fold the way the 100 TB
deployment story claims (merge = re-aggregate, bottom-k candidate union).
All hashing is deterministic, so every assertion is a fixed number per
dataset — stable, not probabilistic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from test_flink_spark.operators import sketch as sk
from test_flink_spark.schemas import load_table

SF = "/root/testdata/sf0.01"

# HLL m=256 -> rsd = 1.04/sqrt(256) = 6.5%; KMV k=64 -> rsd ~ 1/sqrt(62) ~ 12.7%.
HLL_BAND = 3 * 1.04 / (sk.HLL_M ** 0.5)
KMV_BAND = 3 * 1.0 / ((sk.KMV_K - 2) ** 0.5)


def _exact_by_type(spark):
    ev = load_table(spark, SF, "events")
    return {
        r["event_type"]: r["exact"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }


def test_hll_within_error_band(spark):
    ev = load_table(spark, SF, "events")
    exact = _exact_by_type(spark)
    rows = sk.hll_distinct(ev, "user_id", ["event_type"]).collect()
    assert len(rows) == len(exact)
    for r in rows:
        rel = abs(r["hll_est"] - exact[r["event_type"]]) / exact[r["event_type"]]
        assert rel <= HLL_BAND, (r["event_type"], r["hll_est"], exact[r["event_type"]])


def test_hll_registers_merge_exactly(spark):
    """Union two disjoint halves' register tables and re-max: identical to
    the whole-corpus registers — the merge a multi-day rollup performs."""
    ev = load_table(spark, SF, "events")
    reg, rank = sk.hll_register_rank(F.col("user_id"))
    proj = ev.select("event_type", reg.alias("reg"), rank.alias("rank"))
    whole = proj.groupBy("event_type", "reg").agg(F.max("rank").alias("m"))
    h1 = proj.filter(F.col("reg") % 2 == 0)
    h2 = proj.filter(F.col("reg") % 2 == 1)
    merged = (
        h1.groupBy("event_type", "reg").agg(F.max("rank").alias("m"))
        .unionAll(h2.groupBy("event_type", "reg").agg(F.max("rank").alias("m")))
        .groupBy("event_type", "reg")
        .agg(F.max("m").alias("m"))
    )
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_hll_merge_rollup_equals_direct_global(spark):
    """The merged '__all__' estimate (folded from per-type register
    tables) must be IDENTICAL to running the sketch directly over the
    whole table with no grouping — associativity of the register max,
    end-to-end through the estimator."""
    from test_flink_spark.plans.advanced import sketch_hll_merge_rollup

    rows = {
        r["event_type"]: r["hll_est"]
        for r in sketch_hll_merge_rollup(spark, SF).collect()
    }
    ev = load_table(spark, SF, "events")
    direct = sk.hll_distinct(
        ev.withColumn("g", F.lit(1)), "user_id", ["g"]
    ).collect()[0]["hll_est"]
    assert rows["__all__"] == direct
    per_type = {
        r["event_type"]: r["hll_est"]
        for r in sk.hll_distinct(ev, "user_id", ["event_type"]).collect()
    }
    assert {k: v for k, v in rows.items() if k != "__all__"} == per_type


def test_kmv_within_error_band_and_exact_below_k(spark):
    ev = load_table(spark, SF, "events")
    exact = _exact_by_type(spark)
    for r in sk.kmv_distinct(ev, "user_id", ["event_type"]).collect():
        ex = exact[r["event_type"]]
        if ex < sk.KMV_K:
            assert r["kmv_est"] == ex and r["kth_hash"] is None
        else:
            rel = abs(r["kmv_est"] - ex) / ex
            assert rel <= KMV_BAND, (r["event_type"], r["kmv_est"], ex)


def test_kmv_partition_fold_equals_direct(spark):
    """The cluster-scale path: per-partition bottom-k candidate lists,
    unioned, re-folded — must yield the same k-th hash as the direct
    per-group sort (the k smallest of a union are contained in the union
    of each part's k smallest)."""
    ev = load_table(spark, SF, "events")
    h = sk.h60(F.col("user_id"), "kmv")
    distinct = ev.select("event_type", h.alias("h")).distinct()
    direct = distinct.groupBy("event_type").agg(
        F.element_at(F.slice(F.sort_array(F.collect_set("h")), 1, sk.KMV_K), sk.KMV_K)
        .alias("kth")
    )
    # simulate 8 partitions by hash-sharding, fold bottom-k per shard first
    parts = (
        distinct.withColumn("shard", F.col("h") % 8)
        .groupBy("event_type", "shard")
        .agg(F.slice(F.sort_array(F.collect_set("h")), 1, sk.KMV_K).alias("cand"))
        .select("event_type", F.explode("cand").alias("h"))
        .groupBy("event_type")
        .agg(
            F.element_at(
                F.slice(F.sort_array(F.collect_set("h")), 1, sk.KMV_K), sk.KMV_K
            ).alias("kth")
        )
    )
    mismatches = (
        direct.alias("d")
        .join(parts.alias("p"), "event_type")
        .filter("d.kth IS DISTINCT FROM p.kth")
        .count()
    )
    assert mismatches == 0


def test_cms_never_undercounts_and_bounded_overcount(spark):
    ev = load_table(spark, SF, "events")
    n_total = ev.count()
    sketch = sk.cms_build(ev, "user_id")
    # sketch row-count is bounded by d*w regardless of input size
    assert sketch.count() <= sk.CMS_D * sk.CMS_W
    cand = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = sk.cms_estimate(sketch, cand.select("user_id"), "user_id")
    joined = cand.join(est, "user_id").collect()
    assert joined
    # CMS guarantee: est in [exact, exact + eps*N] w.h.p., eps ~ e/w
    eps_bound = 0.01 * n_total
    for r in joined:
        assert r["cms_est"] >= r["exact_cnt"], r
        assert r["cms_est"] - r["exact_cnt"] <= eps_bound, r


def test_cms_merge_is_resummation(spark):
    """Sketches of two disjoint halves, summed bucket-wise, equal the
    whole-corpus sketch exactly."""
    ev = load_table(spark, SF, "events")
    whole = sk.cms_build(ev, "user_id")
    h1 = sk.cms_build(ev.filter(F.col("event_id") % 2 == 0), "user_id")
    h2 = sk.cms_build(ev.filter(F.col("event_id") % 2 == 1), "user_id")
    merged = (
        h1.unionAll(h2).groupBy("row_i", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


# ---------------------------------------------------------------------------
# Integer-exact anomaly flag (plans/advanced.py::events_daily_anomaly)
# ---------------------------------------------------------------------------


def test_anomaly_flag_fires_on_injected_spike(spark):
    """The cross-multiplied 3-sigma test must flag a synthetic 10x day and
    leave flat days unflagged — exercised directly on the same integer
    inequality the registered query uses."""
    rows = [("click", d, 100) for d in range(10)] + [("click", 10, 1000)]
    daily = spark.createDataFrame(rows, "event_type STRING, day BIGINT, cnt BIGINT")
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("t"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("ss"),
    )
    j = daily.join(stats, "event_type")
    dev = F.col("n") * F.col("cnt") - F.col("t")
    flagged = j.select(
        "day", (dev * dev > F.lit(9) * (F.col("n") * F.col("ss") - F.col("t") * F.col("t"))).alias("f")
    ).collect()
    by_day = {r["day"]: r["f"] for r in flagged}
    assert by_day[10] is True
    assert all(not by_day[d] for d in range(10))


def test_kmv_overlap_close_to_exact(spark):
    """Jaccard/intersection estimated from bottom-k sketches vs exact set
    arithmetic on the same data (deterministic — fixed error per dataset)."""
    from test_flink_spark.plans.advanced import sketch_kmv_overlap

    est = sketch_kmv_overlap(spark, SF).collect()[0]
    ev = load_table(spark, SF, "events")
    view = {r[0] for r in ev.filter("event_type = 'view'").select("user_id").distinct().collect()}
    pur = {r[0] for r in ev.filter("event_type = 'purchase'").select("user_id").distinct().collect()}
    exact_union, exact_inter = len(view | pur), len(view & pur)
    assert abs(est["union_est"] - exact_union) / exact_union <= KMV_BAND
    assert abs(est["inter_est"] - exact_inter) / max(exact_inter, 1) <= 2 * KMV_BAND
    exact_j_bp = 10000 * exact_inter // exact_union
    assert abs(est["jaccard_bp"] - exact_j_bp) <= 2 * KMV_BAND * 10000


def test_histogram_quantiles_within_one_bucket(spark):
    """Histogram estimate must land within one bucket width of the exact
    interpolated percentile (the sketch's error contract)."""
    from test_flink_spark.plans.advanced import _HIST_HI, _HIST_LO

    ev = load_table(spark, SF, "events")
    width = (_HIST_HI - _HIST_LO) / sk.HIST_B
    est = {
        r["event_type"]: (r["q_50"], r["q_90"])
        for r in sk.histogram_quantiles(
            ev, "value", ["event_type"], _HIST_LO, _HIST_HI
        ).collect()
    }
    exact = {
        r["event_type"]: (r["p50"], r["p90"])
        for r in ev.groupBy("event_type")
        .agg(
            F.percentile("value", F.lit(0.5)).alias("p50"),
            F.percentile("value", F.lit(0.9)).alias("p90"),
        )
        .collect()
    }
    for t, (q50, q90) in est.items():
        assert abs(q50 - exact[t][0]) <= width + 1e-9, (t, q50, exact[t][0])
        assert abs(q90 - exact[t][1]) <= width + 1e-9, (t, q90, exact[t][1])


def test_histogram_merge_is_resummation(spark):
    """Histograms of two halves re-sum to the whole-corpus histogram."""
    ev = load_table(spark, SF, "events")
    b = F.least(
        F.greatest(
            F.floor(((F.col("value") - 0.0) * float(sk.HIST_B)) / 1000.0).cast("long"),
            F.lit(0),
        ),
        F.lit(sk.HIST_B - 1),
    )
    def hist(df):
        return df.select("event_type", b.alias("bucket")).groupBy(
            "event_type", "bucket"
        ).agg(F.count(F.lit(1)).alias("cnt"))
    whole = hist(ev)
    merged = (
        hist(ev.filter(F.col("event_id") % 2 == 0))
        .unionAll(hist(ev.filter(F.col("event_id") % 2 == 1)))
        .groupBy("event_type", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


# ---------------------------------------------------------------------------
# Z-order layout (operators/layout.py)
# ---------------------------------------------------------------------------


def test_zorder_interleave_roundtrip(spark):
    """Every input bit lands at its interleaved position and nowhere else:
    de-interleaving the code recovers both keys exactly."""
    from test_flink_spark.operators import layout

    df = spark.createDataFrame(
        [(a, b) for a in (0, 1, 5, 1023, 65535) for b in (0, 2, 7, 4095, 65535)],
        "a BIGINT, b BIGINT",
    ).withColumn("z", layout.zorder_code("a", "b"))
    back_a = " | ".join(f"(((z >> {2 * i}) & 1) << {i})" for i in range(16))
    back_b = " | ".join(f"(((z >> {2 * i + 1}) & 1) << {i})" for i in range(16))
    bad = df.filter(F.expr(f"({back_a}) != a OR ({back_b}) != b")).count()
    assert bad == 0


def test_zorder_layout_files_have_disjoint_ranges(spark):
    """repartitionByRange + sortWithinPartitions on the z-code yields
    partitions whose [min, max] code ranges do not overlap — the property
    zone-map file skipping relies on."""
    from test_flink_spark.operators import layout
    from test_flink_spark.schemas import load_table

    ev = load_table(spark, SF, "events").select(
        (F.col("user_id") % 65536).alias("u16"),
        F.expr("(unix_millis(cast(ts as timestamp)) div 60000) & 65535").alias("m16"),
    )
    coded = ev.withColumn("zcode", layout.zorder_code("u16", "m16"))
    laid = layout.zorder_layout(coded, "zcode", partitions=8)
    ranges = (
        laid.select("zcode", F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .agg(F.min("zcode").alias("lo"), F.max("zcode").alias("hi"))
        .orderBy("lo")
        .collect()
    )
    assert len(ranges) > 1
    for prev, cur in zip(ranges, ranges[1:]):
        assert prev["hi"] <= cur["lo"], (prev, cur)
