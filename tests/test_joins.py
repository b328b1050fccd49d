"""As-of join semantics tests (operators/joins.py): backward match,
inclusive ties, no-match null, tolerance."""

from __future__ import annotations

from pyspark.sql import functions as F

from test_flink_spark.operators.joins import asof_join


def _df(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    return df.withColumn("ts", F.timestamp_millis(F.col("t"))).drop("t")


def test_asof_backward_inclusive(spark):
    left = _df(spark, [(1, "u", 100), (2, "u", 200), (3, "u", 50)], "id INT, k STRING, t BIGINT")
    right = _df(
        spark, [("u", 100, 1.0), ("u", 150, 2.0), ("v", 10, 9.0)], "k STRING, t BIGINT, v DOUBLE"
    )
    out = asof_join(left, right, ["k"], "ts", "ts", ["v"])
    got = {r["id"]: r["v"] for r in out.collect()}
    assert got[1] == 1.0  # tie at t=100 is inclusive (<=)
    assert got[2] == 2.0  # latest prior
    assert got[3] is None  # nothing at or before t=50


def test_asof_null_value_row_still_matches(spark):
    """A right row whose value column is legitimately NULL must win over an
    older non-null row — matching is on the row, not per-value (pandas
    merge_asof / DuckDB ASOF row semantics)."""
    left = _df(spark, [(1, "u", 200), (2, "u", 120)], "id INT, k STRING, t BIGINT")
    right = _df(
        spark,
        [("u", 100, 1.0), ("u", 150, None)],
        "k STRING, t BIGINT, v DOUBLE",
    )
    got = {r["id"]: r["v"] for r in asof_join(left, right, ["k"], "ts", "ts", ["v"]).collect()}
    assert got[1] is None  # matched row (t=150) has NULL v — keep it
    assert got[2] == 1.0  # t=120 still matches the t=100 row


def test_asof_tolerance(spark):
    left = _df(spark, [(1, "u", 1000)], "id INT, k STRING, t BIGINT")
    right = _df(spark, [("u", 100, 7.0)], "k STRING, t BIGINT, v DOUBLE")
    near = asof_join(left, right, ["k"], "ts", "ts", ["v"], tolerance_ms=1000)
    far = asof_join(left, right, ["k"], "ts", "ts", ["v"], tolerance_ms=100)
    assert near.collect()[0]["v"] == 7.0
    assert far.collect()[0]["v"] is None


def test_salted_count_equals_plain(spark):
    from test_flink_spark.operators.skew import salted_count, salted_sum

    rows = [("hot", i * 1.5, i) for i in range(500)] + [("cold", 1.0, 999)]
    df = spark.createDataFrame(rows, "k STRING, v DOUBLE, id BIGINT")
    plain = {r["k"]: r["count"] for r in df.groupBy("k").count().collect()}
    for buckets in (1, 4, 64):
        salted = {
            r["k"]: r["cnt"]
            for r in salted_count(df, ["k"], "id", salt_buckets=buckets).collect()
        }
        assert salted == plain
    sums = {r["k"]: r["total"] for r in salted_sum(df, ["k"], "v", "id").collect()}
    assert abs(sums["hot"] - sum(i * 1.5 for i in range(500))) < 1e-9


def test_banded_interval_join_equals_naive(spark):
    """Banded pure-range join ≡ the naive range predicate on random
    intervals (incl. empty/inverted intervals and multi-band spans), and
    its plan is an equality join, not a nested loop."""
    import contextlib
    import io
    import random

    from pyspark.sql import functions as F

    from test_flink_spark.operators.joins import banded_interval_join

    rng = random.Random(11)
    points = [(i, rng.randrange(0, 100_000)) for i in range(300)]
    intervals = []
    for j in range(120):
        s = rng.randrange(0, 100_000)
        # widths from sub-band to several bands; every 10th inverted/empty
        e = s + rng.randrange(0, 30_000) if j % 10 else s - rng.randrange(0, 5_000)
        intervals.append((j, s, e))
    left = spark.createDataFrame(points, "pid long, t long")
    right = spark.createDataFrame(intervals, "iid long, s long, e long")

    got = sorted(
        (r["pid"], r["iid"])
        for r in banded_interval_join(left, right, "t", "s", "e", band_ms=10_000).collect()
    )
    exp = sorted(
        (p, i) for p, t in points for i, s, e in intervals if s <= t < e
    )
    assert got == exp and got  # non-vacuous

    plan_buf = io.StringIO()
    with contextlib.redirect_stdout(plan_buf):
        banded_interval_join(left, right, "t", "s", "e", 10_000).explain("formatted")
    plan = plan_buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan

    import pytest as _pytest

    with _pytest.raises(ValueError):
        banded_interval_join(left, right, "t", "s", "e", 0)
    with _pytest.raises(ValueError):
        banded_interval_join(left, right, "t", "s", "e", 10_000, how="left")


def test_bucketed_join_is_shuffle_free(spark):
    """Tables bucketed on the join key with equal bucket counts must join
    with ZERO Exchanges (the write-time shuffle amortization the layout
    exists for) and bucketed scans on both sides."""
    import contextlib
    import io

    from test_flink_spark.sources.bucketed import bucketed_lineitem_orders

    li, orders = bucketed_lineitem_orders(spark, "/root/testdata/sf0.001")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_custkey"
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, f"bucketed join shuffled:\n{plan}"
        assert plan.count("Bucketed: true") == 2, f"scan not bucketed:\n{plan}"
        # bucket-sorted files let the merge skip nothing correctness-wise;
        # row parity against the plain parquet join:
        from test_flink_spark.schemas import load_table

        plain = load_table(spark, "/root/testdata/sf0.001", "lineitem").join(
            load_table(spark, "/root/testdata/sf0.001", "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
