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
