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
