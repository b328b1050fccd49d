"""Kafka source contract tests (SURVEY.md §2.1 S1/S2/S4).

No broker ships in this container, so the reader's CONTRACT is pinned
instead: the exact option map the built reader hands the Kafka connector —
subscription mode, Java-regex pattern translation, offset policy, and the
data-loss stance.  A regression in any of these is a silently different
consumer, which is exactly what a unit test can catch without Kafka.
"""

from __future__ import annotations

import pytest

from test_flink_spark.sources.kafka import (
    java_pattern_to_kafka,
    kafka_options,
)


def test_topic_pattern_contract_matches_reference():
    # reference S1: Pattern.compile("log_track_\S+"), latest offsets
    # (HotMediaTrack.java:59-74)
    opts = kafka_options("broker:9092", topic_pattern="log_track_\\S+")
    assert opts == {
        "kafka.bootstrap.servers": "broker:9092",
        "startingOffsets": "latest",
        "failOnDataLoss": "false",
        "subscribePattern": "log_track_.+",
    }


def test_single_topic_contract():
    # reference S2: plain single-topic consumer (HotItemAnalysis.java:69-79)
    opts = kafka_options(
        "a:9092,b:9092", topic="user_behavior", starting_offsets="earliest"
    )
    assert opts["subscribe"] == "user_behavior"
    assert "subscribePattern" not in opts
    assert opts["startingOffsets"] == "earliest"


def test_exactly_one_subscription_mode():
    with pytest.raises(ValueError):
        kafka_options("b:9092")
    with pytest.raises(ValueError):
        kafka_options("b:9092", topic="t", topic_pattern="p.*")


def test_java_pattern_translation():
    assert java_pattern_to_kafka("log_track_\\S+") == "log_track_.+"
    assert java_pattern_to_kafka("x_\\S*") == "x_.*"
    # already-Kafka-style regexes pass through untouched
    assert java_pattern_to_kafka("topic_[0-9]+") == "topic_[0-9]+"


def test_fail_on_data_loss_opt_in():
    opts = kafka_options("b:9092", topic="t", fail_on_data_loss=True)
    assert opts["failOnDataLoss"] == "true"


def test_reader_builder_accepts_options(spark):
    """The builder path itself must construct (format + options) without a
    broker — .load() is the only broker-touching step."""
    from test_flink_spark.sources.kafka import kafka_reader

    reader = kafka_reader(spark, "broker:9092", topic_pattern="log_track_\\S+")
    assert reader is not None  # construction succeeded; options applied
