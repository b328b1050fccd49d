#!/usr/bin/env python3
"""CLI for the HotMediaTrack pipeline (HotMediaTrack.java:45-96).

    python bin/run_hot_media_track.py --kafka_url host:9092 \
        --mysql_url jdbc:mysql://h/db --mysql_username u --mysql_password p \
        --checkpoint_dir /tmp/ck

Consumes every topic matching ``log_track_.*`` (the reference's regex
subscription), counts per (appid, type) per 30 s tumbling window, and
upserts into MySQL ``log_track_point`` keyed on (time, appid, type).
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from test_flink_spark.config import PipelineConfig
from test_flink_spark.pipelines.hot_media_track import run_streaming
from test_flink_spark.session import get_spark
from test_flink_spark.sources.kafka import kafka_reader, string_values


def main(argv: list[str]) -> None:
    cfg = PipelineConfig.from_args(argv).require(
        "kafka_url", "mysql_url", "mysql_username", "mysql_password"
    )
    spark = get_spark("track count")
    raw = kafka_reader(spark, cfg.kafka_url, topic_pattern="log_track_.*").load()
    query = run_streaming(
        string_values(raw),
        cfg.mysql_url,
        cfg.mysql_username,
        cfg.mysql_password,
        cfg.checkpoint_dir,
    )
    query.awaitTermination()


if __name__ == "__main__":
    main(sys.argv[1:])
