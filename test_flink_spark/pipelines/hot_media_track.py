"""HotMediaTrack pipeline (HotMediaTrack.java:45-96): Kafka topic-pattern →
JSON parse (5-of-~50 projection) → event-time 30 s tumbling window → count
per (appid, type) → JDBC sink.

Reassembled Spark-first: the same logical plan serves batch replay and
streaming; the sink is a foreachBatch JDBC upsert (exactly-once upgrade over
the reference's per-row autocommit INSERT — SURVEY.md §4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.parsing import parse_log_track
from ..operators.windows import tumbling_count
from ..sinks.jdbc import jdbc_upsert_writer
from ..sinks.memory import start_foreach_batch
from ..streaming.watermarks import ascending_watermark


def transform(raw_values: DataFrame, streaming: bool = True) -> DataFrame:
    """value:string → LogTrackPoint rows (time, appid, type, count).

    Column names match the reference's INSERT (HotMediaTrack.java:116).
    """
    parsed = parse_log_track(raw_values)
    if streaming:
        parsed = ascending_watermark(parsed, "receive_time")
    counts = tumbling_count(
        parsed, "receive_time", ["appid", "type"], "30 seconds", count_as="count"
    )
    return counts.select(
        F.timestamp_millis(F.col("window_end")).alias("time"),
        "appid",
        "type",
        "count",
    )


def run_streaming(
    raw_values: DataFrame,
    mysql_url: str,
    mysql_user: str,
    mysql_password: str,
    checkpoint: str,
    table: str = "log_track_point",
):
    """E1 config surface (kafka_url/mysql_* — HotMediaTrack.java:40-43) maps
    to plain arguments; the Kafka source is built by the caller via
    sources.kafka.kafka_reader(topic_pattern='log_track_.*')."""
    out = transform(raw_values, streaming=True)
    writer = jdbc_upsert_writer(
        mysql_url,
        table,
        key_cols=["time", "appid", "type"],
        properties={"user": mysql_user, "password": mysql_password},
    )
    return start_foreach_batch(out, writer, name="track count", checkpoint=checkpoint)
