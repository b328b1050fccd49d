"""Parsing / projection scalar functions (SURVEY.md §2.2 P1-P4).

Reference:
    P1 ``TextToBean``  HotMediaTrack.java:174-207 — fastjson parse, project 5
       of ~50 fields, epoch-seconds ×1000 (null-safe for event_time).
    P2 CSV lambda      HotItemAnalysis.java:83-93 — split(","), trim, cast.
    P3 unit normalization  ×1000 at HotMediaTrack.java:184,189;
       HotItemAnalysis.java:97.
    P4 result formatting   HotItemAnalysis.java:204-217.

All expressed with built-in functions (from_json / from_csv / split / trim /
to_timestamp / format_string): JVM-side, codegen-fused, pushdown-friendly —
the Spark equivalent of the reference's early projection that drops ~45
fields right after the source (SURVEY.md §4.1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import LOG_TRACK_JSON, USER_BEHAVIOR_CSV


def epoch_seconds_to_ts(col: Column) -> Column:
    """P3: epoch-seconds BIGINT → TimestampType (the ×1000 normalization).

    Null-safe by construction — Spark expressions propagate null, matching
    the explicit null check at HotMediaTrack.java:187-190.
    """
    return F.timestamp_seconds(col)


def epoch_millis_to_ts(col: Column) -> Column:
    """P3: epoch-millis BIGINT → TimestampType (log_time is already millis,
    HotMediaTrack.java:193)."""
    return F.timestamp_millis(col)


def parse_log_track(df: DataFrame, value_col: str = "value") -> DataFrame:
    """P1: JSON string → LogTrack rows (HotMediaTrack.java:174-207).

    from_json with an explicit 5-field schema materializes only the consumed
    fields; extra JSON keys are ignored (PERMISSIVE mode), matching the
    reference's projection of 5 of ~50 fields.
    """
    parsed = df.select(F.from_json(F.col(value_col), LOG_TRACK_JSON).alias("j"))
    return parsed.select(
        F.col("j.appid").alias("appid"),
        F.col("j.event_type").alias("type"),
        epoch_seconds_to_ts(F.col("j.timestamp")).alias("send_time"),
        epoch_seconds_to_ts(F.col("j.event_time")).alias("event_time"),
        epoch_millis_to_ts(F.col("j.log_time")).alias("receive_time"),
    )


def parse_user_behavior(df: DataFrame, value_col: str = "value") -> DataFrame:
    """P2: CSV line → UserBehavior rows (HotItemAnalysis.java:83-93).

    from_csv handles the split+cast; whitespace around fields is trimmed
    first (the reference trims each field, HotItemAnalysis.java:87-91) by
    normalizing ``", "`` → ``","`` via regexp before the parse.
    """
    cleaned = F.regexp_replace(F.col(value_col), r"\s*,\s*", ",")
    parsed = df.select(F.from_csv(F.trim(cleaned), USER_BEHAVIOR_CSV).alias("c"))
    return parsed.select(
        F.col("c.user_id").alias("user_id"),
        F.col("c.item_id").alias("item_id"),
        F.col("c.category_id").alias("category_id"),
        F.col("c.behavior").alias("behavior"),
        epoch_seconds_to_ts(F.col("c.timestamp")).alias("ts"),
    )


def format_topn_report(df: DataFrame) -> DataFrame:
    """P4: render Top-N rows as the reference's console strings
    (HotItemAnalysis.java:204-217).  Kept OUT of the core pipeline — the
    structured rows (window_end, rank, item_id, cnt) are the testable
    contract (SURVEY.md §2.2 P4 note); this is sink-side sugar only.

    The reference's onTimer fires at ``windowEnd + 1`` and prints
    ``new Timestamp(timestamp - 1)`` — i.e. the window end itself, so the
    rendered time is exactly ``window_end`` (no off-by-one).
    """
    return df.select(
        F.format_string(
            "time : %s  No %d -> %d : %d",
            F.timestamp_millis(F.col("window_end")).cast("string"),
            F.col("rank"),
            F.col("item_id"),
            F.col("cnt"),
        ).alias("line")
    )
