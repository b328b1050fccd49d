"""Parsing tests (SURVEY.md §2.2 P1/P2) against a golden record shaped like
the sample embedded at HotMediaTrack.java:38 (same consumed fields; extra
fields present to prove the 5-of-~50 projection)."""

from __future__ import annotations

import json

from test_flink_spark.functions.parsing import parse_log_track, parse_user_behavior

# Synthetic golden record: the 5 consumed fields (FIXTURES.md §1) + noise
# fields standing in for the ~45 the reference discards.
GOLDEN = json.dumps(
    {
        "appid": "281572317291614",
        "event_type": 2,
        "timestamp": 1579337998,       # epoch seconds (×1000 in P1)
        "event_time": 1579337996,      # epoch seconds, nullable
        "log_time": 1579337998710,     # epoch millis — watermark column
        "imei": "ignored", "mac": "ignored", "lat": 1.5, "lon": 2.5,
        "ad_channel_id": 7, "nonce": 0.1,
    }
)

GOLDEN_NULL_EVENT_TIME = json.dumps(
    {"appid": "a1", "event_type": 1, "timestamp": 100, "log_time": 100_500}
)


def test_parse_log_track_golden(spark):
    df = spark.createDataFrame([(GOLDEN,), (GOLDEN_NULL_EVENT_TIME,)], "value STRING")
    out = {r["appid"]: r for r in parse_log_track(df).collect()}
    r = out["281572317291614"]
    assert r["type"] == 2
    assert int(r["send_time"].timestamp() * 1000) == 1579337998000  # ×1000
    assert int(r["event_time"].timestamp() * 1000) == 1579337996000
    assert int(r["receive_time"].timestamp() * 1000) == 1579337998710  # millis kept
    # null-safe event_time (HotMediaTrack.java:187-190)
    r2 = out["a1"]
    assert r2["event_time"] is None
    assert int(r2["receive_time"].timestamp() * 1000) == 100_500


def test_parse_user_behavior_trims(spark):
    # whitespace around CSV fields is trimmed (HotItemAnalysis.java:87-91)
    line = " 543462 , 1715 ,1464116 , pv , 1511658000 "
    df = spark.createDataFrame([(line,)], "value STRING")
    r = parse_user_behavior(df).collect()[0]
    assert (r["user_id"], r["item_id"], r["category_id"], r["behavior"]) == (
        543462, 1715, 1464116, "pv",
    )
    assert int(r["ts"].timestamp()) == 1511658000
