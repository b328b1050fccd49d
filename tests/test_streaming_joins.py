"""Streaming join coverage (SURVEY.md §2.10 engine stance): stream-static
enrichment and watermark-bounded stream-stream join, plus PipelineConfig."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from test_flink_spark.config import PipelineConfig
from test_flink_spark.sinks.memory import start_memory
from test_flink_spark.sources.files import json_source


@pytest.fixture()
def tmpdirs():
    d = tempfile.mkdtemp(prefix="tfs-sjoin-")
    yield Path(d)
    shutil.rmtree(d, ignore_errors=True)


def test_stream_static_join(spark, tmpdirs):
    src = tmpdirs / "src"
    src.mkdir()
    (src / "b1.json").write_text(
        '{"item_id": 1, "t": 1000}\n{"item_id": 2, "t": 2000}\n{"item_id": 9, "t": 3000}\n'
    )
    stream = json_source(spark, str(src), "item_id LONG, t LONG", streaming=True)
    dim = spark.createDataFrame([(1, "alpha"), (2, "beta")], "item_id LONG, name STRING")
    enriched = stream.join(F.broadcast(dim), "item_id", "left")
    q = start_memory(enriched, "ss_join", str(tmpdirs / "ckpt"))
    try:
        q.processAllAvailable()
        rows = {r["item_id"]: r["name"] for r in spark.table("ss_join").collect()}
    finally:
        q.stop()
    assert rows == {1: "alpha", 2: "beta", 9: None}


def test_stream_stream_join_watermark_bounded(spark, tmpdirs):
    imp_dir = tmpdirs / "imp"
    clk_dir = tmpdirs / "clk"
    imp_dir.mkdir()
    clk_dir.mkdir()
    (imp_dir / "b1.json").write_text(
        '{"ad_id": 1, "ts": "2024-01-01T00:00:00Z"}\n{"ad_id": 2, "ts": "2024-01-01T00:00:05Z"}\n'
    )
    (clk_dir / "b1.json").write_text(
        '{"ad_id": 1, "cts": "2024-01-01T00:00:30Z"}\n{"ad_id": 3, "cts": "2024-01-01T00:00:40Z"}\n'
    )
    imps = (
        json_source(spark, str(imp_dir), "ad_id LONG, ts TIMESTAMP", streaming=True)
        .withWatermark("ts", "10 seconds")
    )
    clicks = (
        json_source(spark, str(clk_dir), "ad_id LONG, cts TIMESTAMP", streaming=True)
        .withWatermark("cts", "10 seconds")
    )
    # click must follow its impression within 1 minute — the canonical
    # watermark-bounded stream-stream inner join
    joined = imps.join(
        clicks,
        (imps.ad_id == clicks.ad_id)
        & (clicks.cts >= imps.ts)
        & (clicks.cts <= imps.ts + F.expr("INTERVAL 1 MINUTE")),
    ).select(imps.ad_id.alias("ad_id"), "ts", "cts")
    q = start_memory(joined, "ss2_join", str(tmpdirs / "ckpt"))
    try:
        q.processAllAvailable()
        rows = spark.table("ss2_join").collect()
    finally:
        q.stop()
    assert len(rows) == 1 and rows[0]["ad_id"] == 1  # ad 2 unclicked, ad 3 unmatched


def test_pipeline_config_from_args():
    cfg = PipelineConfig.from_args(
        ["--kafka_url", "k:9092", "--mysql_url", "jdbc:mysql://h/db", "--custom", "x"]
    )
    assert cfg.kafka_url == "k:9092"
    assert cfg.extra == {"custom": "x"}
    with pytest.raises(ValueError, match="missing required"):
        cfg.require("mysql_username")
    cfg.require("kafka_url", "mysql_url")  # present → no raise


def test_stream_stream_left_outer_join_emits_on_watermark_timeout(spark, tmpdirs):
    """Left-outer stream-stream join semantics: an unmatched impression
    must NOT emit while its join window could still be filled, and MUST
    emit (null click) once the watermark passes the window end — the
    timeout behavior Flink users get from intervalJoin + OutputTag and
    Structured Streaming implements natively via state watermark
    cleanup."""
    imp_dir = tmpdirs / "imp2"
    clk_dir = tmpdirs / "clk2"
    imp_dir.mkdir()
    clk_dir.mkdir()
    (imp_dir / "b1.json").write_text(
        '{"ad_id": 1, "ts": "2024-01-01T00:00:00Z"}\n'
        '{"ad_id": 2, "ts": "2024-01-01T00:00:05Z"}\n'
    )
    (clk_dir / "b1.json").write_text('{"ad_id": 1, "cts": "2024-01-01T00:00:30Z"}\n')
    imps = json_source(
        spark, str(imp_dir), "ad_id LONG, ts TIMESTAMP", streaming=True
    ).withWatermark("ts", "10 seconds")
    clicks = json_source(
        spark, str(clk_dir), "ad_id LONG, cts TIMESTAMP", streaming=True
    ).withWatermark("cts", "10 seconds")
    joined = imps.join(
        clicks,
        (imps.ad_id == clicks.ad_id)
        & (clicks.cts >= imps.ts)
        & (clicks.cts <= imps.ts + F.expr("INTERVAL 1 MINUTE")),
        "left_outer",
    ).select(imps.ad_id.alias("ad_id"), "ts", "cts")
    q = start_memory(joined, "ss_left_join", str(tmpdirs / "ckpt_lo"))
    try:
        q.processAllAvailable()
        first = {r["ad_id"]: r["cts"] for r in spark.table("ss_left_join").collect()}
        # matched row may emit immediately; ad 2's null result must NOT
        # have emitted yet (its 1-minute window is still open)
        assert 2 not in first
        # advance both watermarks far past ad 2's window end
        (imp_dir / "b2.json").write_text('{"ad_id": 8, "ts": "2024-01-01T00:10:00Z"}\n')
        (clk_dir / "b2.json").write_text(
            '{"ad_id": 9, "cts": "2024-01-01T00:10:00Z"}\n'
        )
        q.processAllAvailable()
        q.processAllAvailable()
        rows = {r["ad_id"]: r["cts"] for r in spark.table("ss_left_join").collect()}
    finally:
        q.stop()
    assert rows[1] is not None
    assert 2 in rows and rows[2] is None, rows
