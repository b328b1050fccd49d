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
