"""Batch file-sink tests: partitioned parquet round-trip with pruning."""

from __future__ import annotations

import contextlib
import io
import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from test_flink_spark.schemas import load_table
from test_flink_spark.sinks.files import write_parquet

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="tfs-sink-")
    yield Path(d)
    shutil.rmtree(d, ignore_errors=True)


def test_partitioned_parquet_roundtrip_and_pruning(spark, tmpdir):
    ev = load_table(spark, SF, "events")
    out = str(tmpdir / "events_by_type")
    write_parquet(ev, out, partition_by=["event_type"])
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    # directory partitioning must yield partition pruning, not a filter scan
    q = back.filter(F.col("event_type") == "view")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [isnotnull(event_type" in plan
    assert q.count() == ev.filter(F.col("event_type") == "view").count()


def test_upsert_statement_dialects():
    from test_flink_spark.sinks.jdbc import upsert_statement

    cols = ["time", "appid", "type", "count"]
    keys = ["time", "appid", "type"]
    my = upsert_statement("log_track_point", "stg", cols, keys, "mysql")
    assert my.startswith("INSERT INTO log_track_point")
    assert "ON DUPLICATE KEY UPDATE count = VALUES(count)" in my
    ansi = upsert_statement("t", "s", cols, keys, "ansi")
    assert ansi.startswith("MERGE INTO t")
    assert "WHEN MATCHED THEN UPDATE SET t.count = s.count" in ansi
    assert "t.time = s.time AND t.appid = s.appid AND t.type = s.type" in ansi
