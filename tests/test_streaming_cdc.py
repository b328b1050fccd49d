"""Streaming CDC compaction vs the batch operator: the compacted upsert
stream must reproduce the cdc_latest snapshot on identical input,
including out-of-order arrivals WITHIN and ACROSS micro-batches."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from test_flink_spark.operators.cdc import cdc_latest
from test_flink_spark.sinks.memory import start_memory
from test_flink_spark.sources.files import text_lines
from test_flink_spark.streaming.cdc_stream import streaming_cdc_latest


@pytest.fixture()
def tmpdirs():
    d = tempfile.mkdtemp(prefix="tfs-cdc-stream-")
    yield Path(d)
    shutil.rmtree(d, ignore_errors=True)


# CSV contract: k,seq_ms,seq_id,op,value
BATCH1 = [
    "1,100,1,insert,1.5",
    "1,300,3,update,3.5",   # in-batch out-of-order vs the next line
    "1,200,2,update,2.5",   # absorbed: lower seq than 300
    "2,100,1,insert,9.0",
    "3,100,1,insert,7.0",
]
BATCH2 = [
    "2,200,2,delete,",      # tombstone wins for key 2
    "3,50,0,update,6.0",    # cross-batch LATE row: must be absorbed
    "4,100,1,insert,4.0",
    "1,400,4,update,4.5",   # key 1 winner advances -> re-emitted
]


def _parse(stream):
    c = F.split(F.col("value"), ",")
    return stream.select(
        c.getItem(0).cast("long").alias("k"),
        c.getItem(1).cast("long").alias("seq_ms"),
        c.getItem(2).cast("long").alias("seq_id"),
        c.getItem(3).alias("op"),
        # tombstones carry no payload: '' must become NULL, not a cast error
        F.when(c.getItem(4) == "", None)
        .otherwise(c.getItem(4))
        .cast("double")
        .alias("value"),
    )


def test_streaming_cdc_matches_batch_snapshot(spark, tmpdirs):
    src = tmpdirs / "src"
    src.mkdir()
    (src / "b1.csv").write_text("\n".join(BATCH1) + "\n")

    out = streaming_cdc_latest(_parse(text_lines(spark, str(src), streaming=True)))
    q = start_memory(out, "cdc_stream_test", str(tmpdirs / "ckpt"))
    try:
        q.processAllAvailable()
        n_after_b1 = spark.table("cdc_stream_test").count()
        (src / "b2.csv").write_text("\n".join(BATCH2) + "\n")
        q.processAllAvailable()
        got = spark.table("cdc_stream_test").collect()
    finally:
        q.stop()

    # batch 1 emits one row per key seen (3 keys); batch 2 re-emits only
    # keys whose winner changed: 1 (advanced), 2 (tombstone), 4 (new) —
    # key 3's late row is absorbed silently
    assert n_after_b1 == 3
    assert len(got) == 6

    # compact the upsert stream: last emission per key, drop tombstones
    compacted = {}
    for r in sorted(got, key=lambda r: (r["seq_ms"], r["seq_id"])):
        compacted[r["k"]] = r
    stream_snap = {
        k: (r["op"], r["value"], r["seq_ms"])
        for k, r in compacted.items()
        if r["op"] != "delete"
    }

    all_rows = [tuple(l.split(",")) for l in BATCH1 + BATCH2]
    batch_df = spark.createDataFrame(
        [(int(k), int(s), int(i), op, float(v) if v else None)
         for k, s, i, op, v in all_rows],
        "k LONG, seq_ms LONG, seq_id LONG, op STRING, value DOUBLE",
    )
    batch_snap = {
        r["k"]: (r["op"], r["value"], r["seq_ms"])
        for r in cdc_latest(
            batch_df, ["k"], ["seq_ms", "seq_id"], "op", ["delete"]
        ).collect()
    }
    assert stream_snap == batch_snap
    assert 2 not in stream_snap  # tombstoned key absent from both
