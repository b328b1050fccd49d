"""End-to-end exercise of the Kafka reader path (SURVEY.md §2.1 S1/S2/S4)
against the wire-compatible spool source.

No broker or spark-sql-kafka jar exists in this container (verified: no
kafka jar anywhere on the filesystem and no network to fetch one), so a
live-broker read is impossible here.  These tests close the seam the next
best way: the UNMODIFIED reader builder (kafka_reader — same option map,
same translated subscribePattern) loads through ``kafka_fake`` (a Python
Data Source whose schema/options/subscription semantics mirror the
connector) and feeds the real HotMediaTrack pipeline down to the upsert
sink.  On a cluster with the connector, the only change is
``format_name="kafka"``.
"""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from test_flink_spark.sources.kafka import kafka_reader, with_topic_and_value
from test_flink_spark.sources.kafka_fake import register


def _spool(tmp_path, name, topic, values, t0=1_000_000_000_000):
    rows = [
        {"topic": topic, "partition": 0, "key": None, "value": v,
         "ts_ms": t0 + i}
        for i, v in enumerate(values)
    ]
    (tmp_path / f"{name}.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n"
    )


def _log_track(appid, typ, t_ms):
    # the 5-of-~50 JSON projection parse_log_track consumes
    # (functions/parsing.py: appid, event_type, timestamp, event_time,
    # log_time; receive_time = millis(log_time))
    # event_type is an INTEGER code in the reference schema (LOG_TRACK_JSON)
    return json.dumps(
        {"appid": appid, "event_type": typ, "timestamp": t_ms // 1000,
         "event_time": t_ms // 1000, "log_time": t_ms,
         "uid": "u1", "ip": "10.0.0.1", "noise": "x" * 20}
    )


@pytest.fixture()
def spool(tmp_path):
    d = tmp_path / "spool"
    d.mkdir()
    return d


def test_topic_pattern_subscription_e2e(spark, spool, tmp_path):
    """S1: the reference's regex subscription (log_track_\\S+) consumed
    end-to-end — two matching topics in, one non-matching topic excluded,
    through the real reader builder and the real 30 s window pipeline."""
    register(spark)
    t0 = 1_700_000_000_000
    _spool(spool, "a", "log_track_app1",
           [_log_track("app1", 1, t0 + i * 1000) for i in range(5)])
    _spool(spool, "b", "log_track_app2",
           [_log_track("app2", 2, t0 + i * 1000) for i in range(3)])
    _spool(spool, "c", "other_topic",
           [_log_track("ignored", 1, t0)])

    reader = kafka_reader(
        spark,
        "broker:9092",
        topic_pattern="log_track_\\S+",
        starting_offsets="earliest",
        format_name="kafka_fake",
        extra_options={"path": str(spool)},
    )
    from test_flink_spark.pipelines.hot_media_track import transform
    from test_flink_spark.sources.kafka import string_values

    out = transform(string_values(reader.load()), streaming=True)
    q = (
        out.writeStream.queryName("kafka_e2e")
        .format("memory")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # advance the watermark past the first windows so append-mode emits
        _spool(spool, "d", "log_track_app1",
               [_log_track("app1", 1, t0 + 600_000)])
        q.processAllAvailable()
        rows = {
            (r["appid"], r["type"]): r["count"]
            for r in spark.table("kafka_e2e").collect()
        }
    finally:
        q.stop()
    assert rows.get(("app1", 1)) == 5
    assert rows.get(("app2", 2)) == 3
    assert not any(appid == "ignored" for appid, _ in rows)


def test_single_topic_and_s4_projection(spark, spool):
    """S2 + S4: single-topic subscribe, batch replay of the retained log,
    and the (topic, value) deserializer projection on connector-shaped
    columns (binary value → string)."""
    register(spark)
    _spool(spool, "a", "user_behavior", ["1,10,7,pv,1000", "2,20,7,buy,1001"])
    _spool(spool, "b", "unrelated", ["zzz"])
    df = (
        spark.read.format("kafka_fake")
        .option("subscribe", "user_behavior")
        .option("path", str(spool))
        .load()
    )
    # connector schema contract, column-for-column
    assert [f.name for f in df.schema.fields] == [
        "key", "value", "topic", "partition", "offset", "timestamp",
        "timestampType",
    ]
    tv = with_topic_and_value(df).collect()
    assert {(r["topic"], r["value"]) for r in tv} == {
        ("user_behavior", "1,10,7,pv,1000"),
        ("user_behavior", "2,20,7,buy,1001"),
    }


def test_latest_offsets_skip_retained_log(spark, spool, tmp_path):
    """startingOffsets=latest (the reference's mode, HotMediaTrack.java:66):
    records already in the log when the query starts are NOT consumed;
    records appended afterwards are."""
    register(spark)
    _spool(spool, "a", "log_track_x", [_log_track("old", 1, 1)])
    reader = kafka_reader(
        spark,
        "broker:9092",
        topic_pattern="log_track_\\S+",
        starting_offsets="latest",
        format_name="kafka_fake",
        extra_options={"path": str(spool)},
    )
    df = with_topic_and_value(reader.load())
    q = (
        df.writeStream.queryName("kafka_latest")
        .format("memory")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        with open(spool / "a.jsonl", "a") as fh:
            fh.write(json.dumps(
                {"topic": "log_track_x", "partition": 0, "key": None,
                 "value": _log_track("new", 1, 2), "ts_ms": 2}) + "\n")
        q.processAllAvailable()
        vals = [r["value"] for r in spark.table("kafka_latest").collect()]
    finally:
        q.stop()
    assert len(vals) == 1 and '"appid": "new"' in vals[0]


def test_full_pipeline_to_duckdb_upsert(spark, spool, tmp_path):
    """SK1 closure: the complete HotMediaTrack chain — topic-pattern
    subscription (S1) → JSON parse (P1) → 30 s tumbling count (WIN1) →
    foreachBatch staged upsert executed against a REAL database (DuckDB
    speaks the postgres ON CONFLICT dialect the sink generates).  The
    upsert statement comes from the production generator
    (sinks/jdbc.py::upsert_statement); each micro-batch is staged then
    merged, and a deliberate replay of the last batch proves the
    keyed-merge idempotence the sink claims."""
    import duckdb

    from test_flink_spark.pipelines.hot_media_track import transform
    from test_flink_spark.sinks.jdbc import upsert_statement
    from test_flink_spark.sources.kafka import string_values

    register(spark)
    t0 = 1_700_000_000_000
    _spool(spool, "a", "log_track_app1",
           [_log_track("app1", 1, t0 + i * 1000) for i in range(5)])

    con = duckdb.connect()
    con.execute(
        'CREATE TABLE log_track_point ("time" BIGINT, "appid" TEXT,'
        ' "type" INT, "count" BIGINT, PRIMARY KEY ("time", "appid", "type"))'
    )
    con.execute(
        'CREATE TABLE stg ("time" BIGINT, "appid" TEXT, "type" INT,'
        ' "count" BIGINT)'
    )
    stmt = upsert_statement(
        "log_track_point", "stg",
        ["time", "appid", "type", "count"], ["time", "appid", "type"],
        "postgres",
    )
    batches = []

    def upsert_batch(batch_df, batch_id):
        # driver-side DuckDB stand-in for df.write.jdbc staging (no JDBC
        # driver jar in the container); the MERGE is the production SQL
        rows = [
            (r["time"].replace(tzinfo=None).timestamp() * 1000, r["appid"],
             r["type"], r["count"])
            for r in batch_df.collect()
        ]
        if not rows:
            return
        batches.append(rows)
        cur = con.cursor()
        cur.execute("DELETE FROM stg")
        cur.executemany("INSERT INTO stg VALUES (?, ?, ?, ?)", rows)
        cur.execute(stmt)

    reader = kafka_reader(
        spark, "broker:9092", topic_pattern="log_track_\\S+",
        starting_offsets="earliest", format_name="kafka_fake",
        extra_options={"path": str(spool)},
    )
    out = transform(string_values(reader.load()), streaming=True)
    q = (
        out.writeStream.queryName("kafka_duck")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .foreachBatch(upsert_batch)
        .start()
    )
    try:
        q.processAllAvailable()
        _spool(spool, "d", "log_track_app1",
               [_log_track("app1", 1, t0 + 600_000)])  # closes the window
        q.processAllAvailable()
    finally:
        q.stop()

    got = con.execute(
        'SELECT "appid", "type", "count" FROM log_track_point'
        ' WHERE "time" = ?', [t0 // 30000 * 30000 + 30000]
    ).fetchall()
    assert got == [("app1", 1, 5)]
    # replay the last non-empty batch: keyed merge must not duplicate
    n_before = con.execute("SELECT COUNT(*) FROM log_track_point").fetchone()[0]
    cur = con.cursor()
    cur.execute("DELETE FROM stg")
    cur.executemany("INSERT INTO stg VALUES (?, ?, ?, ?)", batches[-1])
    cur.execute(stmt)
    assert con.execute(
        "SELECT COUNT(*) FROM log_track_point"
    ).fetchone()[0] == n_before


def test_multi_partition_parallel_scan(spark, spool):
    """Kafka's unit of parallelism is the topic partition; the fake keeps
    the same contract — one Spark input split per (topic, partition),
    per-partition offset sequences starting at 0, and partition-local
    ordering."""
    register(spark)
    for p in range(3):
        rows = [
            {"topic": "events", "partition": p, "key": f"k{p}",
             "value": f"p{p}-m{i}", "ts_ms": 1000 + i}
            for i in range(4)
        ]
        (spool / f"events-p{p}.jsonl").write_text(
            "\n".join(json.dumps(r) for r in rows) + "\n"
        )
    df = (
        spark.read.format("kafka_fake")
        .option("subscribe", "events")
        .option("path", str(spool))
        .load()
    )
    # 3 partitions -> 3 input splits -> 3 Spark partitions
    assert df.rdd.getNumPartitions() == 3
    rows = df.select(
        "partition", "offset", F.col("value").cast("string").alias("v")
    ).collect()
    assert len(rows) == 12
    by_part = {}
    for r in rows:
        by_part.setdefault(r["partition"], []).append((r["offset"], r["v"]))
    for p, recs in by_part.items():
        assert sorted(recs) == [(i, f"p{p}-m{i}") for i in range(4)]
