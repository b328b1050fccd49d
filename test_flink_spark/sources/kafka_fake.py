"""File-backed stand-in for the Kafka connector, wire-compatible with
``spark.readStream.format("kafka")``.

No Kafka broker or spark-sql-kafka jar exists in this container, so the
real connector can never ``.load()`` here.  This Python Data Source
(Spark 4 ``pyspark.sql.datasource``) closes that last untested seam the
honest way available: it registers as a source whose SCHEMA, OPTION NAMES
and SUBSCRIPTION SEMANTICS are exactly the Kafka connector's, serving
records from a spool directory instead of a broker.  The e2e test
(tests/test_kafka_e2e.py) then drives the UNMODIFIED reader builder
(sources/kafka.py::kafka_reader — same option map, including the
translated ``subscribePattern``) and the full HotMediaTrack pipeline
through it to the upsert sink.  Swapping ``format_name`` back to
``"kafka"`` on a real cluster is the ONLY difference.

Reference parity: HotMediaTrack.java:59-74 (topic-pattern consumer),
HotItemAnalysis.java:69-79 (single-topic consumer).

Spool format: each ``*.jsonl`` file in the directory holds one topic
partition's records, one JSON object per line:
    {"topic": ..., "partition": 0, "key": null|str, "value": str,
     "ts_ms": 1700000000000}
Offsets are line numbers, assigned per (topic, partition) in file order —
append-only files model a growing topic log, so the streaming reader
picks up newly appended lines batch over batch exactly like new Kafka
messages.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# The Kafka connector's fixed source schema (spark-sql-kafka's
# KafkaRecordToRowConverter) — column names, types AND order.
KAFKA_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("offset", LongType()),
        StructField("timestamp", TimestampType()),
        StructField("timestampType", IntegerType()),
    ]
)


def _subscription(options: dict) -> tuple[str | None, re.Pattern | None]:
    """Kafka's mutually-exclusive subscription options, same validation."""
    sub = options.get("subscribe")
    pat = options.get("subscribepattern") or options.get("subscribePattern")
    if (sub is None) == (pat is None):
        raise ValueError("exactly one of subscribe / subscribePattern required")
    return sub, re.compile(pat) if pat is not None else None


def _matches(topic: str, sub: str | None, pat: re.Pattern | None) -> bool:
    if sub is not None:
        return topic in {t.strip() for t in sub.split(",")}
    return pat.fullmatch(topic) is not None


def _scan_spool(path: str) -> list[tuple[str, int, list[dict]]]:
    """[(topic, partition, records)] with records MERGED across spool files
    in sorted-filename order, so several files (or appended lines) for the
    same (topic, partition) form one continuous log and offsets are line
    positions within that merged log — the Kafka per-TopicPartition offset
    model."""
    logs: dict[tuple[str, int], list[dict]] = {}
    for fname in sorted(os.listdir(path)):
        if not fname.endswith(".jsonl"):
            continue
        with open(os.path.join(path, fname)) as fh:
            for line in fh:
                if line.strip():
                    rec = json.loads(line)
                    tp = (rec["topic"], int(rec.get("partition", 0)))
                    logs.setdefault(tp, []).append(rec)
    return [(t, p, recs) for (t, p), recs in sorted(logs.items())]


def _to_row(rec: dict, offset: int):
    import datetime

    key = rec.get("key")
    ts = datetime.datetime.fromtimestamp(
        rec["ts_ms"] / 1000.0, tz=datetime.timezone.utc
    ).replace(tzinfo=None)
    return (
        key.encode() if isinstance(key, str) else key,
        rec["value"].encode(),
        rec["topic"],
        int(rec.get("partition", 0)),
        offset,
        ts,
        0,  # TimestampType.CREATE_TIME, the connector's default
    )


class _FakeKafkaBatchReader(DataSourceReader):
    """Batch replay of the retained log.  ``partitions()`` exposes one
    input split per (topic, partition) — the same 1:1 Kafka-partition →
    Spark-task mapping the real connector documents (sources/kafka.py),
    so scan parallelism scales with topic partitions here too."""

    def __init__(self, options):
        self.path = options["path"]
        self.sub, self.pat = _subscription(options)

    def partitions(self):
        from pyspark.sql.datasource import InputPartition

        return [
            InputPartition((t, p))
            for t, p, _ in _scan_spool(self.path)
            if _matches(t, self.sub, self.pat)
        ]

    def read(self, partition):
        topic, p = partition.value
        for t, tp, recs in _scan_spool(self.path):
            if t == topic and tp == p:
                for off, rec in enumerate(recs):
                    yield _to_row(rec, off)


class _FakeKafkaStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader: the offset dict maps "topic-partition" → next
    line number, mirroring the connector's per-TopicPartition offsets; a
    batch is every line appended past the stored offsets."""

    def __init__(self, options):
        self.path = options["path"]
        self.sub, self.pat = _subscription(options)
        self.starting = options.get("startingoffsets", options.get("startingOffsets", "latest"))
        # Admission control, same option name + semantics as the real
        # connector: cap TOTAL records per micro-batch, prorated across
        # partitions by their share of the lag (KafkaMicroBatchStream's
        # rateLimit: ceil when the prorated share is <1 so small
        # partitions are never starved, floor otherwise).
        raw = options.get("maxoffsetspertrigger", options.get("maxOffsetsPerTrigger"))
        self.max_per_trigger = int(raw) if raw is not None else None

    def _current(self):
        return {
            f"{t}-{p}": len(recs)
            for t, p, recs in _scan_spool(self.path)
            if _matches(t, self.sub, self.pat)
        }

    def initialOffset(self) -> dict:
        # Kafka semantics: latest = only records arriving after the query
        # starts; earliest = the whole retained log.
        return self._current() if self.starting == "latest" else {}

    def read(self, start: dict):
        # ONE spool scan per micro-batch: rows and the committed end
        # offset both derive from the same snapshot.  Scanning twice
        # (rows via _between, end via a later _current) would commit
        # lines appended between the scans without ever emitting them —
        # permanent record loss in the micro-batch path.
        snapshot = [
            (t, p, recs)
            for t, p, recs in _scan_spool(self.path)
            if _matches(t, self.sub, self.pat)
        ]
        end = {f"{t}-{p}": len(recs) for t, p, recs in snapshot}
        if self.max_per_trigger is not None:
            end = self._admit(start, end)
        rows = list(self._between(start, end, snapshot))
        return iter(rows), end

    def _admit(self, start: dict, avail_end: dict) -> dict:
        """maxOffsetsPerTrigger: bound this batch's end offsets so at most
        N records are admitted in total, prorated by each partition's
        share of the outstanding lag (the connector's rateLimit rule:
        ceil a sub-1 prorated share — never starve a small partition —
        floor otherwise)."""
        import math

        lags = {
            tp: max(0, hi - int(start.get(tp, 0))) for tp, hi in avail_end.items()
        }
        total = sum(lags.values())
        if total <= self.max_per_trigger:
            return avail_end
        out = {}
        for tp, hi in avail_end.items():
            share = self.max_per_trigger * (lags[tp] / total)
            admit = int(math.ceil(share) if share < 1 else math.floor(share))
            out[tp] = min(hi, int(start.get(tp, 0)) + admit)
        return out

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._between(start, end)

    def _between(self, start: dict, end: dict | None, snapshot=None):
        logs = (
            snapshot
            if snapshot is not None
            else [
                (t, p, recs)
                for t, p, recs in _scan_spool(self.path)
                if _matches(t, self.sub, self.pat)
            ]
        )
        for topic, p, recs in logs:
            tp = f"{topic}-{p}"
            lo = int(start.get(tp, 0))
            hi = len(recs) if end is None else int(end.get(tp, 0))
            for off in range(lo, min(hi, len(recs))):
                yield _to_row(recs[off], off)


class FakeKafkaDataSource(DataSource):
    """``format("kafka_fake")`` — drop-in for ``format("kafka")`` in
    environments with no broker/connector.  Ignores broker-only options
    (kafka.bootstrap.servers, failOnDataLoss) exactly as unused options
    are ignored by any reader; honors subscribe / subscribePattern /
    startingOffsets plus the spool ``path``."""

    @classmethod
    def name(cls):
        return "kafka_fake"

    def schema(self):
        return KAFKA_SCHEMA

    def reader(self, schema):
        return _FakeKafkaBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return _FakeKafkaStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(FakeKafkaDataSource)
