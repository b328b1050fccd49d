"""Fully-incremental streaming Top-N (SURVEY.md §2.6 T1/T2/T3) — the faithful
port of ``TopNHotItems`` (HotItemAnalysis.java:173-223).

Reference pattern: keyed by windowEnd; every ItemViewCount is buffered in
keyed ListState (processElement, java:188-192); an event-time timer fires at
windowEnd+1 (java:191); on fire the buffer is sorted desc by count, cut at
topSize, emitted, and state cleared (java:195-222).

Spark port: ``applyInPandasWithState`` keyed by the window-end timestamp with
``GroupStateTimeout.EventTimeTimeout``:
    processElement  → accumulate (item, cnt) arrays into GroupState
    registerEventTimeTimer(windowEnd + 1) → state.setTimeoutTimestamp(end + 1 ms)
    onTimer         → sort / cut / emit, state.remove()

State per key is two parallel long arrays — O(items per window), exactly the
reference's ListState footprint, sharded across executors by the groupBy.
The batch/foreachBatch rank-window form (operators/topn.py) is this
operator's correctness oracle (SURVEY.md §7 phase 3).

Determinism: ties break by ascending item id (the reference relies on
parallelism-1 arrival order, which a cluster cannot reproduce —
FIXTURES.md §4).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("window_end", TimestampType()),
        StructField("rank", LongType()),
        StructField("item_id", LongType()),
        StructField("cnt", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("item_ids", ArrayType(LongType())),
        StructField("cnts", ArrayType(LongType())),
    ]
)


def _topn_func(top_size: int):
    def func(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        window_end = key[0]
        if state.hasTimedOut:
            # onTimer (java:195-222): drain, sort desc by cnt (tie: item asc),
            # cut at topSize, emit, clear.
            item_ids, cnts = state.get
            state.remove()
            order = sorted(
                range(len(item_ids)), key=lambda i: (-cnts[i], item_ids[i])
            )[:top_size]
            yield pd.DataFrame(
                {
                    "window_end": [window_end] * len(order),
                    "rank": list(range(1, len(order) + 1)),
                    "item_id": [item_ids[i] for i in order],
                    "cnt": [cnts[i] for i in order],
                }
            )
            return
        # processElement (java:188-192): buffer and (re-)register the timer
        # at windowEnd + 1 ms.
        item_ids, cnts = state.get if state.exists else ([], [])
        for pdf in pdfs:
            item_ids = list(item_ids) + pdf["item_id"].tolist()
            cnts = list(cnts) + pdf["cnt"].tolist()
        state.update((item_ids, cnts))
        end_ms = int(window_end.timestamp() * 1000)
        state.setTimeoutTimestamp(end_ms + 1)
        yield pd.DataFrame(
            columns=["window_end", "rank", "item_id", "cnt"]
        ).astype({"rank": "int64", "item_id": "int64", "cnt": "int64"})

    return func


def streaming_top_n(
    counts: DataFrame,
    n: int = 3,
    window_end_col: str = "window_end_ts",
) -> DataFrame:
    """Apply the stateful Top-N to a stream of per-window counts.

    ``counts`` must be a streaming DataFrame with columns
    (window_end_ts TIMESTAMP [watermarked], item_id LONG, cnt LONG) — e.g.
    pre-aggregated ItemViewCount records from an upstream system (the shape
    ``TopNHotItems`` consumes).  NOTE: Spark rejects
    applyInPandasWithState chained AFTER a streaming aggregation — for the
    end-to-end pipeline use ``streaming_windowed_top_n``, which fuses the
    count into the stateful operator.
    """
    renamed = counts.withColumnRenamed(window_end_col, "window_end")
    return renamed.groupBy("window_end").applyInPandasWithState(
        _topn_func(n),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def _windowed_topn_func(top_size: int):
    """Fused CountAgg + TopNHotItems: state is the per-item count map of one
    window-end key, updated incrementally (the reference's window accumulator
    + ListState collapsed into one keyed state)."""

    def func(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        window_end = key[0]
        if state.hasTimedOut:
            item_ids, cnts = state.get
            state.remove()
            order = sorted(
                range(len(item_ids)), key=lambda i: (-cnts[i], item_ids[i])
            )[:top_size]
            yield pd.DataFrame(
                {
                    "window_end": [window_end] * len(order),
                    "rank": list(range(1, len(order) + 1)),
                    "item_id": [item_ids[i] for i in order],
                    "cnt": [cnts[i] for i in order],
                }
            )
            return
        item_ids, cnts = state.get if state.exists else ([], [])
        acc = dict(zip(item_ids, cnts))
        for pdf in pdfs:
            for item, c in pdf.groupby("item_id").size().items():
                acc[item] = acc.get(item, 0) + int(c)
        state.update((list(acc.keys()), list(acc.values())))
        end_ms = int(window_end.timestamp() * 1000)
        state.setTimeoutTimestamp(end_ms + 1)
        yield pd.DataFrame(
            columns=["window_end", "rank", "item_id", "cnt"]
        ).astype({"rank": "int64", "item_id": "int64", "cnt": "int64"})

    return func


def streaming_windowed_top_n(
    events: DataFrame,
    ts_col: str,
    item_col: str,
    n: int = 3,
    size_ms: int = 3_600_000,
    slide_ms: int = 300_000,
) -> DataFrame:
    """End-to-end streaming sliding-window Top-N in ONE stateful operator.

    ``events`` is a watermarked stream of raw rows.  Each event is assigned
    its size/slide window ends declaratively (JVM-side explode — the same
    multiplicity Flink's window assigner produces), then one
    applyInPandasWithState keyed by window end counts per item and fires at
    window_end + 1 ms.  State per key is O(distinct items), the shuffle is
    the single groupBy — matching the reference's two keyBys collapsed to
    one exchange.
    """
    n_windows = size_ms // slide_ms
    ends = F.transform(
        F.sequence(F.lit(1), F.lit(n_windows)),
        lambda j: F.timestamp_millis(
            (F.floor(F.unix_millis(F.col(ts_col)) / slide_ms) + j) * slide_ms
        ),
    )
    exploded = events.select(
        F.col(item_col).alias("item_id"),
        F.col(ts_col),
        F.explode(ends).alias("window_end"),
    )
    return exploded.groupBy("window_end").applyInPandasWithState(
        _windowed_topn_func(n),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
