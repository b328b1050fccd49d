"""Stateful Top-N on Spark 4's ``transformWithStateInPandas`` — the closest
1:1 port of ``TopNHotItems`` (HotItemAnalysis.java:173-223) Spark offers:

    Flink pattern (reference)              transformWithState port
    ---------------------------------      ------------------------------
    ListState<ItemViewCount> (java:184)    handle.getListState("items")
    processElement buffers (java:188-192)  handleInputRows appends
    registerEventTimeTimer(end+1)          handle.registerTimer(end+1)
    onTimer sorts/cuts/emits (java:195+)   handleExpiredTimer
    itemState.clear() (java:221)           state.clear()

Unlike ``applyInPandasWithState`` (whose GroupState is a single value),
ListState here is append-only per element — the same state-backend access
pattern as Flink, backed by RocksDB.  Requires
``spark.sql.streaming.stateStore.providerClass = RocksDBStateStoreProvider``
(set by ``rocksdb_confs``) AND the python ``protobuf`` package (the
transformWithState control channel is protobuf-serialized).  protobuf is
broken in this build container, so ``tws_available()`` gates usage; the
``applyInPandasWithState`` implementation (stateful_topn.py) is the
production path here and this module is the forward-looking 1:1 port.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
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

ITEM_SCHEMA = StructType(
    [StructField("item_id", LongType()), StructField("cnt", LongType())]
)


def tws_available() -> bool:
    """transformWithState needs a working python protobuf install."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def rocksdb_confs() -> dict[str, str]:
    """transformWithState requires the RocksDB state store."""
    return {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        )
    }


class TopNProcessor(StatefulProcessor):
    """Buffer (item, cnt) rows per window-end key; fire at window_end+1."""

    def __init__(self, top_size: int = 3):
        self.top_size = top_size

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        # ListState: per-element append, identical to the reference's
        # ListStateDescriptor("item-state", ...) (java:184)
        self.items = handle.getListState("items", ITEM_SCHEMA)

    def handleInputRows(
        self, key: tuple[Any, ...], rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        for pdf in rows:
            self.items.appendList(
                pdf[["item_id", "cnt"]].itertuples(index=False, name=None)
            )
        end_ms = int(key[0].timestamp() * 1000)
        self.handle.registerTimer(end_ms + 1)  # java:191
        return iter(())

    def handleExpiredTimer(
        self, key: tuple[Any, ...], timerValues, expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        buffered = [tuple(r) for r in self.items.get()]
        self.items.clear()  # java:221
        self.handle.deleteTimer(expiredTimerInfo.getExpiryTimeInMs())
        order = sorted(buffered, key=lambda t: (-t[1], t[0]))[: self.top_size]
        yield pd.DataFrame(
            {
                "window_end": [key[0]] * len(order),
                "rank": list(range(1, len(order) + 1)),
                "item_id": [t[0] for t in order],
                "cnt": [t[1] for t in order],
            }
        )

    def close(self) -> None:
        pass


def streaming_top_n_tws(
    counts: DataFrame,
    n: int = 3,
    window_end_col: str = "window_end_ts",
) -> DataFrame:
    """Top-N over a watermarked stream of (window_end_ts, item_id, cnt)
    pre-aggregated rows, via transformWithStateInPandas in event-time mode."""
    renamed = counts.withColumnRenamed(window_end_col, "window_end")
    return renamed.groupBy("window_end").transformWithStateInPandas(
        statefulProcessor=TopNProcessor(n),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )
