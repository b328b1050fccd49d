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
transformWithState control channel is protobuf-serialized).  protobuf has
no pip install in this container, so ``export_protobuf_env()`` falls back
to the pure-python runtime bundled with the system google-cloud-sdk (see
its docstring for the one-minor gencode-version skip it authorizes);
``tws_available()`` gates usage for environments with neither.  The
``applyInPandasWithState`` implementation (stateful_topn.py) remains the
production path; this module is the 1:1 ListState+timer port.
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


# A pure-python protobuf runtime (6.32.0, BSD) ships inside the container's
# google-cloud-sdk appengine tooling with unrewritten `google.protobuf`
# import paths — usable as-is by adding ONE directory to sys.path.  pyspark's
# generated StateMessage_pb2 carries gencode version 6.33.0, one minor ahead
# of that runtime; protobuf's own escape hatch for exactly this situation is
# the TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK env var (checked first in
# runtime_version.ValidateProtobufRuntimeVersion).  StateMessage.proto is
# plain proto3 with no 6.33-only features, and the streaming differential
# test validates the channel end-to-end, so the one-minor skip is safe.
_PB_FALLBACK_DIR = "/usr/lib/google-cloud-sdk/platform/google_appengine"


def export_protobuf_env() -> bool:
    """Make python protobuf importable for THIS process and its Spark
    workers.  Must run BEFORE the SparkContext/JVM is created: workers
    inherit PYTHONPATH and the version-check override through the JVM's
    environment, so late calls fix the driver but not the executors.
    Returns True if protobuf is (or becomes) importable."""
    import os
    import sys

    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass
    if not os.path.isdir(os.path.join(_PB_FALLBACK_DIR, "google", "protobuf")):
        return False
    os.environ.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")
    prev = os.environ.get("PYTHONPATH", "")
    if _PB_FALLBACK_DIR not in prev.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{prev}{os.pathsep}{_PB_FALLBACK_DIR}" if prev else _PB_FALLBACK_DIR
        )
    if _PB_FALLBACK_DIR not in sys.path:
        # append, not insert: never shadow a real install, and the SDK's
        # sibling google.* subpackages (auth/appengine) stay unreachable
        # unless something actually imports them (nothing here does)
        sys.path.append(_PB_FALLBACK_DIR)
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def tws_available() -> bool:
    """transformWithState needs a working python protobuf install."""
    return export_protobuf_env()


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
