"""Streaming CEP strict-sequence matcher — the streaming face of
``events_cep_strict_sequence`` (plans/enterprise.py).

Flink frames this as ``Pattern.begin("a").next("b").next("c")
.within(Time)``: *next* is STRICT contiguity (an intervening event of any
type kills the partial match) and *within* bounds first-to-last event
time.  The batch form is two ``lead()`` columns; this module is the
per-key state machine that produces the same matches INCREMENTALLY —
``applyInPandasWithState`` keyed by the sequence key, state = the last
``len(pattern) − 1`` events (type + ts + tiebreak), exactly the NFA
buffer Flink's CEP operator keeps per key.

Ordering contract: events must arrive per-key in (ts, tiebreak) order —
the ascending-watermark regime the reference's sources guarantee
(HotItemAnalysis assigns ascending timestamps).  Within a micro-batch the
function re-sorts; ACROSS batches an out-of-order event would have to
splice into an already-consumed position, which no O(pattern) state can
do — the documented limitation of every streaming CEP (Flink drops or
side-outputs late events the same way).  The batch operator is the
replay/repair path, and the differential test pins stream == batch on
in-order input.

State size is O(pattern length) per key — independent of stream length,
the property that makes this run on unbounded input where the batch
lead() window cannot.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("start_ts_ms", LongType()),
        StructField("end_ts_ms", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("types", ArrayType(StringType())),
        StructField("ts", ArrayType(LongType())),
    ]
)


def _cep_func(pattern: Sequence[str], within_ms: int):
    plen = len(pattern)

    def func(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        types, ts = state.get if state.exists else ([], [])
        types, ts = list(types), list(ts)
        starts, ends = [], []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts_ms", "event_id"], kind="mergesort")
        for et, t in zip(rows["event_type"], rows["ts_ms"]):
            types.append(et)
            ts.append(int(t))
            if len(types) > plen:
                types.pop(0)
                ts.pop(0)
            if (
                len(types) == plen
                and types == list(pattern)
                and ts[-1] - ts[0] <= within_ms
            ):
                starts.append(ts[0])
                ends.append(ts[-1])
        # keep only the last plen-1 events: anything older can never be
        # part of a future strict match
        state.update((types[-(plen - 1):], ts[-(plen - 1):]))
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(starts),
                "start_ts_ms": starts,
                "end_ts_ms": ends,
            }
        ).astype({"key": "int64", "start_ts_ms": "int64", "end_ts_ms": "int64"})

    return func


def streaming_strict_sequence(
    events: DataFrame,
    pattern: Sequence[str],
    within_ms: int,
    key_col: str = "user_id",
) -> DataFrame:
    """Match ``pattern`` (list of event_type values) with strict
    contiguity per ``key_col`` on a streaming DataFrame with columns
    (key_col LONG, event_id LONG, event_type STRING, ts_ms LONG).
    Emits one row per completed match: (key, start_ts_ms, end_ts_ms).
    """
    renamed = events.withColumnRenamed(key_col, "key")
    return renamed.groupBy("key").applyInPandasWithState(
        _cep_func(list(pattern), within_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
