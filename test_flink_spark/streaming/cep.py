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


# ---------------------------------------------------------------------------
# Relaxed contiguity (followedBy, SKIP_TILL_NEXT_MATCH)
# ---------------------------------------------------------------------------

FOLLOWED_BY_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("start_ts_ms", LongType()),
        StructField("end_ts_ms", LongType()),
    ]
)

# state: open view timestamps awaiting a click, plus (view_ts) pairs that
# found their click (click_ts) and await a purchase.
FOLLOWED_BY_STATE_SCHEMA = StructType(
    [
        StructField("open_views", ArrayType(LongType())),
        StructField("paired_views", ArrayType(LongType())),
        StructField("paired_clicks", ArrayType(LongType())),
    ]
)


def _followed_by_func(first: str, second: str, third: str, within_ms: int):
    def func(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            open_views, paired_views, paired_clicks = (
                list(v) for v in state.get
            )
        else:
            open_views, paired_views, paired_clicks = [], [], []
        starts, ends = [], []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts_ms", "event_id"], kind="mergesort")
        for et, t in zip(rows["event_type"], rows["ts_ms"]):
            t = int(t)
            if et == first:
                open_views.append(t)
            elif et == second and open_views:
                # every pending first-step binds THIS click (its first)
                paired_views.extend(open_views)
                paired_clicks.extend([t] * len(open_views))
                open_views = []
            elif et == third and paired_views:
                for v in paired_views:
                    if t - v <= within_ms:
                        starts.append(v)
                        ends.append(t)
                paired_views, paired_clicks = [], []
            # expire partials that can no longer satisfy within()
            open_views = [v for v in open_views if t - v <= within_ms]
            keep = [
                i
                for i, v in enumerate(paired_views)
                if t - v <= within_ms
            ]
            if len(keep) != len(paired_views):
                paired_views = [paired_views[i] for i in keep]
                paired_clicks = [paired_clicks[i] for i in keep]
        state.update((open_views, paired_views, paired_clicks))
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(starts),
                "start_ts_ms": starts,
                "end_ts_ms": ends,
            }
        ).astype({"key": "int64", "start_ts_ms": "int64", "end_ts_ms": "int64"})

    return func


def streaming_followed_by(
    events: DataFrame,
    pattern: Sequence[str],
    within_ms: int,
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming twin of the batch ``events_cep_followed_by``: 3-step
    relaxed-contiguity match (each step binds the FIRST qualifying later
    event) per key, incremental via ``applyInPandasWithState``.

    State is the live partial-match frontier: first-step events awaiting
    step 2, and (step1, step2) pairs awaiting step 3 — bounded by the
    ``within_ms`` horizon (expired partials are pruned on every event),
    which is exactly Flink CEP's NFA state-with-within() bound, not
    O(stream).  Same in-order contract as streaming_strict_sequence."""
    if len(pattern) != 3:
        raise ValueError("streaming_followed_by implements 3-step patterns")
    renamed = events.withColumnRenamed(key_col, "key")
    return renamed.groupBy("key").applyInPandasWithState(
        _followed_by_func(*pattern, within_ms),
        outputStructType=FOLLOWED_BY_OUTPUT_SCHEMA,
        stateStructType=FOLLOWED_BY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# followedBy + within() with TIMED-OUT partials as a side output
# ---------------------------------------------------------------------------

TIMEOUT_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("kind", StringType()),
        StructField("start_ts_ms", LongType()),
        StructField("end_ts_ms", LongType()),
    ]
)


def _followed_by_timeout_func(
    first: str,
    second: str,
    third: str,
    within_ms: int,
    boundary: str = "inclusive",
):
    """Like ``_followed_by_func`` but every partial match the ``within``
    horizon kills is EMITTED, not just dropped — Flink's
    ``PatternTimeoutFunction`` side output.  Rows are
    (key, kind, start_ts_ms, end_ts_ms) with kind ∈ {'match',
    'timeout1', 'timeout2'}: timeout1 = the first step bound but no
    second step arrived inside the horizon (end_ts_ms = expiry instant
    start+within, the timestamp Flink's timer would fire at); timeout2 =
    first and second bound, no third in time (end_ts_ms = the bound
    second-step ts).  Expiry is checked BEFORE the arriving event binds,
    which also fixes a stage-attribution subtlety the match-only matcher
    could ignore: a first-step partial whose earliest second-step
    candidate lies beyond the horizon is a STAGE-1 timeout (it must
    expire before binding), not a stage-2 one.

    ``boundary`` selects the horizon convention (r8 verdict item 3):

    * ``'inclusive'`` (default) — an event at exactly start+within can
      still complete a match; only the first event STRICTLY past the
      horizon kills the partial.  This engine's historical convention:
      batch sweep, SQL oracle, streaming matcher, and the O(n²)
      differential reference all share it, so it is internally
      consistent end to end.
    * ``'flink'`` — Flink's NFA convention: a partial expires when
      ``timestamp - startTimestamp >= windowTime``, i.e. the boundary
      instant is already timed out and an event landing exactly at
      start+within emits a TIMEOUT, never a match.  Use this when
      porting a Flink CEP job whose boundary-timestamp behavior must
      reproduce bit-for-bit; the batch twin is
      plans/enterprise.py::events_cep_within_flink.

    Both modes emit timeout1 with end_ts_ms = start+within — the instant
    Flink's timer fires — regardless of which side of the boundary that
    instant binds on.  A partial with no further traffic on its key
    never expires here — that is the documented watermark-timer gap of
    this in-order matcher; the batch sweep
    (plans/enterprise.py::events_cep_within) is the end-of-data truth,
    and the parity test drains frontiers with a flush event past every
    horizon."""
    if boundary not in ("inclusive", "flink"):
        raise ValueError(f"boundary must be 'inclusive' or 'flink', got {boundary!r}")
    # a partial is dead once t - start > bind_horizon; integer-ms
    # timestamps make flink's >= within equivalent to > within - 1
    bind_horizon = within_ms if boundary == "inclusive" else within_ms - 1

    def func(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            open_views, paired_views, paired_clicks = (
                list(v) for v in state.get
            )
        else:
            open_views, paired_views, paired_clicks = [], [], []
        kinds, starts, ends = [], [], []

        def emit(kind: str, s: int, e: int) -> None:
            kinds.append(kind)
            starts.append(s)
            ends.append(e)

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts_ms", "event_id"], kind="mergesort")
        for et, t in zip(rows["event_type"], rows["ts_ms"]):
            t = int(t)
            # expire FIRST: anything past the bind horizon is dead
            # before this event can bind it
            still_open = []
            for v in open_views:
                if t - v > bind_horizon:
                    emit("timeout1", v, v + within_ms)
                else:
                    still_open.append(v)
            open_views = still_open
            keep_v, keep_c = [], []
            for v, c in zip(paired_views, paired_clicks):
                if t - v > bind_horizon:
                    emit("timeout2", v, c)
                else:
                    keep_v.append(v)
                    keep_c.append(c)
            paired_views, paired_clicks = keep_v, keep_c
            if et == first:
                open_views.append(t)
            elif et == second and open_views:
                # all remaining opens are inside the horizon by the prune
                paired_views.extend(open_views)
                paired_clicks.extend([t] * len(open_views))
                open_views = []
            elif et == third and paired_views:
                for v in paired_views:
                    emit("match", v, t)
                paired_views, paired_clicks = [], []
        state.update((open_views, paired_views, paired_clicks))
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(starts),
                "kind": kinds,
                "start_ts_ms": starts,
                "end_ts_ms": ends,
            }
        ).astype(
            {"key": "int64", "start_ts_ms": "int64", "end_ts_ms": "int64"}
        )

    return func


def streaming_followed_by_with_timeouts(
    events: DataFrame,
    pattern: Sequence[str],
    within_ms: int,
    key_col: str = "user_id",
    boundary: str = "inclusive",
) -> DataFrame:
    """Streaming twin of events_cep_within at a single horizon: the
    3-step relaxed-contiguity matcher whose ``within`` expiries are a
    side output.  State stays the bounded partial-match frontier.
    ``boundary='flink'`` reproduces Flink's exclusive horizon (boundary
    instant = timed out); see _followed_by_timeout_func."""
    if len(pattern) != 3:
        raise ValueError(
            "streaming_followed_by_with_timeouts implements 3-step patterns"
        )
    renamed = events.withColumnRenamed(key_col, "key")
    return renamed.groupBy("key").applyInPandasWithState(
        _followed_by_timeout_func(*pattern, within_ms, boundary=boundary),
        outputStructType=TIMEOUT_OUTPUT_SCHEMA,
        stateStructType=FOLLOWED_BY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Branching middle step (followedBy("x").where(click OR signup)) with
# branch attribution — streaming twin of events_cep_branching.
# ---------------------------------------------------------------------------

BRANCH_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", LongType()),
        StructField("branch", StringType()),
        StructField("start_ts_ms", LongType()),
        StructField("end_ts_ms", LongType()),
    ]
)

# open first-step events awaiting the OR step, plus (view_ts, branch)
# partials that bound a middle event and await the final step
BRANCH_STATE_SCHEMA = StructType(
    [
        StructField("open_views", ArrayType(LongType())),
        StructField("paired_views", ArrayType(LongType())),
        StructField("paired_branches", ArrayType(StringType())),
    ]
)


def _branching_func(
    first: str, seconds: Sequence[str], third: str, within_ms: int
):
    seconds = set(seconds)

    def func(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            open_views, paired_views, paired_branches = (
                list(v) for v in state.get
            )
        else:
            open_views, paired_views, paired_branches = [], [], []
        keys, branches, starts, ends = [], [], [], []
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts_ms", "event_id"], kind="mergesort")
        for et, t in zip(rows["event_type"], rows["ts_ms"]):
            t = int(t)
            if et == first:
                open_views.append(t)
            elif et in seconds and open_views:
                # every pending first-step binds THIS event as its OR
                # step and remembers WHICH branch fired — the single
                # addition over _followed_by_func
                paired_views.extend(open_views)
                paired_branches.extend([et] * len(open_views))
                open_views = []
            elif et == third and paired_views:
                for v, br in zip(paired_views, paired_branches):
                    if t - v <= within_ms:
                        keys.append(key[0])
                        branches.append(br)
                        starts.append(v)
                        ends.append(t)
                paired_views, paired_branches = [], []
            # expire partials that can no longer satisfy within()
            open_views = [v for v in open_views if t - v <= within_ms]
            keep = [
                i for i, v in enumerate(paired_views) if t - v <= within_ms
            ]
            if len(keep) != len(paired_views):
                paired_views = [paired_views[i] for i in keep]
                paired_branches = [paired_branches[i] for i in keep]
        state.update((open_views, paired_views, paired_branches))
        yield pd.DataFrame(
            {
                "key": pd.Series(keys, dtype="int64"),
                "branch": pd.Series(branches, dtype="object"),
                "start_ts_ms": pd.Series(starts, dtype="int64"),
                "end_ts_ms": pd.Series(ends, dtype="int64"),
            }
        )

    return func


def streaming_branching(
    events: DataFrame,
    first: str,
    seconds: Sequence[str],
    third: str,
    within_ms: int,
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming twin of the batch ``events_cep_branching``
    (plans/enterprise.py): view → (click OR signup) → purchase per key
    under SKIP_TILL_NEXT_MATCH, emitting WHICH branch the OR step bound
    — ``(key, branch, start_ts_ms, end_ts_ms)``.

    Same conditional-frontier state machine as streaming_followed_by
    with the branch name riding along in state: first-step events
    awaiting the OR step, and (first_ts, branch) partials awaiting the
    final step, both pruned at the ``within_ms`` horizon so state stays
    O(live partials) per key, never O(stream).  Same in-order contract
    and inclusive within() boundary as the other matchers (see
    _followed_by_timeout_func for the documented divergence from
    Flink's exclusive NFA timeout)."""
    renamed = events.withColumnRenamed(key_col, "key")
    return renamed.groupBy("key").applyInPandasWithState(
        _branching_func(first, list(seconds), third, within_ms),
        outputStructType=BRANCH_OUTPUT_SCHEMA,
        stateStructType=BRANCH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
