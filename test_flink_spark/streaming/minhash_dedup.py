"""Streaming MinHash-LSH near-duplicate detection — the LLM-data dedup
operator as a stream: score documents for near-duplicates ON ARRIVAL
instead of in a nightly batch.

Shape (and why it is the only shape Spark admits):

1. **Stateless signature projection** — ``minhash_signature_expr`` computes
   the full signature + band keys inside row-local higher-order functions
   (operators/dedup.py).  No aggregation, so the stateful stage downstream
   is legal, and no shuffle, so ingest cost is one narrow pass.
2. **Stateful band buckets** — ``applyInPandasWithState`` keyed by
   ``(band, band_key)``: state is the sorted id list of bucket members;
   each arriving member emits candidate pairs against existing members
   exactly once per bucket.  This is the streaming form of the batch
   equality self-join on band keys — same candidates, incremental.
3. **Bounded state** — buckets evict on an event-time timeout ``ttl`` past
   the newest member's event time (the watermark drives expiry), so state
   is O(buckets per horizon), the same discipline as
   ``streaming_exact_dedup``.  A duplicate arriving after its partner's
   bucket expired is missed — the explicit recall-for-boundedness trade
   every streaming dedup makes; the horizon is the knob.

Emission is at-least-once ACROSS bands (two docs colliding in two bands
emit the pair from each bucket, exactly as the batch join would before its
``dropDuplicates``); downstream consumers dedupe within their own horizon
(streaming global distinct after a stateful operator is not expressible in
append mode).  The streaming-vs-batch differential test
(tests/test_streaming.py) set-compares collected pairs against
``minhash_lsh_pairs`` on identical input.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [StructField("id_a", LongType()), StructField("id_b", LongType())]
)

STATE_SCHEMA = StructType(
    [
        StructField("ids", ArrayType(LongType())),
        StructField("band_key", StringType()),  # key echo for debuggability
        # running max event time across ALL batches seen by this bucket —
        # the timeout must never move backward when a later micro-batch
        # carries older (still on-time) events, or the realized TTL would
        # undercut the documented "ttl past the newest member's event time"
        StructField("max_ts_ms", LongType()),
    ]
)

_EMPTY = pd.DataFrame({"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")})


def _bucket_func(ttl_ms: int):
    def func(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            yield _EMPTY
            return
        known: list[int] = list(state.get[0]) if state.exists else []
        # max_ts_ms was added to STATE_SCHEMA after the first release of
        # this operator; a checkpoint written under the 2-field layout is
        # NOT resumable against the 3-field schema (Spark rejects the
        # state row at decode).  Guard the tuple access anyway for the
        # in-between case of a null third field, and document the ops
        # rule: a state-schema change requires a fresh checkpointLocation.
        stored_max: int = (
            int(state.get[2])
            if state.exists and len(state.get) > 2 and state.get[2] is not None
            else 0
        )
        arrived: list[int] = []
        max_ts_ms = stored_max
        for pdf in pdfs:
            arrived.extend(int(x) for x in pdf["doc_id"].tolist())
            if len(pdf):
                batch_max = pdf["ts_ms"].max()
                max_ts_ms = max(max_ts_ms, int(batch_max))
        fresh = sorted(set(arrived) - set(known))
        pairs: list[tuple[int, int]] = []
        for i, b in enumerate(fresh):
            for a in known:
                pairs.append((min(a, b), max(a, b)))
            for b2 in fresh[i + 1 :]:
                pairs.append((b, b2))
        state.update((known + fresh, str(key[1]), max_ts_ms))
        state.setTimeoutTimestamp(max_ts_ms + ttl_ms)
        if pairs:
            yield pd.DataFrame(pairs, columns=["id_a", "id_b"])
        else:
            yield _EMPTY

    return func


def streaming_minhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    num_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    ttl_ms: int = 600_000,
) -> DataFrame:
    """Candidate near-dup pairs ``(id_a, id_b)`` from a WATERMARKED stream
    of documents — signatures identical to the batch operator, candidates
    incremental, state bounded by ``ttl_ms`` past each bucket's newest
    member."""
    from ..operators.dedup import band_keys_expr, minhash_signature_expr
    from ..operators.text import words

    sig: Column = minhash_signature_expr(F.col(text_col), num_perm, shingle_n)
    banded = (
        df.filter(F.size(words(F.col(text_col))) >= shingle_n)
        .select(
            F.col(id_col).alias("doc_id"),
            F.unix_millis(F.col(ts_col)).alias("ts_ms"),
            F.col(ts_col),
            F.explode(band_keys_expr(sig, num_perm, bands)).alias("bk"),
        )
        .select("doc_id", "ts_ms", ts_col, "bk.band", "bk.band_key")
    )
    return banded.groupBy("band", "band_key").applyInPandasWithState(
        _bucket_func(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def streaming_index_check(
    df: DataFrame,
    corpus_index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Check a STREAM of arriving documents against the persisted corpus
    band index (``operators/dedup.py::lsh_band_keys`` output, a static
    DataFrame) — the streaming face of ``incremental_lsh_dedup``'s
    vs-corpus probe.  Emits ``(doc_id, dup_of)`` hit rows.

    Entirely STATELESS: signatures are the row-local expression form and
    the probe is a stream-static equi-join on (band, band_key), which
    Spark plans per micro-batch against the static side — no state store,
    no watermark requirement, append-mode clean.  Emission is
    at-least-once across bands (a doc colliding with the same corpus doc
    in two bands emits twice; the batch operator folds these with its
    min-aggregate) — the documented streaming-dedup contract, downstream
    consumers fold within their own horizon.  Within-stream duplicate
    pairs are ``streaming_minhash_pairs``'s job; compose both for the
    full incremental-ingest story.

    At 100 TB: the static side is the O(docs × bands) key index, loaded
    from its bucketed table — each micro-batch probes via hash join with
    no corpus rescan, exactly the batch operator's join strategy.
    """
    from ..operators.dedup import band_keys_expr, minhash_signature_expr
    from ..operators.text import words

    sig: Column = minhash_signature_expr(F.col(text_col), num_perm, shingle_n)
    banded = (
        df.filter(F.size(words(F.col(text_col))) >= shingle_n)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(band_keys_expr(sig, num_perm, bands)).alias("bk"),
        )
        .select("doc_id", "bk.band", "bk.band_key")
    )
    idx = corpus_index.select(
        F.col("band"),
        F.col("band_key"),
        F.col(id_col).alias("dup_of"),
    )
    return banded.join(idx, ["band", "band_key"]).select("doc_id", "dup_of")
