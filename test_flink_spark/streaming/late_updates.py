"""Flink allowed-lateness window UPDATES — a late event re-fires its
(already emitted) window instead of being dropped, up to a lateness
bound; beyond the bound it goes to the late side output.

Flink: ``window(...).allowedLateness(L).sideOutputLateData(tag)`` keeps
window state alive L past the watermark and re-emits an UPDATED result
per late element.  Spark's native streaming aggregation cannot update an
append-mode window after emission; the idiomatic twin is the repo's
versioned-accumulator shape (cluster_ingest / verdict_ingest precedent):

1. Each micro-batch computes a max-event-time high watermark (monotone
   across batches, persisted with the snapshot).
2. Rows are split with streaming/side_outputs.py::split_batch semantics:
   ``on_time_or_late`` (event_time >= watermark - window - L: still
   allowed to create or UPDATE a window) vs the ``rest`` sink (beyond
   allowed lateness — Flink's late side output, captured not dropped).
3. Allowed rows fold into the per-window count table by += upsert,
   written as a batch-keyed snapshot ``windows_v{N}`` (overwrite own
   version; retries idempotent because the fold reads only versions
   < batch_id).

Differential (pinned in tests/test_streaming.py): after any batch
sequence, the snapshot equals the batch tumbling-window counts over
every row EXCEPT those routed to the late sink — and a late-but-allowed
row demonstrably UPDATES a window emitted two batches earlier, the exact
behavior Spark append-mode cannot express and Flink users rely on.

At 100 TB the snapshot becomes an upserted table keyed by (key, window)
and the += delta is exactly the changed-windows set — the same
touched-rows argument as cluster_ingest's label remap.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .snapshots import (
    read_latest,
    read_sidecar,
    resolve_version,
    write_snapshot,
)

_WIN_SCHEMA = "event_type STRING, win_start LONG, cnt LONG"

# the watermark sidecar is part of the commit: a snapshot without it
# (crash between parquet commit and sidecar write) is treated as
# nonexistent, so the retry resolves the previous version and repairs
# the orphan by overwrite instead of wedging on a missing file
_SIDECARS = ("_WATERMARK.json",)


def late_update_batch(
    batch_df: DataFrame,
    state_dir: str,
    batch_id: int | None = None,
    window_ms: int = 60_000,
    allowed_lateness_ms: int = 120_000,
    late_dir: str | None = None,
) -> DataFrame:
    """Fold ONE micro-batch of ``(event_type, ts_ms)`` rows into the
    per-(type, tumbling window) count snapshot with allowed-lateness
    semantics; rows beyond the bound are written to ``late_dir`` (the
    side output) and excluded from the fold.  Returns the new snapshot."""
    spark = batch_df.sparkSession
    prior_path, prior = read_latest(
        spark, state_dir, "windows", before=batch_id, sidecars=_SIDECARS
    )
    version = resolve_version(prior_path, batch_id)
    if prior_path is not None:
        prior_wm = read_sidecar(prior_path, "_WATERMARK.json")["watermark_ms"]
    else:
        prior = spark.createDataFrame([], _WIN_SCHEMA)
        prior_wm = -(1 << 62)
    batch = batch_df.localCheckpoint(eager=True)
    batch_max = batch.agg(F.max("ts_ms")).collect()[0][0]
    watermark = max(prior_wm, batch_max if batch_max is not None else prior_wm)
    # a window [s, s+W) is still updatable while s + W + L > watermark;
    # equivalently rows with ts in a closed window are allowed iff their
    # window start passes that test.  Boundary convention: this twin
    # still folds at watermark == end + L, whereas Flink's WindowOperator
    # drops once window.maxTimestamp() + L <= watermark, i.e. at
    # end - 1 + L — the twin is deliberately ~1 window-resolution MORE
    # permissive at the exact boundary (a deliberate, pinned divergence;
    # the batch-parity differential encodes THIS cutoff)
    cutoff = watermark - window_ms - allowed_lateness_ms
    win_start = (F.col("ts_ms") / window_ms).cast("long") * window_ms
    tagged = batch.withColumn("win_start", win_start)
    allowed = tagged.filter(F.col("win_start") >= F.lit(cutoff))
    late = tagged.filter(F.col("win_start") < F.lit(cutoff))
    if late_dir is not None:
        late.write.mode("overwrite").parquet(
            os.path.join(late_dir, f"b{version}")
        )
    delta = allowed.groupBy("event_type", "win_start").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    merged = (
        prior.unionByName(delta)
        .groupBy("event_type", "win_start")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    write_snapshot(
        merged,
        state_dir,
        "windows",
        version,
        sidecars={"_WATERMARK.json": {"watermark_ms": watermark}},
    )
    return merged


def streaming_late_updates(
    events: DataFrame,
    state_dir: str,
    late_dir: str,
    checkpoint_dir: str,
    window_ms: int = 60_000,
    allowed_lateness_ms: int = 120_000,
    query_name: str = "late_updates",
):
    """foreachBatch wiring of :func:`late_update_batch` over a stream of
    ``(event_type, ts_ms)`` rows."""
    return (
        events.writeStream.foreachBatch(
            lambda df, bid: late_update_batch(
                df,
                state_dir,
                batch_id=bid,
                window_ms=window_ms,
                allowed_lateness_ms=allowed_lateness_ms,
                late_dir=late_dir,
            )
        )
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
