"""Streaming incremental HLL sketch maintenance — the sketch family's
streaming twin (extends the twin roster: minhash_dedup, cluster_ingest,
substring_dedup, verdict_ingest).

The batch operator (operators/sketch.py::hll_registers) already proves
the register table is max-mergeable: union any partitioning of the data
and re-max, and the fold gives bit-identical estimates.  This module is
that property run continuously — the per-(group, register) max-rank
table maintained across micro-batches, which is exactly how a 100 TB
deployment serves "distinct users per type, so far today" without ever
re-scanning history:

1. **Persisted state** — one register snapshot ``registers_v{N}/`` per
   micro-batch under ``state_dir``.  A batch OVERWRITES its own
   batch-keyed directory (idempotent under foreachBatch retries) and
   reads the latest snapshot with version < its own, so a retried batch
   never double-merges itself (max would forgive it anyway — idempotence
   is the point of HLL — but the version discipline matches the other
   ingest twins and keeps the crash-recovery story uniform).
2. **Per-batch fold** — compute the batch's register table (bounded:
   |groups| x 256 rows) and max-merge with the prior snapshot.  Work per
   batch is O(batch rows) map-side + a bounded-aggregate shuffle.
3. **Read side** — :func:`estimates` folds any snapshot through the
   shared estimator, so streaming estimates are BIT-EQUAL to the batch
   ``sketch_hll_distinct_users`` output over the union of all batches
   (pinned by the differential test, including the '__all__' rollup).

State is on-disk parquet rather than the state store for the same reason
as cluster_ingest: the snapshot is a TABLE other jobs read (the serving
artifact), not operator-private state.

Reference parity note: generalizes the reference's windowed COUNT
aggregations (HotItemAnalysis.java:126-160) to streaming distinct-count
analytics — the §2.10 superset path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators import sketch as sk
from .snapshots import read_latest, resolve_version, write_snapshot

_REG_SCHEMA = "grp STRING, reg LONG, m_rank LONG"


def sketch_ingest_batch(
    batch_df: DataFrame,
    state_dir: str,
    batch_id: int | None = None,
    value_col: str = "user_id",
    group_col: str = "event_type",
) -> DataFrame:
    """Fold ONE micro-batch into the persisted HLL register snapshot;
    returns (and persists) the post-batch register table.  Callable
    directly for batch backfill or through :func:`streaming_sketch_ingest`."""
    spark = batch_df.sparkSession
    prior_path, prior = read_latest(
        spark, state_dir, "registers", before=batch_id
    )
    version = resolve_version(prior_path, batch_id)
    if prior is None:
        prior = spark.createDataFrame([], _REG_SCHEMA)
    new_regs = sk.hll_registers(batch_df, value_col, [group_col]).withColumnRenamed(
        group_col, "grp"
    )
    merged = (
        prior.unionByName(new_regs)
        .groupBy("grp", "reg")
        .agg(F.max("m_rank").alias("m_rank"))
        # cut lineage before overwriting directories this plan read from
        .localCheckpoint(eager=True)
    )
    write_snapshot(merged, state_dir, "registers", version)
    return merged


def estimates(spark, state_dir: str, with_rollup: bool = True) -> DataFrame:
    """Fold the LATEST register snapshot through the shared estimator:
    ``(grp, registers_used, hll_est)`` rows, plus an '__all__' rollup row
    max-merged from the per-group sketches (never from the raw values)."""
    path, regs = read_latest(spark, state_dir, "registers")
    if path is None:
        raise ValueError(f"no register snapshot under {state_dir}")
    per_group = sk.hll_fold_registers(regs, ["grp"])
    if not with_rollup:
        return per_group
    merged = (
        regs.groupBy("reg")
        .agg(F.max("m_rank").alias("m_rank"))
        .withColumn("grp", F.lit("__all__"))
    )
    return per_group.unionByName(sk.hll_fold_registers(merged, ["grp"]))


def streaming_sketch_ingest(
    events: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    query_name: str = "sketch_ingest",
    value_col: str = "user_id",
    group_col: str = "event_type",
) -> StreamingQuery:
    """Run :func:`sketch_ingest_batch` over a STREAM via ``foreachBatch``
    — after every micro-batch, ``{state_dir}/registers_v{batch_id}``
    holds the register table identical to the batch sketch over every
    row seen so far."""

    def _on_batch(batch_df: DataFrame, batch_id: int) -> None:
        sketch_ingest_batch(
            batch_df,
            state_dir,
            batch_id=batch_id,
            value_col=value_col,
            group_col=group_col,
        )

    return (
        events.writeStream.foreachBatch(_on_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
