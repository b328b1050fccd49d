"""CDC changelog application: collapse an ordered stream of upsert/delete
change events into the latest-state snapshot per key — the MERGE INTO /
materialized-upsert operator every warehouse ingestion pipeline runs over
its CDC feed (Debezium-style changelogs, Flink's upsert streams, Delta/
Iceberg merge).

Semantics (deterministic, engine-reproducible):
- rows are (key, seq, op, payload); the winning row per key is the one
  with the greatest ``seq`` tuple (callers supply a total order — here
  (ts_ms, event_id), unique by construction);
- if the winning op is a delete op, the key is absent from the snapshot
  (tombstone); otherwise the winner's payload is emitted.

Scale design:
- one hash exchange on the key + an in-partition sort for row_number —
  identical shuffle profile to a groupBy, no global sort anywhere;
- the changelog body shuffles once; payload columns ride along with the
  key, so there is no second join to recover the winner's payload (the
  max(seq)-then-join-back form reads the changelog twice);
- late-arriving changes are handled by re-running over the union of the
  old snapshot (as upserts with their original seq) and the new delta —
  the operator is idempotent and associative over batches, which is what
  makes it safe to run incrementally per partition/day at 100 TB.

Reference parity: extends test-flink's analytics surface with the
ingestion-side operator family (SURVEY.md §2 beyond-reference ops); no
counterpart in /root/reference (the reference jobs are append-only).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cdc_latest(
    df: DataFrame,
    key_cols: Sequence[str],
    seq_cols: Sequence[str],
    op_col: str,
    delete_ops: Sequence[str],
) -> DataFrame:
    """Latest-state snapshot of a changelog: one row per key holding the
    payload of the greatest-``seq_cols`` change, keys whose last change is
    in ``delete_ops`` dropped.  All non-key/seq/op columns pass through."""
    if not key_cols or not seq_cols:
        raise ValueError("key_cols and seq_cols must be non-empty")
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in seq_cols]
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(~F.col(op_col).isin(list(delete_ops)))
        .drop("__rn")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    value_cols: Sequence[str],
) -> DataFrame:
    """The inverse of ``cdc_latest``: given two snapshots of a keyed
    table, derive the changelog that transforms old into new —
    ``(*key_cols, op, *value_cols)`` with op ∈ {insert, update, delete};
    unchanged keys emit nothing.  Applying the diff to ``old`` as a
    changelog reproduces ``new`` exactly (round-trip pinned by test) —
    the snapshot-reconciliation a warehouse runs when upstream can't
    emit CDC.

    One full-outer hash join on the key; change detection is a null-safe
    column comparison (``eqNullSafe`` — NULL -> value IS a change, NULL
    == NULL is not), so the exchange carries each snapshot once and
    nothing quadratic ever happens.  For the delete rows, value columns
    are NULL (a tombstone carries no payload)."""
    if not key_cols or not value_cols:
        raise ValueError("key_cols and value_cols must be non-empty")
    # explicit presence markers, NOT key-null checks: the join is
    # eqNullSafe, so a NULL key is a legitimate joinable value — deciding
    # presence from key_cols[0].isNotNull() would misclassify NULL-keyed
    # rows as inserts/deletes and break the round-trip property
    o = old.select(*key_cols, *value_cols, F.lit(1).alias("__op")).alias("o")
    n = new.select(*key_cols, *value_cols, F.lit(1).alias("__np")).alias("n")
    cond = [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in key_cols]
    j = o.join(n, cond, "full_outer")
    o_present = F.col("o.__op").isNotNull()
    n_present = F.col("n.__np").isNotNull()
    changed = ~F.lit(True)
    for v in value_cols:
        changed = changed | ~F.col(f"o.{v}").eqNullSafe(F.col(f"n.{v}"))
    op = (
        F.when(~o_present, F.lit("insert"))
        .when(~n_present, F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    keys_out = [
        F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in key_cols
    ]
    vals_out = [
        F.when(n_present, F.col(f"n.{v}")).alias(v) for v in value_cols
    ]
    return (
        j.select(*keys_out, op.alias("op"), *vals_out)
        .filter(F.col("op").isNotNull())
    )


def scd2_history(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Sequence[str],
    op_col: str,
    delete_ops: Sequence[str],
) -> DataFrame:
    """Slowly-changing-dimension type 2: turn the changelog into validity
    intervals — every change row becomes a version with ``valid_from`` =
    its own timestamp, ``valid_to`` = the NEXT change's timestamp (NULL
    for the current version), and ``is_current`` true only for the last
    non-deleted version.  Delete rows close the previous interval but
    emit no version themselves (a tombstone has no state to describe).

    Same shuffle profile as ``cdc_latest``: one hash exchange on the key,
    one in-partition sort; ``lead()`` over the per-key sequence supplies
    the closing timestamp without a self-join.  Re-running over snapshot
    + delta is NOT valid for SCD2 (closed intervals are history, not
    state) — the operator is deterministic over the full log, which is
    what a warehouse replays per partition."""
    if not key_cols or not tiebreak_cols:
        raise ValueError("key_cols and tiebreak_cols must be non-empty")
    order = [F.col(ts_col).asc(), *[F.col(c).asc() for c in tiebreak_cols]]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    versioned = df.withColumn(
        "valid_to", F.lead(ts_col).over(w)
    ).withColumn(
        "__last", F.lead(F.lit(1)).over(w).isNull()
    )
    return (
        versioned.filter(~F.col(op_col).isin(list(delete_ops)))
        .withColumn("valid_from", F.col(ts_col))
        .withColumn("is_current", F.col("__last"))
        .drop("__last")
    )
