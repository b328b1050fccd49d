"""Shared versioned-snapshot state discipline for the streaming twins.

Every foreachBatch twin that maintains retroactive state (cluster labels,
retention verdicts, HLL registers, broadcast rules, late-update window
counts, …) persists it as a sequence of ``{prefix}_v{N}/`` parquet
directories under a state dir, with three invariants:

1. **Batch-keyed overwrite** — batch N writes (only) version N in
   overwrite mode, so a foreachBatch retry is idempotent: it clobbers its
   own partial output and never appends to shared state.
2. **Read-before** — a fold for batch N reads only versions < N, so a
   retried batch never double-merges itself and an orphan version-N dir
   from a crashed attempt is invisible to its own retry.
3. **Committed-only visibility** (r9 ADVICE) — a version directory is a
   snapshot only once Spark's job committer has marked it ``_SUCCESS``
   (plus any twin-specific sidecar files written after the parquet
   commit, e.g. late_updates' ``_WATERMARK.json``).  Concurrent readers
   (broadcast_rules runs the rules-fold and event-evaluation queries
   side by side) therefore never resolve a mid-write or mid-overwrite
   directory; they fall back to the previous committed version, which is
   exactly the processing-time semantics the twins pin.  As of r11,
   write_snapshot stages into a glob-invisible directory and renames it
   into place, so a visible version dir always has _SUCCESS AND every
   sidecar (no partially-committed window), and a retry overwrite moves
   the old committed dir aside whole instead of deleting it under a
   live reader.  A crash mid-stage leaves only a glob-invisible
   ``stage_…`` dir — the next backfill resolves the prior committed
   version, derives version+1 (= the orphan's number), and repairs it.

This module replaced five copy-pasted ``_latest()`` helpers
(broadcast_rules / late_updates / sketch_ingest / verdict_ingest /
cluster_ingest) in round 10; the orphan-crash and retry-idempotence
tests in tests/test_streaming.py exercise all twins through it.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame

# Spark's FileOutputCommitter drops this marker at job commit; a version
# directory without it is mid-write, mid-overwrite, or a crash orphan.
_COMMIT_MARKER = "_SUCCESS"


def version_of(path: str) -> int:
    """Version number encoded in a ``{prefix}_v{N}`` directory name."""
    return int(path.rsplit("_v", 1)[1])


def latest_snapshot(
    state_dir: str,
    prefix: str,
    before: int | None = None,
    sidecars: tuple[str, ...] = (),
) -> str | None:
    """Newest COMMITTED ``{prefix}_v{N}`` directory under ``state_dir``,
    optionally restricted to versions < ``before`` (the read-before rule;
    ``None`` = no bound, for read-side consumers).  Committed means the
    ``_SUCCESS`` marker and every required sidecar file exist — anything
    else is an uncommitted write or crash orphan and resolves to the
    previous version instead."""
    required = (_COMMIT_MARKER, *sidecars)
    versions = [
        p
        for p in glob.glob(os.path.join(state_dir, f"{prefix}_v*"))
        if (before is None or version_of(p) < before)
        and all(os.path.exists(os.path.join(p, f)) for f in required)
    ]
    return max(versions, key=version_of) if versions else None


def resolve_version(prior_path: str | None, batch_id: int | None) -> int:
    """Version a fold call writes: the foreachBatch batch id when driven
    by a stream, else prior+1 (batch backfill / orphan repair)."""
    if batch_id is not None:
        return batch_id
    return version_of(prior_path) + 1 if prior_path is not None else 0


def write_snapshot(
    df: DataFrame,
    state_dir: str,
    prefix: str,
    version: int,
    sidecars: dict[str, dict] | None = None,
) -> str:
    """Publish ``{state_dir}/{prefix}_v{version}`` via stage-then-rename
    (r10 ADVICE): the parquet write AND every sidecar land in a staging
    directory whose name the ``{prefix}_v*`` glob cannot match, then one
    ``os.rename`` exposes the fully-committed directory.  Consequences:

    - a version directory visible to :func:`latest_snapshot` is complete
      by construction — there is no window where ``_SUCCESS`` exists but
      a required sidecar does not;
    - a foreachBatch RETRY that overwrites an already-committed version
      never deletes it in place: the old directory is moved aside whole
      (to a ``trash_…`` name the glob also skips), so a concurrent reader
      mid-scan keeps a consistent snapshot.  The path is absent only for
      the instant between the two renames (narrowed, not eliminated —
      readers that must not fail re-resolve once, see
      broadcast_rules.apply_rules_batch).  Trash directories are inert
      and tiny (retries are rare); they are left for external cleanup
      rather than rmtree'd under a possibly-live reader."""
    out = os.path.join(state_dir, f"{prefix}_v{version}")
    stage = os.path.join(state_dir, f"stage_{prefix}_v{version}")
    if os.path.exists(stage):  # crashed earlier attempt; staging is private
        import shutil

        shutil.rmtree(stage)
    df.write.mode("overwrite").parquet(stage)
    for name, payload in (sidecars or {}).items():
        with open(os.path.join(stage, name), "w") as f:
            json.dump(payload, f)
    if os.path.exists(out):  # retry over a committed version: move aside
        n = len(glob.glob(os.path.join(state_dir, f"trash_{prefix}_v{version}_*")))
        os.rename(out, os.path.join(state_dir, f"trash_{prefix}_v{version}_{n}"))
    os.rename(stage, out)
    return out


def read_latest(
    spark,
    state_dir: str,
    prefix: str,
    before: int | None = None,
    sidecars: tuple[str, ...] = (),
):
    """Resolve the newest committed snapshot AND read it, re-resolving
    once if the read fails — the shared guard for write_snapshot's narrow
    retry race (r11 ADVICE): between a retry's two renames the previously
    committed ``{prefix}_v{N}`` is briefly absent (moved to trash, stage
    not yet renamed in), so a reader that resolved just before loses the
    path.  One re-resolve suffices: the rename pair is not repeated for
    the same version, and a second failure means real corruption, which
    should raise.  Returns ``(path, DataFrame)`` or ``(None, None)`` when
    no committed snapshot exists.

    Every snapshot consumer — fold-side prior reads and read-side
    audit()/merge views — goes through here instead of a bare
    ``spark.read.parquet(latest_snapshot(...))``; previously only
    broadcast_rules.apply_rules_batch carried the guard."""
    path = latest_snapshot(state_dir, prefix, before=before, sidecars=sidecars)
    if path is None:
        return None, None
    try:
        return path, spark.read.parquet(path)
    except Exception:
        path = latest_snapshot(
            state_dir, prefix, before=before, sidecars=sidecars
        )
        if path is None:
            return None, None
        return path, spark.read.parquet(path)


def read_sidecar(path: str, name: str) -> dict:
    with open(os.path.join(path, name)) as f:
        return json.load(f)
