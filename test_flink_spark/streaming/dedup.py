"""Streaming exact deduplication (SURVEY.md §7 phase 3: watermark-scoped
dropDuplicates).

The state-boundedness decision is the whole operator at scale:

- ``dropDuplicates(keys)`` on a stream keeps EVERY key seen since the query
  started — state grows without bound (the 100 TB failure mode is a state
  store that eats the cluster weeks after deploy).
- ``dropDuplicatesWithinWatermark(keys)`` evicts a key's state once the
  watermark passes the event time it was recorded at + the watermark delay:
  duplicates are only suppressed while they can still legitimately arrive,
  and state is O(keys per watermark horizon).

The bounded form is therefore the default; unbounded is an explicit opt-in
for genuinely finite key domains (e.g. a bounded id space re-keyed daily).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def streaming_exact_dedup(
    df: DataFrame,
    keys: Sequence[str],
    bounded_state: bool = True,
) -> DataFrame:
    """First-occurrence-wins exact dedup on a watermarked stream.

    ``bounded_state=True`` requires a watermark upstream (Spark enforces
    it) and holds per-key state only for the watermark horizon; ``False``
    falls back to unbounded ``dropDuplicates`` — documented cost above.
    """
    if bounded_state:
        return df.dropDuplicatesWithinWatermark(list(keys))
    return df.dropDuplicates(list(keys))
