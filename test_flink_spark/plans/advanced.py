"""Round-5 query assemblies: mergeable sketches (HLL / KMV / count-min),
each registered with a FULL algorithm-replay DuckDB oracle — the sketch
estimators themselves are value-hash-checked, closing the gap that kept
`approx_aggregates` (Spark's built-in engine-specific sketches) as the
fleet's one rows-only row.  `approx_aggregates` stays registered as the
built-in-sketch demo; these are the checked, mergeable, 100 TB-shaped
equivalents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import sketch as sk
from .relational import _t

# ---------------------------------------------------------------------------
# HyperLogLog distinct users per event type.
# ---------------------------------------------------------------------------


def sketch_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """256-register HLL per event_type.  Shuffle out is <= |types| * 256
    register rows with map-side partial max — the register table is the
    mergeable artifact a 100 TB pipeline persists per day/partition.
    Accuracy (rsd ~6.5%) is pinned against exact counts in pytest, not
    here: an exact countDistinct column would reintroduce the O(distinct)
    shuffle the sketch exists to avoid."""
    ev = _t(spark, sf_dir, "events")
    return sk.hll_distinct(ev, "user_id", ["event_type"])


_HLL_SQL = sk.hll_oracle_sql("events", "user_id", ["event_type"])


# ---------------------------------------------------------------------------
# KMV bottom-k distinct users per event type.
# ---------------------------------------------------------------------------


def sketch_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-64 KMV distinct estimate per event_type; exact below k."""
    ev = _t(spark, sf_dir, "events")
    return sk.kmv_distinct(ev, "user_id", ["event_type"])


_KMV_SQL = sk.kmv_oracle_sql("events", "user_id", ["event_type"])


# ---------------------------------------------------------------------------
# Count-min heavy hitters.
# ---------------------------------------------------------------------------

_CMS_TOP_N = 10


def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a 4x1024 count-min sketch over event user_ids (bounded 4096-row
    aggregate) and point-query it for the top-10 exact heavy hitters:
    ``(user_id, exact_cnt, cms_est)`` with cms_est >= exact_cnt by
    construction (pinned in pytest).  The exact candidate pass exists to
    exhibit estimator error in the checked output; a 100 TB deployment
    queries the sketch for externally-supplied keys instead."""
    ev = _t(spark, sf_dir, "events")
    sketch = sk.cms_build(ev, "user_id")
    cand = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), F.col("user_id").asc())
        .limit(_CMS_TOP_N)
    )
    est = sk.cms_estimate(sketch, cand.select("user_id"), "user_id")
    return cand.join(F.broadcast(est), "user_id").select(
        "user_id", F.col("exact_cnt").cast("long").alias("exact_cnt"), "cms_est"
    )


_CMS_SQL = sk.cms_oracle_sql("events", "user_id", _CMS_TOP_N)


QUERIES = {
    "sketch_hll_distinct_users": sketch_hll_distinct_users,
    "sketch_kmv_distinct_users": sketch_kmv_distinct_users,
    "sketch_cms_heavy_hitters": sketch_cms_heavy_hitters,
}

ORACLES = {
    "sketch_hll_distinct_users": _HLL_SQL,
    "sketch_kmv_distinct_users": _KMV_SQL,
    "sketch_cms_heavy_hitters": _CMS_SQL,
}
