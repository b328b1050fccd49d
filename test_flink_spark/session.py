"""SparkSession construction with scale-minded defaults.

The reference pins parallelism to 1 (HotMediaTrack.java:52,
HotItemAnalysis.java:66) for deterministic console output.  We do the
opposite: determinism comes from explicit sort keys + tie-breakers, and the
session is configured for a real cluster — AQE on (runtime shuffle-partition
coalescing + skew-join splitting), broadcast joins enabled, Arrow for any
Python exchange.  On a 1000-executor cluster only `master` and the shuffle
partition count change; nothing in the operator library assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime confs applied per-session even when we are handed an existing
# SparkSession (e.g. by the verification driver).  Only runtime-settable
# confs belong here.
RUNTIME_CONFS = {
    # Deterministic timestamp arithmetic: epoch math must agree with the
    # DuckDB oracle, which is timezone-naive.
    "spark.sql.session.timeZone": "UTC",
    # AQE re-plans at runtime: coalesces small shuffle partitions and splits
    # skewed ones — both essential at 100 TB where static partition counts
    # are always wrong for someone.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Join strategy (guide §3.1/§9): let the planner pick shuffled-hash
    # over sort-merge when its size conditions hold, and let AQE rewrite
    # SMJ->SHJ at runtime when every post-shuffle partition's build side
    # fits 128 MB (size-based, so the decision stays correct at any
    # scale).  SHJ skips the per-partition sort — measured 3-13% on the
    # join-heavy fleet (q2/q3/q8/q21, fk audit, sparse cosine) at sf0.1,
    # and the win grows with partition width at 100 TB where the sort
    # spills.  Join strategy never changes values, only the plan.
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "134217728",
    # The driver's events.parquet carries TIMESTAMP(NANOS), which Spark 4
    # refuses by default; read the raw int64 and normalize in load_table
    # (schemas.py) — lossless down to the microsecond Spark works in.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Round-4 testdata switched events.ts to TIMESTAMP(MICROS) without the
    # UTC annotation; Spark 4 would infer TIMESTAMP_NTZ, which epoch
    # functions (unix_millis etc.) reject.  Read it as session-tz TIMESTAMP
    # (UTC above) — identical epoch values, same as the DuckDB oracle.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}


def builder_confs(shuffle_partitions: int | None = None) -> dict[str, str]:
    """Confs for building a fresh session (tests / bench / pipelines)."""
    if shuffle_partitions is None:
        # SPARK_GRAFT_SHUFFLE decouples partition count from thread count
        # for scale probes: local[32] at sf10 needs 256+ partitions so a
        # single shuffle partition stays inside per-thread heap — the same
        # knob a real cluster turns when data grows 10x (AQE coalesces the
        # excess at smaller SFs, so over-partitioning is cheap).
        shuffle_partitions = int(
            os.environ.get(
                "SPARK_GRAFT_SHUFFLE", os.environ.get("SPARK_GRAFT_CPUS", "32")
            )
        )
    confs = dict(RUNTIME_CONFS)
    confs.update(
        {
            "spark.sql.shuffle.partitions": str(shuffle_partitions),
            # Arrow batches for pandas UDFs / applyInPandas — the only
            # sanctioned Python exchange path (SURVEY.md §7 design stance).
            "spark.sql.execution.arrow.pyspark.enabled": "true",
            "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
            # Size input splits so a partition fits executor memory at scale.
            "spark.sql.files.maxPartitionBytes": "134217728",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
            "spark.ui.enabled": "false",
        }
    )
    return confs


def get_spark(
    app_name: str = "test-flink-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    b = SparkSession.builder.appName(app_name).master(master)
    for k, v in builder_confs(shuffle_partitions).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    apply_runtime_confs(spark)
    return spark


# sessions already normalized: every query helper calls
# apply_runtime_confs defensively, so without this memo the fleet pays
# len(RUNTIME_CONFS) py4j conf.set round-trips per query (the session
# object rides in the value so a GC'd id can never alias a live session)
_CONFS_APPLIED: dict[int, SparkSession] = {}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally-provided session.

    The correctness driver hands us its own SparkSession; UTC + AQE must
    hold there too or epoch arithmetic diverges from the oracle.
    """
    if id(spark) in _CONFS_APPLIED:
        return spark
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf not runtime-settable on this build — defaults fine
    _CONFS_APPLIED[id(spark)] = spark
    return spark
