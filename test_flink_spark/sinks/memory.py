"""Console / memory / parquet sinks (SURVEY.md §2.8 SK2/SK3) and the
start-query helper (``env.execute`` equivalent)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def start_console(df: DataFrame, name: str, checkpoint: str, mode: str = "append") -> StreamingQuery:
    """SK2: console sink (reference .print())."""
    return (
        df.writeStream.queryName(name)
        .format("console")
        .outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def start_memory(df: DataFrame, name: str, checkpoint: str, mode: str = "append") -> StreamingQuery:
    """Memory sink — the test harness: results land in a temp view ``name``."""
    return (
        df.writeStream.queryName(name)
        .format("memory")
        .outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def start_parquet(df: DataFrame, path: str, name: str, checkpoint: str) -> StreamingQuery:
    """Durable file sink (exactly-once via checkpoint + atomic file manifest)."""
    return (
        df.writeStream.queryName(name)
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def start_foreach_batch(df: DataFrame, func, name: str, checkpoint: str, mode: str = "update") -> StreamingQuery:
    """foreachBatch runner (SK1 host; every batch is (DataFrame, batch_id))."""
    return (
        df.writeStream.queryName(name)
        .foreachBatch(func)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .start()
    )
