"""Batch file sinks: parquet/csv/json writers with the partitioning knobs
that matter at 100 TB (partitionBy for pruning, maxRecordsPerFile against
giant files, explicit compression)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
    max_records_per_file: int = 5_000_000,
    compression: str = "zstd",
) -> None:
    """Parquet writer.  ``partition_by`` low-cardinality columns become
    directory partitions → free partition pruning for every downstream scan;
    ``maxRecordsPerFile`` bounds file size so a single task never writes an
    unsplittable monster."""
    w = (
        df.write.mode(mode)
        .option("compression", compression)
        .option("maxRecordsPerFile", str(max_records_per_file))
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
    compression: str = "zstd",
) -> None:
    """ORC writer (the warehouse-interchange alternative to parquet; same
    partition-pruning layout semantics)."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
