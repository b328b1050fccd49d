"""File sources (SURVEY.md §2.1 S3 — the commented-out
``env.readTextFile(FILE_PATH)`` at HotItemAnalysis.java:58,77).

Spark unifies batch and streaming over the same formats: ``spark.read`` for
batch replay, ``spark.readStream`` over a directory for continuous ingestion
(each new file becomes micro-batch input — the idiomatic replacement for the
reference's intended file mode, and the harness for all streaming tests).
Explicit schemas always (schemas.py) — streaming schema inference is
disabled by default in Spark for good reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def text_lines(spark: SparkSession, path: str, streaming: bool = False) -> DataFrame:
    """readTextFile equivalent: one 'value' string column per line."""
    if streaming:
        return spark.readStream.format("text").load(path)
    return spark.read.format("text").load(path)


def csv_source(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    streaming: bool = False,
    header: bool = False,
) -> DataFrame:
    opts = {"header": str(header).lower()}
    if streaming:
        return spark.readStream.options(**opts).schema(schema).csv(path)
    return spark.read.options(**opts).schema(schema).csv(path)


def json_source(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    streaming: bool = False,
) -> DataFrame:
    if streaming:
        return spark.readStream.schema(schema).json(path)
    return spark.read.schema(schema).json(path)


def parquet_source(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    streaming: bool = False,
) -> DataFrame:
    if streaming:
        reader = spark.readStream
        if schema is not None:
            reader = reader.schema(schema)
        return reader.parquet(path)
    return spark.read.parquet(path)


def rate_source(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic (timestamp, value) stream — test/bench source."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


def schema_drift_report(spark: SparkSession, old_path: str, new_path: str) -> DataFrame:
    """Column-level diff between two parquet datasets' schemas: one row per
    drifted column with status in {added, removed, type_changed} plus the
    old/new type strings (unchanged columns are omitted).

    Ingest pipelines break on silent producer-side schema drift; making
    the diff a DataFrame lets the validation stage join/alert on it like
    any other check (data_quality_report's philosophy).  Pure metadata —
    reads footers only, never data; cost is O(columns), independent of
    dataset size."""
    old = dict(spark.read.parquet(old_path).dtypes)
    new = dict(spark.read.parquet(new_path).dtypes)
    rows = []
    for c in sorted(set(old) | set(new)):
        if c not in new:
            rows.append((c, "removed", old[c], None))
        elif c not in old:
            rows.append((c, "added", None, new[c]))
        elif old[c] != new[c]:
            rows.append((c, "type_changed", old[c], new[c]))
    return spark.createDataFrame(
        rows, "column STRING, status STRING, old_type STRING, new_type STRING"
    )
