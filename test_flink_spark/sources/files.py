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
