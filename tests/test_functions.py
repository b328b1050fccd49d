"""Tests for the UDF registration surface and P4 result formatting."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from test_flink_spark.functions.udf import grouped_agg, register_row_udf, register_vectorized


def test_vectorized_udf_roundtrip(spark):
    register_vectorized(spark, "double_it", lambda s: s * 2, "double")
    out = spark.sql("SELECT double_it(CAST(21 AS DOUBLE)) AS v").collect()
    assert out[0]["v"] == 42.0


def test_row_udf_requires_opt_in(spark):
    with pytest.raises(ValueError, match="slow path"):
        register_row_udf(spark, "f", lambda x: x, "int")
    fn = register_row_udf(spark, "inc", lambda x: x + 1, "int", allow_slow=True)
    df = spark.createDataFrame([(1,)], "x INT").select(fn("x").alias("y"))
    assert df.collect()[0]["y"] == 2


def test_grouped_agg_applyinpandas(spark):
    df = spark.createDataFrame([("a", 1.0), ("a", 3.0), ("b", 5.0)], "k STRING, v DOUBLE")

    def span(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": [pdf["k"].iloc[0]], "span": [pdf["v"].max() - pdf["v"].min()]})

    out = {r["k"]: r["span"] for r in grouped_agg(df, ["k"], span, "k STRING, span DOUBLE").collect()}
    assert out == {"a": 2.0, "b": 0.0}


def test_format_topn_report_p4(spark):
    """P4 (HotItemAnalysis.java:204-217): the console rendering of Top-N rows."""
    from test_flink_spark.functions.parsing import format_topn_report

    df = spark.createDataFrame(
        [(120_000, 1, 42, 7)], "window_end LONG, rank INT, item_id LONG, cnt LONG"
    )
    line = format_topn_report(df).collect()[0]["line"]
    assert "No 1 -> 42 : 7" in line
    # onTimer fires at windowEnd+1 and prints Timestamp(timestamp-1) == the
    # window end itself: 120_000 ms = 1970-01-01 00:02:00 (UTC session tz)
    assert line.startswith("time : 1970-01-01 00:02:00")


def test_udtf_registration_and_lateral(spark):
    from test_flink_spark.functions.udf import register_udtf

    class SplitWords:
        def eval(self, text: str):
            for w in (text or "").split():
                yield (w, len(w))

    register_udtf(spark, "split_words_t", SplitWords, "word: string, n: int")
    got = spark.sql("SELECT * FROM split_words_t('a bb ccc')").collect()
    assert [(r["word"], r["n"]) for r in got] == [("a", 1), ("bb", 2), ("ccc", 3)]
    # LATERAL application against a table
    spark.createDataFrame([(1, "x yy"), (2, "")], "id int, t string") \
        .createOrReplaceTempView("udtf_src")
    rows = spark.sql(
        "SELECT id, word FROM udtf_src, LATERAL split_words_t(t)"
    ).collect()
    assert sorted((r["id"], r["word"]) for r in rows) == [(1, "x"), (1, "yy")]
