"""UDF/UDAF/UDTF registration surface (SURVEY.md §2.10).

The reference has no formal registration API — ``TextToBean`` (P1),
``CountAgg`` (A1), ``AverageAgg`` (A2) and ``TopNHotItems`` (T1) are ad-hoc
user classes wired by hand.  The engine exposes Spark's native registration
points through thin helpers with one enforced house rule: **Python row UDFs
are the slow path** — Arrow-batched pandas UDFs are the default, and plain
row-at-a-time UDFs require an explicit opt-in flag so they never sneak into
a hot path.

At scale: pandas UDFs move Arrow record batches between JVM and one Python
worker per core; a row UDF pickles every row individually (10-100× slower).
Aggregates go through ``applyInPandas`` (grouped-map) which shuffles once on
the group key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DataType


def register_vectorized(
    spark: SparkSession, name: str, fn: Callable, return_type: DataType | str
):
    """Register an Arrow-batched pandas UDF (pd.Series → pd.Series) usable
    from both the DataFrame API and SQL.  Returns the column-function."""
    udf_fn = F.pandas_udf(fn, returnType=return_type)
    spark.udf.register(name, udf_fn)
    return udf_fn


def register_row_udf(
    spark: SparkSession,
    name: str,
    fn: Callable,
    return_type: DataType | str,
    allow_slow: bool = False,
):
    """Row-at-a-time Python UDF — requires ``allow_slow=True``; prefer
    ``register_vectorized`` (10-100× faster on the same logic)."""
    if not allow_slow:
        raise ValueError(
            "row-at-a-time UDFs are the slow path; pass allow_slow=True "
            "or use register_vectorized"
        )
    udf_fn = F.udf(fn, returnType=return_type)
    spark.udf.register(name, udf_fn)
    return udf_fn


def grouped_agg(
    df: DataFrame,
    group_cols: list[str],
    fn: Callable,
    output_schema: DataType | str,
) -> DataFrame:
    """UDAF surface: grouped-map ``applyInPandas`` (one shuffle on the group
    key, each group as a pandas DataFrame) — the generalization of the
    reference's AggregateFunction add/merge contract for non-algebraic
    aggregates.  Algebraic aggregates should stay on built-ins."""
    return df.groupBy(*group_cols).applyInPandas(fn, schema=output_schema)


def register_udtf(spark: SparkSession, name: str, cls: type, return_type: str):
    """UDTF surface: register a row → rows table function usable from SQL
    (``SELECT * FROM name(...)`` or LATERAL joins).  ``cls`` is a plain
    class with an ``eval(self, ...)`` generator — the analogue of the
    reference's flatMap-shaped user functions.

    Same house rule as row UDFs applies at scale: a Python UDTF runs
    row-at-a-time in the Python worker, so keep it OFF per-row hot paths —
    built-in generators (explode/posexplode/inline/stack over expression-
    built arrays) cover most fan-out shapes JVM-side and should be
    preferred; the UDTF is for genuinely imperative row expansion."""
    udtf_fn = F.udtf(cls, returnType=return_type)
    spark.udtf.register(name, udtf_fn)
    return udtf_fn
