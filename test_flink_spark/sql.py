"""SQL surface: register the testdata tables as temp views so the engine is
fully drivable from ``spark.sql`` (Catalyst is the parser/planner — SURVEY.md
§2.10 'SQL layer')."""

from __future__ import annotations

from pyspark.sql import SparkSession

from .schemas import TESTDATA_TABLES, load_table
from .session import apply_runtime_confs


def register_testdata_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Create a temp view per testdata table; returns the view names."""
    apply_runtime_confs(spark)
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return list(TESTDATA_TABLES)
