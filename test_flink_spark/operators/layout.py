"""Z-order (Morton) data-layout codes: interleave the bits of two
dimension keys so that sorting/range-partitioning by the code clusters
rows that are close in BOTH dimensions — the standard multi-dimensional
data-skipping layout (Delta/Iceberg OPTIMIZE ZORDER, Hudi clustering).
At 100 TB the payoff is file skipping: writing files ordered by
z(user_id, time) lets min/max zone maps prune scans filtered on either
dimension, where single-column sort only prunes one.

The code is a pure integer expression — 2x16 bit-extract/shift/or terms
generated once in Python and rendered into BOTH dialects, so the oracle
is trivially exact.  No UDF, no shuffle: the code is a projection; the
layout write is then a range-repartition + sortWithinPartitions on it
(exercised in pytest; the registered query checks the code arithmetic
and the top-k cut)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 16


def _interleave_terms(xa: str, xb: str, bits: int) -> list[str]:
    """SQL terms: xa's bit i -> position 2i, xb's bit i -> position 2i+1
    (shared int64 >> & << operator syntax in Spark SQL and DuckDB)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({xa} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({xb} >> {i}) & 1) << {2 * i + 1})")
    return terms


def zorder_expr_sql(xa: str, xb: str, bits: int = BITS) -> str:
    """The interleaved code as one SQL expression (valid in both engines
    given BIGINT inputs; callers mask inputs to ``bits`` bits first)."""
    return "(" + " | ".join(_interleave_terms(xa, xb, bits)) + ")"


def zorder_code(xa: str, xb: str, bits: int = BITS) -> Column:
    """The interleaved code as a Spark Column.  ``xa``/``xb`` are SQL
    expression strings (usually column names) so the arithmetic rendered
    here is the IDENTICAL text the oracle runs."""
    return F.expr(zorder_expr_sql(xa, xb, bits))


def zorder_layout(
    df: DataFrame, code_col: str = "zcode", partitions: int = 32
) -> DataFrame:
    """Cluster rows for write: range-partition + sort by the z-code so
    every output file covers a compact z-range (tight per-file min/max
    zone maps on BOTH underlying dimensions)."""
    return df.repartitionByRange(partitions, F.col(code_col)).sortWithinPartitions(
        code_col
    )
