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

from collections.abc import Sequence

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


def pruning_report(
    df: DataFrame,
    layout_name: str,
    block_expr: str,
    probe_col: str,
    lo: int,
    hi: int,
) -> DataFrame:
    """Quantified zone-map data skipping for one layout: assign every row
    to its layout block (``block_expr`` — a pure integer projection, e.g.
    a z-code or sort-key prefix), build the per-block [min, max] zone map
    of ``probe_col``, and report what a scan filtered to
    ``probe_col BETWEEN lo AND hi`` would touch:

        (layout, n_blocks, n_hit_blocks, rows_scanned, rows_matched,
         total_rows)

    ``rows_scanned`` counts rows in blocks whose zone-map interval
    overlaps the predicate — what the engine reads; ``rows_matched`` is
    the exact predicate count — what it keeps.  The scanned/matched ratio
    IS the layout quality metric (1.0 = perfect clustering).

    Shuffle profile: one groupBy on the block id with map-side partial
    min/max/count, then one bounded aggregate over |blocks| rows — the
    input body never shuffles, so auditing a 100 TB table's layout costs
    one narrow scan."""
    blocks = df.groupBy(F.expr(block_expr).alias("blk")).agg(
        F.min(probe_col).alias("p_min"),
        F.max(probe_col).alias("p_max"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            ((F.col(probe_col) >= lo) & (F.col(probe_col) <= hi)).cast("long")
        ).alias("n_match"),
    )
    hit = (F.col("p_max") >= lo) & (F.col("p_min") <= hi)
    return blocks.agg(
        F.lit(layout_name).alias("layout"),
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum(hit.cast("long")).cast("long").alias("n_hit_blocks"),
        F.sum(F.when(hit, F.col("n_rows")).otherwise(F.lit(0)))
        .cast("long")
        .alias("rows_scanned"),
        F.sum("n_match").cast("long").alias("rows_matched"),
        F.sum("n_rows").cast("long").alias("total_rows"),
    )


def pruning_report_sql(
    source_cte: str,
    layout_name: str,
    block_expr: str,
    probe_col: str,
    lo: int,
    hi: int,
) -> str:
    """DuckDB replay of ``pruning_report`` over a CTE named
    ``source_cte`` exposing ``probe_col`` and the block expression's
    inputs."""
    return f"""
SELECT '{layout_name}' AS layout,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(SUM(CASE WHEN p_max >= {lo} AND p_min <= {hi} THEN 1 ELSE 0 END) AS BIGINT) AS n_hit_blocks,
       CAST(SUM(CASE WHEN p_max >= {lo} AND p_min <= {hi} THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
       CAST(SUM(n_match) AS BIGINT) AS rows_matched,
       CAST(SUM(n_rows) AS BIGINT) AS total_rows
FROM (
    SELECT {block_expr} AS blk,
           MIN({probe_col}) AS p_min, MAX({probe_col}) AS p_max,
           COUNT(*) AS n_rows,
           SUM(CASE WHEN {probe_col} BETWEEN {lo} AND {hi} THEN 1 ELSE 0 END) AS n_match
    FROM {source_cte} GROUP BY 1
)
"""


def encoding_advisor(df: DataFrame, cols: Sequence[str], dict_ppm: int = 100_000) -> DataFrame:
    """Storage-encoding advisor: per column, exact cardinality and byte
    statistics plus a dictionary-vs-plain recommendation —
    ``(col_name, n_rows, n_distinct, distinct_ppm, total_chars,
    recommendation)``.  A column whose distinct share is under
    ``dict_ppm`` (default 10%) dictionary-encodes well; the report is the
    pre-OPTIMIZE audit a 100 TB table layout review starts from.

    One aggregate per column over a shared scan (Catalyst collapses the
    union branches onto one ReadSchema), each with map-side partials;
    output is |cols| rows.  All integer arithmetic: char totals via
    length(), share via cross-multiplied integer division."""
    parts = []
    for c in cols:
        parts.append(
            df.agg(
                F.lit(c).alias("col_name"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.countDistinct(F.col(c)).cast("long").alias("n_distinct"),
                F.sum(F.length(F.col(c).cast("string")))
                .cast("long")
                .alias("total_chars"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.select(
        "col_name",
        "n_rows",
        "n_distinct",
        F.expr("(1000000 * n_distinct) div n_rows").alias("distinct_ppm"),
        "total_chars",
        F.when(
            F.expr("(1000000 * n_distinct) div n_rows") < dict_ppm,
            F.lit("dictionary"),
        )
        .otherwise(F.lit("plain"))
        .alias("recommendation"),
    )


def encoding_advisor_sql(table: str, cols: Sequence[str], dict_ppm: int = 100_000) -> str:
    """DuckDB replay of encoding_advisor."""
    branches = []
    for c in cols:
        branches.append(f"""
    SELECT '{c}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(SUM(length(CAST({c} AS VARCHAR))) AS BIGINT) AS total_chars
    FROM {table}""")
    body = "\n    UNION ALL\n".join(branches)
    return f"""
WITH stats AS ({body})
SELECT col_name, n_rows, n_distinct,
       CAST((1000000 * n_distinct) // n_rows AS BIGINT) AS distinct_ppm,
       total_chars,
       CASE WHEN (1000000 * n_distinct) // n_rows < {dict_ppm}
            THEN 'dictionary' ELSE 'plain' END AS recommendation
FROM stats
"""
