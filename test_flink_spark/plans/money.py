"""Exact scaled-integer money aggregation (the ROUND(SUM(double)) retirement).

Rationale (r10 verdict item 4): ``ROUND(SUM(double), k)`` over a large
group is cross-engine-fragile — double summation order differs between
Spark partial/final aggregation and DuckDB (and between any two Spark
partitionings), so a sum whose true value sits near a rounding boundary
can flip its last digit.  ``grouping_sets_orders`` flipped a half-cent on
its whole-table grouping set at sf1, and the r11 migration diff caught
``q1_pricing_summary.sum_disc_price`` sitting on an EXACT half-cent
boundary at sf0.1 (…914.845).

Convention: every money/quantity column in the testdata is 2-decimal, so

- ``CAST(ROUND(x * 100) AS BIGINT)`` cents are per-row EXACT (parquet
  doubles carry <=1e-9 representation noise, far under the 0.5 round
  threshold);
- a discounted price is an exact integer in 1e-4 dollar units:
  price-cents x (100 - discount-hundredths);
- sums accumulate in DECIMAL(38,0) on Spark (no int64 overflow at any
  scale: 1e38 headroom vs ~1e21 needed at 100 TB) and HUGEINT (int128)
  on DuckDB;
- the final double is reconstructed from the exact integer with integer
  half-up division — ``(2*a + b) DIV (2*b)`` — so BOTH engines perform
  the identical integer ops and one identical int→double conversion.
  Deterministic under any summation order, partitioning, or AQE re-plan.

Output columns keep the names, types, and (at the driver's sf0.01
certificate scale, verified by an old-vs-new diff) the exact values of
the ROUND(SUM(double)) forms they replace — these migrations are NOT
semantic swaps and do not void driver certificates.  Where a larger SF
sat on a literal rounding boundary, the exact form pins the
decimal-correct value and the sf0.1/sf1 certificates were re-pinned.

Both dialect strings are kept side by side here so a future column can't
migrate in one engine only (Spark: ``DIV``; DuckDB: ``//`` / HUGEINT).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# exact discounted price in 1e-4 dollar units, per-row (integer-valued)
_DISC4_SPARK = (
    "CAST(CAST(ROUND({p} * 100) AS BIGINT)"
    " * (100 - CAST(ROUND({d} * 100) AS BIGINT)) AS DECIMAL(38,0))"
)
_DISC4_DUCK = (
    "CAST(ROUND({p} * 100) AS BIGINT)"
    " * (100 - CAST(ROUND({d} * 100) AS BIGINT))"
)


def revenue_exact(price: str = "l_extendedprice", disc: str = "l_discount") -> Column:
    """Aggregate Column == ROUND(SUM(price*(1-disc)), 2) computed exactly."""
    s4 = _DISC4_SPARK.format(p=price, d=disc)
    return F.expr(f"CAST((SUM({s4}) + 50) DIV 100 AS DOUBLE) / 100.0")


def revenue_exact_sql(price: str = "l_extendedprice", disc: str = "l_discount") -> str:
    s4 = _DISC4_DUCK.format(p=price, d=disc)
    return f"CAST((SUM({s4}) + 50) // 100 AS DOUBLE) / 100.0"


def cents_sum(col: str) -> Column:
    """Aggregate Column == ROUND(SUM(col), 2) for a 2-decimal column,
    computed exactly (no rounding step at all: the cent sum IS the value).
    Safe for negative values (acctbal) — no half-up division involved."""
    return F.expr(
        f"CAST(SUM(CAST(ROUND({col} * 100) AS DECIMAL(38,0))) AS DOUBLE) / 100.0"
    )


def cents_sum_sql(col: str) -> str:
    return f"CAST(SUM(CAST(ROUND({col} * 100) AS BIGINT)) AS DOUBLE) / 100.0"
