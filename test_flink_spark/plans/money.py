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
``CAST(ROUND(x * 100) AS BIGINT)`` cents are per-row EXACT (parquet
doubles carry <=1e-9 representation noise, far under the 0.5 round
threshold), and a discounted price is an exact integer in 1e-4 dollar
units: price-cents x (100 - discount-hundredths).

Accumulator design — BIGINT hot phase, DECIMAL only in the finish:
the first cut summed DECIMAL(38,0); measured 3x slower than the double
sum it replaced (Spark decimals above the compact-long width leave
whole-stage codegen's primitive path), while SUM(BIGINT) measures AT
double-sum speed (0.615 s vs 0.601 s on the sf0.1 cube).  So:

- **cent sums** accumulate as plain BIGINT.  Headroom: a whole-table
  cent sum is ~2.3e13 x SF, so int64 (9.2e18) holds through ~sf400k
  (~400 TB raw) — 4x headroom at the 100 TB design point.  (DuckDB
  SUM(BIGINT) promotes to HUGEINT — exact on both engines either way.)
- **1e-4-unit sums** (discounted revenue) would overflow int64 around
  sf4k, so they use a SPLIT ACCUMULATOR: per row q = units DIV 100
  (cent part, bounded like any cent sum) and r = units % 100 (< 100, so
  SUM(r) <= 99 x rows ~ 6e16 at sf100k).  Two fused BIGINT sums instead
  of one decimal sum.  The exact half-up cent reconstruction never
  materializes the 1e-4 total:  ``(100*Sq + Sr + 50) DIV 100
  == Sq + (Sr + 50) DIV 100`` — pure BIGINT, overflow-safe.
- **finishes that re-scale an aggregated sum** (averages, ratios) run
  AFTER aggregation on a handful of rows — there DECIMAL(38,0) is free,
  so any expression that would overflow int64 (e.g. ``2*Scents*100``)
  casts to decimal at that point and nowhere else.

The final double is reconstructed from exact integers with integer
half-up division — ``(2*a + b) DIV (2*b)`` — so BOTH engines perform
identical integer ops and one identical int→double conversion:
deterministic under any summation order, partitioning, or AQE re-plan.

Output columns keep the names, types, and (at the driver's sf0.01
certificate scale, verified by an old-vs-new diff) the exact values of
the ROUND(SUM(double)) forms they replace — these migrations are NOT
semantic swaps and do not void driver certificates.

Both dialect strings are kept side by side here so a future column can't
migrate in one engine only (Spark: ``DIV``; DuckDB: ``//`` / HUGEINT).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# exact discounted price in 1e-4 dollar units, per-row (BIGINT-valued;
# magnitude <= ~1e9 x 100 per row — far inside int64)
_DISC4 = (
    "CAST(ROUND({p} * 100) AS BIGINT)"
    " * (100 - CAST(ROUND({d} * 100) AS BIGINT))"
)


def _split_sums(price: str, disc: str) -> tuple[str, str]:
    """(SUM of cent part, SUM of sub-cent remainder) of the 1e-4-unit
    discounted price — the BIGINT split accumulator."""
    d4 = _DISC4.format(p=price, d=disc)
    return (f"SUM(({d4}) DIV 100)", f"SUM(({d4}) % 100)")


def _split_sums_duck(price: str, disc: str) -> tuple[str, str]:
    d4 = _DISC4.format(p=price, d=disc)
    return (f"SUM(({d4}) // 100)", f"SUM(({d4}) % 100)")


def revenue_exact(price: str = "l_extendedprice", disc: str = "l_discount") -> Column:
    """Aggregate Column == ROUND(SUM(price*(1-disc)), 2) computed exactly.
    Half-up cents = Sq + (Sr + 50) DIV 100 (split accumulator, see module
    docstring) — all BIGINT, no decimal in the hot path or the finish."""
    sq, sr = _split_sums(price, disc)
    return F.expr(f"CAST({sq} + ({sr} + 50) DIV 100 AS DOUBLE) / 100.0")


def revenue_exact_sql(price: str = "l_extendedprice", disc: str = "l_discount") -> str:
    sq, sr = _split_sums_duck(price, disc)
    return f"CAST({sq} + ({sr} + 50) // 100 AS DOUBLE) / 100.0"


def cents_sum(col: str) -> Column:
    """Aggregate Column == ROUND(SUM(col), 2) for a 2-decimal column,
    computed exactly (no rounding step at all: the cent sum IS the value).
    Safe for negative values (acctbal) — no half-up division involved."""
    return F.expr(f"CAST(SUM(CAST(ROUND({col} * 100) AS BIGINT)) AS DOUBLE) / 100.0")


def cents_sum_sql(col: str) -> str:
    return f"CAST(SUM(CAST(ROUND({col} * 100) AS BIGINT)) AS DOUBLE) / 100.0"
