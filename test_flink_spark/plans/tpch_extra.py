"""The remaining TPC-H query shapes (Q2/7/8/9/11/12/13/14/15/16/19/20/21),
adapted to the driver's reduced star schema (TESTDATA.md has no ``partsupp``
table and no commit/receipt/shipmode columns) while preserving each query's
canonical PLAN shape — groupwise-min, fact-fact multi-joins, scalar-subquery
HAVING, CASE-pivot aggregation, argmax-equality join, disjunctive pushdown,
correlated-quantity semi-join, and multi-EXISTS.  Together with q1/3/4/5/6/
10/17/18/22 in relational.py this completes the 22-query suite.

Adaptations (documented per query):
  - supplier "offers" (partsupp) are derived from lineitem shipments;
  - "late" lineitems use shipdate - orderdate (no receipt/commit dates);
  - argmax joins compare exact integer cents (per-row FLOOR before the sum)
    so the winning key is engine-stable — a ROUND(SUM(double)) argmax could
    flip on last-ulp summation-order noise, a hash-compare convention this
    repo enforces fleet-wide (plans/__init__.py).

Scale notes: every dimension (part 2 k, supplier 100, nation, region, and
1-row scalar aggregates) is broadcast; fact-fact joins (lineitem⋈orders)
stay sort-merge on the join key so they survive 100× data; all aggregates
are partial-before-shuffle (pinned fleet-wide by tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .money import revenue_exact, revenue_exact_sql
from .relational import _ms, _t

# ---------------------------------------------------------------------------
# Q2: min-cost supplier (groupwise-min / decorrelated correlated subquery).
# ---------------------------------------------------------------------------


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape without partsupp: a supplier's "offer" for a part is
    the cheapest unit price it ever shipped (exact integer cents — per-row
    FLOOR((ep/qty)*100), deterministic across engines because no float agg
    is compared).  For LARGE parts of size ≤ 10, pick the EUROPE supplier(s)
    matching the per-part minimum — the classic correlated-min subquery,
    expressed as the decorrelated aggregate-join Catalyst produces anyway."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 10)
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    euro_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cents = F.floor(F.col("l_extendedprice") / F.col("l_quantity") * 100)
    offers = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(euro_supp, li.l_suppkey == euro_supp.s_suppkey)
        .groupBy("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(cents).alias("cost_cents"))
    )
    min_cost = offers.groupBy(F.col("p_partkey").alias("mk")).agg(
        F.min("cost_cents").alias("min_cents")
    )
    return (
        offers.join(
            min_cost,
            (offers.p_partkey == min_cost.mk)
            & (offers.cost_cents == min_cost.min_cents),
        )
        .select(
            "p_partkey",
            "s_suppkey",
            "s_name",
            "n_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "cost_cents",
        )
    )


_Q2_SQL = """
WITH euro_supp AS (
    SELECT s_suppkey, s_name, s_acctbal, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
), offers AS (
    SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name,
           MIN(CAST(FLOOR(l_extendedprice / l_quantity * 100) AS BIGINT)) AS cost_cents
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN euro_supp ON l_suppkey = s_suppkey
    WHERE p_type = 'LARGE' AND p_size <= 10
    GROUP BY 1, 2, 3, 4, 5
)
SELECT p_partkey, s_suppkey, s_name, n_name,
       ROUND(s_acctbal, 2) AS s_acctbal, cost_cents
FROM offers o
WHERE cost_cents = (SELECT MIN(cost_cents) FROM offers
                    WHERE p_partkey = o.p_partkey)
"""


# ---------------------------------------------------------------------------
# Q7: volume shipping between two nations (fact-fact join, two dim paths).
# ---------------------------------------------------------------------------


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional nation-pair trade volume: supplier nation via lineitem,
    customer nation via orders — the two-dimension-path join DAG of Q7."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8")
    rev_pair = (F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair | rev_pair)
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            revenue_exact().alias("revenue"),  # exact cents (plans.money)
            F.count(F.lit(1)).alias("cnt"),
        )
    )


_Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       EXTRACT(year FROM l_shipdate) AS l_year,
       CAST(SUM((CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) // 100) + (SUM((CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) % 100) + 50) // 100 AS DOUBLE) / 100.0 AS revenue,
       COUNT(*) AS cnt
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
    OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Q8: national market share (conditional-share aggregation).
# ---------------------------------------------------------------------------


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_6's share of PROMO-part volume sold to AMERICA customers per
    order year — CASE-conditional numerator over a common denominator."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1995-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    amer_cust = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(amer_cust, orders.o_custkey == amer_cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("o_year")
        .agg(
            # exact ROUND(num/den, 4): split-accumulator BIGINT sums in
            # the hot path (plans.money), DECIMAL only on the 1-row finish
            F.expr(
                "CAST((2 * (CAST(SUM(CASE WHEN supp_nation = 'NATION_6'"
                " THEN (CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) DIV 100 ELSE 0 END) AS DECIMAL(38,0)) * 100"
                " + SUM(CASE WHEN supp_nation = 'NATION_6'"
                " THEN (CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) % 100 ELSE 0 END)) * 10000"
                " + (CAST(SUM((CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) DIV 100) AS DECIMAL(38,0)) * 100"
                " + SUM((CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) % 100)))"
                " DIV (2 * (CAST(SUM((CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) DIV 100) AS DECIMAL(38,0)) * 100"
                " + SUM((CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) % 100))) AS DOUBLE) / 10000.0"
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


_Q8_SQL = """
SELECT EXTRACT(year FROM o_orderdate) AS o_year,
       CAST((2 * (CAST(SUM(CASE WHEN n1.n_name = 'NATION_6'
                           THEN (CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) // 100 ELSE 0 END) AS HUGEINT) * 100
                  + SUM(CASE WHEN n1.n_name = 'NATION_6'
                        THEN (CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) % 100 ELSE 0 END)) * 10000
             + (CAST(SUM((CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) // 100) AS HUGEINT) * 100 + SUM((CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) % 100)))
            // (2 * (CAST(SUM((CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) // 100) AS HUGEINT) * 100
                     + SUM((CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) % 100)))
            AS DOUBLE) / 10000.0 AS mkt_share,
       COUNT(*) AS cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region ON n2.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
WHERE p_type = 'PROMO' AND r_name = 'AMERICA'
  AND o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q9: product-type profit by nation and year.
# ---------------------------------------------------------------------------


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on parts named '%widget%' per supplier nation and order year.
    Without ps_supplycost the profit term is the discounted revenue — the
    join DAG (part⋈lineitem⋈orders⋈supplier⋈nation) is Q9's.  Profit is
    summed in exact integer cents: the per-group sums here are ~1e6 with
    thousands of addends, where ROUND(SUM(double), 2) measurably flips on
    summation-order ulp noise (seen at sf0.01: ...43 vs ...44)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy(F.col("n_name").alias("nation"), F.col("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.floor(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    )
                )
                / 100.0,
                2,
            ).alias("sum_profit"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


_Q9_SQL = """
SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
       ROUND(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100)
                      AS BIGINT)) / 100.0, 2) AS sum_profit,
       COUNT(*) AS cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q11: important stock (global-scalar HAVING).
# ---------------------------------------------------------------------------


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose ASIA-supplied value exceeds a fixed fraction of the total
    — Q11's scalar-subquery HAVING.  The global total re-aggregates the
    per-part aggregate (one fact scan, not two); the 1-row total is
    broadcast, the same sanctioned scalar-join shape as q22.

    Arithmetic is INTEGER-exact (the fleet convention): value is summed in
    price-cents × discount-hundredths units (int64), the HAVING threshold
    is the cross-multiplied ``1000·part > total``, and the only double op
    is one final exactly-rounded ``/10⁴``.  The first cut summed doubles
    and survived only while the physical plan froze one summation order —
    removing a broadcast hint in r5 re-ordered the partial sums and pushed
    one part across a ROUND boundary, exactly the float fragility the
    integer convention exists to kill."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey")
    )
    value_c4 = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    per_part = (
        li.join(asia_supp, li.l_suppkey == asia_supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(value_c4).alias("value_c4"))
    )
    total = per_part.agg(F.sum("value_c4").alias("total_c4"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_c4") * 1000 > F.col("total_c4"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("value_c4") / 10000.0, 2).alias("part_value"),
        )
    )


_Q11_SQL = """
WITH per_part AS (
    SELECT l_partkey,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS value_c4
    FROM lineitem
    WHERE l_suppkey IN (
        SELECT s_suppkey FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA')
    GROUP BY 1
)
SELECT l_partkey AS p_partkey, ROUND(value_c4 / 10000.0, 2) AS part_value
FROM per_part
WHERE value_c4 * 1000 > (SELECT SUM(value_c4) FROM per_part)
"""


# ---------------------------------------------------------------------------
# Q12: shipping-delay buckets vs order priority (CASE-pivot aggregation).
# ---------------------------------------------------------------------------


def q12_ship_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 without shipmode/receiptdate: lineitems bucketed by ship delay
    (shipdate − orderdate), counting critical- vs normal-priority orders
    per bucket — the CASE-sum pivot over a fact-fact join."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    orders = _t(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
    bucket = (
        F.when(delay <= 30, "FAST").when(delay <= 90, "MEDIUM").otherwise("SLOW")
    )
    critical = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .withColumn("delay_bucket", bucket)
        .groupBy("delay_bucket")
        .agg(
            F.sum(F.when(critical, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(critical, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


_Q12_SQL = """
SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                           CAST(l_shipdate AS DATE)) <= 30 THEN 'FAST'
            WHEN date_diff('day', CAST(o_orderdate AS DATE),
                           CAST(l_shipdate AS DATE)) <= 90 THEN 'MEDIUM'
            ELSE 'SLOW' END AS delay_bucket,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q13: customer order-count distribution (left join + double aggregation).
# ---------------------------------------------------------------------------


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of orders-per-customer including zero-order customers —
    the LEFT OUTER + two-level aggregation that exercises null-safe
    counting."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY 1)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q14: promo revenue share (single-row conditional ratio).
# ---------------------------------------------------------------------------


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-03-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-05-01")))
    )
    part = _t(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            # exact ROUND(100*num/den, 4): split-accumulator BIGINT sums,
            # DECIMAL only on the 1-row finish (plans.money)
            F.expr(
                "CAST((2 * (CAST(SUM(CASE WHEN p_type = 'PROMO'"
                " THEN (CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) DIV 100 ELSE 0 END) AS DECIMAL(38,0)) * 100"
                " + SUM(CASE WHEN p_type = 'PROMO'"
                " THEN (CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) % 100 ELSE 0 END)) * 1000000"
                " + (CAST(SUM((CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) DIV 100) AS DECIMAL(38,0)) * 100"
                " + SUM((CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) % 100)))"
                " DIV (2 * (CAST(SUM((CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) DIV 100) AS DECIMAL(38,0)) * 100"
                " + SUM((CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) % 100))) AS DOUBLE) / 10000.0"
            ).alias("promo_revenue"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


_Q14_SQL = """
SELECT CAST((2 * (CAST(SUM(CASE WHEN p_type = 'PROMO'
                          THEN (CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) // 100 ELSE 0 END) AS HUGEINT) * 100
                 + SUM(CASE WHEN p_type = 'PROMO'
                       THEN (CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) % 100 ELSE 0 END)) * 1000000
            + (CAST(SUM((CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) // 100) AS HUGEINT) * 100 + SUM((CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) % 100)))
           // (2 * (CAST(SUM((CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) // 100) AS HUGEINT) * 100
                    + SUM((CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) % 100)))
           AS DOUBLE) / 10000.0 AS promo_revenue,
       COUNT(*) AS cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-05-01'
"""


# ---------------------------------------------------------------------------
# Q15: top supplier by quarterly revenue (argmax-equality join).
# ---------------------------------------------------------------------------


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the maximum Q1-1996 revenue.  Revenue is summed in
    exact integer cents (per-row FLOOR) so the argmax equality join cannot
    flip between engines on float summation order — a double SUM differs in
    the last ulp across plans, and ROUND cannot mask that at an argmax
    boundary."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-04-01")))
    )
    supp = _t(spark, sf_dir, "supplier")
    cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
    rev = li.groupBy("l_suppkey").agg(F.sum(cents).alias("revenue_cents"))
    top = rev.agg(F.max("revenue_cents").alias("max_cents"))
    return (
        rev.join(F.broadcast(top), rev.revenue_cents == top.max_cents)
        .join(supp, rev.l_suppkey == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("revenue_cents") / 100.0, 2).alias("total_revenue"),
        )
    )


_Q15_SQL = """
WITH rev AS (
    SELECT l_suppkey,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY 1
)
SELECT s_suppkey, s_name, ROUND(revenue_cents / 100.0, 2) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE revenue_cents = (SELECT MAX(revenue_cents) FROM rev)
"""


# ---------------------------------------------------------------------------
# Q16: supplier count per part attribute (anti-join + COUNT DISTINCT).
# ---------------------------------------------------------------------------


def q16_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct shipping suppliers per (brand, type, size) slice, excluding
    negative-balance suppliers (the complaints stand-in) — Q16's NOT IN +
    COUNT DISTINCT over the part-supplier relation derived from lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 7, 14, 21, 28, 35, 42, 49)
    )
    bad_supp = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


_Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 7, 14, 21, 28, 35, 42, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Q19: disjunctive predicate revenue (OR-of-ANDs pushdown).
# ---------------------------------------------------------------------------


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three OR'd brand/size/quantity branches — the disjunctive filter
    Catalyst must evaluate post-join without exploding the plan."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    b1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    b2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    b3 = (
        (F.col("p_brand") == "Brand#21")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(b1 | b2 | b3)
        .agg(
            revenue_exact().alias("revenue"),  # exact cents (plans.money)
            F.count(F.lit(1)).alias("cnt"),
        )
    )


_Q19_SQL = """
SELECT CAST(SUM((CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) // 100) + (SUM((CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) % 100) + 50) // 100 AS DOUBLE) / 100.0 AS revenue,
       COUNT(*) AS cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#21' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# Q20: dominant-share suppliers of red parts (correlated-quantity semi-join).
# ---------------------------------------------------------------------------


def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AFRICA suppliers who shipped more than 10% of a red part's 1996
    volume — Q20's correlated quantity threshold (availqty vs half of
    shipped, re-expressed over the lineitem-derived relation).  Quantities
    are integral doubles (< 2^53), so the SUMs are exact and the threshold
    compare is engine-stable."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    red = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("red")).select(
        "p_partkey"
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    africa_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name")
    )
    red_li = li.join(red, li.l_partkey == red.p_partkey)
    per_pair = red_li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("supp_qty")
    )
    per_part = red_li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("l_quantity").alias("total_qty")
    )
    dominant = (
        per_pair.join(per_part, per_pair.l_partkey == per_part.pk)
        .filter(F.col("supp_qty") > 0.1 * F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return africa_supp.join(
        dominant, africa_supp.s_suppkey == dominant.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


_Q20_SQL = """
WITH red_li AS (
    SELECT l_partkey, l_suppkey, l_quantity
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
), per_pair AS (
    SELECT l_partkey, l_suppkey, SUM(l_quantity) AS supp_qty
    FROM red_li GROUP BY 1, 2
), per_part AS (
    SELECT l_partkey, SUM(l_quantity) AS total_qty
    FROM red_li GROUP BY 1
)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'AFRICA'
  AND s_suppkey IN (
      SELECT pp.l_suppkey FROM per_pair pp
      JOIN per_part pt ON pp.l_partkey = pt.l_partkey
      WHERE pp.supp_qty > 0.1 * pt.total_qty)
"""


# ---------------------------------------------------------------------------
# Q21: suppliers who alone delayed an order (multi-EXISTS).
# ---------------------------------------------------------------------------


def q21_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the ONLY late shipper on a multi-supplier
    finished order ("late" = shipped > 60 days after the order date; the
    schema has no receipt/commit dates).  Q21's EXISTS / NOT-EXISTS pair is
    expressed as per-order distinct counts — one aggregation instead of two
    correlated probes, the decorrelation a 100 TB plan needs anyway.
    Top 20 by wait count with a total key-order tie-break."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).withColumn(
        "is_late",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).cast("int"),
    )
    per_order = joined.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("is_late") == 1, F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    lone = per_order.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    late_rows = (
        joined.filter(F.col("is_late") == 1)
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    waits = (
        late_rows.join(lone, late_rows.l_orderkey == lone.ok, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return (
        waits.join(supp, waits.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_suppkey").asc())
        .limit(20)
    )


_Q21_SQL = """
WITH j AS (
    SELECT l_orderkey, l_suppkey,
           CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                THEN 1 ELSE 0 END AS is_late
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
), per_order AS (
    SELECT l_orderkey,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS n_late_supp
    FROM j GROUP BY 1
), waits AS (
    SELECT l_suppkey, COUNT(*) AS numwait
    FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM j WHERE is_late = 1) lr
    WHERE l_orderkey IN (SELECT l_orderkey FROM per_order
                         WHERE n_supp > 1 AND n_late_supp = 1)
    GROUP BY 1
)
SELECT s_suppkey, s_name, numwait
FROM waits JOIN supplier ON l_suppkey = s_suppkey
ORDER BY numwait DESC, s_suppkey ASC
LIMIT 20
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_important_stock": q11_important_stock,
    "q12_ship_delay_priority": q12_ship_delay_priority,
    "q13_customer_distribution": q13_customer_distribution,
    "q14_promo_revenue": q14_promo_revenue,
    "q15_top_supplier": q15_top_supplier,
    "q16_parts_supplier_count": q16_parts_supplier_count,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q20_part_promotion": q20_part_promotion,
    "q21_late_suppliers": q21_late_suppliers,
}

ORACLES = {
    "q2_min_cost_supplier": _Q2_SQL,
    "q7_volume_shipping": _Q7_SQL,
    "q8_market_share": _Q8_SQL,
    "q9_product_profit": _Q9_SQL,
    "q11_important_stock": _Q11_SQL,
    "q12_ship_delay_priority": _Q12_SQL,
    "q13_customer_distribution": _Q13_SQL,
    "q14_promo_revenue": _Q14_SQL,
    "q15_top_supplier": _Q15_SQL,
    "q16_parts_supplier_count": _Q16_SQL,
    "q19_disjunctive_revenue": _Q19_SQL,
    "q20_part_promotion": _Q20_SQL,
    "q21_late_suppliers": _Q21_SQL,
}
