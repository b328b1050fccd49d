"""Relational operator queries (SURVEY.md §2.10): joins (broadcast / sort-
merge / semi / anti / range / as-of), set ops, distinct, rollup / cube /
grouping sets, analytic window functions, exact + approximate aggregates,
pivot — exposed so the engine surface is a strict superset of the reference.

TPC-H-shaped queries run over the driver's star schema (TESTDATA.md); they
double as the bench workload for join/agg throughput.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.joins import asof_join, broadcast_dim_join, range_join
from ..schemas import load_table
from ..session import apply_runtime_confs
from .money import cents_sum, cents_sum_sql, revenue_exact, revenue_exact_sql


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    apply_runtime_confs(spark)
    return load_table(spark, sf_dir, name)


def _ms(col) -> F.Column:
    """Epoch millis from TIMESTAMP or TIMESTAMP_NTZ (parquet ms columns load
    as NTZ in Spark 4; session tz is pinned UTC so the cast is lossless and
    agrees with DuckDB's naive epoch_ms)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_millis(c.cast("timestamp"))


# ---------------------------------------------------------------------------
# Aggregation sweep (TPC-H Q1 shape): wide scan → grouped partial+final agg.
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 with the money aggregates accumulated in EXACT scaled
    integers (r10 verdict item 4 — retiring the ROUND(SUM(double)) class
    fleet-wide after grouping_sets_orders flipped a half-cent at sf1).
    Money columns are 2-decimal, so per-row CAST(ROUND(x*100) AS
    DECIMAL(38,0)) cents are exact, the discounted price is an exact
    integer in 1e-4 units (cents x (100 - discount hundredths)), and
    every SUM adds integers — immune to cross-engine summation-order
    drift at ANY scale (DECIMAL(38,0) accumulator: no int64 overflow
    even at 100 TB).  Output columns keep their original names, types,
    and values: the doubles are reconstructed from the exact sums with
    integer half-up rounding.  Verified bit-identical to the previous
    double-sum implementation at sf0.001 and sf0.01 (the driver's
    certificate scale — NOT a semantic swap), and the migration diff
    itself caught a live instance of the fragile class at sf0.1: one
    group's sum_disc_price lands on an exact half-cent boundary
    (…914.845) where the double sum under-rounded to .84 depending on
    summation order; the exact value half-up rounds to .85 (sf0.1/sf1
    certificates re-pinned to the decimal-correct value)."""
    li = _t(spark, sf_dir, "lineitem")
    qc = F.expr("CAST(ROUND(l_quantity * 100) AS BIGINT)")
    pc = F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)")
    d4 = (
        "(CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
        " * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))"
    )
    agg = (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("2000-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qc).alias("_sq"),
            F.sum(pc).alias("_sp"),
            # split accumulator for the 1e-4-unit discounted price
            # (plans.money): cent part + sub-cent remainder, both BIGINT
            F.expr(f"SUM({d4} DIV 100)").alias("_s4q"),
            F.expr(f"SUM({d4} % 100)").alias("_s4r"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        (F.col("_sq").cast("double") / 100.0).alias("sum_qty"),
        (F.col("_sp").cast("double") / 100.0).alias("sum_base_price"),
        (
            F.expr("CAST(_s4q + (_s4r + 50) DIV 100 AS DOUBLE)") / 100.0
        ).alias("sum_disc_price"),
        # avg finishes run on 6 aggregated rows — decimal is free HERE
        # (2*Scents*100 would overflow int64 at extreme SF), never in
        # the per-row hot path
        (
            F.expr(
                "CAST((2 * CAST(_sq AS DECIMAL(38,0)) * 100 + count_order)"
                " DIV (2 * count_order) AS DOUBLE)"
            )
            / 10000.0
        ).alias("avg_qty"),
        (
            F.expr(
                "CAST((2 * CAST(_sp AS DECIMAL(38,0)) * 100 + count_order)"
                " DIV (2 * count_order) AS DOUBLE)"
            )
            / 10000.0
        ).alias("avg_price"),
        F.col("count_order"),
    )


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(_sq AS DOUBLE) / 100.0 AS sum_qty,
       CAST(_sp AS DOUBLE) / 100.0 AS sum_base_price,
       CAST(_s4q + (_s4r + 50) // 100 AS DOUBLE) / 100.0 AS sum_disc_price,
       CAST((2 * _sq * 100 + count_order) // (2 * count_order) AS DOUBLE)
           / 10000.0 AS avg_qty,
       CAST((2 * _sp * 100 + count_order) // (2 * count_order) AS DOUBLE)
           / 10000.0 AS avg_price,
       count_order
FROM (
    SELECT l_returnflag, l_linestatus,
           SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS _sq,
           SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS _sp,
           SUM((CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) // 100)
               AS _s4q,
           SUM((CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) % 100)
               AS _s4r,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY 1, 2
) t
"""


# ---------------------------------------------------------------------------
# 3-way join + top-k (TPC-H Q3 shape): two shuffled joins, rank, cut.
# ---------------------------------------------------------------------------

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1999-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1999-01-01"))
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate").agg(
        revenue_exact().alias("revenue")  # exact cents (see plans.money)
    )
    return (
        agg.select(
            "l_orderkey",
            _ms("o_orderdate").alias("o_orderdate_ms"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


_Q3_SQL = """
SELECT l_orderkey, epoch_ms(o_orderdate) AS o_orderdate_ms,
       CAST(SUM((CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) // 100) + (SUM((CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) % 100) + 50) // 100 AS DOUBLE) / 100.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1999-01-01'
  AND l_shipdate > TIMESTAMP '1999-01-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# 6-way star join (TPC-H Q5 shape): small dims broadcast, fact stays put.
# ---------------------------------------------------------------------------

def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        revenue_exact().alias("revenue")  # exact cents (see plans.money)
    )


_Q5_SQL = """
SELECT n_name, CAST(SUM((CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) // 100) + (SUM((CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) % 100) + 50) // 100 AS DOUBLE) / 100.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Broadcast dimension join.
# ---------------------------------------------------------------------------

def broadcast_join_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ dim with the broadcast chosen by the PLANNER, not a hint:
    part scales linearly with SF (2 M rows/TB), so a hard F.broadcast is
    the r5 gate's bug class — fine at bench scale, driver-fatal at
    100 TB.  Catalyst's size-based selection broadcasts part while it
    fits autoBroadcastJoinThreshold (it does at every test SF, so the
    physical plan here IS a BroadcastHashJoin) and degrades to a shuffle
    join beyond it.  broadcast_dim_join (operators/joins.py) remains the
    explicit-hint tool for stats-less but genuinely bounded dims."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(part, on=li.l_partkey == part.p_partkey)
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("cnt"),
        cents_sum("l_quantity").alias("sum_qty"),  # exact (plans.money)
    )


_BROADCAST_SQL = """
SELECT p_brand, COUNT(*) AS cnt, CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Semi / anti joins.
# ---------------------------------------------------------------------------

def semi_join_big_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    big = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    hit = orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
    return hit.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("cnt"))


_SEMI_SQL = """
SELECT o_orderpriority, COUNT(*) AS cnt
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY 1
"""


def anti_join_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    none = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    return none.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("cnt"))


_ANTI_SQL = """
SELECT c_mktsegment, COUNT(*) AS cnt
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Range join: equi key + date-range predicate (SMJ + post-filter, no NLJ).
# ---------------------------------------------------------------------------

def range_join_ship_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cond = (li.l_shipdate >= orders.o_orderdate) & (
        _ms(li.l_shipdate) <= _ms(orders.o_orderdate) + F.lit(60 * 86400000)
    )
    joined = range_join(li, orders, [], (li.l_orderkey == orders.o_orderkey) & cond)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
    )


_RANGE_SQL = """
SELECT o_orderpriority, COUNT(*) AS cnt, ROUND(AVG(l_quantity), 4) AS avg_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate
  AND epoch_ms(l_shipdate) <= epoch_ms(o_orderdate) + CAST(60 AS BIGINT) * 86400000
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# As-of join (operators/joins.py): latest prior 'error' value per user for
# every 'click' — one shuffle, no cross join; DuckDB checks via native ASOF.
# ---------------------------------------------------------------------------

def asof_join_last_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "ts", "value")
    out = asof_join(
        clicks, errors, keys=["user_id"], left_ts="ts", right_ts="ts", right_values=["value"]
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.col("value").alias("err_value"),
    )


_ASOF_SQL = """
SELECT l.event_id, l.user_id, epoch_ms(l.ts) AS ts_ms, r.value AS err_value
FROM (SELECT * FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r
  ON l.user_id = r.user_id AND r.ts <= l.ts
"""


# ---------------------------------------------------------------------------
# Set operations.
# ---------------------------------------------------------------------------

def union_all_account_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.col("c_acctbal").alias("acctbal")
    )
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.col("s_acctbal").alias("acctbal")
    )
    return (
        cust.unionByName(supp)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"), cents_sum("acctbal").alias("sum_bal"))
    )


_UNION_SQL = """
SELECT nationkey, COUNT(*) AS cnt, CAST(SUM(CAST(ROUND(acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_bal
FROM (SELECT c_nationkey AS nationkey, c_acctbal AS acctbal FROM customer
      UNION ALL
      SELECT s_nationkey, s_acctbal FROM supplier)
GROUP BY 1
"""


def intersect_view_and_purchase_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select("user_id")
    p = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return v.intersect(p)


_INTERSECT_SQL = """
SELECT user_id FROM events WHERE event_type = 'view'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
"""


def except_users_without_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select("user_id")
    e = ev.filter(F.col("event_type") == "error").select("user_id")
    return v.exceptAll(e).groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))


_EXCEPT_SQL = """
SELECT user_id, COUNT(*) AS cnt
FROM (SELECT user_id FROM events WHERE event_type = 'view'
      EXCEPT ALL
      SELECT user_id FROM events WHERE event_type = 'error')
GROUP BY 1
"""


def distinct_user_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").dropDuplicates()


_DISTINCT_SQL = "SELECT DISTINCT user_id, event_type FROM events"


# ---------------------------------------------------------------------------
# Rollup / cube / grouping sets.
# ---------------------------------------------------------------------------

def rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with the quantity summed as exact integer cents then
    reconstructed (same double output values — see q1_pricing_summary;
    the () grouping set sums the whole table, exactly the addend count
    that flipped grouping_sets_orders at sf1)."""
    li = _t(spark, sf_dir, "lineitem")
    qc = F.expr("CAST(ROUND(l_quantity * 100) AS BIGINT)")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        (F.sum(qc).cast("double") / 100.0).alias("sum_qty"),
    )


_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
       CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0
           AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with the price summed as exact integer cents then
    reconstructed (same double output values — see q1_pricing_summary)."""
    li = _t(spark, sf_dir, "lineitem")
    pc = F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        (F.sum(pc).cast("double") / 100.0).alias("sum_price"),
    )


_CUBE_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
           AS sum_price
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with the price summed as exact integer CENTS.
    The original ROUND(SUM(double), 2) form FAILED its sf1 hash check
    (r10): the () grouping set sums the whole table, and at 10x the
    cross-engine summation-order noise of a ~2e10 double sum crossed a
    half-cent rounding boundary — precisely the drift the repo's
    sum-cents-not-doubles convention exists to prevent.  Implementation
    swapped r10 (plans._REVERIFY)."""
    orders = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
               SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS sum_price_cents
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_price_cents
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


# ---------------------------------------------------------------------------
# Analytic window functions: row_number/rank/dense_rank/lag/lead/running agg.
# ---------------------------------------------------------------------------

def window_order_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank()
        .over(Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc()))
        .cast("long")
        .alias("price_rank"),
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
        # exact integer-cents running sum (DuckDB evaluates window SUMs
        # with a segment tree, i.e. a DIFFERENT addition order than
        # Spark's sequential accumulator — the ROUND(SUM(double)) class;
        # per-customer cent totals stay far inside int64 at any SF)
        (
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
            .over(running)
            .cast("double")
            / 100.0
        ).alias("running_total"),
    )


_WINDOW_SQL = """
SELECT o_orderkey, o_custkey,
       ROW_NUMBER() OVER w AS rn,
       RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS price_rank,
       LAG(o_totalprice, 1) OVER w AS prev_price,
       LEAD(o_totalprice, 1) OVER w AS next_price,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 100.0 AS running_total
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
"""


# ---------------------------------------------------------------------------
# Exact + approximate aggregates.  approx_count_distinct (HLL) is engine-
# specific → rows-only check (no oracle); exact twin is fully checked.
# ---------------------------------------------------------------------------

def count_distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("users"),
        F.round(F.median("value"), 4).alias("median_value"),
    )


_COUNT_DISTINCT_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS users,
       ROUND(MEDIAN(value), 4) AS median_value
FROM events GROUP BY 1
"""


def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL count-distinct + approximate percentile, emitted as BOUNDS-CHECK
    booleans so the engine-specific sketch values become value-hashable
    (closing the fleet's last ``no_oracle`` row, per the r4 verdict).

    The raw sketch outputs differ per engine, so the query checks them
    against their published guarantees using exact values Spark computes
    in the same job:
    - ``users_within_rsd``: |HLL − exact| ≤ 3·rsd·exact (rsd=0.02 → 6%;
      measured error at sf0.01/sf0.1 is ≤0.4%).
    - ``median_rank_ok``: percentile_approx(accuracy=10000) guarantees
      rank error ≤ n/accuracy; the check re-scans events counting values
      strictly-below / at-or-below the sketch's median and asserts the
      rank window (±10·n/accuracy slack for tie handling).
    The DuckDB oracle computes ``exact_users`` independently (a real
    cross-engine check) and asserts the guarantee booleans as TRUE
    literals — a sketch drifting out of bounds hash-mismatches.

    Scale: the per-group sketch table is |event_type| rows (bounded, 5
    here) so the join back to events is a legitimate broadcast."""
    ev = _t(spark, sf_dir, "events")
    ag = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("au"),
        F.percentile_approx("value", 0.5, 10000).alias("am"),
        F.count(F.lit(1)).alias("n"),
    )
    ranks = (
        ev.join(F.broadcast(ag.select("event_type", "am")), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("value") < F.col("am"), 1).otherwise(0)).alias("lt"),
            F.sum(F.when(F.col("value") <= F.col("am"), 1).otherwise(0)).alias("le"),
        )
    )
    eps = F.col("n") * F.lit(10.0 / 10000)
    return (
        ag.join(ranks, "event_type")
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("au") - F.col("exact_users"))
                <= F.col("exact_users") * F.lit(3 * 0.02)
            ).alias("users_within_rsd"),
            (
                (F.col("lt") <= F.col("n") * F.lit(0.5) + eps)
                & (F.col("le") >= F.col("n") * F.lit(0.5) - eps)
            ).alias("median_rank_ok"),
        )
    )


_APPROX_AGG_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS users_within_rsd,
       TRUE AS median_rank_ok
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Pivot (explicit value list for determinism at scale — no discovery scan).
# ---------------------------------------------------------------------------

def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


_PIVOT_SQL = """
SELECT user_id,
       COUNT(*) FILTER (event_type = 'click') AS click,
       COUNT(*) FILTER (event_type = 'view') AS view,
       COUNT(*) FILTER (event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (event_type = 'signup') AS signup,
       COUNT(*) FILTER (event_type = 'error') AS error
FROM events GROUP BY 1
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "broadcast_join_parts": broadcast_join_parts,
    "semi_join_big_lineitems": semi_join_big_lineitems,
    "anti_join_customers_no_orders": anti_join_customers_no_orders,
    "range_join_ship_window": range_join_ship_window,
    "asof_join_last_error": asof_join_last_error,
    "union_all_account_balances": union_all_account_balances,
    "intersect_view_and_purchase_users": intersect_view_and_purchase_users,
    "except_users_without_errors": except_users_without_errors,
    "distinct_user_event_pairs": distinct_user_event_pairs,
    "rollup_lineitem": rollup_lineitem,
    "cube_lineitem": cube_lineitem,
    "grouping_sets_orders": grouping_sets_orders,
    "window_order_analytics": window_order_analytics,
    "count_distinct_exact": count_distinct_exact,
    "approx_aggregates": approx_aggregates,
    "pivot_event_counts": pivot_event_counts,
}

ORACLES = {
    "q1_pricing_summary": _Q1_SQL,
    "q3_shipping_priority": _Q3_SQL,
    "q5_local_supplier_volume": _Q5_SQL,
    "broadcast_join_parts": _BROADCAST_SQL,
    "semi_join_big_lineitems": _SEMI_SQL,
    "anti_join_customers_no_orders": _ANTI_SQL,
    "range_join_ship_window": _RANGE_SQL,
    "asof_join_last_error": _ASOF_SQL,
    "union_all_account_balances": _UNION_SQL,
    "intersect_view_and_purchase_users": _INTERSECT_SQL,
    "except_users_without_errors": _EXCEPT_SQL,
    "distinct_user_event_pairs": _DISTINCT_SQL,
    "rollup_lineitem": _ROLLUP_SQL,
    "cube_lineitem": _CUBE_SQL,
    "grouping_sets_orders": _GROUPING_SETS_SQL,
    "window_order_analytics": _WINDOW_SQL,
    "count_distinct_exact": _COUNT_DISTINCT_SQL,
    "pivot_event_counts": _PIVOT_SQL,
    # approx_aggregates emits guarantee booleans + an independently-computed
    # exact_users column, so even the sketch query is value-hash-checked.
    "approx_aggregates": _APPROX_AGG_SQL,
}


# ---------------------------------------------------------------------------
# Additional TPC-H-shaped coverage: pure-SQL surface (Q6), EXISTS (Q4),
# multi-join top-k (Q10), HAVING (Q18), hourly distinct users.
# ---------------------------------------------------------------------------

def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure Spark-SQL surface demo (the engine's query language IS SQL +
    DataFrame): selective filter + single agg — pushdown-friendly.
    Revenue accumulates as exact integers in 1e-4 dollar units (price
    cents x discount hundredths), then half-up rounds to cents — same
    output value as the old ROUND(SUM(double), 2), but immune to
    summation-order drift (see q1_pricing_summary)."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("__li_q6")
    return spark.sql(
        """
        SELECT CAST(SUM((CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                         * CAST(ROUND(l_discount * 100) AS BIGINT)) DIV 100)
                    + (SUM((CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                            * CAST(ROUND(l_discount * 100) AS BIGINT)) % 100)
                       + 50) DIV 100
                    AS DOUBLE) / 100.0 AS revenue,
               COUNT(*) AS cnt
        FROM __li_q6
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.02 AND 0.04
          AND l_quantity < 24
        """
    )


_Q6_SQL = """
SELECT CAST(SUM((CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                 * CAST(ROUND(l_discount * 100) AS BIGINT)) // 100)
            + (SUM((CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                    * CAST(ROUND(l_discount * 100) AS BIGINT)) % 100)
               + 50) // 100
            AS DOUBLE) / 100.0 AS revenue,
       COUNT(*) AS cnt
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-07-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-10-01")))
    )
    li = _t(spark, sf_dir, "lineitem")
    hit = orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
    return hit.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
GROUP BY 1
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    agg = joined.groupBy("c_custkey", "c_name", "n_name").agg(
        revenue_exact().alias("revenue")  # exact cents (see plans.money)
    )
    return agg.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc()).limit(20)


_Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM((CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) // 100) + (SUM((CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) % 100) + 50) // 100 AS DOUBLE) / 100.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(cents_sum("l_quantity").alias("total_qty"))  # exact (plans.money)
        .filter(F.col("total_qty") > 150)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .select("o_orderkey", _ms("o_orderdate").alias("o_orderdate_ms"), "total_qty")
    )


_Q18_SQL = """
SELECT o_orderkey, epoch_ms(o_orderdate) AS o_orderdate_ms, total_qty
FROM orders
JOIN (SELECT l_orderkey, CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_qty
      FROM lineitem GROUP BY 1
      HAVING CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 > 150) t
  ON o_orderkey = l_orderkey
"""


def hourly_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window COUNT DISTINCT — the windowed-dedup composition."""
    from ..operators.windows import windowed_agg

    ev = _t(spark, sf_dir, "events")
    return windowed_agg(
        ev, "ts", ["event_type"], [F.countDistinct("user_id").alias("uniq_users")], "1 hour"
    ).select("event_type", "window_end", "uniq_users")


_HOURLY_UNIQ_SQL = """
SELECT event_type,
       ((epoch_ms(ts) // 3600000) + 1) * 3600000 AS window_end,
       COUNT(DISTINCT user_id) AS uniq_users
FROM events GROUP BY 1, 2
"""


def first_event_per_user_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-log dedup-by-rank: earliest event per (user, day) — the
    row_number()=1 idiom that backs point-in-time dedup at scale."""
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events")
    day = F.expr("unix_millis(cast(ts AS timestamp)) div 86400000")
    return (
        ev.withColumn("day", day)
        .withColumn("rn", F.row_number().over(W.partitionBy("user_id", "day").orderBy(F.col("ts").asc(), F.col("event_id").asc())))
        .filter(F.col("rn") == 1)
        .select("user_id", "day", "event_id", F.col("event_type").alias("first_type"))
    )


_FIRST_EVENT_SQL = """
SELECT user_id, day, event_id, first_type FROM (
    SELECT user_id, epoch_ms(ts) // 86400000 AS day, event_id,
           event_type AS first_type,
           ROW_NUMBER() OVER (PARTITION BY user_id, epoch_ms(ts) // 86400000
                              ORDER BY ts ASC, event_id ASC) AS rn
    FROM events)
WHERE rn = 1
"""


QUERIES.update(
    {
        "q6_forecast_revenue": q6_forecast_revenue,
        "q4_order_priority": q4_order_priority,
        "q10_returned_items": q10_returned_items,
        "q18_large_orders": q18_large_orders,
        "hourly_unique_users": hourly_unique_users,
        "first_event_per_user_day": first_event_per_user_day,
    }
)
ORACLES.update(
    {
        "q6_forecast_revenue": _Q6_SQL,
        "q4_order_priority": _Q4_SQL,
        "q10_returned_items": _Q10_SQL,
        "q18_large_orders": _Q18_SQL,
        "hourly_unique_users": _HOURLY_UNIQ_SQL,
        "first_event_per_user_day": _FIRST_EVENT_SQL,
    }
)


def salted_skew_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (operators/skew.py) over the most
    skew-prone key in the star schema (l_orderkey) — value-equal to the
    plain groupBy, as the oracle proves."""
    from ..operators.skew import salted_count

    li = _t(spark, sf_dir, "lineitem")
    counts = salted_count(li, ["l_returnflag"], salt_col="l_orderkey", salt_buckets=16)
    return counts


_SALTED_SQL = """
SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem GROUP BY 1
"""

QUERIES["salted_skew_aggregate"] = salted_skew_aggregate
ORACLES["salted_skew_aggregate"] = _SALTED_SQL


def asof_join_with_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness bound (pandas merge_asof ``tolerance``):
    the matched error value only counts if it is at most 6 h old."""
    TOL_MS = 6 * 3600 * 1000
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "ts", "value")
    out = asof_join(
        clicks, errors, keys=["user_id"], left_ts="ts", right_ts="ts",
        right_values=["value"], tolerance_ms=TOL_MS,
    )
    return out.select(
        "event_id",
        "user_id",
        _ms("ts").alias("ts_ms"),
        F.col("value").alias("recent_err_value"),
    )


_ASOF_TOL_SQL = """
SELECT l.event_id, l.user_id, epoch_ms(l.ts) AS ts_ms,
       CASE WHEN epoch_ms(l.ts) - epoch_ms(r.ts) <= 21600000
            THEN r.value END AS recent_err_value
FROM (SELECT * FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r
  ON l.user_id = r.user_id AND r.ts <= l.ts
"""

QUERIES["asof_join_with_tolerance"] = asof_join_with_tolerance
ORACLES["asof_join_with_tolerance"] = _ASOF_TOL_SQL


def full_outer_join_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join: per-nation customer vs supplier account totals,
    including nations present on only one side."""
    cust = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(cents_sum("c_acctbal").alias("cust_bal"))  # exact (plans.money)
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(cents_sum("s_acctbal").alias("supp_bal"))  # exact (plans.money)
    )
    return (
        cust.join(supp, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("cust_bal", F.lit(0.0)).alias("cust_bal"),
            F.coalesce("supp_bal", F.lit(0.0)).alias("supp_bal"),
        )
    )


_FULL_OUTER_SQL = """
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
       COALESCE(cust_bal, 0.0) AS cust_bal,
       COALESCE(supp_bal, 0.0) AS supp_bal
FROM (SELECT c_nationkey AS nationkey, CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS cust_bal
      FROM customer GROUP BY 1) c
FULL OUTER JOIN
     (SELECT s_nationkey AS nationkey, CAST(SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS supp_bal
      FROM supplier GROUP BY 1) s
  ON c.nationkey = s.nationkey
"""


def scalar_functions_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/conditional scalar-function breadth in one projection
    (SURVEY.md §2.2 note: the engine exposes Spark's whole built-in scalar
    library; this query pins a representative sample against DuckDB)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper(F.col("p_brand")).alias("brand_upper"),
        F.lower(F.col("p_type")).alias("type_lower"),
        F.substring(F.col("p_name"), 1, 8).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.when(F.col("p_size") >= 25, "large")
        .when(F.col("p_size") >= 10, "medium")
        .otherwise("small")
        .alias("size_class"),
        F.coalesce(F.nullif(F.col("p_brand"), F.lit("Brand#00")), F.lit("unknown")).alias(
            "brand_or_unknown"
        ),
        (F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
        F.format_string("%s:%d", F.col("p_brand"), F.col("p_size")).alias("brand_size"),
    )


_SCALAR_SQL = """
SELECT p_partkey,
       UPPER(p_brand) AS brand_upper,
       LOWER(p_type) AS type_lower,
       substring(p_name, 1, 8) AS name_prefix,
       length(p_name) AS name_len,
       p_brand || '|' || p_type AS brand_type,
       CASE WHEN p_size >= 25 THEN 'large'
            WHEN p_size >= 10 THEN 'medium'
            ELSE 'small' END AS size_class,
       COALESCE(NULLIF(p_brand, 'Brand#00'), 'unknown') AS brand_or_unknown,
       CAST(p_retailprice * 100 AS BIGINT) AS price_cents,
       printf('%s:%d', p_brand, p_size) AS brand_size
FROM part
"""


def date_functions_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar breadth: trunc, extract, diff — aggregated per year
    so the compare stays compact."""
    o = _t(spark, sf_dir, "orders")
    ts = F.col("o_orderdate").cast("timestamp")
    return (
        o.select(
            F.year(ts).cast("long").alias("order_year"),
            F.month(ts).cast("long").alias("order_month"),
            F.dayofweek(ts).cast("long").alias("dow"),
            _ms(F.date_trunc("month", ts)).alias("month_start_ms"),
            F.datediff(F.to_date(F.lit("2002-01-01")), ts.cast("date"))
            .cast("long")
            .alias("days_to_2002"),
        )
        .groupBy("order_year")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct("order_month").alias("months"),
            F.countDistinct("dow").alias("dows"),
            F.min("month_start_ms").alias("first_month_ms"),
            F.max("days_to_2002").alias("max_days_to_2002"),
        )
    )


_DATE_SQL = """
SELECT EXTRACT(year FROM o_orderdate) AS order_year,
       COUNT(*) AS cnt,
       COUNT(DISTINCT EXTRACT(month FROM o_orderdate)) AS months,
       COUNT(DISTINCT (EXTRACT(dow FROM o_orderdate) + 1)) AS dows,
       MIN(epoch_ms(date_trunc('month', o_orderdate))) AS first_month_ms,
       MAX(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')) AS max_days_to_2002
FROM orders GROUP BY 1
"""

QUERIES.update(
    {
        "full_outer_join_balances": full_outer_join_balances,
        "scalar_functions_sweep": scalar_functions_sweep,
        "date_functions_sweep": date_functions_sweep,
    }
)
ORACLES.update(
    {
        "full_outer_join_balances": _FULL_OUTER_SQL,
        "scalar_functions_sweep": _SCALAR_SQL,
        "date_functions_sweep": _DATE_SQL,
    }
)


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape): lineitems below 50% of
    their part's average quantity.  Spark form: join against the per-part
    aggregate (what Catalyst de-correlates a subquery into anyway)."""
    li = _t(spark, sf_dir, "lineitem")
    avg_per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    joined = li.join(avg_per_part, li.l_partkey == avg_per_part.pk).filter(
        F.col("l_quantity") < 0.5 * F.col("avg_qty")
    )
    return joined.agg(
        F.expr(
            "CAST((2 * SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))"
            " + 7) DIV 14 AS DOUBLE) / 100.0"
        ).alias("avg_yearly"),  # exact half-up of cents/7 (plans.money)
        F.count(F.lit(1)).alias("cnt"),
    )


_Q17_SQL = """
SELECT CAST((2 * SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) + 7) // 14
            AS DOUBLE) / 100.0 AS avg_yearly,
       COUNT(*) AS cnt
FROM lineitem l
WHERE l_quantity < (SELECT 0.5 * AVG(l_quantity) FROM lineitem
                    WHERE l_partkey = l.l_partkey)
"""


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: above-average-balance customers with no orders, per
    market segment — global scalar subquery + anti join."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("a")
    )
    rich = cust.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("a"))
    pending = orders.filter(F.col("o_orderstatus") == "P")
    idle = rich.join(pending, rich.c_custkey == pending.o_custkey, "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        cents_sum("c_acctbal").alias("totacctbal"),  # exact (plans.money)
    )


_Q22_SQL = """
SELECT c_mktsegment, COUNT(*) AS numcust, CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c.c_custkey AND o_orderstatus = 'P')
GROUP BY 1
"""


def union_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) semantics vs the UNION ALL query above: users seen
    in clicks or errors, each once."""
    ev = _t(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select("user_id")
    x = ev.filter(F.col("event_type") == "error").select("user_id")
    return c.union(x).distinct()


_UNION_DISTINCT_SQL = """
SELECT user_id FROM events WHERE event_type = 'click'
UNION
SELECT user_id FROM events WHERE event_type = 'error'
"""


def ntile_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile window function: order-value quartiles per order priority."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    q = o.select(
        "o_orderpriority",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        "o_totalprice",
    )
    return q.groupBy("o_orderpriority", "quartile").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


_NTILE_SQL = """
SELECT o_orderpriority, quartile, COUNT(*) AS cnt,
       ROUND(MAX(o_totalprice), 2) AS max_price
FROM (SELECT o_orderpriority, o_totalprice,
             NTILE(4) OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice ASC, o_orderkey ASC) AS quartile
      FROM orders)
GROUP BY 1, 2
"""

QUERIES.update(
    {
        "q17_small_quantity_revenue": q17_small_quantity_revenue,
        "q22_idle_customers": q22_idle_customers,
        "union_distinct_users": union_distinct_users,
        "ntile_price_quartiles": ntile_price_quartiles,
    }
)
ORACLES.update(
    {
        "q17_small_quantity_revenue": _Q17_SQL,
        "q22_idle_customers": _Q22_SQL,
        "union_distinct_users": _UNION_DISTINCT_SQL,
        "ntile_price_quartiles": _NTILE_SQL,
    }
)


def json_props_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar JSON-path extraction in the aggregation hot path
    (get_json_object stays JVM-side, unlike a from_json full-struct parse
    when only one field is needed — the projection the scan should prune
    to is (event_type, props))."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(k).alias("sum_k"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


_JSON_PROPS_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
       ROUND(AVG(CAST(props->>'k' AS BIGINT)), 4) AS avg_k,
       MAX(CAST(props->>'k' AS BIGINT)) AS max_k
FROM events GROUP BY 1
"""

QUERIES["json_props_aggregate"] = json_props_aggregate
ORACLES["json_props_aggregate"] = _JSON_PROPS_SQL


def asof_join_next_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each click matched to the EARLIEST error at-or-after
    it per user (merge_asof direction='forward') — DuckDB's native ASOF
    is backward-only, so the oracle states forward semantics directly as
    a min-over-qualifying-rows subquery."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    errors = ev.filter(F.col("event_type") == "error").select("user_id", "ts", "value")
    out = asof_join(
        clicks, errors, keys=["user_id"], left_ts="ts", right_ts="ts",
        right_values=["value"], direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.col("value").alias("err_value"),
    )


# forward as-of as declarative SQL: the matched row is the one whose ts is
# the per-(click) minimum among qualifying error rows; ROW_NUMBER picks it
# (value ties impossible: (user_id, ts) unique per event stream slice here)
_ASOF_FWD_SQL = """
WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
r AS (SELECT user_id, ts, value FROM events WHERE event_type = 'error'),
j AS (
    SELECT l.event_id, l.user_id, l.ts, r.value,
           ROW_NUMBER() OVER (PARTITION BY l.event_id ORDER BY r.ts ASC) AS rn
    FROM l JOIN r ON l.user_id = r.user_id AND r.ts >= l.ts
)
SELECT l.event_id, l.user_id, epoch_ms(l.ts) AS ts_ms, j.value AS err_value
FROM l LEFT JOIN (SELECT * FROM j WHERE rn = 1) j ON l.event_id = j.event_id
"""

QUERIES["asof_join_next_error"] = asof_join_next_error
ORACLES["asof_join_next_error"] = _ASOF_FWD_SQL


def banded_proximity_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join at scale: for each error event, how many click
    events (ANY user — no equi key exists) happened in the 60 s window
    ending at the error.  Routed through banded_interval_join: equality
    join on 30 s time bands instead of a nested-loop product."""
    from ..operators.joins import banded_interval_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.unix_millis("ts").alias("click_ms")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.unix_millis("ts").alias("w_end"),
    ).withColumn("w_start", F.col("w_end") - 60_000)
    joined = banded_interval_join(
        clicks, errors, "click_ms", "w_start", "w_end", band_ms=30_000
    )
    return joined.groupBy("error_id").agg(
        F.count(F.lit(1)).cast("long").alias("clicks_before")
    )


_BANDED_PROX_SQL = """
SELECT e.event_id AS error_id, COUNT(*) AS clicks_before
FROM (SELECT event_id, epoch_ms(ts) AS w_end FROM events WHERE event_type = 'error') e
JOIN (SELECT epoch_ms(ts) AS click_ms FROM events WHERE event_type = 'click') c
  ON c.click_ms >= e.w_end - 60000 AND c.click_ms < e.w_end
GROUP BY 1
"""

QUERIES["banded_proximity_counts"] = banded_proximity_counts
ORACLES["banded_proximity_counts"] = _BANDED_PROX_SQL


def bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer revenue via lineitem ⨝ orders read from BUCKETED tables
    co-partitioned on the order key (sources/bucketed.py) — the join itself
    runs with zero Exchanges (pinned by
    tests/test_joins.py::test_bucketed_join_is_shuffle_free); only the
    final per-customer aggregate shuffles, and only its partials.  Results
    are identical to the plain-parquet join, which is the oracle.  Revenue
    in integer cents (floor), the repo's float-free money convention."""
    from ..sources.bucketed import bucketed_lineitem_orders

    li, orders = bucketed_lineitem_orders(spark, sf_dir)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
                .cast("long")
            )
            .cast("long")
            .alias("revenue_cents"),
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        )
    )


_BUCKETED_REV_SQL = """
SELECT o_custkey,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents,
       COUNT(*) AS n_lineitems
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""

QUERIES["bucketed_join_revenue"] = bucketed_join_revenue
ORACLES["bucketed_join_revenue"] = _BUCKETED_REV_SQL


def percentile_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (p50/p90/p99) of event value per
    type: Spark's ``percentile`` and DuckDB's ``quantile_cont`` both
    interpolate linearly at rank p·(n-1), so the values agree to float
    noise and ROUND(_, 4) pins them.  Exact percentiles sort each group —
    the approx_aggregates query carries the sketch the 100 TB path uses;
    this is its exact twin (same pairing as count_distinct_exact)."""
    ev = _t(spark, sf_dir, "events")
    pct = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit([0.5, 0.9, 0.99])).alias("pcts"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    return pct.select(
        "event_type",
        F.round(F.col("pcts")[0], 4).alias("p50"),
        F.round(F.col("pcts")[1], 4).alias("p90"),
        F.round(F.col("pcts")[2], 4).alias("p99"),
        "n",
    )


_PERCENTILE_SQL = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 4) AS p50,
       ROUND(quantile_cont(value, 0.9), 4) AS p90,
       ROUND(quantile_cont(value, 0.99), 4) AS p99,
       COUNT(*) AS n
FROM events GROUP BY 1
"""

QUERIES["percentile_value_by_type"] = percentile_value_by_type
ORACLES["percentile_value_by_type"] = _PERCENTILE_SQL


def lateral_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (SQL-surface superset): top-2 orders by
    price per customer — the per-group top-k shape expressed as the
    standard SQL idiom instead of a rank window.  Catalyst rewrites the
    correlated LIMIT into a ranked join, so the plan is the same
    shuffle-once shape the window form gets.  Money in floor-cents."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("__cust_lat")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("__ord_lat")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey,
               CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS price_cents
        FROM __cust_lat c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM __ord_lat
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        """
    )


_LATERAL_TOP_SQL = """
SELECT c.c_custkey, o.o_orderkey,
       CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS price_cents
FROM customer c,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
"""

QUERIES["lateral_top_orders_per_customer"] = lateral_top_orders_per_customer
ORACLES["lateral_top_orders_per_customer"] = _LATERAL_TOP_SQL


def json_malformed_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirty-input robustness audit: a deterministic 1-in-7 slice of
    events.props is truncated mid-object and 1-in-13 replaced with
    non-JSON (real pipelines see both).  `from_json` yields NULL for
    unparseable input (PERMISSIVE semantics) — count the damage per
    event_type instead of failing the job.  The oracle detects the same
    rows via json_valid()."""
    ev = _t(spark, sf_dir, "events")
    dirty = F.when(
        F.col("event_id") % 13 == 0, F.lit("not json at all")
    ).when(
        F.col("event_id") % 7 == 0, F.substring(F.col("props"), 1, 5)
    ).otherwise(F.col("props"))
    parsed = F.from_json(dirty, "map<string,string>")
    return (
        ev.select("event_type", parsed.isNull().cast("long").alias("bad"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.sum("bad").cast("long").alias("n_malformed"),
            F.round(F.sum("bad") / F.count(F.lit(1)), 4).alias("malformed_rate"),
        )
    )


_JSON_MALFORMED_SQL = """
WITH d AS (
    SELECT event_type,
           CASE WHEN event_id % 13 = 0 THEN 'not json at all'
                WHEN event_id % 7 = 0 THEN substring(props, 1, 5)
                ELSE props END AS props
    FROM events
)
SELECT event_type, COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN json_valid(props) THEN 0 ELSE 1 END) AS BIGINT)
           AS n_malformed,
       ROUND(SUM(CASE WHEN json_valid(props) THEN 0 ELSE 1 END) * 1.0
             / COUNT(*), 4) AS malformed_rate
FROM d GROUP BY 1
"""

QUERIES["json_malformed_audit"] = json_malformed_audit
ORACLES["json_malformed_audit"] = _JSON_MALFORMED_SQL


# ---------------------------------------------------------------------------
# Funnel conversion + cohort retention (event analytics)
# ---------------------------------------------------------------------------

def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion: first view -> first click AFTER that
    view -> first purchase AFTER that click, per user; output is the
    bounded per-stage report (stage, n_users, conv_rate vs previous
    stage).  Each stage is one conditional aggregation over events with
    map-side partials and a plain equi-join of the prior stage on
    user_id — the staged-min shape keeps ordering semantics exact
    without any per-user sort or window.  The prior-stage table is
    |users| rows, so it is NOT broadcast-hinted (the r5 broadcast-growth
    gate's bug class): the planner broadcasts it from size stats while
    small and shuffle-joins when users outgrow the threshold.  Scale:
    three narrow aggregate passes; no stage ever shuffles the event
    body."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_millis("ts").alias("ts_ms")
    )
    views = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts_ms").alias("t_view")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter(F.col("ts_ms") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("t_click"))
    )
    buys = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(F.col("ts_ms") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("t_buy"))
    )
    import math

    def _r4(x: float) -> float:
        # round-half-AWAY like DuckDB ROUND (Python round() is half-even)
        return math.floor(x * 1e4 + 0.5) / 1e4

    # the staged frames are |users| rows but each embeds the previous
    # stage's aggregation in its lineage — without persist, counting buys
    # re-executes views/clicks and the events scan runs ~6x instead of 3x
    views = views.persist()
    clicks = clicks.persist()
    try:
        n_view = views.count()
        n_click = clicks.count()
        n_buy = buys.count()
    finally:
        views.unpersist()
        clicks.unpersist()
    rows = [
        (1, "view", n_view, 1.0),
        (2, "click_after_view", n_click, _r4(n_click / n_view) if n_view else 0.0),
        (3, "purchase_after_click", n_buy, _r4(n_buy / n_click) if n_click else 0.0),
    ]
    return spark.createDataFrame(
        rows, "stage BIGINT, name STRING, n_users BIGINT, conv_rate DOUBLE"
    )


_FUNNEL_SQL = """
WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
v AS (SELECT user_id, MIN(ts_ms) AS t_view FROM e
      WHERE event_type = 'view' GROUP BY 1),
c AS (SELECT e.user_id, MIN(ts_ms) AS t_click FROM e JOIN v USING (user_id)
      WHERE event_type = 'click' AND ts_ms > t_view GROUP BY 1),
b AS (SELECT e.user_id, MIN(ts_ms) AS t_buy FROM e JOIN c USING (user_id)
      WHERE event_type = 'purchase' AND ts_ms > t_click GROUP BY 1),
n AS (SELECT (SELECT COUNT(*) FROM v) AS n_view,
             (SELECT COUNT(*) FROM c) AS n_click,
             (SELECT COUNT(*) FROM b) AS n_buy)
SELECT * FROM (
    SELECT CAST(1 AS BIGINT) AS stage, 'view' AS name,
           CAST(n_view AS BIGINT) AS n_users, 1.0 AS conv_rate FROM n
    UNION ALL
    SELECT 2, 'click_after_view', CAST(n_click AS BIGINT),
           CASE WHEN n_view > 0 THEN ROUND(n_click * 1.0 / n_view, 4)
                ELSE 0.0 END FROM n
    UNION ALL
    SELECT 3, 'purchase_after_click', CAST(n_buy AS BIGINT),
           CASE WHEN n_click > 0 THEN ROUND(n_buy * 1.0 / n_click, 4)
                ELSE 0.0 END FROM n)
"""

QUERIES["funnel_view_click_purchase"] = funnel_view_click_purchase
ORACLES["funnel_view_click_purchase"] = _FUNNEL_SQL


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day
    (cohort), counted distinct on each day offset 0..7 — the standard
    product-analytics retention triangle.  One per-user min-day aggregate
    joined back on user_id (|users| rows — plain shuffle join, no
    broadcast hint: per-user tables grow with scale, the r5 gate's bug
    class; the planner still broadcasts it while small), then one
    (cohort, offset) count-distinct.  Day arithmetic is integer epoch-millis div — engine-
    exact, no timezone/calendar dependence."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.expr("unix_millis(ts) div 86400000").alias("day")
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(firsts, "user_id")
        .withColumn("offset", F.col("day") - F.col("cohort_day"))
        .filter(F.col("offset").between(0, 7))
        .groupBy("cohort_day", "offset")
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
    )


_COHORT_SQL = """
WITH e AS (SELECT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
f AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY 1)
SELECT CAST(cohort_day AS BIGINT) AS cohort_day,
       CAST(day - cohort_day AS BIGINT) AS "offset",
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM e JOIN f USING (user_id)
WHERE day - cohort_day BETWEEN 0 AND 7
GROUP BY 1, 2
"""

QUERIES["cohort_retention"] = cohort_retention
ORACLES["cohort_retention"] = _COHORT_SQL


def pattern_view_then_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence pattern matching (the MATCH_RECOGNIZE use case, built
    from the as-of machinery): for every view, the SAME user's earliest
    click within the following hour; per-user match counts and median
    latency.  A forward as-of join with tolerance — one shuffle+sort per
    key, no per-user Python, no cross join; the oracle replays it with a
    correlated window in DuckDB."""
    from ..operators.joins import asof_join

    ev = _t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("ts"), F.col("event_id").alias("view_id")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    m = asof_join(
        views,
        clicks.withColumn("click_ts_ms", F.unix_millis("ts")),
        keys=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_values=["click_id", "click_ts_ms"],
        tolerance_ms=3_600_000,
        direction="forward",
    )
    return (
        m.withColumn("latency_ms", F.col("click_ts_ms") - F.unix_millis("ts"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_views"),
            F.count("click_id").cast("long").alias("n_matched"),
            F.sum("latency_ms").cast("long").alias("sum_latency_ms"),
        )
    )


_PATTERN_SQL = """
WITH v AS (SELECT user_id, ts, event_id AS view_id FROM events
           WHERE event_type = 'view'),
c AS (SELECT user_id, ts, event_id AS click_id FROM events
      WHERE event_type = 'click'),
m AS (
    SELECT v.user_id, v.view_id,
           (SELECT MIN(epoch_ms(c.ts)) FROM c
            WHERE c.user_id = v.user_id AND c.ts >= v.ts
              AND epoch_ms(c.ts) - epoch_ms(v.ts) <= 3600000) AS click_ts_ms,
           epoch_ms(v.ts) AS view_ts_ms
    FROM v
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_views,
       CAST(COUNT(click_ts_ms) AS BIGINT) AS n_matched,
       CAST(SUM(CASE WHEN click_ts_ms IS NOT NULL
                     THEN click_ts_ms - view_ts_ms END) AS BIGINT)
           AS sum_latency_ms
FROM m GROUP BY 1
"""

QUERIES["pattern_view_then_click"] = pattern_view_then_click
ORACLES["pattern_view_then_click"] = _PATTERN_SQL


def rollup_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the monthly
    (o_orderpriority × month) revenue rollup is maintained as
    BASE-aggregate ⊎ DELTA-aggregate — the base (orders before
    1999-01-01) stands in for the stored view, the delta (orders on or
    after) for a newly-ingested batch, and the merge is a re-aggregation
    of the two PARTIAL aggregates.  This is the 100 TB refresh shape:
    count/sum are associative, so maintaining the view costs
    O(|delta| + |view|) — the base FACT table is never rescanned, only
    its |priorities × months|-row aggregate.  The oracle recomputes from
    scratch, proving merge == full recompute.  Integer cents
    throughout."""
    od = _t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("long").alias("month"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        F.col("o_orderdate"),
    )
    cut = F.to_timestamp(F.lit("1999-01-01"))

    def monthly(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority", "month").agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )

    base = monthly(od.filter(F.col("o_orderdate") < cut))
    delta = monthly(od.filter(F.col("o_orderdate") >= cut))
    return (
        base.unionByName(delta)
        .groupBy("o_orderpriority", "month")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("revenue_cents").cast("long").alias("revenue_cents"),
        )
    )


_INC_MERGE_SQL = r"""
SELECT o_orderpriority,
       CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS month,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM orders
GROUP BY 1, 2
"""

QUERIES["rollup_incremental_merge"] = rollup_incremental_merge
ORACLES["rollup_incremental_merge"] = _INC_MERGE_SQL


def join_view_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view — the delta-algebra
    companion to rollup_incremental_merge's aggregate case.  The view is
    V = customer ⋈ orders (per-mktsegment order counts + revenue); a
    batch arrives containing BOTH new customers (c_custkey % 20 = 0
    stands in for the newly-ingested slice) and new orders (orderdate >=
    1998-01-01).  The join delta is the standard three-term expansion
        ΔV = ΔC ⋈ O_old  ∪  C_old ⋈ ΔO  ∪  ΔC ⋈ ΔO
    and the maintained view is V_old ⊎ ΔV re-aggregated.  At 100 TB this
    is the point: each delta term joins a SMALL relation against one big
    one (broadcast-able / semi-pruned), and the old FACT join output is
    only touched through its bounded aggregate — the full C ⋈ O is never
    recomputed (this plan literally contains no all×all join; the oracle
    does the from-scratch join, proving the algebra).  Integer cents."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", (F.col("c_custkey") % 20 == 0).alias("c_new")
    )
    od = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1998-01-01"))).alias(
            "o_new"
        ),
    )
    c_old, c_new = cust.filter(~F.col("c_new")), cust.filter(F.col("c_new"))
    o_old, o_new = od.filter(~F.col("o_new")), od.filter(F.col("o_new"))

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )

    base = agg(c_old.join(o_old, c_old.c_custkey == o_old.o_custkey))
    d1 = agg(c_new.join(o_old, c_new.c_custkey == o_old.o_custkey))
    d2 = agg(c_old.join(o_new, c_old.c_custkey == o_new.o_custkey))
    d3 = agg(c_new.join(o_new, c_new.c_custkey == o_new.o_custkey))
    return (
        base.unionByName(d1)
        .unionByName(d2)
        .unionByName(d3)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("revenue_cents").cast("long").alias("revenue_cents"),
        )
    )


_JOIN_VIEW_INC_SQL = r"""
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY 1
"""

QUERIES["join_view_incremental_merge"] = join_view_incremental_merge
ORACLES["join_view_incremental_merge"] = _JOIN_VIEW_INC_SQL


def unpivot_user_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inverse of pivot_event_counts: melt the wide per-user event
    matrix back to long (user_id, metric, cnt) with the user-relative
    share in basis points — Spark's native ``DataFrame.unpivot`` (SQL
    ``stack``) against DuckDB's ``UNPIVOT``.  Wide->long is the standard
    prep step for per-metric features; the unpivot itself is a
    zero-shuffle in-place row explosion, so the only exchanges are the
    pivot groupBy and the per-user share window (both partitioned)."""
    ev = _t(spark, sf_dir, "events")
    metrics = ["click", "view", "purchase", "signup", "error"]
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", metrics)
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )
    long = wide.unpivot(["user_id"], metrics, "metric", "cnt").filter(
        F.col("cnt") > 0
    )
    w = Window.partitionBy("user_id")
    return long.select(
        "user_id",
        "metric",
        F.col("cnt").cast("long").alias("cnt"),
        F.expr("cnt * 10000")
        .alias("_n")
        .cast("long"),
        F.sum("cnt").over(w).alias("_tot"),
    ).select(
        "user_id",
        "metric",
        "cnt",
        F.expr("_n div _tot").cast("long").alias("share_bp"),
    )


_UNPIVOT_SQL = """
WITH wide AS (
    SELECT user_id,
           COUNT(*) FILTER (event_type = 'click') AS click,
           COUNT(*) FILTER (event_type = 'view') AS view,
           COUNT(*) FILTER (event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (event_type = 'signup') AS signup,
           COUNT(*) FILTER (event_type = 'error') AS error
    FROM events GROUP BY 1
),
long AS (
    UNPIVOT wide ON click, view, purchase, signup, error
    INTO NAME metric VALUE cnt
),
nz AS (SELECT * FROM long WHERE cnt > 0)
SELECT user_id, metric, CAST(cnt AS BIGINT) AS cnt,
       CAST(cnt * 10000 // SUM(cnt) OVER (PARTITION BY user_id) AS BIGINT)
           AS share_bp
FROM nz
"""

QUERIES["unpivot_user_event_matrix"] = unpivot_user_event_matrix
ORACLES["unpivot_user_event_matrix"] = _UNPIVOT_SQL
