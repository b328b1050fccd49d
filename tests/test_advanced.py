

def test_pareto_abc_distributed_prefix_sum_matches_naive(spark):
    """The range-partition + per-partition-offset prefix sum must equal
    the naive single-partition cumulative share — including revenue ties
    (broken by partkey) and the exact 80%/95% class boundaries."""
    import unittest.mock as um

    from pyspark.sql import functions as F

    import test_flink_spark.plans.advanced as A

    # 10 parts, revenues with ties; one lineitem row per part so the
    # cents rounding is trivial
    revs = [100, 90, 90, 80, 40, 20, 10, 10, 5, 5]  # total 450
    df = spark.createDataFrame(
        [(k, float(r), 0.0) for k, r in enumerate(revs)],
        "l_partkey LONG, l_extendedprice DOUBLE, l_discount DOUBLE",
    )
    with um.patch.object(A, "_t", lambda s, sf, name: df):
        got = {
            r["abc_class"]: (r["n_parts"], r["revenue_cents"])
            for r in A.parts_pareto_abc(spark, "ignored").collect()
        }
    # naive: sorted desc (rev, key asc): cum_bp = floor(cum*1e4/450_00)
    cents = sorted(
        [(r * 100, k) for k, r in enumerate(revs)], key=lambda t: (-t[0], t[1])
    )
    cum, expected = 0, {}
    for c, _ in cents:
        cum += c
        bp = cum * 10000 // 45000
        cls = "A" if bp <= 8000 else ("B" if bp <= 9500 else "C")
        n, s = expected.get(cls, (0, 0))
        expected[cls] = (n + 1, s + c)
    assert got == expected, (got, expected)


def test_partitioned_prefix_max_matches_naive_running_max(spark):
    """The range-partition + exclusive-offset running MAX must equal the
    naive single-pass cummax over the total order — including a maximum
    that lands in the FIRST partition (null offset path) and values that
    descend across a partition boundary (offset must dominate)."""
    from pyspark.sql import functions as F

    from test_flink_spark.operators.prefix import partitioned_prefix_max

    # value pattern: early global max, then descending, then a late spike
    vals = [5, 90, 12, 7, 3, 50, 2, 95, 1, 4]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "seq LONG, v LONG"
    )
    got = {
        r["seq"]: r["__cummax"]
        for r in partitioned_prefix_max(
            df, "v", [F.col("seq").asc()], n_partitions=4
        ).collect()
    }
    run, expected = None, {}
    for i, v in enumerate(vals):
        run = v if run is None or v > run else run
        expected[i] = run
    assert got == expected, (got, expected)


def test_hll_sliding_pane_merge_equals_direct_window_sketch(spark):
    """Pane-merged sliding sketches must be IDENTICAL to sketching each
    window's raw events directly — register-max associativity across the
    pane decomposition (the property that lets the fan-out run on the
    sketch table instead of the data)."""
    from pyspark.sql import functions as F

    import test_flink_spark.operators.sketch as sk

    rows = [(i % 37, (i * 977) % 100_000) for i in range(2_000)]
    df = spark.createDataFrame(rows, "v LONG, ts_ms LONG")
    pane_ms, n = 10_000, 3

    merged = sk.hll_sliding_distinct(df, "v", "ts_ms", pane_ms, n)
    got = {
        r["w"]: (r["registers_used"], r["hll_est"]) for r in merged.collect()
    }

    offs = F.array(*[F.lit(i) for i in range(n)])
    direct_base = (
        df.withColumn("__pane", F.expr(f"ts_ms div {pane_ms}"))
        .select("v", "__pane", F.explode(offs).alias("__i"))
        .select((F.col("__pane") + F.col("__i")).alias("w"), "v")
    )
    direct = sk.hll_fold_registers(
        sk.hll_registers(direct_base, "v", ["w"]), ["w"]
    )
    want = {
        r["w"]: (r["registers_used"], r["hll_est"]) for r in direct.collect()
    }
    assert got == want


def test_join_cardinality_estimate_matches_naive_correlated_sample(spark):
    """The 1/16-stratum correlated-sampling estimator must reproduce the
    exact python replay on a crafted fixture — including the skewed key
    (fanout 50) that independent row sampling would mis-weight — and the
    exact_rows audit column must equal the true join size."""
    import hashlib

    import unittest.mock as um

    from pyspark.sql import functions as F  # noqa: F401

    import test_flink_spark.plans.advanced as A

    # orders: keys 1..400 once each; lineitem: key k appears (k % 5 + 1)
    # times, plus one hot key (7) with 50 extra rows.
    okeys = list(range(1, 401))
    lkeys = [k for k in okeys for _ in range(k % 5 + 1)] + [7] * 50
    orders = spark.createDataFrame([(k,) for k in okeys], "o_orderkey LONG")
    li = spark.createDataFrame([(k,) for k in lkeys], "l_orderkey LONG")
    tables = {"orders": orders, "lineitem": li}
    with um.patch.object(A, "_t", lambda s, sf, name: tables[name]):
        row = A.join_cardinality_estimate(spark, "ignored").collect()[0]

    def h(k: int) -> int:
        return int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)

    from collections import Counter

    lc = Counter(lkeys)
    sampled = [k for k in okeys if h(k) % A._JCE_MOD == 0 and k in lc]
    est = sum(lc[k] for k in sampled) * A._JCE_MOD  # ca == 1 for every key
    exact = sum(lc[k] for k in okeys if k in lc)
    assert row["exact_rows"] == exact
    assert row["est_rows"] == est
    assert row["sampled_keys"] == len(sampled)
    assert row["err_ppm"] == abs(est - exact) * 1000000 // exact


def test_join_order_advisor_ranks_by_replayed_estimates(spark):
    """The advisor's three per-dimension estimates must equal the python
    replay of the correlated sample (filtered dim x fact frequency
    products, scaled by the stratum), and join_rank must order them
    ascending with the name tie-break."""
    import hashlib

    import unittest.mock as um

    import test_flink_spark.plans.advanced as A

    def h(k: int) -> bool:
        return int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16) % A._JCE_MOD == 0

    keys = list(range(1, 301))
    li = spark.createDataFrame(
        [(k, k % 40 + 1, k % 25 + 1) for k in keys for _ in range(k % 3 + 1)],
        "l_orderkey LONG, l_partkey LONG, l_suppkey LONG",
    )
    orders = spark.createDataFrame(
        [(k, "1-URGENT" if k % 4 == 0 else "3-MEDIUM") for k in keys],
        "o_orderkey LONG, o_orderpriority STRING",
    )
    part = spark.createDataFrame(
        [(p, p % 20) for p in range(1, 41)], "p_partkey LONG, p_size INT"
    )
    supplier = spark.createDataFrame(
        [(s, s % 12) for s in range(1, 26)], "s_suppkey LONG, s_nationkey INT"
    )
    tables = {"lineitem": li, "orders": orders, "part": part, "supplier": supplier}
    with um.patch.object(A, "_t", lambda s, sf, name: tables[name]):
        got = {
            r["dim"]: (r["est_rows"], r["join_rank"])
            for r in A.join_order_advisor(spark, "ignored").collect()
        }

    from collections import Counter

    fact = {
        "orders": Counter(r["l_orderkey"] for r in li.collect()),
        "part": Counter(r["l_partkey"] for r in li.collect()),
        "supplier": Counter(r["l_suppkey"] for r in li.collect()),
    }
    dims = {
        "orders": Counter(k for k in keys if k % 4 == 0),
        "part": Counter(p for p in range(1, 41) if p % 20 < 10),
        "supplier": Counter(s for s in range(1, 26) if s % 12 < 5),
    }
    ests = {
        d: sum(cf * dims[d][k] for k, cf in fact[d].items() if h(k) and k in dims[d])
        * A._JCE_MOD
        for d in fact
    }
    ranked = sorted(ests, key=lambda d: (ests[d], d))
    expected = {d: (ests[d], ranked.index(d) + 1) for d in ests}
    assert got == expected, (got, expected)


def test_agg_reduction_advisor_exact_ratios(spark):
    """Reduction ratios must be exact rows/keys integer ppm on a fixture
    with known cardinalities, and the 2x verdict boundary must hold."""
    import datetime as dt

    import unittest.mock as um

    import test_flink_spark.plans.advanced as A

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    # 40 rows: 2 types, 20 users, all in 2 distinct minutes
    for i in range(40):
        rows.append(
            (
                base + dt.timedelta(minutes=i % 2),
                i % 20,
                "view" if i % 2 == 0 else "click",
            )
        )
    ev = spark.createDataFrame(rows, "ts TIMESTAMP, user_id LONG, event_type STRING")
    with um.patch.object(A, "_t", lambda s, sf, name: ev):
        got = {
            r["candidate"]: (
                r["n_keys"],
                r["n_rows"],
                r["reduction_ppm"],
                r["partial_agg_pays"],
            )
            for r in A.agg_reduction_advisor(spark, "ignored").collect()
        }
    # user_type pairs: user u always maps to one type (u%2 == i%2 parity)
    expected = {
        "event_type": (2, 40, 20_000_000, True),
        "user_id": (20, 40, 2_000_000, True),  # exactly the 2x boundary
        "user_type": (20, 40, 2_000_000, True),
        "minute": (2, 40, 20_000_000, True),
    }
    assert got == expected, (got, expected)


def test_collect_table_stats_exact_on_fixture(spark):
    """NDV / null count / min / max must be exact per column, with floats
    normalized to cents and dates to epoch millis, including a column
    containing NULLs."""
    import datetime as dt

    import unittest.mock as um

    import test_flink_spark.plans.advanced as A

    rows = [
        (1, 10, 100, 2.0, 10.25, dt.datetime(2024, 1, 1)),
        (2, 10, 200, 3.0, 20.50, dt.datetime(2024, 1, 2)),
        (3, 20, 200, 3.0, None, dt.datetime(2024, 1, 1)),
        (4, None, 300, 5.0, 0.01, None),
    ]
    li = spark.createDataFrame(
        rows,
        "l_orderkey LONG, l_partkey LONG, l_suppkey LONG, l_quantity DOUBLE,"
        " l_extendedprice DOUBLE, l_shipdate TIMESTAMP",
    )
    with um.patch.object(A, "_t", lambda s, sf, name: li):
        got = {
            r["column"]: (r["ndv"], r["n_nulls"], r["min_v"], r["max_v"])
            for r in A.collect_table_stats(spark, "ignored").collect()
        }
    d1 = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1000)
    d2 = int(dt.datetime(2024, 1, 2, tzinfo=dt.timezone.utc).timestamp() * 1000)
    expected = {
        "l_orderkey": (4, 0, 1, 4),
        "l_partkey": (2, 1, 10, 20),
        "l_suppkey": (3, 0, 100, 300),
        "l_quantity": (3, 0, 200, 500),
        "l_extendedprice": (3, 1, 1, 2050),
        "l_shipdate": (2, 1, d1, d2),
    }
    assert got == expected, (got, expected)


def test_gdpr_erasure_audit_blast_radius_on_fixture(spark):
    """Row/subject counts per table must equal the python replay of the
    md5 cohort and the FK fan-out (customer -> orders -> lineitem,
    customer -> events)."""
    import hashlib

    import unittest.mock as um

    import test_flink_spark.plans.advanced as A

    def in_cohort(k: int) -> bool:
        return (
            int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16) % A._GDPR_MOD == 0
        )

    custkeys = list(range(1, 201))
    cohort = [k for k in custkeys if in_cohort(k)]
    assert cohort, "fixture must contain at least one cohort member"
    cust = spark.createDataFrame([(k,) for k in custkeys], "c_custkey LONG")
    # each customer owns 2 orders; each order has 3 lineitems
    orders = spark.createDataFrame(
        [(k * 10 + i, k) for k in custkeys for i in range(2)],
        "o_orderkey LONG, o_custkey LONG",
    )
    li = spark.createDataFrame(
        [(k * 10 + i,) for k in custkeys for i in range(2) for _ in range(3)],
        "l_orderkey LONG",
    )
    ev = spark.createDataFrame(
        [(k,) for k in custkeys for _ in range(k % 4)], "user_id LONG"
    )
    tables = {"customer": cust, "orders": orders, "lineitem": li, "events": ev}
    with um.patch.object(A, "_t", lambda s, sf, name: tables[name]):
        got = {
            r["table_name"]: (r["n_rows"], r["n_subjects"])
            for r in A.gdpr_erasure_audit(spark, "ignored").collect()
        }
    ev_rows = sum(k % 4 for k in cohort)
    expected = {
        "customer": (len(cohort), len(cohort)),
        "orders": (2 * len(cohort), len(cohort)),
        "lineitem": (6 * len(cohort), len(cohort)),
        "events": (ev_rows, len([k for k in cohort if k % 4])),
    }
    assert got == expected, (got, expected)


def test_broadcast_plan_advisor_width_model_exact(spark):
    """est_bytes must equal the exact per-row width model (8 per fixed
    column, 4+len per string) and the 10 MiB verdict must flip for a
    table modeled over the threshold."""
    import unittest.mock as um

    import test_flink_spark.plans.advanced as A

    # Shrink the fixture to two tables by patching the table spec.
    small = spark.createDataFrame(
        [(1, "aa"), (2, "bbbb")], "r_regionkey INT, r_name STRING"
    )
    # 3 fixed cols -> 24 bytes + one 4000-char string per row, 3000 rows
    # -> ~12 MB: over the threshold
    big = spark.createDataFrame(
        [(i, "x" * 4000, 0, 0.0) for i in range(3000)],
        "c_custkey LONG, c_name STRING, c_nationkey INT, c_acctbal DOUBLE",
    )
    tables = {"region": small, "customer": big}
    spec = (
        ("region", 1, ("r_name",)),
        ("customer", 3, ("c_name",)),
    )
    with um.patch.object(A, "_BPA_TABLES", spec), um.patch.object(
        A, "_t", lambda s, sf, name: tables[name]
    ):
        got = {
            r["table_name"]: (r["n_rows"], r["est_bytes"], r["broadcastable"])
            for r in A.broadcast_plan_advisor(spark, "ignored").collect()
        }
    expected = {
        "region": (2, (8 + 4 + 2) + (8 + 4 + 4), True),
        "customer": (3000, 3000 * (24 + 4 + 4000), False),
    }
    assert got == expected, (got, expected)


def test_stats_merge_rollup_paths_agree_and_match_exact(spark):
    """The merged-from-shards path must equal the direct path for every
    measure (register-max associativity; exact min/max/null folds), and
    min/max/nulls must equal the exact python values on a fixture with
    NULLs and duplicates straddling both shards."""
    import unittest.mock as um

    import test_flink_spark.plans.advanced as A

    rows = [(k, k % 37 + 1, None if k % 11 == 0 else float(k % 50)) for k in range(1, 301)]
    li = spark.createDataFrame(
        rows, "l_orderkey LONG, l_partkey LONG, l_quantity DOUBLE"
    )
    with um.patch.object(A, "_t", lambda s, sf, name: li):
        out = {
            (r["column"], r["path"]): (
                r["ndv_est"],
                r["min_v"],
                r["max_v"],
                r["n_nulls"],
            )
            for r in A.stats_merge_rollup(spark, "ignored").collect()
        }
    for col in ("l_partkey", "l_quantity"):
        assert out[(col, "merged")] == out[(col, "direct")], col
    n_null = sum(1 for k in range(1, 301) if k % 11 == 0)
    assert out[("l_partkey", "direct")][1:] == (1, 37, 0)
    assert out[("l_quantity", "direct")][1:] == (0, 4900, n_null)
    # HLL NDV within its documented rsd band of the exact value (37 keys)
    assert abs(out[("l_partkey", "direct")][0] - 37) <= 12


def test_shuffle_partition_advisor_sizing_formulas(spark):
    """Partition count and salt factor must equal the exact integer
    formulas on a fixture engineered to exceed one 64 MiB target (via a
    wide props column) with one hot key owning half the rows."""
    import unittest.mock as um

    import test_flink_spark.plans.advanced as A

    n = 3000
    rows = []
    for i in range(n):
        uid = 7 if i % 2 == 0 else 10_000 + i  # key 7 owns half the rows
        rows.append((uid, "view", "p" * 50_000))
    ev = spark.createDataFrame(rows, "user_id LONG, event_type STRING, props STRING")
    with um.patch.object(A, "_t", lambda s, sf, name: ev):
        r = A.shuffle_partition_advisor(spark, "ignored").collect()[0]
    row_bytes = 40 + (4 + 4) + (4 + 50_000)
    total = n * row_bytes
    rec = max(-(-total // A._SPA_TARGET_BYTES), A._SPA_MIN_PARTS)
    hot = n // 2
    assert (r["n_rows"], r["total_bytes"]) == (n, total)
    assert r["rec_partitions"] == rec
    assert r["hot_key_rows"] == hot
    assert r["salt_factor"] == -(-hot * rec // n)
    assert r["salt_factor"] > 1  # the hot key genuinely needs salting
