"""PageRank invariants (operators/graph.py).  The driver's oracle gate
proves Spark and DuckDB agree on every rank; these pin that the ranks are
RIGHT: hub dominance on a known graph, approximate mass conservation
(integer floors only ever lose mass), and the dangling-node guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from test_flink_spark.operators import graph as gr


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src STRING, dst STRING")


def test_hub_outranks_leaves(spark):
    # star: a <-> {b, c, d}; a receives from 3 nodes, leaves from 1
    pairs = []
    for leaf in ("b", "c", "d"):
        pairs += [("a", leaf), (leaf, "a")]
    ranks = {r["node"]: r["rank_fp"] for r in gr.pagerank(_edges(spark, pairs)).collect()}
    assert ranks["a"] > ranks["b"] == ranks["c"] == ranks["d"]


def test_rank_mass_approximately_conserved(spark):
    # ring of 6: perfectly symmetric, every rank should stay ~SCALE
    n = 6
    pairs = []
    for i in range(n):
        j = (i + 1) % n
        pairs += [(f"n{i}", f"n{j}"), (f"n{j}", f"n{i}")]
    df = gr.pagerank(_edges(spark, pairs).distinct())
    total = df.agg(F.sum("rank_fp")).collect()[0][0]
    # integer division only discards mass: total in (0.99 * n * SCALE, n * SCALE]
    assert 0.99 * n * gr.SCALE < total <= n * gr.SCALE
    ranks = [r["rank_fp"] for r in df.collect()]
    assert max(ranks) - min(ranks) <= 1  # symmetry -> equal up to 1 ulp of floor


def test_dangling_nodes_rejected(spark):
    with pytest.raises(ValueError, match="out-degree 0"):
        gr.pagerank(_edges(spark, [("a", "b")]))  # b never emits


def test_label_propagation_two_cliques(spark):
    """Two 4-cliques joined by one bridge edge must resolve to two
    communities (each labeled by its minimum member), with the bridge
    endpoints keeping their own clique's label."""
    from test_flink_spark.operators.graph import label_propagation

    c1 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    c2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edges = spark.createDataFrame(c1 + c2 + [(4, 10)], "a INT, b INT")
    out = {r["node"]: r["community"] for r in label_propagation(edges, 3).collect()}
    assert {out[n] for n in (1, 2, 3, 4)} == {1}
    assert {out[n] for n in (10, 11, 12, 13)} == {10}


def test_label_propagation_deterministic_tiebreak(spark):
    """A 2-path (1-2, 2-3): node 2 sees labels {1, 3} plus its own {2} —
    one vote each, min-label tie-break must pick 1 every run."""
    from test_flink_spark.operators.graph import label_propagation

    edges = spark.createDataFrame([(1, 2), (2, 3)], "a INT, b INT")
    for _ in range(2):
        out = {
            r["node"]: r["community"]
            for r in label_propagation(edges, 1).collect()
        }
        assert out[2] == 1
        assert out[1] == 1  # sees {2} + self {1}: tie -> 1


def test_rolling_checkpoint_spares_foreign_caches(spark):
    """_rolling_checkpoint must unpersist ONLY its own prior generation.
    It records the checkpointed Dataset's own RDD id; a before/after
    getPersistentRDDs diff would instead attribute any cache that
    happens to register during the checkpoint job (e.g. a lazy
    edges.cache() first materialized by it) and silently drop it on the
    next call."""
    from pyspark.sql import functions as F

    from test_flink_spark.operators.graph import _rolling_checkpoint

    foreign = spark.range(100).select(F.col("id").alias("n")).cache()
    gen: set = set()
    out1 = _rolling_checkpoint(spark.range(1000).toDF("id"), gen)
    assert len(gen) == 1, "must record exactly the checkpointed RDD"
    gen1 = set(gen)
    foreign.count()  # foreign cache registers between generations
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    foreign_ids = set(jmap.keySet().toArray()) - gen1
    assert foreign_ids, "foreign cache should be registered"
    out2 = _rolling_checkpoint(out1.withColumn("v", F.col("id") + 1), gen)
    assert out2.count() == 1000
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    live = set(jmap.keySet().toArray())
    assert foreign_ids <= live, "foreign cache was stolen by the rolling diff"
    assert not (gen1 & live), "prior generation must be freed"
    assert gen and gen.isdisjoint(gen1)
    foreign.unpersist()


def test_supplier_jaccard_exact_on_tiny_graph(spark, tmp_path):
    """Suppliers with identical customer sets score 10000 bp; a supplier
    covering 1 of the other's 3 customers scores floor(1/3 * 10000)."""
    from test_flink_spark.plans.advanced import graph_supplier_jaccard

    orders = [(k, k) for k in (1, 2, 3)]  # o_orderkey == o_custkey
    spark.createDataFrame(
        orders, "o_orderkey LONG, o_custkey LONG"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    # supplier 10 and 11 sell to all three customers; 12 to custs 1 and 2
    # (two shared customers — the n_co >= 2 support floor keeps the pair)
    li = [(c, s) for c in (1, 2, 3) for s in (10, 11)] + [(1, 12), (2, 12)]
    spark.createDataFrame(
        li, "l_orderkey LONG, l_suppkey LONG"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

    rows = graph_supplier_jaccard(spark, str(tmp_path)).collect()
    by_pair = {(r["supplier"], r["neighbor"]): r for r in rows}
    assert by_pair[(10, 11)]["jaccard_bp"] == 10000
    assert by_pair[(11, 10)]["rank"] == 1
    # (10, 12): n_co=2, degrees 3 and 2 -> 2/3
    assert by_pair[(10, 12)]["jaccard_bp"] == 6666


def test_hits_bipartite_roles_and_normalization(spark):
    # s1 feeds {c1, c2, c3}; s2 feeds {c1} only: s1 is the stronger hub,
    # and c1 (fed by both) the stronger authority.  Max-renorm pins the
    # best of each role at exactly SCALE.
    pairs = [("s1", "c1"), ("s1", "c2"), ("s1", "c3"), ("s2", "c1")]
    out = gr.hits(_edges(spark, pairs), iterations=2).collect()
    hubs = {r["node"]: r["score_fp"] for r in out if r["role"] == "hub"}
    auth = {r["node"]: r["score_fp"] for r in out if r["role"] == "authority"}
    assert set(hubs) == {"s1", "s2"} and set(auth) == {"c1", "c2", "c3"}
    assert hubs["s1"] == gr.SCALE and hubs["s2"] < gr.SCALE
    assert auth["c1"] == gr.SCALE and auth["c2"] < gr.SCALE
    assert auth["c2"] == auth["c3"]  # symmetric leaves tie exactly


def test_min_label_components_chain_converges(spark):
    # a 40-node chain needs 39 one-hop rounds but only ~6 with the
    # pointer jump — max_iter=8 converging proves the doubling works
    n = 40
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a LONG, id_b LONG"
    )
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node LONG")
    out = gr.min_label_components(pairs, nodes, "node", max_iter=8)
    labels = {r["node"]: r["cluster_id"] for r in out.collect()}
    assert set(labels.values()) == {0}  # one component, min id 0


def test_min_label_components_isolated_nodes_self_label(spark):
    pairs = spark.createDataFrame([(10, 11)], "id_a LONG, id_b LONG")
    nodes = spark.createDataFrame([(10,), (11,), (99,)], "node LONG")
    labels = {
        r["node"]: r["cluster_id"]
        for r in gr.min_label_components(pairs, nodes, "node").collect()
    }
    assert labels == {10: 10, 11: 10, 99: 99}


def _write_bipartite(spark, tmp_path, orders, lineitem):
    spark.createDataFrame(
        orders or [(None, None)], "o_orderkey LONG, o_custkey LONG"
    ).filter("o_orderkey IS NOT NULL").write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    spark.createDataFrame(
        lineitem or [(None, None)], "l_orderkey LONG, l_suppkey LONG"
    ).filter("l_orderkey IS NOT NULL").write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )


def test_assortativity_empty_pairs_returns_null_r2(spark, tmp_path):
    """r10 ADVICE: with zero supplier-customer pairs the moment SUMs are
    NULL; the scalar finish must return (0, NULL) like the oracle's CASE,
    not raise TypeError on int(None)."""
    from test_flink_spark.plans.advanced import graph_degree_assortativity

    _write_bipartite(spark, tmp_path, [], [])
    rows = graph_degree_assortativity(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0]["m"] == 0 and rows[0]["signed_r2_milli"] is None


def test_assortativity_tiny_graph_matches_python_replay(spark, tmp_path):
    from test_flink_spark.plans.advanced import graph_degree_assortativity

    # S10-C1, S10-C2, S11-C1 (o_orderkey==o_custkey keys the join)
    _write_bipartite(
        spark,
        tmp_path,
        [(1, 1), (2, 2)],
        [(1, 10), (2, 10), (1, 11)],
    )
    # python replay of the documented statistic (quantized by 10**6)
    edges = [("S10", "C1"), ("S10", "C2"), ("S11", "C1")]
    und = edges + [(b, a) for a, b in edges]
    deg = {}
    for a, _ in und:
        deg[a] = deg.get(a, 0) + 1
    xy = [(deg[a], deg[b]) for a, b in und]
    m = len(xy)
    sx = sum(x for x, _ in xy)
    sy = sum(y for _, y in xy)
    sxy = sum(x * y for x, y in xy)
    sxx = sum(x * x for x, _ in xy)
    syy = sum(y * y for _, y in xy)
    c = m * sxy - sx * sy
    q = 10**6
    cq, dxq, dyq = abs(c) // q, (m * sxx - sx * sx) // q, (m * syy - sy * sy) // q
    want = None
    if dxq > 0 and dyq > 0:
        want = (-1 if c < 0 else 1) * ((cq * cq * 1000) // (dxq * dyq))
    row = graph_degree_assortativity(spark, str(tmp_path)).collect()[0]
    assert row["m"] == m and row["signed_r2_milli"] == want
