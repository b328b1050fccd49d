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
