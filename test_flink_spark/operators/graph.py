"""Iterative graph analytics: fixed-point PageRank over a DataFrame edge
list, with a bit-exact unrolled-CTE DuckDB oracle.

The repo already has one iterative graph operator — connected components
via min-label propagation (operators/dedup.py, duplicate clusters).
PageRank adds the weighted-influence shape: rank mass flows along edges,
damped, for a FIXED number of power iterations.  Fixed iteration count is
the differential-testing move (the same one IVF training uses for k-means,
ivf.py): convergence-threshold loops are float-order-sensitive, but N
unrolled integer iterations replay exactly in SQL.

Determinism: ranks are int64 fixed-point (SCALE = 1e12 per unit rank).
Each iteration is
    contrib(v)  = rank(v) div out_deg(v)          -- integer division
    rank'(u)    = floor(0.15 * SCALE) + (85 * sum contrib(in(u))) div 100
Integer division discards remainders identically in Spark (`div`) and
DuckDB (`//`); the sum is an exact integer sum.  Headroom: sum of all
contribs <= total rank ~ N * SCALE; times 85 stays under int64 for
N < ~10^5 nodes at SCALE 1e12 — callers with bigger graphs drop SCALE
(the estimator is relative).  No dangling-node term: callers must supply
edge lists where every node has out-degree >= 1 (the registered query
symmetrizes a bipartite graph, which guarantees it); pagerank() raises
otherwise rather than silently leaking rank mass.

Scale shape (100 TB): the edge list is the big table; ranks are O(nodes).
Each iteration is one equi-join ranks->edges on src (co-partitionable by
bucketing both on the node key; AQE splits skewed hubs) and one groupBy
dst with map-side partial sums.  Iterations are a fixed small constant,
and each intermediate rank table is cached + count()-materialized so the
final plan is 1 join deep, not iterations-deep (the dedup_clusters
lineage-truncation lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12
DAMP_NUM = 85  # damping 0.85 as an exact integer percentage
BASE = (100 - DAMP_NUM) * SCALE // 100  # floor(0.15 * SCALE)


def pagerank(edges: DataFrame, iterations: int = 5) -> DataFrame:
    """PageRank over ``edges(src, dst)`` (pre-deduplicated, every node with
    out-degree >= 1): returns ``(node, rank_fp)`` with rank in SCALE
    fixed-point units (initial rank = 1.0 per node = SCALE)."""
    edges = edges.cache()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    sinks = nodes.join(deg, nodes.node == deg.src, "left_anti").count()
    if sinks:
        raise ValueError(
            f"{sinks} node(s) have out-degree 0 — symmetrize the edge list "
            "or add self-loops; this operator has no dangling-mass term"
        )
    # out-degree rides along with the rank so each iteration is ONE join
    # against the edge list (ranks ⋈ edges on src), not two.
    ranks = nodes.join(deg, nodes.node == deg.src).select(
        "node", F.lit(SCALE).cast("long").alias("rank_fp"), "deg"
    )
    for _ in range(iterations):
        contribs = ranks.select(
            F.col("node").alias("src"),
            F.expr("rank_fp div deg").alias("contrib"),
        )
        inbound = (
            edges.join(contribs, "src")
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inflow"))
        )
        ranks = (
            nodes.join(inbound, nodes.node == inbound.dst, "left")
            .select(
                "node",
                (
                    F.lit(BASE).cast("long")
                    + F.expr(f"({DAMP_NUM} * coalesce(inflow, 0)) div 100")
                ).alias("rank_fp"),
            )
            .join(deg, F.col("node") == deg.src)
            .select("node", "rank_fp", "deg")
            .cache()
        )
        ranks.count()  # materialize: truncates lineage to 1 iteration deep
    return ranks.select("node", "rank_fp")


def pagerank_oracle_cte(edges_sql: str, iterations: int = 5) -> str:
    """Unrolled-CTE replay of ``pagerank`` (same fixed-point arithmetic).
    ``edges_sql`` must select columns (src, dst), deduplicated.  Returns
    the CTE body; the caller appends its own final SELECT over ``r{N}``."""
    parts = [
        f"edges AS ({edges_sql})",
        "deg AS (SELECT src AS node, COUNT(*) AS deg FROM edges GROUP BY src)",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        f"r0 AS (SELECT node, {SCALE}::BIGINT AS rank_fp FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""r{i} AS (
  SELECT n.node,
         ({BASE}::BIGINT + ({DAMP_NUM} * COALESCE(s.inflow, 0)) // 100)::BIGINT
           AS rank_fp
  FROM nodes n LEFT JOIN (
    SELECT e.dst, SUM(r.rank_fp // d.deg) AS inflow
    FROM edges e
    JOIN r{i - 1} r ON r.node = e.src
    JOIN deg d ON d.node = e.src
    GROUP BY e.dst
  ) s ON s.dst = n.node
)"""
        )
    return ",\n".join(parts)
