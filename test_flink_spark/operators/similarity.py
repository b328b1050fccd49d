"""Embedding similarity search (north-star, BASELINE.json).

Two tiers, as the scale path demands:
- ``cosine_topk``: brute-force exact top-k — the baseline/oracle.  The query
  set is broadcast (small side); each executor scans its shard of the corpus
  once and keeps top-k per query via a rank window.  Exact, O(Q×N), right
  whenever Q is small or N fits a scan budget.
- ``lsh_bucket_topk``: random-hyperplane LSH — sign bits of dot products
  with deterministic md5-seeded hyperplanes form a bucket key; candidates
  are corpus rows sharing the bucket (equality join), then exact cosine
  re-ranks.  Sub-linear candidate sets at the cost of recall; multiple
  hash tables raise recall.  This is the 100 TB path (the equality join
  shuffles buckets, never the full cross product).

All vector math is built-in higher-order functions (zip_with/aggregate) in
DOUBLE — JVM-side, codegen-fused, no Python.  Hyperplanes are derived from
md5 so results are deterministic and test-reproducible with no RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Exact brute-force top-k: broadcast the query set against the corpus.

    Deterministic ranking: order by ROUNDED similarity desc, then neighbor
    id asc — ties at the rounding precision cannot reorder results across
    engines.  Self-matches excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _to_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _to_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), round_to).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, i) derives from
    md5(f"{p}:{i}") mapped to [-1, 1).  No RNG state, reproducible anywhere."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            h = int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:8], 16)
            row.append((h / 2**32) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket_key(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket key: bit p = 1 iff vec·plane_p >= 0."""
    bits = [
        F.when(_dot(vec, F.array(*[F.lit(c) for c in plane])) >= 0, F.lit(1 << p))
        .otherwise(F.lit(0))
        for p, plane in enumerate(planes)
    ]
    return sum(bits[1:], bits[0]).cast("int")


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = corpus rows in the query's LSH bucket,
    re-ranked by exact cosine.  Equality join on the bucket key — shuffle is
    O(candidates), never O(Q×N).  Recall tested against cosine_topk."""
    planes = hyperplanes(dim, n_planes)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _to_double(F.col(vec_col)).alias("qv"),
    ).withColumn("bucket", lsh_bucket_key(F.col("qv"), planes))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _to_double(F.col(vec_col)).alias("cv"),
    ).withColumn("bucket", lsh_bucket_key(F.col("cv"), planes))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def near_dup_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (i < j, sim >= threshold).
    Brute-force form — correct at oracle scale; at 100 TB route candidate
    generation through ``lsh_bucket_topk``'s bucket join instead."""
    a = corpus.select(F.col(id_col).alias("id_a"), _to_double(F.col(vec_col)).alias("va"))
    b = corpus.select(F.col(id_col).alias("id_b"), _to_double(F.col(vec_col)).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 4).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )
