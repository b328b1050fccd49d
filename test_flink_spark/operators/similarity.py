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

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Dot product over raw float arrays, computed in double.

    The higher-order fold stays in a tight JVM loop; an explicit 64-term
    scalar chain was measured SLOWER (the generated method exceeds HotSpot's
    huge-method JIT limit and falls back to interpreted bytecode).  Float→
    double casts are exact and addition is left-to-right, bit-identical to
    the DuckDB oracle's list_reduce.  ``dim`` is accepted for signature
    stability but both paths now use the fold."""
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column, dim: int | None = None) -> Column:
    return F.sqrt(_dot(a, a, dim))


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
    dim: int | None = None,
) -> DataFrame:
    """Exact brute-force top-k: broadcast the query set against the corpus.

    Deterministic ranking: order by ROUNDED similarity desc, then neighbor
    id asc — ties at the rounding precision cannot reorder results across
    engines.  Self-matches excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("nq", _norm(F.col("qv"), dim))
    c = (
        corpus.repartition(corpus.sparkSession.sparkContext.defaultParallelism)
        .select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
        .withColumn("nc", _norm(F.col("cv"), dim))
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("cv"), dim) / (F.col("nq") * F.col("nc")), round_to
            ).alias("sim"),
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
    return hyperplanes_seeded(dim, n_planes, seed=0)


def hyperplanes_seeded(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Independent plane sets per hash table (seed 0 == the unseeded set)."""
    import hashlib

    prefix = "" if seed == 0 else f"{seed}|"
    planes = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            h = int(hashlib.md5(f"{prefix}{p}:{i}".encode()).hexdigest()[:8], 16)
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
    n_tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = corpus rows sharing the query's LSH
    bucket in ANY of ``n_tables`` independent hash tables (OR-amplification:
    collision prob rises from p^b to 1-(1-p^b)^L), re-ranked by exact
    cosine.  Equality join on (table, bucket) — shuffle is O(candidates),
    never O(Q×N).  Recall vs n_tables is pytest-measured against the exact
    top-k."""
    tables = [
        hyperplanes_seeded(dim, n_planes, seed=t) for t in range(n_tables)
    ]
    # One Arrow-batched numpy matmul computes ALL table buckets per batch:
    # (batch × dim) @ (dim × n_tables·n_planes) → sign bits → bucket ints.
    # JVM-side per-plane folds rebuilt the 64-literal plane array per row —
    # measured ~10× slower than BLAS here; this is exactly the "vectorized
    # pandas UDF for embedding ops" carve-out in the design rules.
    planes_mat = np.array([p for tbl in tables for p in tbl], dtype=np.float64).T

    def _all_buckets(v: pd.Series) -> pd.Series:
        X = np.stack(v.map(lambda a: np.asarray(a, dtype=np.float64)).values)
        bits = (X @ planes_mat) >= 0  # (batch, n_tables*n_planes)
        weights = 1 << np.arange(n_planes, dtype=np.int64)
        out = []
        for r in bits:
            out.append(
                [int((r[t * n_planes:(t + 1) * n_planes] * weights).sum()) for t in range(n_tables)]
            )
        return pd.Series(out)

    all_buckets = F.pandas_udf(_all_buckets, "array<int>")

    def with_buckets(df: DataFrame, idc: str, vc: str, nc: str) -> DataFrame:
        base = df.select(F.col(id_col).alias(idc), F.col(vec_col).alias(vc)).withColumn(
            nc, _norm(F.col(vc), dim)
        ).withColumn("__buckets", all_buckets(F.col(vc)))
        return base.select(
            idc, vc, nc, F.posexplode(F.col("__buckets")).alias("table", "bucket")
        )

    # modest fan-out only: each partition pays an Arrow python-worker
    # round-trip for the bucket matmul, so 32 tiny tasks cost more than 8
    # right-sized ones at this corpus size (fixed overhead, not compute)
    fan = max(4, corpus.sparkSession.sparkContext.defaultParallelism // 4)
    q = with_buckets(queries, "query_id", "qv", "nq")
    c = with_buckets(corpus.repartition(fan), "neighbor_id", "cv", "nc")
    scored = (
        c.join(F.broadcast(q), ["table", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("cv"), dim) / (F.col("nq") * F.col("nc")), 4
            ).alias("sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])  # union of tables
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
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (i < j, sim >= threshold).
    Brute-force form — correct at oracle scale; at 100 TB route candidate
    generation through ``lsh_bucket_topk``'s bucket join instead.

    Norms are computed ONCE per row before the pair join (O(n) instead of
    O(n²) norm folds — 3× fewer flops per pair) with the identical fold
    arithmetic, so per-pair results are bit-equal to the naive form."""
    a = (
        corpus.repartition(corpus.sparkSession.sparkContext.defaultParallelism)
        .select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        .withColumn("na", _norm(F.col("va"), dim))
    )
    b = corpus.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    ).withColumn("nb", _norm(F.col("vb"), dim))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("va"), F.col("vb"), dim) / (F.col("na") * F.col("nb")), 4
            ).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )
