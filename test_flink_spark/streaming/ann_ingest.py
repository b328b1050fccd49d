"""Streaming ANN-index ingest: newly arriving embedding vectors are
assigned to their IVF inverted list and PQ-coded AGAINST THE PERSISTED
CODEBOOKS — the production shape where the index accumulates while the
codebooks (trained offline, retrained rarely) enter the plan as
literals.  The streaming face of ``operators/ivf.py::ivf_assign`` +
the PQ encode stage of ``ivfpq_ann_topk``, and the embedding-side
complement of ``minhash_dedup.streaming_index_check``.

Entirely STATELESS: coarse assignment is the same literal-centroid
argmin expression the batch path uses (k·dim ints baked into the plan —
no join, no state store, no watermark requirement, append-mode clean),
and PQ codes come from the same literal sub-codebooks.  The
differential test pins stream output == batch ``ivf_assign``/PQ codes
on identical rows; at 100 TB each micro-batch is one narrow map pass
and the sink append IS the index growth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.ivf import _argmin_cluster, _sq_dist_lit, quantize


def _pq_code(sub: Column, book: list[list[int]]) -> Column:
    """Codeword index of the nearest sub-centroid (lowest-cid tie-break,
    the batch/oracle convention)."""
    dists = F.array(*[_sq_dist_lit(sub, cw) for cw in book])
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("long")


def streaming_ivf_assign(
    vectors: DataFrame,
    coarse: list[list[int]],
    books: list[list[list[int]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign a stream of ``(id_col, vec_col: array<float>)`` rows to
    their inverted list, optionally PQ-coding the residual:
    ``(vec_id, cluster[, codes])``.  Expression-only — safe in any
    output mode, survives restarts with no state."""
    q = vectors.select(
        F.col(id_col), quantize(F.col(vec_col)).alias("qv")
    ).withColumn("cluster", _argmin_cluster(F.col("qv"), coarse))
    if books is None:
        return q.select(id_col, "cluster")
    cent_lit = F.array(*[F.array(*[F.lit(int(v)) for v in c]) for c in coarse])
    dsub = len(books[0][0])
    res = q.withColumn(
        "r",
        F.zip_with(
            F.col("qv"),
            F.element_at(cent_lit, (F.col("cluster") + 1).cast("int")),
            lambda a, b: a - b,
        ),
    )
    codes = F.array(
        *[
            _pq_code(F.slice("r", s * dsub + 1, dsub), book)
            for s, book in enumerate(books)
        ]
    )
    return res.select(id_col, "cluster", codes.alias("codes"))
