"""IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
scale path for similarity search, complementing the random-hyperplane LSH
variant in ``similarity.py``.  (Public-literature lineage: the IVF/coarse-
quantizer design of Sivic & Zisserman's "Video Google" and Jégou et al.'s
IVFADC, here without the product-quantization residual step; the
``semantic_dedup`` consumer follows Abbas et al., "SemDeDup", 2023.)

An IVF index is k-means in two phases: TRAIN a small codebook of centroids,
then ASSIGN every corpus vector to its nearest centroid (its "inverted
list").  A query probes only the ``nprobe`` nearest lists and reranks
exactly inside them — candidate volume drops from N to ~N·nprobe/k.

The 100 TB shape, and how this implementation keeps it:

- **Training never shuffles the corpus.**  Each Lloyd iteration is one
  narrow assignment pass (centroids broadcast into the plan as literal
  arrays — k·dim ints, far below any broadcast threshold) followed by one
  groupBy(cluster) aggregate whose state is k rows × dim running sums
  (map-side partials, ~k·dim longs per task).  The k summary rows come back
  to the driver — the sanctioned tiny-scalar pattern (cf. the TF-IDF doc
  count) — never the vectors.  On a real corpus you train on a
  deterministic hash sample (``train_frac``) and assign the full corpus
  once: standard IVF practice.
- **Search shuffles candidates, not the corpus.**  Probing is an equality
  join on the cluster id between the (tiny, broadcast) exploded query×probe
  set and the assignments — never a cross product.
- **Every step is integer-exact**, so the DuckDB oracle replays the WHOLE
  algorithm — quantization, md5-ordered seeding, each unrolled Lloyd
  iteration, probing, rerank — bit-for-bit.  Vectors are fixed-point
  quantized (``floor(x·10^6)``: floor is unambiguous where round's
  half-way rule is not); distances are integer squared-L2 (associative
  adds — no float fold-order hazard); centroid updates are
  ``floor(sum/count)`` where the double quotient of exact <2^53 integers
  is correctly rounded in the JVM, DuckDB, and CPython alike.  Ties in
  assignment and ranking break on the lower centroid / neighbor id.

Quantization costs ~1e-6 relative precision — irrelevant for neighbor
retrieval and the price of an engine-reproducible ANN, which neither LSH
table in this repo could offer (their float bucketing is rows-only-checked).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

QUANT = 1_000_000


def quantize(vec: Column) -> Column:
    """array<float> -> fixed-point array<bigint>: floor(x * 10^6)."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * F.lit(float(QUANT))).cast("long")
    )


def _sq_dist_lit(vec: Column, centroid: list[int]) -> Column:
    """Integer squared L2 distance from a quantized vector column to a
    literal centroid (broadcast into the plan — no join)."""
    c = F.array(*[F.lit(int(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(vec, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def sq_dist(a: Column, b: Column) -> Column:
    """Integer squared L2 distance between two quantized vector columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def exact_sq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str | None = None,
    max_queries: int = 10_000,
) -> DataFrame:
    """Exact integer-L2 top-k of every query against the corpus —
    ``(query_id, neighbor_id)``, self-matches excluded, optionally
    restricted to corpus rows whose ``label_col`` equals the query's.

    The r13 replacement for the 20×-corpus broadcast-NLJ + rank-window
    "exact5" ground-truth legs (r12 verdict item 7): ONE Arrow map pass
    over the corpus computes all |Q| distances per row in int64 numpy and
    emits only each batch's per-query top-k (≤ |Q|·k rows per batch); a
    final window over that bounded union picks the global top-k.  Same
    pass count as the BNLJ form but the per-row work is a vectorized
    int64 matmul instead of |Q| interpreted zip_with/aggregate lambdas,
    and the rank window sorts batches·|Q|·k rows instead of |corpus|·|Q|
    (guide §3/§4.2).

    Exactness (the oracle is untouched): distances are integer squared
    L2 over the same ``quantize`` fixed-point values — JVM-computed on
    the query side, numpy int64 on the corpus side (float32→float64 cast,
    ×10⁶, floor are the identical IEEE ops; all sums < 2⁶³).  The
    decomposition ``|c|² + |q|² − 2c·q`` is associative integer
    arithmetic, bit-equal to the zip_with fold.  Per-batch top-k keeps
    the k smallest under the total order (dist, neighbor_id) — a
    selection that decomposes over any partitioning of the corpus, so
    the final window sees every global top-k row and reproduces the
    BNLJ + row_number result row-for-row.

    ``queries`` (≤ ``max_queries`` rows — asserted) is collected to the
    driver: the same panel the BNLJ form broadcast, in the sanctioned
    tiny-panel class."""
    import numpy as np

    q_cols = [F.col(id_col).alias("query_id"), quantize(F.col(vec_col)).alias("q")]
    if label_col is not None:
        q_cols.append(F.col(label_col).alias("qlabel"))
    q_rows = queries.select(*q_cols).collect()
    if len(q_rows) > max_queries:
        raise ValueError(
            f"exact_sq_topk query panel has {len(q_rows)} rows > "
            f"max_queries={max_queries} — use the IVF path for large panels"
        )
    qids = np.asarray([r["query_id"] for r in q_rows], dtype=np.int64)
    qmat = np.asarray([r["q"] for r in q_rows], dtype=np.int64)
    qlabels = (
        np.asarray([r["qlabel"] for r in q_rows], dtype=np.int64)
        if label_col is not None
        else None
    )
    c_cols = [F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")]
    if label_col is not None:
        c_cols.append(F.col(label_col).alias("clabel"))
    src = corpus.select(*c_cols)

    def gen(batches):
        import pandas as pd

        nq = len(qids)
        qn = (qmat * qmat).sum(axis=1)  # (nq,)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["cv"].to_numpy())
            # same fixed-point quantize as the JVM side: float32→float64
            # (exact), ×1e6 and floor are identical IEEE double ops
            c = np.floor(x.astype(np.float64) * float(QUANT)).astype(np.int64)
            nid = pdf["neighbor_id"].to_numpy().astype(np.int64)
            cn = (c * c).sum(axis=1)  # (nb,)
            # (nb, nq) integer distances: |c|² + |q|² − 2 c·q
            d = cn[:, None] + qn[None, :] - 2 * (c @ qmat.T)
            clab = (
                pdf["clabel"].to_numpy().astype(np.int64)
                if qlabels is not None
                else None
            )
            out_q, out_n, out_d = [], [], []
            for j in range(nq):
                mask = nid != qids[j]
                if clab is not None:
                    mask &= clab == qlabels[j]
                if not mask.any():
                    continue
                dj = d[mask, j]
                nj = nid[mask]
                # total order (dist asc, neighbor asc): lexsort keys are
                # last-key-primary
                order = np.lexsort((nj, dj))[:k]
                out_q.append(np.full(len(order), qids[j], dtype=np.int64))
                out_n.append(nj[order])
                out_d.append(dj[order])
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "dist": np.concatenate(out_d),
                }
            )

    partial = src.mapInPandas(
        gen, schema="query_id bigint, neighbor_id bigint, dist bigint"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        partial.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id")
    )


def _argmin_cluster(vec: Column, centroids: list[list[int]]) -> Column:
    """Index of the nearest centroid; ties -> lowest index (matches the
    oracle's ``ORDER BY dist, cid`` row_number)."""
    dists = F.array(*[_sq_dist_lit(vec, c) for c in centroids])
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("long")


def ivf_train(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    seed: str = "ivf",
    train_frac: float = 1.0,
) -> list[list[int]]:
    """Deterministic integer Lloyd's: returns the k quantized centroids.

    Seeding: the k vectors with the smallest ``md5(seed ':' id)`` (hash
    order = reproducible pseudo-random, cluster id = rank).  Each iteration
    is ONE Arrow pass: per batch, numpy assigns every vector to its nearest
    centroid and emits per-cluster partial ``(n, per-dim sums)`` rows —
    <= k rows per batch, merged exactly on the driver (int64 sums are
    associative; numpy integer arithmetic is bit-identical to a JVM fold,
    the sq8/SemDedup precedent).  The r12 rewrite: the old form built a
    k·dim-literal Catalyst expression (8×64 = 512-term distance tree) that
    was re-analyzed and interpreted per Lloyd collect — measured 2.14 s vs
    0.58 s for the identical centroids at sf0.1 (guide §4.2: hand whole
    batches to vectorized native code; the values are unchanged).
    ``train_frac`` trains on a deterministic hash sample — at corpus scale
    the codebook needs a sample, not the corpus.  The quantized training
    sample is pinned (MEMORY_AND_DISK localCheckpoint) for the iterations
    and released before return — the standard cache-the-training-set shape
    (guide §5: reused per iteration, recompute = full scan + quantize).
    """
    from .sampling import hash_bucket

    q = df.select(F.col(id_col).alias("vid"), quantize(F.col(vec_col)).alias("qv"))
    if train_frac < 1.0:
        q = q.filter(
            hash_bucket(F.col("vid"), f"{seed}-train") < round(train_frac * 10_000)
        )
    q = q.localCheckpoint(eager=True)
    try:
        seeds = (
            q.withColumn(
                "h", F.md5(F.concat(F.lit(f"{seed}:"), F.col("vid").cast("string")))
            )
            .orderBy("h", "vid")  # TakeOrdered(k) — no global sort materializes
            .limit(k)
            .collect()
        )
        centroids = [list(r["qv"]) for r in seeds]
        for _ in range(iters):
            cents = centroids

            def _partials(batches):
                import numpy as np
                import pandas as pd

                c_arr = np.asarray(cents, dtype=np.int64)
                for pdf in batches:
                    if not len(pdf):
                        continue
                    x = np.stack(pdf["qv"].to_numpy()).astype(np.int64, copy=False)
                    d = ((x[:, None, :] - c_arr[None, :, :]) ** 2).sum(axis=2)
                    # numpy argmin takes the FIRST minimum — the same
                    # lowest-cid tie-break as _argmin_cluster / the oracle
                    cl = d.argmin(axis=1)
                    cids, ns, sums = [], [], []
                    for cid in np.unique(cl):
                        sel = x[cl == cid]
                        cids.append(int(cid))
                        ns.append(int(sel.shape[0]))
                        sums.append([int(v) for v in sel.sum(axis=0)])
                    yield pd.DataFrame({"cluster": cids, "n": ns, "sm": sums})

            parts = q.mapInPandas(
                _partials, "cluster bigint, n bigint, sm array<bigint>"
            ).collect()
            merged: dict[int, list] = {}
            for r in parts:
                cid = int(r["cluster"])
                if cid in merged:
                    merged[cid][0] += int(r["n"])
                    merged[cid][1] = [a + b for a, b in zip(merged[cid][1], r["sm"])]
                else:
                    merged[cid] = [int(r["n"]), list(r["sm"])]
            # floor of the float quotient, exactly as the old groupBy path
            # (exact <2^53 integers divide correctly rounded — module doc)
            updated = {
                cid: [math.floor(s / n) for s in sm] for cid, (n, sm) in merged.items()
            }
            # empty clusters keep their previous centroid
            centroids = [updated.get(cid, c) for cid, c in enumerate(centroids)]
        return centroids
    finally:
        from .dedup import _unpersist_checkpoint

        _unpersist_checkpoint(q)


def ivf_assign(
    df: DataFrame,
    centroids: list[list[int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The inverted file: ``(vec_id, qv, cluster)`` — one narrow pass."""
    return df.select(
        F.col(id_col).alias("neighbor_id"), quantize(F.col(vec_col)).alias("cv")
    ).withColumn("cluster", _argmin_cluster(F.col("cv"), centroids))


def _probe_clusters(
    queries: DataFrame,
    centroids: list[list[int]],
    nprobe: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(query_id, qv, cluster) — each query exploded to its ``nprobe``
    nearest centroids.  (dist, cid) structs sort by dist then cid, so the
    probe order (and therefore the candidate set) is deterministic and
    matches the oracle's ``ORDER BY dist, cid`` row_number; shared by both
    ANN variants so the tie-break discipline can never diverge."""
    q = queries.select(
        F.col(id_col).alias("query_id"), quantize(F.col(vec_col)).alias("qv")
    )
    probe_arr = F.slice(
        F.array_sort(
            F.array(
                *[
                    F.struct(
                        _sq_dist_lit(F.col("qv"), c).alias("d"),
                        F.lit(cid).cast("long").alias("cid"),
                    )
                    for cid, c in enumerate(centroids)
                ]
            )
        ),
        1,
        nprobe,
    )
    return q.withColumn(
        "cluster", F.explode(F.transform(probe_arr, lambda s: s["cid"]))
    )


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[int]],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the ``nprobe`` nearest inverted lists per query, exact
    integer-L2 rerank inside them: ``(query_id, neighbor_id, dist, rank)``.

    The query side (queries × nprobe rows) is broadcast into an equality
    join on cluster id — candidates shuffle, the corpus never does.
    """
    inv = ivf_assign(corpus, centroids, id_col, vec_col)
    probes = _probe_clusters(queries, centroids, nprobe, id_col, vec_col)
    cands = inv.join(F.broadcast(probes), on="cluster").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        sq_dist(F.col("qv"), F.col("cv")).alias("dist"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )


def _oracle_dist(dim: int):
    rng = f"range(1, {dim + 1})"

    def dist(a: str, b: str) -> str:
        return (
            f"CAST(list_sum(list_transform({rng}, i -> "
            f"({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))) AS BIGINT)"
        )

    return dist


def ivf_cte_body(
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    seed: str = "ivf",
    table: str = "embeddings",
    train_frac: float = 1.0,
) -> tuple[str, str]:
    """DuckDB CTE chain replaying train + full-corpus assignment, ending in
    ``inv(neighbor_id, cv, cluster)``.  Returns (cte_body, final_centroid
    CTE name) so callers can keep composing (probe/search, SemDedup).

    ``train_frac`` mirrors ``ivf_train``'s deterministic hash-bucket
    training sample (same md5 bucket arithmetic), so the replay guarantee
    holds for sampled training too: seeding and the Lloyd iterations run
    on the sample, the final ``inv`` assignment on the full corpus."""
    dist = _oracle_dist(dim)
    rng = f"range(1, {dim + 1})"

    parts = [
        f"""
qv AS (SELECT vec_id, list_transform(embedding,
           x -> CAST(floor(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT)) AS v
       FROM {table})"""
    ]
    train = "qv"
    if train_frac < 1.0:
        # same bucket arithmetic as sampling.hash_bucket(vid, seed+'-train')
        cutoff = round(train_frac * 10_000)
        parts.append(
            f"""
tq AS (SELECT vec_id, v FROM qv
       WHERE (('0x' || substr(md5('{seed}-train:' || CAST(vec_id AS VARCHAR)),
               1, 15))::BIGINT % 10000) < {cutoff})"""
        )
        train = "tq"
    parts.append(
        f"""
c0 AS (SELECT ROW_NUMBER() OVER (
           ORDER BY md5('{seed}:' || CAST(vec_id AS VARCHAR)), vec_id) - 1
           AS cid, v
       FROM {train}
       QUALIFY cid < {k})"""
    )
    prev = "c0"
    for it in range(1, iters + 1):
        a, u, c = f"a{it}", f"u{it}", f"c{it}"
        parts.append(
            f"""
{a} AS (SELECT vec_id, v, cid FROM (
        SELECT q.vec_id, q.v, c.cid,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY {dist('q.v', 'c.v')}, c.cid) AS rn
        FROM {train} q CROSS JOIN {prev} c) WHERE rn = 1),
{u} AS (SELECT cid, list(ci ORDER BY i) AS v FROM (
        SELECT cid, i,
               CAST(floor(SUM(v[i]) * 1.0 / COUNT(*)) AS BIGINT) AS ci
        FROM {a}, {rng} t(i) GROUP BY cid, i) GROUP BY cid),
{c} AS (SELECT p.cid, COALESCE(u.v, p.v) AS v
        FROM {prev} p LEFT JOIN {u} u USING (cid))"""
        )
        prev = c
    parts.append(
        f"""
inv AS (SELECT vec_id AS neighbor_id, v AS cv, cid AS cluster FROM (
        SELECT q.vec_id, q.v, c.cid,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY {dist('q.v', 'c.v')}, c.cid) AS rn
        FROM qv q CROSS JOIN {prev} c) WHERE rn = 1)"""
    )
    return ",".join(parts), prev


def ivf_oracle_sql(
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    seed: str = "ivf",
    topk: int = 5,
    nprobe: int = 2,
    query_pred: str = "vec_id < 20",
    table: str = "embeddings",
    train_frac: float = 1.0,
) -> str:
    """DuckDB SQL replaying the full IVF algorithm (train + assign + probe
    + rerank) with the Lloyd iterations unrolled as CTEs — bit-identical
    to the Spark implementation by construction (see module docstring)."""
    dist = _oracle_dist(dim)
    body, final_c = ivf_cte_body(k, iters, dim, seed, table, train_frac)
    return f"""
WITH {body},
probes AS (SELECT query_id, qv2 AS qv, cid AS cluster FROM (
        SELECT q.vec_id AS query_id, q.v AS qv2, c.cid,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY {dist('q.v', 'c.v')}, c.cid) AS rn
        FROM (SELECT * FROM qv WHERE {query_pred}) q
        CROSS JOIN {final_c} c) WHERE rn <= {nprobe}),
scored AS (SELECT p.query_id, i.neighbor_id,
                  {dist('p.qv', 'i.cv')} AS dist
           FROM probes p JOIN inv i ON p.cluster = i.cluster
           WHERE i.neighbor_id <> p.query_id)
SELECT query_id, neighbor_id, dist,
       CAST(rn AS BIGINT) AS rank
FROM (SELECT query_id, neighbor_id, dist,
             ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY dist, neighbor_id) AS rn
      FROM scored)
WHERE rn <= {topk}
"""


def ivf_assign_sq8(
    df: DataFrame,
    centroids: list[list[int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVFADC-style compressed inverted file: each vector's RESIDUAL from
    its centroid is quantized to int8 codes + one int64 scale —
    ``(neighbor_id, cluster, scale, codes)``.  At 100 TB this is the
    memory/bandwidth story of the index: dim bytes + 8 per vector instead
    of 8·dim, so inverted lists stay executor-resident 8x longer.

    Pure integer round-half-up (no floats anywhere):

        scale = max_i |r_i|,   code_i = sign(r_i) * ((254|r_i| + scale)
                                                     div (2·scale))

    which is floor(127|r|/scale + 1/2) exactly — engine-reproducible by
    construction.

    Computed as exact int64 numpy in one Arrow batch per partition (the
    SemDedup precedent: every value is an integer < 2^63, so numpy integer
    arithmetic is bit-identical to a JVM fold).  The pure-expression form
    measured 2.6 s at sf0.1 — Catalyst's project collapsing re-inlines the
    residual ``zip_with`` into each of its three consumers and interpreted
    HOF lambdas pay ~5 passes x 64 dims per row; the numpy form is 0.2 s
    with the identical output."""
    import pandas as pd

    inv = ivf_assign(df, centroids, id_col, vec_col)
    cent_arr = centroids  # broadcast with the closure (k x dim ints)

    def _encode(batches):
        import numpy as np

        cents = np.asarray(cent_arr, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["cv"].to_numpy()).astype(np.int64, copy=False)
            cl = pdf["cluster"].to_numpy().astype(np.int64)
            r = x - cents[cl]
            a = np.abs(r)
            scale = a.max(axis=1)
            safe = np.where(scale > 0, scale, 1)
            codes = np.sign(r) * ((254 * a + safe[:, None]) // (2 * safe[:, None]))
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "cluster": cl,
                    "scale": scale,
                    "codes": list(codes),
                }
            )

    return inv.mapInPandas(
        _encode,
        "neighbor_id bigint, cluster bigint, scale bigint, codes array<bigint>",
    )


def ivfadc_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[int]],
    k: int = 5,
    nprobe: int = 2,
    refine: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN search over the COMPRESSED inverted file: candidates are scored
    by integer squared-L2 against the code-reconstructed vectors
    (asymmetric distance computation), only the top ``k·refine`` per query
    survive to an exact rerank against the full-precision corpus —
    ``(query_id, neighbor_id, dist, rank)``, dist exact.

    Reconstruction stays integer-exact across engines: with shifted
    non-negative codes ``c' = c + 127``,

        v̂_i = centroid_i - scale + (c'_i · scale) div 127

    equals ``centroid_i + floor(c_i·scale/127)`` (trunc == floor once the
    operand is non-negative — the sign hazard between Spark's ``div`` and
    DuckDB's ``//`` on negatives never arises).

    Plan shape: identical probe join to ``ivf_ann_topk`` (candidates
    shuffle, corpus doesn't), but the candidate stage moves 8x fewer bytes
    and the exact-distance join touches only k·refine rows per query."""
    inv8 = ivf_assign_sq8(corpus, centroids, id_col, vec_col)
    cent_lit = F.array(
        *[F.array(*[F.lit(int(v)) for v in c]) for c in centroids]
    )
    probes = _probe_clusters(queries, centroids, nprobe, id_col, vec_col)
    cent = F.element_at(cent_lit, (F.col("cluster") + 1).cast("int"))
    recon = F.zip_with(
        cent,
        F.col("codes"),
        lambda ci, c: ci
        - F.col("scale")
        + F.floor(((c + 127) * F.col("scale")) / 127).cast("long"),
    )
    # reconstruct BELOW the probe join: rv depends only on the corpus row,
    # so it materializes once per vector instead of once per (query,
    # candidate) pair.  With the numpy sq8 encoder this full search
    # measures 0.77 s at sf0.1 (was 3.55 s with per-candidate HOF recon
    # over the pure-expression codes)
    inv_r = inv8.withColumn("rv", recon)
    cands = inv_r.join(F.broadcast(probes), on="cluster").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    approx = cands.select(
        "query_id",
        "neighbor_id",
        "qv",
        sq_dist(F.col("qv"), F.col("rv")).alias("adist"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id").asc()
    )
    survivors = approx.withColumn("arank", F.row_number().over(w)).filter(
        F.col("arank") <= k * refine
    )
    exact = corpus.select(
        F.col(id_col).alias("neighbor_id"), quantize(F.col(vec_col)).alias("cv")
    )
    reranked = survivors.join(exact, on="neighbor_id").select(
        "query_id",
        "neighbor_id",
        sq_dist(F.col("qv"), F.col("cv")).alias("dist"),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return reranked.withColumn("rank", F.row_number().over(w2).cast("long")).filter(
        F.col("rank") <= k
    )


def ivfadc_oracle_sql(
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    seed: str = "ivf",
    topk: int = 5,
    nprobe: int = 2,
    refine: int = 3,
    query_pred: str = "vec_id < 20",
    table: str = "embeddings",
) -> str:
    """DuckDB replay of ``ivfadc_ann_topk``: shared IVF CTEs + residual
    SQ8 codes + ADC candidate ranking + exact refine — bit-identical by
    construction (integer round-half-up quantization, shifted-code
    floor-division reconstruction, deterministic tie-breaks)."""
    dist = _oracle_dist(dim)
    rng = f"range(1, {dim + 1})"
    body, final_c = ivf_cte_body(k, iters, dim, seed, table)
    return f"""
WITH {body},
inv8 AS (
    SELECT neighbor_id, cluster, scale,
           list_transform({rng}, i ->
               (CASE WHEN r[i] > 0 THEN 1 WHEN r[i] < 0 THEN -1 ELSE 0 END)
               * ((254 * abs(r[i]) + safe) // (2 * safe))) AS codes
    FROM (
        SELECT i.neighbor_id, i.cluster,
               list_transform({rng}, j -> i.cv[j] - c.v[j]) AS r,
               list_aggregate(list_transform({rng}, j -> abs(i.cv[j] - c.v[j])),
                              'max') AS scale,
               greatest(list_aggregate(
                   list_transform({rng}, j -> abs(i.cv[j] - c.v[j])), 'max'),
                   1) AS safe
        FROM inv i JOIN {final_c} c ON i.cluster = c.cid)
),
aprobes AS (SELECT query_id, qv2 AS qv, cid AS cluster FROM (
        SELECT q.vec_id AS query_id, q.v AS qv2, c.cid,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY {dist('q.v', 'c.v')}, c.cid) AS rn
        FROM (SELECT * FROM qv WHERE {query_pred}) q
        CROSS JOIN {final_c} c) WHERE rn <= {nprobe}),
recon AS (
    SELECT p.query_id, p.qv, i8.neighbor_id,
           list_transform({rng}, j ->
               c.v[j] - i8.scale
               + ((i8.codes[j] + 127) * i8.scale) // 127) AS rv
    FROM aprobes p
    JOIN inv8 i8 ON p.cluster = i8.cluster
    JOIN {final_c} c ON i8.cluster = c.cid
    WHERE i8.neighbor_id <> p.query_id
),
survivors AS (
    SELECT query_id, qv, neighbor_id FROM (
        SELECT query_id, qv, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY {dist('qv', 'rv')}, neighbor_id) AS arank
        FROM recon) WHERE arank <= {topk * refine}
),
rr AS (
    SELECT s.query_id, s.neighbor_id,
           {dist('s.qv', 'i.cv')} AS dist
    FROM survivors s JOIN inv i ON s.neighbor_id = i.neighbor_id
)
SELECT query_id, neighbor_id, dist, CAST(rn AS BIGINT) AS rank
FROM (SELECT query_id, neighbor_id, dist,
             ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY dist, neighbor_id) AS rn
      FROM rr)
WHERE rn <= {topk}
"""


def semantic_dedup(
    df: DataFrame,
    centroids: list[list[int]],
    tau: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDedup: drop every vector with a LOWER-id semantic duplicate
    (integer squared-L2 <= ``tau``) in the SAME inverted list —
    ``(vec_id, cluster, keep)`` for every input vector.

    Pairing is confined within clusters, so the work is O(n·B) for bounded
    cluster size B, exactly the blocked near-dup argument: at corpus scale
    k grows with n (k ~ n/B) and the codebook trains on a sample.  The
    min-id-canonical rule is the same convention as ``dedup_exact``; unlike
    greedy sequential SemDedup it is order-free, which is what makes it
    both distributable and engine-reproducible.

    The pairwise stage is one Arrow batch per cluster with an exact int64
    matmul (``|a-b|^2 = |a|^2 + |b|^2 - 2ab``; all values < 2^63 for the
    fixed-point range, so numpy integer arithmetic is bit-identical to the
    JVM fold) — the same vectorization that took the blocked near-dup from
    2.3 s to 0.6 s; the expanded pair join measured 3.8 s at sf0.1, this
    shape 6x less.  Communication is unchanged: one shuffle of the
    vectors on cluster id, pair enumeration never leaves the executor."""
    import pandas as pd

    inv = ivf_assign(df, centroids, id_col, vec_col)

    def _dropped(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        ids = pdf["neighbor_id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"neighbor_id": np.array([], dtype=np.int64)})
        x = np.stack(pdf["cv"].to_numpy()).astype(np.int64, copy=False)
        g = x @ x.T
        sq = np.diag(g)
        d = sq[:, None] + sq[None, :] - 2 * g
        has_smaller_dup = ((d <= int(tau)) & (ids[:, None] < ids[None, :])).any(axis=0)
        return pd.DataFrame({"neighbor_id": ids[has_smaller_dup]})

    dropped = inv.groupBy("cluster").applyInPandas(_dropped, "neighbor_id bigint")
    return (
        inv.join(dropped.withColumn("dup", F.lit(True)), on="neighbor_id", how="left")
        .select(
            F.col("neighbor_id").alias(id_col),
            "cluster",
            F.coalesce(~F.col("dup"), F.lit(True)).alias("keep"),
        )
    )


def semdedup_oracle_sql(
    tau: int,
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    seed: str = "ivf",
    table: str = "embeddings",
) -> str:
    """DuckDB replay of ``semantic_dedup`` on top of the shared IVF CTEs."""
    dist = _oracle_dist(dim)
    body, _ = ivf_cte_body(k, iters, dim, seed, table)
    return f"""
WITH {body},
dropped AS (
    SELECT DISTINCT b.neighbor_id
    FROM inv a JOIN inv b
      ON a.cluster = b.cluster AND a.neighbor_id < b.neighbor_id
    WHERE {dist('a.cv', 'b.cv')} <= {int(tau)}
)
SELECT i.neighbor_id AS vec_id, i.cluster,
       d.neighbor_id IS NULL AS keep
FROM inv i LEFT JOIN dropped d ON i.neighbor_id = d.neighbor_id
"""


# ---------------------------------------------------------------------------
# IVF-PQ: true product quantization (Jégou et al., IVFADC with PQ codes)
# ---------------------------------------------------------------------------

PQ_M = 4       # subspaces
PQ_KSUB = 16   # codewords per subspace (production: 256)


def pq_train(
    corpus: DataFrame,
    coarse: list[list[int]],
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = 2,
    dim: int = 64,
    seed: str = "pq",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_frac: float = 1.0,
) -> list[list[list[int]]]:
    """Train ``m`` per-subspace codebooks of ``ksub`` codewords each on the
    RESIDUALS from the coarse quantizer — real product quantization, the
    100 TB serving format (dim·8 bytes/vector → m code bytes + 8).

    Same determinism contract as :func:`ivf_train` so the DuckDB oracle
    replays training bit-for-bit: md5-ordered seeding per subspace
    (``md5('pq{s}:' || vid)``), integer squared-L2 assignment with
    lowest-cid tie-break, ``floor(sum/count)`` centroid updates, empty
    clusters keep their codeword.

    One-pass shape: the residual table ``(vid, r)`` is materialized ONCE
    (localCheckpointed — seeding + every Lloyd pass read it, released
    before return); the (vid, s, slice) explode exists only lazily for
    seeding.  Each iteration is ONE Arrow pass over the residuals: numpy
    slices the m subspaces, assigns each against its codebook, and emits
    per-(s, cluster) partial ``(n, per-dim sums)`` rows — <= m·ksub rows
    per batch, merged exactly on the driver (int64 sums are associative;
    the sq8/SemDedup bit-exactness precedent).  The r12 rewrite: the old
    per-iteration ``when``-chain over m·ksub·dsub literal distance terms
    (1024 literals) was re-analyzed and interpreted per collect —
    measured 6.18 s vs 1.49 s for identical books at sf0.1 (guide §4.2).

    ``train_frac`` trains on a deterministic hash sample, the same
    ``hash_bucket(id, seed + '-train')`` arithmetic as :func:`ivf_train`
    — at corpus scale codebook training runs on a sample while encoding
    touches everything (train-on-sample, encode-everything).  The sample
    filter is applied to the corpus BEFORE residual assignment, so the
    training passes (coarse assign + explode + seeding + Lloyd) each
    scan only the sample; per-row assignment is independent, so the
    sampled residuals are bit-identical to filtering afterwards and the
    DuckDB replay (``ivfpq_oracle_sql(pq_train_frac=...)``, which
    filters the exploded ``sub`` table) proves it."""
    dsub = dim // m
    if train_frac < 1.0:
        from .sampling import hash_bucket

        corpus = corpus.filter(
            hash_bucket(F.col(id_col), f"{seed}-train")
            < round(train_frac * 10_000)
        )
    inv = ivf_assign(corpus, coarse, id_col, vec_col)
    cent_lit = F.array(*[F.array(*[F.lit(int(v)) for v in c]) for c in coarse])
    res = inv.select(
        F.col("neighbor_id").alias("vid"),
        F.zip_with(
            F.col("cv"),
            F.element_at(cent_lit, (F.col("cluster") + 1).cast("int")),
            lambda a, b: a - b,
        ).alias("r"),
    ).localCheckpoint(eager=True)
    try:
        sub = res.select(
            "vid",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).cast("int").alias("s"),
                            F.slice("r", s * dsub + 1, dsub).alias("qv"),
                        )
                        for s in range(m)
                    ]
                )
            ).alias("e"),
        ).select("vid", "e.s", "e.qv")
        wnd = Window.partitionBy("s").orderBy("h", "vid")
        seed_rows = (
            sub.withColumn(
                "h",
                F.md5(
                    F.concat(
                        F.lit(seed),
                        F.col("s").cast("string"),
                        F.lit(":"),
                        F.col("vid").cast("string"),
                    )
                ),
            )
            .withColumn("rk", F.row_number().over(wnd))
            .filter(F.col("rk") <= ksub)
            .select("s", (F.col("rk") - 1).alias("cid"), "qv")
            .collect()
        )
        books: list[list[list[int]]] = [[None] * ksub for _ in range(m)]
        for r in seed_rows:
            books[r["s"]][r["cid"]] = list(r["qv"])
        for s, book in enumerate(books):
            n_seeded = sum(1 for cw in book if cw is not None)
            if n_seeded < ksub:
                raise ValueError(
                    f"pq_train: subspace {s} has only {n_seeded} < ksub={ksub} "
                    f"training rows — shrink ksub or enlarge the training set"
                )
        for _ in range(iters):
            bks = books

            def _partials(batches):
                import numpy as np
                import pandas as pd

                b_arr = np.asarray(bks, dtype=np.int64)  # (m, ksub, dsub)
                n_sub, d_sub = b_arr.shape[0], b_arr.shape[2]
                for pdf in batches:
                    if not len(pdf):
                        continue
                    r = np.stack(pdf["r"].to_numpy()).astype(np.int64, copy=False)
                    out_s, out_c, out_n, out_sum = [], [], [], []
                    for s in range(n_sub):
                        rs = r[:, s * d_sub : (s + 1) * d_sub]
                        d = ((rs[:, None, :] - b_arr[s][None, :, :]) ** 2).sum(axis=2)
                        # first minimum = lowest-cid tie-break (oracle rule)
                        cl = d.argmin(axis=1)
                        for cid in np.unique(cl):
                            sel = rs[cl == cid]
                            out_s.append(s)
                            out_c.append(int(cid))
                            out_n.append(int(sel.shape[0]))
                            out_sum.append([int(v) for v in sel.sum(axis=0)])
                    yield pd.DataFrame(
                        {"s": out_s, "cluster": out_c, "n": out_n, "sm": out_sum}
                    )

            parts = res.mapInPandas(
                _partials, "s int, cluster bigint, n bigint, sm array<bigint>"
            ).collect()
            merged: dict[tuple, list] = {}
            for r in parts:
                key = (int(r["s"]), int(r["cluster"]))
                if key in merged:
                    merged[key][0] += int(r["n"])
                    merged[key][1] = [
                        a + b for a, b in zip(merged[key][1], r["sm"])
                    ]
                else:
                    merged[key] = [int(r["n"]), list(r["sm"])]
            # floor of the float quotient, exactly as the old groupBy path
            updated = {
                key: [math.floor(s / n) for s in sm]
                for key, (n, sm) in merged.items()
            }
            books = [
                [updated.get((s, cid), books[s][cid]) for cid in range(ksub)]
                for s in range(m)
            ]
        return books
    finally:
        from .dedup import _unpersist_checkpoint

        _unpersist_checkpoint(res)


def ivfpq_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    coarse: list[list[int]],
    books: list[list[list[int]]],
    k: int = 5,
    nprobe: int = 2,
    refine: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN search over PQ-coded inverted lists: each corpus vector is
    m code bytes + its list id; candidates are scored by integer
    squared-L2 against the PQ-reconstructed vector (coarse centroid +
    per-subspace codeword — asymmetric distance), top ``k·refine``
    survivors rerank exactly — ``(query_id, neighbor_id, dist, rank)``.

    Same plan skeleton as :func:`ivfadc_ann_topk` (probe equality join,
    reconstruct below the join so rv materializes once per vector, exact
    refine touches k·refine rows/query); encoding + reconstruction run as
    exact int64 numpy in one Arrow batch per partition (the sq8 lesson:
    interpreted HOF lambdas pay per-row; every value is < 2^63 so numpy
    is bit-identical to a JVM fold).  numpy ``argmin`` takes the FIRST
    minimum — the same lowest-cid tie-break as the oracle's
    ``ORDER BY dist, cid``."""
    import pandas as pd

    m, ksub = len(books), len(books[0])
    dsub = len(books[0][0])
    inv = ivf_assign(corpus, coarse, id_col, vec_col)
    coarse_arr, books_arr = coarse, books  # closure broadcast: m·ksub·dsub ints

    def _encode(batches):
        import numpy as np

        cents = np.asarray(coarse_arr, dtype=np.int64)
        bk = np.asarray(books_arr, dtype=np.int64)  # (m, ksub, dsub)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["cv"].to_numpy()).astype(np.int64, copy=False)
            cl = pdf["cluster"].to_numpy().astype(np.int64)
            r = x - cents[cl]
            codes = np.empty((len(x), m), dtype=np.int64)
            rv = cents[cl].copy()
            for s in range(m):
                rs = r[:, s * dsub : (s + 1) * dsub]
                d = ((rs[:, None, :] - bk[s][None, :, :]) ** 2).sum(axis=2)
                c = d.argmin(axis=1)
                codes[:, s] = c
                rv[:, s * dsub : (s + 1) * dsub] += bk[s][c]
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "cluster": cl,
                    "codes": list(codes),
                    "rv": list(rv),
                }
            )

    inv_r = inv.mapInPandas(
        _encode,
        "neighbor_id bigint, cluster bigint, codes array<bigint>, rv array<bigint>",
    )
    probes = _probe_clusters(queries, coarse, nprobe, id_col, vec_col)
    cands = inv_r.join(F.broadcast(probes), on="cluster").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    approx = cands.select(
        "query_id",
        "neighbor_id",
        "qv",
        sq_dist(F.col("qv"), F.col("rv")).alias("adist"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id").asc()
    )
    survivors = approx.withColumn("arank", F.row_number().over(w)).filter(
        F.col("arank") <= k * refine
    )
    exact = corpus.select(
        F.col(id_col).alias("neighbor_id"), quantize(F.col(vec_col)).alias("cv")
    )
    reranked = survivors.join(exact, on="neighbor_id").select(
        "query_id",
        "neighbor_id",
        sq_dist(F.col("qv"), F.col("cv")).alias("dist"),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("neighbor_id").asc()
    )
    return reranked.withColumn("rank", F.row_number().over(w2).cast("long")).filter(
        F.col("rank") <= k
    )


def ivfpq_oracle_sql(
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    seed: str = "ivf",
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    pq_iters: int = 2,
    pq_seed: str = "pq",
    topk: int = 5,
    nprobe: int = 2,
    refine: int = 3,
    query_pred: str = "vec_id < 20",
    table: str = "embeddings",
    train_frac: float = 1.0,
    pq_train_frac: float = 1.0,
) -> str:
    """DuckDB replay of the ENTIRE IVF-PQ pipeline: shared coarse CTEs,
    per-subspace residual k-means (seeding + every Lloyd iteration
    unrolled), code assignment, codeword reconstruction, ADC ranking,
    exact refine — bit-identical to the Spark path by the same
    integer-exactness argument as the module docstring.

    ``train_frac`` / ``pq_train_frac`` mirror the deterministic
    hash-bucket training samples of :func:`ivf_train` and
    :func:`pq_train`: seeding and Lloyd run on the sample (``tsub``),
    code assignment and search on the full corpus."""
    dsub = dim // m
    dist = _oracle_dist(dim)
    sdist = _oracle_dist(dsub)
    rng = f"range(1, {dim + 1})"
    srng = f"range(1, {dsub + 1})"
    body, final_c = ivf_cte_body(k, iters, dim, seed, table, train_frac)
    ptrain = "sub"
    sample_cte = ""
    if pq_train_frac < 1.0:
        cutoff = round(pq_train_frac * 10_000)
        sample_cte = f"""
tsub AS (SELECT * FROM sub
         WHERE (('0x' || substr(md5('{pq_seed}-train:' || CAST(vid AS VARCHAR)),
                 1, 15))::BIGINT % 10000) < {cutoff}),"""
        ptrain = "tsub"
    parts = [
        f"""
res AS (SELECT i.neighbor_id AS vid, i.cluster,
               list_transform({rng}, j -> i.cv[j] - c.v[j]) AS r
        FROM inv i JOIN {final_c} c ON i.cluster = c.cid),
sub AS (SELECT vid, s,
               list_transform({srng}, j -> r[s * {dsub} + j]) AS qv
        FROM res, (SELECT unnest(range({m})) AS s)),{sample_cte}
pc0 AS (SELECT s, ROW_NUMBER() OVER (PARTITION BY s
            ORDER BY md5('{pq_seed}' || s || ':' || CAST(vid AS VARCHAR)), vid)
            - 1 AS cid, qv AS v
        FROM {ptrain}
        QUALIFY cid < {ksub})"""
    ]
    prev = "pc0"
    for it in range(1, pq_iters + 1):
        a, u, c = f"pa{it}", f"pu{it}", f"pc{it}"
        parts.append(
            f"""
{a} AS (SELECT vid, s, qv, cid FROM (
        SELECT q.vid, q.s, q.qv, c.cid,
               ROW_NUMBER() OVER (PARTITION BY q.s, q.vid
                   ORDER BY {sdist('q.qv', 'c.v')}, c.cid) AS rn
        FROM {ptrain} q JOIN {prev} c ON q.s = c.s) WHERE rn = 1),
{u} AS (SELECT s, cid, list(ci ORDER BY i) AS v FROM (
        SELECT s, cid, i,
               CAST(floor(SUM(qv[i]) * 1.0 / COUNT(*)) AS BIGINT) AS ci
        FROM {a}, {srng} t(i) GROUP BY s, cid, i) GROUP BY s, cid),
{c} AS (SELECT p.s, p.cid, COALESCE(u.v, p.v) AS v
        FROM {prev} p LEFT JOIN {u} u ON p.s = u.s AND p.cid = u.cid)"""
        )
        prev = c
    parts.append(
        f"""
codes AS (SELECT vid, s, cid FROM (
        SELECT q.vid, q.s, c.cid,
               ROW_NUMBER() OVER (PARTITION BY q.s, q.vid
                   ORDER BY {sdist('q.qv', 'c.v')}, c.cid) AS rn
        FROM sub q JOIN {prev} c ON q.s = c.s) WHERE rn = 1),
rcat AS (SELECT k.vid, flatten(list(c.v ORDER BY k.s)) AS catv
         FROM codes k JOIN {prev} c ON k.s = c.s AND k.cid = c.cid
         GROUP BY k.vid),
pqrecon AS (SELECT i.neighbor_id, i.cluster,
                   list_transform({rng}, j -> c.v[j] + rc.catv[j]) AS rv
            FROM inv i
            JOIN {final_c} c ON i.cluster = c.cid
            JOIN rcat rc ON rc.vid = i.neighbor_id),
qprobes AS (SELECT query_id, qv2 AS qv, cid AS cluster FROM (
        SELECT q.vec_id AS query_id, q.v AS qv2, c.cid,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY {dist('q.v', 'c.v')}, c.cid) AS rn
        FROM (SELECT * FROM qv WHERE {query_pred}) q
        CROSS JOIN {final_c} c) WHERE rn <= {nprobe}),
adc AS (SELECT p.query_id, p.qv, r.neighbor_id,
               {dist('p.qv', 'r.rv')} AS adist
        FROM qprobes p JOIN pqrecon r ON p.cluster = r.cluster
        WHERE r.neighbor_id <> p.query_id),
psurv AS (SELECT query_id, qv, neighbor_id FROM (
        SELECT query_id, qv, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY adist, neighbor_id) AS arank
        FROM adc) WHERE arank <= {topk * refine}),
prr AS (SELECT s.query_id, s.neighbor_id,
               {dist('s.qv', 'i.cv')} AS dist
        FROM psurv s JOIN inv i ON s.neighbor_id = i.neighbor_id)"""
    )
    return f"""
WITH {body},{",".join(parts)}
SELECT query_id, neighbor_id, dist, CAST(rn AS BIGINT) AS rank
FROM (SELECT query_id, neighbor_id, dist,
             ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY dist, neighbor_id) AS rn
      FROM prr)
WHERE rn <= {topk}
"""
