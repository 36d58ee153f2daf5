"""Approximate-nearest-neighbor search over embedding columns.

- :func:`cosine_topk` — brute-force exact top-k (the baseline): native
  ``zip_with``/``aggregate`` dot products (JVM codegen, no Python) +
  ranking window.
- :func:`ivf_topk` — IVF-style scale path: K deterministic centroids,
  vectors assigned to nearest centroid (one broadcast join), queries
  probe the top-P nearest cells only. Recall < 1 by design; exactness
  is the baseline's job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
                       lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0),
                              lambda acc, x: acc + x))


def cosine_topk(emb: DataFrame, queries: DataFrame, k: int,
                id_col: str = "vec_id", vec_col: str = "embedding",
                q_id: str = "query_id", q_vec: str = "q_vec") -> DataFrame:
    """Exact cosine top-k: for every query vector, the k most-similar
    candidate vectors. Queries are broadcast (small side); similarity is
    pure column math; per-query top-k via ranking window.

    Output: (query_id, vec_id, cosine, rank), rank 1..k, ties broken by
    candidate id ascending (deterministic).
    """
    c = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    q = queries.select(F.col(q_id), F.col(q_vec).cast("array<double>").alias("qv"))
    pairs = c.crossJoin(F.broadcast(q))
    sim = pairs.withColumn("cosine", _dot("v", "qv") / (_norm("v") * _norm("qv")))
    w = Window.partitionBy(q_id).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, id_col, "cosine", "rank")
    )


def train_centroids(emb: DataFrame, n_cells: int, n_iters: int = 5,
                    sample_size: int = 4096, id_col: str = "vec_id",
                    vec_col: str = "embedding"):
    """Deterministic k-means on a driver-side sample (Lloyd iterations).

    Sample = the ``sample_size`` smallest ids (deterministic, resumable —
    no RNG in the data path); init = first n_cells of the sample (k-means++
    would add RNG for marginal gain at this K). Returns a list of
    unit-normalized centroid vectors. At 100 TB the sample collect is a
    partition-pruned scan of a few thousand rows — trivially cheap next
    to the assignment pass, which stays fully distributed.
    """
    import numpy as np

    pdf = (
        emb.orderBy(F.col(id_col).asc()).limit(sample_size)
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .toPandas()
    )
    X = np.stack(pdf["v"].values)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = X[:n_cells].copy()
    for _ in range(n_iters):
        sims = X @ C.T
        assign = sims.argmax(axis=1)
        for c in range(n_cells):
            members = X[assign == c]
            if len(members):
                m = members.sum(axis=0)
                C[c] = m / max(np.linalg.norm(m), 1e-12)
    return [[float(x) for x in row] for row in C]


def build_ivf_index(emb: DataFrame, n_cells: int | None = 16,
                    id_col: str = "vec_id", vec_col: str = "embedding"):
    """IVF index build: k-means centroids (deterministic sampled Lloyd)
    + fully-distributed nearest-centroid assignment. Returns
    (centroids_df, assigned_df) where assigned has a ``cell`` column.

    ``n_cells=None`` auto-scales to ~sqrt(N) (clamped to [8, 65536]) —
    the standard IVF sizing, so cells hold ~sqrt(N) vectors each and
    both the probe fan-out and per-cell scan grow as sqrt, not linearly.
    """
    import math

    spark = emb.sparkSession
    if n_cells is None:
        n = emb.count()
        n_cells = min(max(int(math.isqrt(max(n, 1))), 8), 65_536)
    cvecs = train_centroids(emb, n_cells, id_col=id_col, vec_col=vec_col,
                            sample_size=max(4096, 4 * n_cells))
    cents = spark.createDataFrame(
        [(i, v) for i, v in enumerate(cvecs)], "cell long, cv array<double>")
    v = emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    scored = v.crossJoin(F.broadcast(cents)).withColumn(
        "sim", _dot("v", "cv") / (_norm("v") * _norm("cv"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("sim").desc(), F.col("cell").asc())
    assigned = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, "v", "cell")
    )
    return cents, assigned


def ivf_topk(emb: DataFrame, queries: DataFrame, k: int,
             n_cells: int | None = 16,
             n_probe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
             q_id: str = "query_id", q_vec: str = "q_vec") -> DataFrame:
    """IVF-bucketed approximate top-k: probe only the n_probe cells whose
    centroids are most similar to the query; exact cosine within probed
    cells. Candidate work drops ~n_cells/n_probe-fold vs brute force.
    ``n_cells=None`` auto-scales to ~sqrt(N) (see build_ivf_index).
    """
    cents, assigned = build_ivf_index(emb, n_cells, id_col, vec_col)
    q = queries.select(F.col(q_id), F.col(q_vec).cast("array<double>").alias("qv"))
    qc = q.crossJoin(F.broadcast(cents)).withColumn(
        "csim", _dot("qv", "cv") / (_norm("qv") * _norm("cv"))
    )
    wq = Window.partitionBy(q_id).orderBy(F.col("csim").desc(), F.col("cell").asc())
    probes = (
        qc.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= n_probe)
        .select(q_id, "qv", "cell")
    )
    cand = probes.join(assigned, on="cell")
    sim = cand.withColumn("cosine", _dot("v", "qv") / (_norm("v") * _norm("qv")))
    w = Window.partitionBy(q_id).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id, id_col, "cosine", "rank")
    )
