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


def build_ivf_index(emb: DataFrame, n_cells: int = 16,
                    id_col: str = "vec_id", vec_col: str = "embedding"):
    """Deterministic IVF 'training': centroids = the n_cells vectors with
    the smallest ids (no RNG — resumable and oracle-checkable). Returns
    (centroids_df, assigned_df) where assigned has a ``cell`` column.

    At real scale centroids would come from a k-means sample; the
    assignment/probe machinery below is unchanged by that substitution.
    """
    cents = (
        emb.orderBy(F.col(id_col).asc()).limit(n_cells)
        .select(F.col(id_col).alias("cell"),
                F.col(vec_col).cast("array<double>").alias("cv"))
    )
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


def ivf_topk(emb: DataFrame, queries: DataFrame, k: int, n_cells: int = 16,
             n_probe: int = 4, id_col: str = "vec_id", vec_col: str = "embedding",
             q_id: str = "query_id", q_vec: str = "q_vec") -> DataFrame:
    """IVF-bucketed approximate top-k: probe only the n_probe cells whose
    centroids are most similar to the query; exact cosine within probed
    cells. Candidate work drops ~n_cells/n_probe-fold vs brute force.
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
