"""Per-query isolation harness for the optimization round (guide §1.4).

NOT the official bench — bench.py stays frozen. This file reuses
bench.py's data setup and session config, runs ONE named query (or all)
for N reps with per-rep walls, and can dump .explain("formatted") to
plans/r06/. Usage:

    python bench_extra.py q3 [reps]          # time one query
    python bench_extra.py all [reps]         # time all
    python bench_extra.py explain q3 suffix  # write plans/r06/q3_<suffix>.txt
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

import bench  # noqa: E402  (frozen harness; reused for data + session)

SF_DIR = bench.SF_DIR
CPUS = bench.CPUS


def build_queries(spark):
    """Dict of name -> (fn, df_fn): fn() is the timed action (mirrors
    bench.run_bench exactly); df_fn() returns the DataFrame for explain
    (None for queries whose action is not a plain count)."""
    from pyspark.sql import functions as F

    from geodistpy_spark.operators import geodist, knn_join, radius_join, zonal_stats
    from geodistpy_spark.sources.documents import extract_geo_spans, verify_roundtrip
    from geodistpy_spark.sources.fixtures import ensure_default_fixtures
    from geodistpy_spark.textops import cosine_topk, near_duplicates_minhash

    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", 0)) or bench._SF_DOCS.get(
        bench._sf_label(), 10_000)
    docs_path = bench.ensure_bench_docs(n_docs)
    queries_path = bench.ensure_bench_queries(
        int(os.environ.get("SPARK_GRAFT_BENCH_QUERIES", 200)))
    fixture_paths = ensure_default_fixtures()

    docs = spark.read.parquet(docs_path)
    queries = spark.read.parquet(queries_path)

    geo = extract_geo_spans(docs, res=12).cache()
    geo.count()

    polys = spark.read.parquet(fixture_paths["polygons"])
    flat = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qv = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec"))

    n_pairs = int(os.environ.get("SPARK_GRAFT_BENCH_PAIRS", 2_000_000))
    a = geo.limit(max(n_pairs // 1000, 1)).select(
        F.col("lat").alias("lat1"), F.col("lon").alias("lon1"))
    b = geo.limit(1000).select(F.col("lat").alias("lat2"), F.col("lon").alias("lon2"))
    pairs = a.repartition(int(CPUS)).crossJoin(b)

    def _q6():
        caches: list = []
        n = near_duplicates_minhash(flat, threshold=0.5, caches=caches).count()
        for c in caches:
            c.unpersist(blocking=True)
        return n

    geo_uncached = extract_geo_spans(docs, res=12)
    return {
        "q1": (lambda: geo_uncached.count(), lambda: geo_uncached),
        "q2": (lambda: radius_join(queries, geo, 100_000.0,
                                   c_lat="lat", c_lon="lon").count(),
               lambda: radius_join(queries, geo, 100_000.0, c_lat="lat", c_lon="lon")),
        "q3": (lambda: knn_join(queries, geo, 10, c_lat="lat", c_lon="lon").count(),
               lambda: knn_join(queries, geo, 10, c_lat="lat", c_lon="lon")),
        "q4": (lambda: zonal_stats(geo.withColumn("value", F.lit(1.0)), polys).count(),
               lambda: zonal_stats(geo.withColumn("value", F.lit(1.0)), polys)),
        "q5": (lambda: geodist(pairs, "lat1", "lon1", "lat2", "lon2")
               .agg(F.sum("dist")).collect(),
               lambda: geodist(pairs, "lat1", "lon1", "lat2", "lon2").agg(F.sum("dist"))),
        "q6": (_q6, lambda: near_duplicates_minhash(flat, threshold=0.5)),
        "q7": (lambda: cosine_topk(emb, qv, 10).count(),
               lambda: cosine_topk(emb, qv, 10)),
        "q8": (lambda: verify_roundtrip(docs), None),
    }


def main():
    from geodistpy_spark import get_spark

    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark(app_name="geodistpy_spark_bench_extra",
                      master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS) * 4)
    qs = build_queries(spark)

    if mode == "explain":
        name, suffix = sys.argv[2], sys.argv[3]
        _, df_fn = qs[name]
        if df_fn is None:
            print(f"{name} has no single-DataFrame plan; explain inline instead")
            sys.exit(1)
        os.makedirs(os.path.join(_REPO, "plans", "r06"), exist_ok=True)
        out = os.path.join(_REPO, "plans", "r06", f"{name}_{suffix}.txt")
        with open(out, "w") as f:
            f.write(df_fn()._sc._jvm.PythonSQLUtils.explainString(
                df_fn()._jdf.queryExecution(), "formatted"))
        print(f"wrote {out}")
        spark.stop()
        return

    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    names = list(qs) if mode == "all" else [mode]
    results = {}
    for name in names:
        fn, _ = qs[name]
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            walls.append(round(time.perf_counter() - t0, 3))
        results[name] = walls
        print(f"{name}: best={min(walls):.3f} walls={walls}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
