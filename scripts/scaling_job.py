"""The scaling-evidence job: one compute-bound spatial pipeline run.

Pipeline: interleaved docs -> geo-span extraction -> cell index ->
many-center exact radius join (cover equi-join + Vincenty/Karney Arrow
refine) -> aggregate. This is the engine's flagship shape; at the chosen
radius the exact refine dominates (~16M kernel pairs), i.e. the regime a
100 TB deployment lives in.

Runs warm (one full warm-up execution, then best-of-2 measured) so JIT/
codegen compilation and Python-worker startup are excluded — on a real
cluster those are once-per-executor costs, not per-job costs.

Usage: python scripts/scaling_job.py <cpus> [n_docs] [n_queries] [radius_m]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    cpus = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000
    radius_m = float(sys.argv[4]) if len(sys.argv) > 4 else 1_000_000.0

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "96g")
    from pyspark.sql import functions as F

    from bench import ensure_bench_docs, ensure_bench_queries
    from geodistpy_spark import get_spark
    from geodistpy_spark.operators import radius_join
    from geodistpy_spark.sources.documents import extract_geo_spans

    docs_path = ensure_bench_docs(n_docs)
    queries_path = ensure_bench_queries(n_queries)

    spark = get_spark(app_name=f"scaling_{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 4)
    docs = spark.read.parquet(docs_path)
    queries = spark.read.parquet(queries_path)

    def job():
        # the fixture is ONE parquet file -> 1-2 scan splits; without this
        # repartition the broadcast-join pipeline (no shuffle anywhere)
        # would run at scan parallelism regardless of cores. Production
        # tables arrive as thousands of files/splits, so the repartition
        # stands in for real input parallelism rather than adding work.
        geo = extract_geo_spans(docs, res=12).repartition(cpus * 4)
        rj = radius_join(queries, geo, radius_m, c_lat="lat", c_lon="lon")
        row = rj.agg(F.count("*").alias("n"), F.sum("dist").alias("s")).collect()[0]
        return row["n"]

    n_pairs = job()  # warm: codegen + Arrow workers + file listing
    walls = []
    for _ in range(3):  # best-of-3: this host shows large run-to-run noise
        t0 = time.perf_counter()
        job()
        walls.append(time.perf_counter() - t0)
    wall = min(walls)
    print(json.dumps({
        "cpus": cpus, "n_docs": n_docs, "n_queries": n_queries,
        "radius_m": radius_m, "result_pairs": n_pairs,
        "wall_sec": round(wall, 3), "walls": [round(w, 3) for w in walls],
        "docs_per_sec": round(n_docs / wall, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
