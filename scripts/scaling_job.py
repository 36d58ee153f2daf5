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

    # 32g is the sweet spot measured on this box: huge heaps defer G1
    # collection into rare massive pauses that wreck run-to-run variance
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
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
        # docs fixture is written as 32 files (bench.ensure_bench_docs), so
        # scan -> extract -> broadcast cover join -> Arrow refine -> agg is
        # ONE fully parallel pipelined stage with no shuffle at all.
        geo = extract_geo_spans(docs, res=12)
        rj = radius_join(queries, geo, radius_m, c_lat="lat", c_lon="lon")
        row = rj.agg(F.count("*").alias("n"), F.sum("dist").alias("s")).collect()[0]
        return row["n"]

    def cpu_stat():
        p = open("/proc/stat").readline().split()
        v = list(map(int, p[1:9]))
        return sum(v), v[7]  # total jiffies, steal jiffies

    n_pairs = job()
    for _ in range(2):
        job()  # 3 warm executions total: C2 JIT + codegen + Arrow workers
    walls, steals = [], []
    for _ in range(5):  # best-of-5: this shared host has noisy periods
        spark.sparkContext._jvm.System.gc()  # fence out cross-rep GC debt
        j0, s0 = cpu_stat()
        t0 = time.perf_counter()
        job()
        dt = time.perf_counter() - t0
        j1, s1 = cpu_stat()
        walls.append(dt)
        # steal cores-equivalent during the run (hypervisor contention)
        steals.append(round((s1 - s0) / 100.0 / dt, 2))
    wall = min(walls)
    print(json.dumps({
        "cpus": cpus, "n_docs": n_docs, "n_queries": n_queries,
        "radius_m": radius_m, "result_pairs": n_pairs,
        "wall_sec": round(wall, 3), "walls": [round(w, 3) for w in walls],
        "steal_cores": steals,
        "docs_per_sec": round(n_docs / wall, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
