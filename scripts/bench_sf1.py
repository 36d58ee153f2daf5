"""sf1 stress run: the full headline suite at 1M interleaved docs (10x
the per-round bench's sf0.1 corpus) + per-phase kNN populations.

Evidence for the 10x scale-up claim: docs/sec through the spatial
pipeline should stay within ~2x of sf0.1's (the plan is the same; the
only superlinear terms would be a blown-up phase-3 straggler set or a
driver bottleneck), and the kNN phase populations show how many of the
2,000 queries each phase closed — phase 3 must stay < 1% of queries.

Usage: python scripts/bench_sf1.py   (writes BENCH/sf1.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

N_DOCS = int(os.environ.get("SPARK_GRAFT_SF1_DOCS", 1_000_000))
N_QUERIES = 2_000
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    os.environ["SPARK_GRAFT_BENCH_DOCS"] = str(N_DOCS)
    os.environ.setdefault("SPARK_GRAFT_BENCH_REPS", "2")
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")

    from bench import ensure_bench_docs, ensure_bench_queries, run_bench
    from geodistpy_spark import get_spark
    from geodistpy_spark.operators import knn_join
    from geodistpy_spark.sources.documents import extract_geo_spans

    spark = get_spark(app_name="bench_sf1", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS) * 4)

    t0 = time.perf_counter()
    timings = run_bench(spark, os.environ.get("SPARK_GRAFT_SF_DIR",
                                              "/root/testdata/sf0.1"))
    total = round(time.perf_counter() - t0, 3)
    n_docs = timings.pop("_n_docs")
    n_geo = timings.pop("_n_geo")
    pipeline_sec = sum(timings[q] for q in
                       ("q1_extract_index", "q2_radius_join",
                        "q3_knn_join", "q4_pip_zonal"))

    # per-phase kNN populations at the stress query count (2,000 centers
    # over the full 1M-doc geo relation)
    docs = spark.read.parquet(ensure_bench_docs(n_docs))
    queries = spark.read.parquet(ensure_bench_queries(N_QUERIES))
    geo = extract_geo_spans(docs, res=12).cache()
    geo.count()
    stats: dict = {}
    t0 = time.perf_counter()
    kj = knn_join(queries, geo, 10, c_lat="lat", c_lon="lon", stats=stats)
    total_rows = kj.count()
    knn_sec = round(time.perf_counter() - t0, 3)
    p1 = stats["phase1"].count()
    p2 = stats["phase2"].count()
    p3 = total_rows - p1 - p2
    geo.unpersist()

    out = {
        "n_docs": n_docs,
        "n_geo_points": n_geo,
        "cpus": int(CPUS),
        "suite_total_sec": total,
        "queries": timings,
        "pipeline_sec": round(pipeline_sec, 3),
        "docs_per_sec": round(n_docs / pipeline_sec, 1),
        "knn_stress": {
            "n_queries": N_QUERIES,
            "k": 10,
            "wall_sec": knn_sec,
            "rows_phase1": int(p1),
            "rows_phase2": int(p2),
            "rows_phase3": int(p3),
            "queries_phase3_pct": round(100.0 * (p3 / 10) / N_QUERIES, 3),
        },
    }
    path = os.path.join(_REPO, "BENCH", "sf1.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
