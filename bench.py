"""Benchmark harness: headline engine queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "docs_per_sec": ...}

The spatial-pipeline queries run over a bench-scale interleaved
documents table generated deterministically on first use (cached in
.bench_work/); text/embedding queries run over the driver tables in the
sf dir. Timings are action-to-action wall clock (count/collect).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
BENCH_DIR = os.path.join(_REPO, ".bench_work")

# docs-per-sf: FIXTURES.md sizing (sf0.1 ~ 100k interleaved docs)
_SF_DOCS = {"sf0.001": 1_000, "sf0.01": 10_000, "sf0.1": 100_000}


def _sf_label() -> str:
    return os.path.basename(SF_DIR.rstrip("/"))


def _sf_value() -> float:
    try:
        return float(_sf_label().replace("sf", ""))
    except ValueError:
        return 0.0


def ensure_bench_docs(n_docs: int, n_files: int = 32) -> str:
    """Bench-scale interleaved documents table (deterministic, cached).

    Written as a DIRECTORY of ``n_files`` parquet files so the scan has
    real split parallelism — a single 100+ MB file with one row group
    pins extraction to 1-2 tasks, which is not how production tables
    (thousands of files) behave.
    """
    import pyarrow.parquet as pq

    from geodistpy_spark.sources.fixtures import generate_documents

    os.makedirs(BENCH_DIR, exist_ok=True)
    path = os.path.join(BENCH_DIR, f"docs_{n_docs}")
    marker = os.path.join(path, "_DONE")
    if not os.path.exists(marker):
        os.makedirs(path, exist_ok=True)
        table = generate_documents(n_docs)
        step = (n_docs + n_files - 1) // n_files
        for i in range(n_files):
            sl = table.slice(i * step, step)
            if sl.num_rows:
                pq.write_table(sl, os.path.join(path, f"part-{i:04d}.parquet"))
        open(marker, "w").close()
    return path


def ensure_bench_queries(n: int = 200) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from geodistpy_spark.sources.fixtures import generate_places

    os.makedirs(BENCH_DIR, exist_ok=True)
    path = os.path.join(BENCH_DIR, f"queries_{n}.parquet")
    if not os.path.exists(path):
        t = generate_places(n, seed=777)
        t = t.rename_columns(["query_id", "name", "q_lat", "q_lon"])
        pq.write_table(pa.table({"query_id": t["query_id"], "q_lat": t["q_lat"],
                                 "q_lon": t["q_lon"]}), path)
    return path


def ensure_bench_polygons(n: int) -> str:
    """Sweep-scale polygon set (deterministic; default bench uses the
    50-ring driver fixture)."""
    import pyarrow.parquet as pq

    from geodistpy_spark.sources.fixtures import generate_polygons

    os.makedirs(BENCH_DIR, exist_ok=True)
    path = os.path.join(BENCH_DIR, f"polygons_{n}.parquet")
    if not os.path.exists(path):
        pq.write_table(generate_polygons(n), path)
    return path


def ensure_bench_texts(n: int) -> str:
    """Sweep-scale text corpus for the dedup query: deterministic
    documents of 20-60 words drawn from a 20,000-word synthetic
    vocabulary, with an explicit ~10% near-duplicate fraction (each
    near-dup is the previous doc with two words swapped out). Random
    3-shingles from a 20k vocab are effectively unique, so LSH band
    buckets stay small and candidate pairs grow LINEARLY with n --
    the earlier 33-word lorem vocabulary saturated the shingle space
    by n~=4e5, which made band buckets quadratic AND skewed (one
    straggler task dominated every level of the scaling sweep,
    measuring a degenerate workload rather than the engine).

    Written as multiple parquet files like a production corpus (note
    Spark splits even a single parquet file by byte range scaled to
    default parallelism, so scan parallelism is fine either way -- the
    multi-file layout just mirrors what a real pipeline reads).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(BENCH_DIR, exist_ok=True)
    path = os.path.join(BENCH_DIR, f"texts2_{n}")
    marker = os.path.join(path, "_DONE")
    if not os.path.exists(marker):
        os.makedirs(path, exist_ok=True)
        vocab = np.array([f"w{i:05d}" for i in range(20_000)])
        rng = np.random.default_rng(4242)
        n_words = rng.integers(20, 61, size=n)
        idx = rng.integers(0, len(vocab), size=(n, 60))
        # ~10% near-dups: doc i copies doc i-1 (same word ids, same
        # length) with two word positions re-rolled
        dup_mask = (np.arange(n) % 10 == 5) & (np.arange(n) > 0)
        dup_ids = np.flatnonzero(dup_mask)
        idx[dup_ids] = idx[dup_ids - 1]
        n_words[dup_ids] = n_words[dup_ids - 1]
        for d in dup_ids:
            pos = rng.integers(0, n_words[d], size=2)
            idx[d, pos] = rng.integers(0, len(vocab), size=2)
        chunk = max(n // 16, 1)
        part = 0
        for start in range(0, n, chunk):
            end = min(start + chunk, n)
            texts = [" ".join(vocab[idx[i, : n_words[i]]])
                     for i in range(start, end)]
            pq.write_table(pa.table({
                "doc_id": pa.array(range(start, end), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }), os.path.join(path, f"part-{part:04d}.parquet"))
            part += 1
        open(marker, "w").close()
    return path


def ensure_bench_embeddings(n: int, dim: int = 64) -> str:
    """Sweep-scale embedding table (deterministic float32)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(BENCH_DIR, exist_ok=True)
    path = os.path.join(BENCH_DIR, f"emb_{n}")
    marker = os.path.join(path, "_DONE")
    if not os.path.exists(marker):
        os.makedirs(path, exist_ok=True)
        rng = np.random.default_rng(99)
        chunk = 250_000
        for i, start in enumerate(range(0, n, chunk)):
            m = min(chunk, n - start)
            V = rng.standard_normal((m, dim), dtype=np.float32)
            pq.write_table(pa.table({
                "vec_id": pa.array(range(start, start + m), pa.int64()),
                "embedding": pa.array(list(V), pa.list_(pa.float32())),
            }), os.path.join(path, f"part-{i:04d}.parquet"))
        open(marker, "w").close()
    return path


def run_bench(spark, sf_dir: str) -> dict[str, float]:
    from pyspark.sql import functions as F

    from geodistpy_spark.operators import knn_join, radius_join, zonal_stats
    from geodistpy_spark.sources.documents import extract_geo_spans
    from geodistpy_spark.sources.fixtures import ensure_default_fixtures
    from geodistpy_spark.textops import cosine_topk, near_duplicates_minhash

    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", 0)) or _SF_DOCS.get(_sf_label(), 10_000)
    docs_path = ensure_bench_docs(n_docs)
    # query-set size knob: the scaling sweeps raise this so per-query
    # work dwarfs fixed per-job overhead (N=2 walls must be tens of
    # seconds for an efficiency measurement to see the engine, not the
    # ~2.5 s driver/plan/worker-spinup constant)
    n_queries = int(os.environ.get("SPARK_GRAFT_BENCH_QUERIES", 200))
    queries_path = ensure_bench_queries(n_queries)
    fixture_paths = ensure_default_fixtures()

    docs = spark.read.parquet(docs_path)
    queries = spark.read.parquet(queries_path)
    timings: dict[str, float] = {}

    def timed(name, fn):
        # best-of-3: the first execution carries codegen/JIT/worker-spawn
        # warmup, and this shared host has multi-second noisy periods
        # (observed 5x swings on unchanged queries under load-average ~10
        # from co-tenants); the minimum is the steady-state number a
        # long-lived cluster job sees
        best = float("inf")
        for _ in range(int(os.environ.get("SPARK_GRAFT_BENCH_REPS", 3))):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    # q1: span extraction + cell index over the full docs table
    geo = extract_geo_spans(docs, res=12)
    timed("q1_extract_index", lambda: geo.count())
    geo = geo.cache()
    n_geo = geo.count()

    # q2: many-center exact radius join (cover equi-join + Vincenty refine)
    timed("q2_radius_join", lambda: radius_join(
        queries, geo, 100_000.0, c_lat="lat", c_lon="lon").count())

    # q3: exact kNN join (expanding cover rounds + window top-k)
    timed("q3_knn_join", lambda: knn_join(
        queries, geo, 10, c_lat="lat", c_lon="lon").count())

    # q4: point-in-polygon + zonal aggregate over doc points
    # (SPARK_GRAFT_BENCH_POLYS scales the ring set for the scaling
    # sweeps; default stays the 50-ring driver fixture)
    n_polys = int(os.environ.get("SPARK_GRAFT_BENCH_POLYS", 0))
    polys_path = ensure_bench_polygons(n_polys) if n_polys \
        else fixture_paths["polygons"]
    polys = spark.read.parquet(polys_path)
    timed("q4_pip_zonal", lambda: zonal_stats(
        geo.withColumn("value", F.lit(1.0)), polys).count())

    # q5: Vincenty kernel throughput — n_pairs through the Arrow UDF
    # (repartition the LEFT side before the crossJoin so pair generation,
    # UDF compute, and aggregation all parallelize without a post-shuffle)
    from geodistpy_spark.operators import geodist

    n_pairs = int(os.environ.get("SPARK_GRAFT_BENCH_PAIRS", 2_000_000))
    n_left = max(n_pairs // 1000, 1)
    a = geo.limit(n_left).select(F.col("lat").alias("lat1"), F.col("lon").alias("lon1"))
    b = geo.limit(1000).select(F.col("lat").alias("lat2"), F.col("lon").alias("lon2"))
    pairs = a.repartition(int(CPUS)).crossJoin(b)
    timed("q5_vincenty_pairs", lambda: geodist(
        pairs, "lat1", "lon1", "lat2", "lon2").agg(F.sum("dist")).collect())

    # q6: MinHash near-dup pipeline over the driver documents table
    # (SPARK_GRAFT_BENCH_TEXT_DOCS swaps in a deterministic n-doc
    # corpus for the scaling sweeps)
    n_texts = int(os.environ.get("SPARK_GRAFT_BENCH_TEXT_DOCS", 0))
    flat = spark.read.parquet(
        ensure_bench_texts(n_texts) if n_texts
        else f"{sf_dir}/documents.parquet")
    def _q6():
        # evict the pipeline's caches after each rep: the cached shingle
        # relation is plan-canonicalization-reused across reps, so
        # without eviction every rep after the first measures only the
        # warm-cache increment (seconds) instead of the full
        # corpus-sized derivation a production run pays
        caches: list = []
        n = near_duplicates_minhash(flat, threshold=0.5, caches=caches).count()
        for c in caches:
            c.unpersist(blocking=True)
        return n

    timed("q6_minhash_dedup", _q6)

    # q7: embedding cosine top-k (SPARK_GRAFT_BENCH_EMB scales the
    # vector table for the scaling sweeps)
    n_emb = int(os.environ.get("SPARK_GRAFT_BENCH_EMB", 0))
    emb = spark.read.parquet(
        ensure_bench_embeddings(n_emb) if n_emb
        else f"{sf_dir}/embeddings.parquet")
    qv = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec"))
    # measured: an explicit repartition (cosine_topk min_parallelism)
    # LOSES here — the matmul pass is cheaper than the extra shuffle at
    # these sizes, and the r4 "0.73 q7 efficiency" turned out to be a
    # cross-run pairing artifact (same-run pairs are >= 0.99)
    timed("q7_embed_topk", lambda: cosine_topk(emb, qv, 10).count())

    # q8: span-sequence roundtrip verification over the full docs table
    # (single-pass: original fingerprint + explode + reassembly fp in
    # one scan/shuffle — see sources.documents.verify_roundtrip)
    from geodistpy_spark.sources.documents import verify_roundtrip

    timed("q8_span_roundtrip", lambda: verify_roundtrip(docs))

    geo.unpersist()
    timings["_n_docs"] = n_docs
    timings["_n_geo"] = n_geo
    return timings


def _host_probe() -> dict:
    """Load + steal snapshot — this shared host swings 5x under
    co-tenant bursts, so every recording carries the evidence needed
    to tell engine regressions from noise."""
    out = {}
    try:
        with open("/proc/loadavg") as f:
            out["load1"] = float(f.read().split()[0])
        with open("/proc/stat") as f:
            out["steal_ticks"] = int(f.readline().split()[8])
    except (OSError, IndexError, ValueError):
        pass
    return out


def _wait_quiet(limit: float = 2.0, max_wait_s: float = 300.0) -> float:
    """Bounded wait for the 1-min load average to drop under ``limit``
    before recording. This shared host swings 5x under co-tenant
    bursts (the round-4 recording started inside one and measured
    1.25-1.4x slower across queries whose code had not changed);
    deferring the start by up to 5 minutes is cheaper than a poisoned
    recording. Returns seconds waited; set
    SPARK_GRAFT_BENCH_NOWAIT=1 to skip."""
    if os.environ.get("SPARK_GRAFT_BENCH_NOWAIT"):
        return 0.0
    t0 = time.perf_counter()
    while True:
        try:
            l1 = os.getloadavg()[0]
        except OSError:
            return 0.0
        waited = time.perf_counter() - t0
        if l1 < limit or waited >= max_wait_s:
            return round(waited, 1)
        time.sleep(15)


def main():
    from geodistpy_spark import get_spark

    waited = _wait_quiet()
    spark = get_spark(app_name="geodistpy_spark_bench", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS) * 4)
    h0 = _host_probe()
    t0 = time.perf_counter()
    timings = run_bench(spark, SF_DIR)
    total = round(time.perf_counter() - t0, 3)
    h1 = _host_probe()
    n_docs = timings.pop("_n_docs")
    n_geo = timings.pop("_n_geo")
    # docs/sec over the spatial pipeline segment (extract+index+joins+zonal)
    pipeline_sec = sum(timings[q] for q in
                       ("q1_extract_index", "q2_radius_join", "q3_knn_join", "q4_pip_zonal"))
    out = {
        "metric": "spatial-join + kNN + dedup headline suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_value(),
        "docs_per_sec": round(n_docs / pipeline_sec, 1),
        "pipeline_sec": round(pipeline_sec, 3),
        "n_docs": n_docs,
        "n_geo_points": n_geo,
        "cpus": int(CPUS),
        "host": {
            "load1_start": h0.get("load1"),
            "load1_end": h1.get("load1"),
            "steal_ticks": (h1.get("steal_ticks", 0) - h0.get("steal_ticks", 0))
            if "steal_ticks" in h0 else None,
            "waited_for_quiet_s": waited,
        },
    }
    # attach the best steal-gated recording of this suite so a run
    # that lands in a co-tenant burst (this shared VM swings 5x; bursts
    # of 25k+ steal ticks observed) still carries the clean reference
    # number WITH the telemetry that qualifies it — the live `host`
    # key above tells the reader which situation this run was in
    best_path = os.path.join(_REPO, "BENCH", "headline_r5_final.json")
    if os.path.exists(best_path):
        with open(best_path) as f:
            best = json.load(f)
        if best.get("sf") == out["sf"]:
            out["best_recorded"] = {
                "value": best["value"],
                "queries": best["queries"],
                "docs_per_sec": best["docs_per_sec"],
                "host": best.get("host"),
                "note": "best steal-gated recording of this suite on "
                        "this host (see BENCH/headline_r5_final.json)",
            }
    scaling_path = os.path.join(_REPO, "BENCH", "scaling.json")
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            out["scaling"] = json.load(f)
    suite_path = os.path.join(_REPO, "BENCH", "scaling_suite.json")
    if os.path.exists(suite_path):
        with open(suite_path) as f:
            s = json.load(f)
        out["scaling_suite"] = {
            "pair": s["pair"],
            "suite_efficiency": s["suite_efficiency"],
            "pipeline_efficiency": s["pipeline_efficiency"],
            "per_query_efficiency": s["per_query_efficiency"],
        }
        # the best whole-run pair above is biased upward by lo-level
        # steal; surface the honest trio alongside it when the merged
        # artifact carries them (median over all runs, the least-steal
        # run's pair, and the zero-steal regression intercept)
        for k in ("suite_efficiency_median", "cleanest_run",
                  "steal_efficiency_fit"):
            if s.get(k) is not None:
                out["scaling_suite"][k] = s[k]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
