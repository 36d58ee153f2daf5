"""Suite-level scaling evidence: the FULL 8-query headline suite at sf1
(1M interleaved docs) at local[2] and local[8], per-query efficiency ->
BENCH/scaling_suite.json (merged into bench.py's JSON line).

This extends scripts/bench_scaling.py (which proves the 2->8 pair on the
radius-pipeline job) to the whole suite, per round-3's ask: the north
rule's N -> 4N criterion evidenced on every headline query, not just
one. Same methodology:

- primary pair local[2] -> local[8]: a local[k] job bursts to ~2k busy
  vCPUs (k JVM task threads + k Python workers), and the host probe in
  bench_scaling.py shows this shared VM's per-core throughput cliffs
  above ~16 busy vCPUs, so 2->8 is the widest pair measuring the ENGINE
  rather than the host.
- efficiency(q) = T_2(q) / (4 * T_8(q)); suite efficiency uses the wall
  sums. >= 0.8 passes the rule; > 1.0 = superlinear within host
  variance (bigger heaps/partitions amortize fixed costs).
- runs are poisoned by co-tenant bursts: load average is recorded
  before/after each level and the sweep should be re-run (not
  "corrected") if load was > ~2 at the start.

Usage: python scripts/bench_scaling_suite.py   (~20 min at quiet load)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_DOCS = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", 2_000_000))
# per-query work must dwarf the ~2.5 s fixed per-job overhead at N=2 or
# the efficiency measures the constant, not the engine (first sweep at
# the default 200 queries / 2M pairs read 0.24-0.4 on the join queries
# purely from overhead): 8,000 radius/kNN queries and 80M Vincenty
# pairs put every scalable query's local[2] wall in the tens of seconds
N_QUERIES = int(os.environ.get("SPARK_GRAFT_SCALE_QUERIES", 8_000))
N_PAIRS = int(os.environ.get("SPARK_GRAFT_SCALE_PAIRS", 80_000_000))
N_POLYS = int(os.environ.get("SPARK_GRAFT_SCALE_POLYS", 500))
# q6/q7 carry a ~4-5 s per-job fixed cost (query-vector collect scan,
# Python worker spin-up, small-stage scheduling floor) that is paid
# ONCE per executor on a real cluster; their sources must be large
# enough that the scalable work dwarfs it or the ratio measures the
# constant (the 50k-text / 4M-vector sizing measured 0.5-0.7 for this
# reason after the xxhash64 MinHash rewrite made q6 3x faster)
N_TEXTS = int(os.environ.get("SPARK_GRAFT_SCALE_TEXTS", 800_000))
N_EMB = int(os.environ.get("SPARK_GRAFT_SCALE_EMB", 20_000_000))
# local[8] runs FIRST: it needs ~16 free vCPUs and is the level
# sensitive to residual load; local[2] (needs ~4 of 32) is nearly
# immune, so it absorbs the decay of the first run
LEVELS = (8, 2)
REPS = os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")


def wait_quiet(limit: float = 1.0, max_wait_s: int = 900) -> float:
    """Block until the 1-min load average drops under ``limit`` (or the
    wait budget runs out) — sweeps recorded under co-tenant bursts are
    poisoned and must be re-run, not corrected."""
    t0 = time.time()
    while True:
        l1 = os.getloadavg()[0]
        if l1 < limit or time.time() - t0 > max_wait_s:
            return l1
        time.sleep(20)


def loadavg() -> float:
    return os.getloadavg()[0]


def steal_jiffies() -> int:
    """Cumulative hypervisor steal time — the co-tenant poison signal
    loadavg can NOT see (steal only accrues while we burn CPU, so a
    quiet pre-run loadavg says nothing about contention during the
    run; round-5 triage measured q1 wall tracking steal-cores
    monotonically: 0.85 steal-cores -> 0.65 s, 2.9 -> 8 s)."""
    with open("/proc/stat") as fh:
        return int(fh.readline().split()[8])


def run_level(cpus: int) -> dict:
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_CPUS": str(cpus),
        "SPARK_GRAFT_BENCH_DOCS": str(N_DOCS),
        "SPARK_GRAFT_BENCH_QUERIES": str(N_QUERIES),
        "SPARK_GRAFT_BENCH_PAIRS": str(N_PAIRS),
        "SPARK_GRAFT_BENCH_POLYS": str(N_POLYS),
        "SPARK_GRAFT_BENCH_TEXT_DOCS": str(N_TEXTS),
        "SPARK_GRAFT_BENCH_EMB": str(N_EMB),
        "SPARK_GRAFT_BENCH_REPS": REPS,
        "SPARK_DRIVER_MEMORY": "48g",
        # the sweep gates each level on load itself (wait_quiet above);
        # bench.py's own start-quiet wait would only double-wait here
        "SPARK_GRAFT_BENCH_NOWAIT": "1",
    })
    t0 = time.perf_counter()
    s0 = steal_jiffies()
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=_REPO, timeout=7200)
    wall = time.perf_counter() - t0
    s1 = steal_jiffies()
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    rec = json.loads(line)
    rec["_sweep_wall"] = round(wall, 1)
    rec["_steal_cores"] = round((s1 - s0) / 100.0 / wall, 2)
    return rec


def warm_page_cache() -> float:
    """Sequentially read every bench source file once so both levels see
    a warm page cache. Runs 25 and 26 were deflated by a pure
    environment asymmetry: the FIRST level (local[8], the ratio's
    denominator) paid cold disk reads for every source after a VM
    reboot / cache eviction while the second level read from memory —
    producing q1 local[8] walls slower in ABSOLUTE terms than the same
    query's local[2] wall, which no engine property can cause. The
    corpus (~5 GB) fits the 125 GB host cache many times over."""
    bench_dir = os.path.join(_REPO, ".bench_work")
    t0 = time.perf_counter()
    n_bytes = 0
    for root, _dirs, files in os.walk(bench_dir):
        for f in files:
            with open(os.path.join(root, f), "rb") as fh:
                while True:
                    chunk = fh.read(1 << 24)
                    if not chunk:
                        break
                    n_bytes += len(chunk)
    dt = time.perf_counter() - t0
    print(f"[warmup] {n_bytes / 1e9:.2f} GB read into page cache "
          f"in {dt:.1f}s", flush=True)
    return dt


def main():
    results = {}
    loads = {}
    warm_page_cache()
    for cpus in LEVELS:
        l0 = wait_quiet()
        print(f"[local[{cpus}]] start (load {l0:.2f}) ...", flush=True)
        rec = run_level(cpus)
        loads[cpus] = {"before": l0, "after": loadavg(),
                       "steal_cores": rec["_steal_cores"]}
        results[cpus] = rec
        print(f"  suite {rec['value']}s pipeline {rec['pipeline_sec']}s "
              f"docs/s {rec['docs_per_sec']}", flush=True)

    lo, hi = min(LEVELS), max(LEVELS)
    tlo, thi = results[lo]["queries"], results[hi]["queries"]
    factor = hi / lo
    per_query = {
        q: round(tlo[q] / (factor * thi[q]), 3)
        for q in tlo if not q.startswith("_")
    }
    sum_lo = sum(v for k, v in tlo.items() if not k.startswith("_"))
    sum_hi = sum(v for k, v in thi.items() if not k.startswith("_"))
    out = {
        "pair": f"local[{lo}]->local[{hi}]",
        "run_order": [f"local[{k}]" for k in LEVELS],
        "sf": "sf2-scale spatial corpus (2M interleaved docs), all sources sweep-scaled",
        "n_docs": N_DOCS,
        "n_queries": N_QUERIES,
        "n_pairs": N_PAIRS,
        "suite_efficiency": round(sum_lo / (factor * sum_hi), 3),
        "pipeline_efficiency": round(
            results[lo]["pipeline_sec"]
            / (factor * results[hi]["pipeline_sec"]), 3),
        "per_query_efficiency": per_query,
        "suite_sec": {str(k): results[k]["value"] for k in LEVELS},
        "queries_sec": {str(k): {q: v for q, v in results[k]["queries"].items()}
                        for k in LEVELS},
        "docs_per_sec": {str(k): results[k]["docs_per_sec"] for k in LEVELS},
        "load_avg": loads,
        "sources": {
            "docs": N_DOCS, "queries": N_QUERIES, "pairs": N_PAIRS,
            "polygons": N_POLYS, "text_docs": N_TEXTS, "embeddings": N_EMB,
        },
        "note": (
            "every query's source is scaled so its local[2] wall dwarfs "
            "the ~2.5 s fixed per-job constant (a once-per-executor cost "
            f"on a real cluster): {N_DOCS} docs (q1/q4/q8), {N_QUERIES} "
            f"radius/kNN queries (q2/q3), {N_PAIRS} Vincenty pairs (q5), "
            f"{N_POLYS} polygons (q4), {N_TEXTS} text docs (q6), "
            f"{N_EMB} embeddings (q7)"
        ),
    }
    path = os.path.join(_REPO, "BENCH", "scaling_suite.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
