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

N_DOCS = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", 1_000_000))
# per-query work must dwarf the ~2.5 s fixed per-job overhead at N=2 or
# the efficiency measures the constant, not the engine (first sweep at
# the default 200 queries / 2M pairs read 0.24-0.4 on the join queries
# purely from overhead): 2,000 radius/kNN queries and 40M Vincenty
# pairs put every scalable query's local[2] wall in the tens of seconds
N_QUERIES = int(os.environ.get("SPARK_GRAFT_SCALE_QUERIES", 2_000))
N_PAIRS = int(os.environ.get("SPARK_GRAFT_SCALE_PAIRS", 40_000_000))
LEVELS = (2, 8)
REPS = os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")


def loadavg() -> float:
    return os.getloadavg()[0]


def run_level(cpus: int) -> dict:
    env = dict(os.environ)
    env.update({
        "SPARK_GRAFT_CPUS": str(cpus),
        "SPARK_GRAFT_BENCH_DOCS": str(N_DOCS),
        "SPARK_GRAFT_BENCH_QUERIES": str(N_QUERIES),
        "SPARK_GRAFT_BENCH_PAIRS": str(N_PAIRS),
        "SPARK_GRAFT_BENCH_REPS": REPS,
        "SPARK_DRIVER_MEMORY": "48g",
    })
    t0 = time.perf_counter()
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=_REPO, timeout=3600)
    wall = time.perf_counter() - t0
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    rec = json.loads(line)
    rec["_sweep_wall"] = round(wall, 1)
    return rec


def main():
    results = {}
    loads = {}
    for cpus in LEVELS:
        l0 = loadavg()
        print(f"[local[{cpus}]] start (load {l0:.2f}) ...", flush=True)
        rec = run_level(cpus)
        loads[cpus] = {"before": l0, "after": loadavg()}
        results[cpus] = rec
        print(f"  suite {rec['value']}s pipeline {rec['pipeline_sec']}s "
              f"docs/s {rec['docs_per_sec']}", flush=True)

    q2, q8 = results[LEVELS[0]]["queries"], results[LEVELS[1]]["queries"]
    factor = LEVELS[1] / LEVELS[0]
    per_query = {
        q: round(q2[q] / (factor * q8[q]), 3)
        for q in q2 if not q.startswith("_")
    }
    sum2 = sum(v for k, v in q2.items() if not k.startswith("_"))
    sum8 = sum(v for k, v in q8.items() if not k.startswith("_"))
    out = {
        "pair": f"local[{LEVELS[0]}]->local[{LEVELS[1]}]",
        "sf": "sf1 spatial corpus (1M interleaved docs) + sf0.1 driver tables",
        "n_docs": N_DOCS,
        "suite_efficiency": round(sum2 / (factor * sum8), 3),
        "pipeline_efficiency": round(
            results[LEVELS[0]]["pipeline_sec"]
            / (factor * results[LEVELS[1]]["pipeline_sec"]), 3),
        "per_query_efficiency": per_query,
        "suite_sec": {str(k): results[k]["value"] for k in LEVELS},
        "queries_sec": {str(k): {q: v for q, v in results[k]["queries"].items()}
                        for k in LEVELS},
        "docs_per_sec": {str(k): results[k]["docs_per_sec"] for k in LEVELS},
        "load_avg": loads,
        "note": (
            "q6/q7 run over the fixed sf0.1 driver tables (5k docs / 500 "
            "vectors) whose walls sit near the fixed per-job overhead at "
            "both levels — their efficiencies measure that constant, not "
            "the engine's plan; the docs-scaled (q1/q4/q8) and "
            "knob-scaled (q2/q3/q5) queries are the signal"
        ),
    }
    path = os.path.join(_REPO, "BENCH", "scaling_suite.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
