"""Scaling-efficiency evidence for the north rule.

No real multi-executor cluster exists in this sandbox, so the N -> 4N
executor criterion is evidenced by running the IDENTICAL bench job at
two local parallelism levels (local[8] vs local[32]) on the same input
and reporting throughput at both plus efficiency = (T_8 / T_32) / 4
(BASELINE.md evidence plan).

Writes BENCH/BASELINE.md. Usage: python scripts/bench_scaling.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


SCALE_DOCS = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", 1_000_000))
SCALE_PAIRS = int(os.environ.get("SPARK_GRAFT_SCALE_PAIRS", 20_000_000))


def run_at(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_BENCH_DOCS=str(SCALE_DOCS),
               SPARK_GRAFT_BENCH_PAIRS=str(SCALE_PAIRS),
               PYTHONPATH=_REPO)
    out = subprocess.run(
        [sys.executable, os.path.join(_REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # warm run to exclude one-time fixture generation + JIT-ish warmup from
    # the comparison (both measured runs then see identical cached inputs)
    run_at(8, sf_dir)

    r8 = run_at(8, sf_dir)
    r32 = run_at(32, sf_dir)
    t8, t32 = r8["value"], r32["value"]
    d8, d32 = r8["docs_per_sec"], r32["docs_per_sec"]
    eff_total = (t8 / t32) / 4.0
    eff_pipeline = (d32 / d8) / 4.0

    lines = [
        "# BENCH — scaling-efficiency evidence (north rule)",
        "",
        f"Generated {time.strftime('%Y-%m-%d %H:%M:%S')} by scripts/bench_scaling.py.",
        "",
        "No real multi-executor cluster exists in this sandbox; the north",
        "rule's N -> 4N executor criterion is evidenced by the same job at",
        "two local parallelism levels on the same input (BASELINE.md plan):",
        "identical bench suite, `local[8]` vs `local[32]`, one 32-core box.",
        "",
        "The comparison runs at a compute-bound scale (the regime the rule",
        "is about): the per-round sf0.1 BENCH_r{N}.json numbers are small",
        "enough that fixed driver-side costs dominate and neither level",
        "saturates its cores.",
        "",
        f"Input: {sf_dir} + deterministic interleaved docs table "
        f"({r32['n_docs']:,} docs, {r32['n_geo_points']:,} geo points), "
        f"{SCALE_PAIRS:,} Vincenty pairs.",
        "",
        "| parallelism | suite wall (s) | spatial pipeline docs/sec |",
        "|---|---|---|",
        f"| local[8]  (N)  | {t8:.2f} | {d8:,.0f} |",
        f"| local[32] (4N) | {t32:.2f} | {d32:,.0f} |",
        "",
        f"**Scaling efficiency (suite wall): (T_8 / T_32) / 4 = {eff_total:.3f}**",
        f"**Scaling efficiency (pipeline docs/sec): (D_32 / D_8) / 4 = {eff_pipeline:.3f}**",
        "",
        "Per-query seconds:",
        "",
        "| query | local[8] | local[32] | speedup |",
        "|---|---|---|---|",
    ]
    for q in sorted(r8["queries"]):
        a, b = r8["queries"][q], r32["queries"][q]
        lines.append(f"| {q} | {a:.2f} | {b:.2f} | {a / max(b, 1e-9):.2f}x |")
    lines += [
        "",
        "Notes: local-mode wall times include fixed driver-side costs",
        "(query planning, Python UDF worker startup, driver-side kNN round",
        "control) that do not shrink with cores; the per-query speedup",
        "column shows which operators are compute-bound (Vincenty UDF,",
        "extraction) vs orchestration-bound at this small scale. At 100 TB",
        "the compute-bound fraction dominates.",
        "",
        "Raw JSON:",
        "```json",
        json.dumps(r8),
        json.dumps(r32),
        "```",
    ]
    os.makedirs(os.path.join(_REPO, "BENCH"), exist_ok=True)
    out_path = os.path.join(_REPO, "BENCH", "BASELINE.md")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_path}: eff_total={eff_total:.3f} eff_pipeline={eff_pipeline:.3f}")


if __name__ == "__main__":
    main()
