"""Merge multiple scaling-suite runs into BENCH/scaling_suite.json by
taking, per query and per parallelism level, the MINIMUM wall across
runs — the same best-of-N methodology bench.py applies to repetitions
within one run, extended across sweeps: on a shared VM with bursty
co-tenant load (observed: one level's tail queries inflated 5x by a
burst that raised load to 10+), the minimum is the least-interfered
measurement and the one a dedicated cluster would see.

Only runs with IDENTICAL source sizing are merged (docs/queries/pairs/
polygons/text_docs/embeddings must match); q7 walls from runs predating
the cosine_topk matmul rewrite are dropped via the per-run `sources`
stamp (the 1M-embedding run).

Usage: python scripts/merge_scaling_runs.py BENCH/scaling_suite_run*.json
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(paths):
    runs = [json.load(open(p)) for p in paths]
    # comparable source sizing only: group by the sources stamp, keep
    # the sizing shared by the most recent run
    ref = runs[-1].get("sources")
    usable = []
    for p, r in zip(paths, runs):
        if r.get("sources") == ref:
            usable.append((p, r))
        else:
            print(f"note: {p} sizing {r.get('sources')} != reference; "
                  "merging only queries whose sources match", flush=True)
            usable.append((p, r))

    levels = sorted(runs[-1]["queries_sec"], key=int)
    qnames = [q for q in runs[-1]["queries_sec"][levels[0]]]
    # per-query source dependence: which sizing keys govern each query
    deps = {
        "q1_extract_index": ("docs",),
        "q2_radius_join": ("docs", "queries"),
        "q3_knn_join": ("docs", "queries"),
        "q4_pip_zonal": ("docs", "polygons"),
        "q5_vincenty_pairs": ("pairs",),
        "q6_minhash_dedup": ("text_docs",),
        "q7_embed_topk": ("embeddings",),
        "q8_span_roundtrip": ("docs",),
    }

    best = {lv: {} for lv in levels}
    contributing = {lv: {} for lv in levels}
    for p, r in usable:
        src = r.get("sources") or {}
        for lv in levels:
            for q in qnames:
                if any(src.get(k) != ref.get(k) for k in deps.get(q, ())):
                    continue
                t = r["queries_sec"].get(lv, {}).get(q)
                if t is None:
                    continue
                if q not in best[lv] or t < best[lv][q]:
                    best[lv][q] = t
                    contributing[lv][q] = os.path.basename(p)

    lo, hi = levels[0], levels[-1]
    factor = int(hi) / int(lo)
    pipe = ("q1_extract_index", "q2_radius_join", "q3_knn_join",
            "q4_pip_zonal")

    # EFFICIENCY is computed within SAME-RUN (lo, hi) pairs only: pairing
    # one sweep's lo wall with another sweep's hi wall can only inflate
    # the ratio (each minimum independently picks its least-interfered
    # sweep). Per query we report the best same-run pair; suite/pipeline
    # level we report the best AND median whole-run efficiency.
    def run_eff(r, qset):
        qs = r["queries_sec"]
        src = r.get("sources") or {}
        usable_q = [q for q in qset
                    if not any(src.get(k) != ref.get(k)
                               for k in deps.get(q, ()))
                    and qs.get(lo, {}).get(q) is not None
                    and qs.get(hi, {}).get(q) is not None]
        if set(usable_q) != set(qset):
            return None
        s_lo = sum(qs[lo][q] for q in qset)
        s_hi = sum(qs[hi][q] for q in qset)
        return s_lo / (factor * s_hi)

    per_query = {}
    per_query_run = {}
    for q in qnames:
        effs = [(r["queries_sec"][lo][q] /
                 (factor * r["queries_sec"][hi][q]), os.path.basename(p))
                for p, r in usable
                if not any((r.get("sources") or {}).get(k) != ref.get(k)
                           for k in deps.get(q, ()))
                and r["queries_sec"].get(lo, {}).get(q) is not None
                and r["queries_sec"].get(hi, {}).get(q) is not None]
        e, p = max(effs)
        per_query[q] = round(e, 3)
        per_query_run[q] = p

    suite_effs = sorted(e for e in (run_eff(r, qnames) for _, r in usable)
                        if e is not None)
    pipe_effs = sorted(e for e in (run_eff(r, pipe) for _, r in usable)
                       if e is not None)

    # steal-vs-efficiency evidence: hypervisor steal on the hi (4N)
    # level mechanically DEPRESSES the measured ratio (it inflates the
    # denominator wall), steal on the lo level inflates it. Rather than
    # excluding runs by a post-hoc threshold, report every run's
    # (efficiency, steal) triple plus a least-squares zero-steal
    # intercept — the contention-free efficiency the fleet of sweeps
    # points at.
    steal_rows = []
    for p, r in usable:
        e = run_eff(r, qnames)
        la = r.get("load_avg") or {}
        s_hi = (la.get(hi) or la.get(str(hi)) or {}).get("steal_cores")
        s_lo = (la.get(lo) or la.get(str(lo)) or {}).get("steal_cores")
        if e is not None and s_hi is not None:
            steal_rows.append({"run": os.path.basename(p),
                               "suite_efficiency": round(e, 3),
                               "steal_cores_hi": s_hi,
                               "steal_cores_lo": s_lo})
    steal_fit = None
    if len(steal_rows) >= 3:
        xs = [row["steal_cores_hi"] for row in steal_rows]
        ys = [row["suite_efficiency"] for row in steal_rows]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        sxx = sum((x - mx) ** 2 for x in xs)
        if sxx > 0:
            b = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sxx
            if b < 0:
                note = ("suite efficiency regressed on hi-level "
                        "steal-cores across all comparable sweeps; the "
                        "intercept estimates the contention-free "
                        "efficiency without excluding any run")
            else:
                # a non-negative slope means the campaign contains
                # zero-steal runs with degraded hi-level legs (memory-
                # bandwidth contention steal accounting cannot see —
                # the run-14 caveat below), so steal-cores does NOT
                # explain the variance; say so instead of asserting a
                # relationship the data contradicts
                note = ("fitted slope is non-negative: steal-cores does "
                        "not explain this campaign's variance (zero-steal "
                        "runs with degraded hi-level legs present — "
                        "memory-bandwidth contention is invisible to "
                        "steal accounting); the all-runs median is the "
                        "operative statistic")
            steal_fit = {
                "slope_per_steal_core": round(b, 3),
                "zero_steal_intercept": round(my - b * mx, 3),
                "note": note,
            }
    med = lambda xs: xs[len(xs) // 2] if len(xs) % 2 else \
        (xs[len(xs) // 2 - 1] + xs[len(xs) // 2]) / 2
    # cleanest-run headline: the whole-run pair with the LEAST total
    # recorded steal. The best-pair maximum is biased upward (lo-level
    # steal inflates a ratio; a max over noisy ratios picks the
    # inflated one), so alongside best/median we name the run whose
    # measurement carried the least co-tenant CPU contention. Note the
    # run-14 caveat: zero steal does not rule out memory-bandwidth
    # contention (see BENCH/io_calibration.json), so this is still one
    # evidence point, not ground truth.
    cleanest = None
    if steal_rows:
        c = min(steal_rows,
                key=lambda r: (r["steal_cores_hi"] or 0)
                + (r["steal_cores_lo"] or 0))
        cleanest = {"run": c["run"],
                    "suite_efficiency": c["suite_efficiency"],
                    "steal_cores_hi": c["steal_cores_hi"],
                    "steal_cores_lo": c["steal_cores_lo"]}
        effs = sorted(r["suite_efficiency"] for r in steal_rows)
        if cleanest["suite_efficiency"] < med(effs):
            cleanest["note"] = (
                "below the all-runs median: zero recorded steal did not "
                "rule out memory-bandwidth contention for this run (the "
                "run-14 caveat) — read it with steal_efficiency_fit's "
                "note, not as the headline")
    # timing-info table (best-of-sweeps walls) kept, with a flag for
    # queries whose lo/hi minima come from different sweeps
    cross_run = [q for q in qnames
                 if contributing[lo].get(q) != contributing[hi].get(q)]
    out = {
        "pair": f"local[{lo}]->local[{hi}]",
        "methodology": (
            f"efficiencies from SAME-RUN (lo, hi) pairs only — per query "
            f"the best same-run pair across {len(usable)} sweeps, "
            "suite/pipeline the best and median whole-run pair (each "
            "sweep itself best-of-N reps); cross-run minima are reported "
            "as walls only, never paired into a ratio"
        ),
        "sources": ref,
        "suite_efficiency": round(max(suite_effs), 3) if suite_effs else None,
        "suite_efficiency_median": round(med(suite_effs), 3) if suite_effs else None,
        "pipeline_efficiency": round(max(pipe_effs), 3) if pipe_effs else None,
        "pipeline_efficiency_median": round(med(pipe_effs), 3) if pipe_effs else None,
        "per_query_efficiency": per_query,
        "per_query_efficiency_run": per_query_run,
        "queries_sec": best,
        "queries_sec_note": (
            "per-query minima across sweeps (timing evidence; lo/hi of "
            "a query may come from different sweeps — see "
            "cross_run_minima — so ratios are NOT derived from this "
            "table)"),
        "cross_run_minima": cross_run,
        "contributing_run": contributing,
        "per_run_steal_evidence": steal_rows,
        "steal_efficiency_fit": steal_fit,
        "cleanest_run": cleanest,
        "runs": [os.path.basename(p) for p in paths],
        "note": runs[-1].get("note"),
    }
    path = os.path.join(_REPO, "BENCH", "scaling_suite.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main(sys.argv[1:])
