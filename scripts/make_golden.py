"""Generate fixtures/golden/*.parquet — mpmath high-precision expected
values for the driver queries whose kernels are iterative (not
SQL-expressible): vincenty_pairs, bearing_vincenty, midpoint,
interpolate, knn_exact.

The driver's correctness gate compares each Spark query against a DuckDB
oracle; iterative Vincenty/Karney paths had rows-only checks. These
fixtures close that hole: both sides read the SAME golden parquet, the
Spark side computes its kernel value and returns a within-tolerance
boolean (plus reference values taken from the golden table so the
columns hash-match), the oracle returns the same reference values with
ok=TRUE. A kernel value regression flips ok and fails the hash gate.

Truth source: tests/truth_geodesic.py — exact elliptic integrals via
mpmath.quad at 40 significant digits (the same arbiter the kernel
accuracy tests use; the reference's arbiter is geographiclib,
benchmark.py:206-265, absent in this environment).

Azimuth goldens: the inverse truth solver returns distance only, so
azi1 is taken from the production kernel and VALIDATED independently —
mpmath's exact DIRECT problem shot from (lat1, lon1) along the kernel
azimuth for the mpmath distance must land on (lat2, lon2). The landing
error bounds the azimuth error by err <= R sin(sigma) * delta, so each
row gets a per-row tolerance azi_tol_deg = max(1e-6 deg,
4*err/(R sin sigma)) — wide where the azimuth is genuinely
ill-conditioned (near-antipodal), tight everywhere else.

Inputs are the driver contract's derived points (pure integer math over
c_custkey / n_nationkey — identical doubles in numpy, Spark and DuckDB),
so the golden rows join back to ANY scale factor's customer/nation
tables by key.

Run: python scripts/make_golden.py   (~4 min on 32 cores; one-time,
outputs are committed)
"""

from __future__ import annotations

import json
import os
import sys
from multiprocessing import Pool

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

from geodistpy_spark import kernels as K  # noqa: E402

N_PAIRS = 1500        # custkeys 0..1499 (sf0.01 driver scale; sf0.001 is a subset)
KNN_CANDS = 150       # sf-independent candidate set (custkeys 0..149)
KNN_K = 3
MID_MOD = 5           # midpoint ids: id % 5 == 0
INTERP_MOD = 7        # interpolate ids: id % 7 == 0
N_WAYPOINTS = 3       # fracs 1/4, 2/4, 3/4 (endpoints excluded)
R_MEAN = 6_371_000.0

OUT_DIR = os.path.join(_REPO, "fixtures", "golden")


def pts(k: np.ndarray):
    """The driver contract's derived pair coordinates (PTS_* formulas)."""
    lat1 = (k * 9973 % 17999) / 1e2 - 8.9995e1
    lon1 = (k * 7919 % 35999) / 1e2 - 1.79995e2
    lat2 = ((k * 104729 + 12345) % 17999) / 1e2 - 8.9995e1
    lon2 = ((k * 95231 + 54321) % 35999) / 1e2 - 1.79995e2
    return lat1, lon1, lat2, lon2


def qry(k: np.ndarray):
    lat = ((k * 3571 + 11) % 17999) / 1e2 - 8.9995e1
    lon = ((k * 6763 + 13) % 35999) / 1e2 - 1.79995e2
    return lat, lon


def _inv(args):
    from truth_geodesic import geodesic_inverse_truth
    return geodesic_inverse_truth(*args)


def _direct(args):
    from truth_geodesic import geodesic_direct_truth
    return geodesic_direct_truth(*args)


def _pmap(fn, items, procs=30):
    with Pool(procs) as p:
        return p.map(fn, items, chunksize=4)


def angdiff(a, b):
    return (a - b + 180.0) % 360.0 - 180.0


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    ids = np.arange(N_PAIRS, dtype=np.int64)
    lat1, lon1, lat2, lon2 = pts(ids)

    # ---- inverse truth (distance) for all pairs --------------------------
    print(f"[1/5] mpmath inverse x {N_PAIRS} ...", flush=True)
    s_truth = np.array(_pmap(_inv, list(zip(lat1, lon1, lat2, lon2))))

    s_kern, az1_kern, _ = K.geodesic_inverse_full(lat1, lon1, lat2, lon2)
    inv_err = np.abs(s_kern - s_truth)
    print(f"      kernel |s - truth|: mean {inv_err.mean()*1e6:.1f} um, "
          f"max {inv_err.max()*1e6:.1f} um")
    assert inv_err.max() <= 1.5e-4, "kernel distance drifted past 0.15 mm"

    # ---- validate kernel azimuths via the exact direct problem ----------
    print(f"[2/5] mpmath direct validation x {N_PAIRS} ...", flush=True)
    landed = _pmap(_direct, list(zip(lat1, lon1, az1_kern, s_truth)))
    llat = np.array([p[0] for p in landed])
    llon = np.array([p[1] for p in landed])
    val_err = K.haversine(llat, llon, lat2, lon2)
    sigma = s_truth / R_MEAN
    azi_tol = np.maximum(
        1e-6,
        np.degrees(4.0 * val_err / (R_MEAN * np.maximum(np.sin(sigma), 1e-3))),
    )
    print(f"      landing err: mean {val_err.mean()*1e6:.1f} um, "
          f"max {val_err.max()*1e6:.1f} um; azi_tol max {azi_tol.max():.2e} deg")
    assert val_err.max() <= 2e-3, "azimuth validation landing error > 2 mm"

    pq.write_table(pa.table({
        "id": ids, "s_m": s_truth, "azi1_deg": az1_kern,
        "azi_tol_deg": azi_tol, "val_err_m": val_err,
    }), os.path.join(OUT_DIR, "inverse.parquet"))

    # ---- midpoint truth: exact direct at s/2 along the validated azi ----
    mid_ids = ids[ids % MID_MOD == 0]
    sel = np.isin(ids, mid_ids)
    print(f"[3/5] mpmath midpoint x {len(mid_ids)} ...", flush=True)
    mids = _pmap(_direct, list(zip(lat1[sel], lon1[sel],
                                   az1_kern[sel], s_truth[sel] / 2.0)))
    mid_lat = np.array([p[0] for p in mids])
    mid_lon = np.array([p[1] for p in mids])
    kla, klo = K.interpolate_points(lat1[sel], lon1[sel], lat2[sel], lon2[sel], 1)
    mid_err = K.haversine(kla[:, 0], klo[:, 0], mid_lat, mid_lon)
    print(f"      kernel midpoint err: max {mid_err.max()*1e6:.1f} um")
    assert mid_err.max() <= 1e-3, "kernel midpoint drifted past 1 mm"
    pq.write_table(pa.table({
        "id": mid_ids, "mid_lat": mid_lat, "mid_lon": mid_lon,
    }), os.path.join(OUT_DIR, "midpoint.parquet"))

    # ---- interpolate truth: exact direct at s*i/(n+1) --------------------
    it_ids = ids[ids % INTERP_MOD == 0]
    sel = np.isin(ids, it_ids)
    fracs = np.arange(1, N_WAYPOINTS + 1) / (N_WAYPOINTS + 1)
    jobs, keys = [], []
    for i in np.flatnonzero(sel):
        for w, fr in enumerate(fracs):
            jobs.append((lat1[i], lon1[i], az1_kern[i], s_truth[i] * fr))
            keys.append((ids[i], w))
    print(f"[4/5] mpmath interpolate x {len(jobs)} ...", flush=True)
    wps = _pmap(_direct, jobs)
    wp_lat = np.array([p[0] for p in wps])
    wp_lon = np.array([p[1] for p in wps])
    kla, klo = K.interpolate_points(lat1[sel], lon1[sel], lat2[sel], lon2[sel],
                                    N_WAYPOINTS)
    it_err = K.haversine(kla.ravel(), klo.ravel(), wp_lat, wp_lon)
    print(f"      kernel waypoint err: max {it_err.max()*1e6:.1f} um")
    assert it_err.max() <= 1e-3, "kernel waypoints drifted past 1 mm"
    pq.write_table(pa.table({
        "id": np.array([k[0] for k in keys], dtype=np.int64),
        "waypoint_idx": np.array([k[1] for k in keys], dtype=np.int64),
        "wp_lat": wp_lat, "wp_lon": wp_lon,
    }), os.path.join(OUT_DIR, "interp.parquet"))

    # ---- knn_exact truth: kernel brute-force ranking, mpmath-verified ----
    # queries = 25 nations, candidates = custkeys < KNN_CANDS (present at
    # every sf). Kernel errors (<0.15 mm) can only flip a rank if the
    # rank-k/rank-k+1 truth gap is comparable — assert it is not.
    qids = np.arange(25, dtype=np.int64)
    qlat, qlon = qry(qids)
    clat, clon = pts(np.arange(KNN_CANDS, dtype=np.int64))[0:2]
    rows = {"query_id": [], "cand_id": [], "rank": [], "s_m": []}
    ver_jobs, ver_keys = [], []
    order_all = {}
    for qi in qids:
        d = K.geodesic_inverse(np.full(KNN_CANDS, qlat[qi]),
                               np.full(KNN_CANDS, qlon[qi]), clat, clon)
        order = np.lexsort((np.arange(KNN_CANDS), d))  # tie-break cand_id
        order_all[qi] = (order, d)
        for r in range(KNN_K + 1):  # verify top-k AND the runner-up gap
            c = order[r]
            ver_jobs.append((qlat[qi], qlon[qi], clat[c], clon[c]))
            ver_keys.append((qi, r, c))
    print(f"[5/5] mpmath knn verification x {len(ver_jobs)} ...", flush=True)
    ver = _pmap(_inv, ver_jobs)
    truth = {}
    for (qi, r, c), s in zip(ver_keys, ver):
        truth[(qi, r)] = (c, s)
    for qi in qids:
        ts = [truth[(qi, r)][1] for r in range(KNN_K + 1)]
        assert all(ts[r] <= ts[r + 1] for r in range(KNN_K)), \
            f"kernel ranking disagrees with truth for query {qi}"
        assert ts[KNN_K] - ts[KNN_K - 1] > 1e-3, \
            f"rank-{KNN_K}/{KNN_K+1} gap < 1 mm for query {qi} (flaky top-k)"
        for r in range(KNN_K):
            c, s = truth[(qi, r)]
            rows["query_id"].append(int(qi))
            rows["cand_id"].append(int(c))
            rows["rank"].append(r + 1)
            rows["s_m"].append(s)
    pq.write_table(pa.table({
        "query_id": np.array(rows["query_id"], dtype=np.int64),
        "cand_id": np.array(rows["cand_id"], dtype=np.int64),
        "rank": np.array(rows["rank"], dtype=np.int64),
        "s_m": np.array(rows["s_m"]),
    }), os.path.join(OUT_DIR, "knn.parquet"))

    meta = {
        "n_pairs": N_PAIRS,
        "inverse_err_max_um": float(inv_err.max() * 1e6),
        "azi_validation_err_max_um": float(val_err.max() * 1e6),
        "azi_tol_max_deg": float(azi_tol.max()),
        "midpoint_err_max_um": float(mid_err.max() * 1e6),
        "interp_err_max_um": float(it_err.max() * 1e6),
        "gate_bars": {"distance_m": 2.5e-4, "position_m": 5e-3,
                      "azimuth_deg": "per-row azi_tol_deg"},
        "truth": "tests/truth_geodesic.py mpmath 40-digit exact integrals",
    }
    with open(os.path.join(OUT_DIR, "META.json"), "w") as fh:
        json.dump(meta, fh, indent=2)
    print(json.dumps(meta, indent=2))


if __name__ == "__main__":
    main()
