"""Generate fixtures/golden/{span_path,simplify}.parquet — independent
high-precision expected values for the two document-trajectory driver
queries that previously lacked tie-proof value gates:

- span_path: per-document trajectory stats over the ordered geo spans
  of fixtures/documents_interleaved.parquet. The r3 driver gate
  quantized each great-circle leg to integer millimeters on BOTH
  engines and compared the sums — a 1-ulp libm difference between
  Spark's JVM trig and DuckDB's flips half-ties at the .5 mm boundary
  (rows 1396/1396 matched, hash flipped). This golden recomputes each
  leg with mpmath (30 significant digits) through the SAME
  Andoyer-Lambert formula the engine contracts
  (kernels.py great_circle / functions/expressions.py great_circle_m;
  reference semantics geodesic.py:676-767), sums exactly, and the
  driver query now returns within-tolerance BOOLEANS plus
  golden-sourced reference columns — the tie-proof pattern the
  Vincenty golden gates already use (scripts/make_golden.py).

- simplify: the exact Douglas-Peucker kept-set of each document's geo
  trajectory at epsilon_m=10km, computed by an INDEPENDENT scalar
  implementation (pure-python math, recursive split) of the same
  distance-to-segment metric as sources/documents.py simplify_path
  (|cross-track| inside the segment, min endpoint distance when the
  along-track projection falls outside). Kept ids are integers — the
  driver gate compares the sets directly.

Tolerances (span_path): per-leg mm quantization contributes <= 0.5 mm
per leg (docs have <= 8 spans -> <= 7 legs -> <= 3.5 mm), float64
evaluation noise ~um — the path gate uses 0.05 m. net_m is rounded to
whole meters by the operator, so its gate is 0.51 m.

Run: python scripts/make_golden_docs.py   (~1 min; outputs committed)
"""

from __future__ import annotations

import json
import math
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from mpmath import mp, mpf, atan, atan2, tan, sin, cos, sqrt  # noqa: E402

mp.dps = 30

WGS84_A = 6_378_137.0
WGS84_F = 1.0 / 298.257223563
R_MEAN = 6_371_009.0
EPSILON_M = 10_000.0  # driver simplify_path query epsilon

DOCS = os.path.join(_REPO, "fixtures", "documents_interleaved.parquet")
OUT_DIR = os.path.join(_REPO, "fixtures", "golden")

PATH_TOL_M = 0.05
NET_TOL_M = 0.51


def al_great_circle(lat1, lon1, lat2, lon2) -> mpf:
    """Andoyer-Lambert great circle, exact real arithmetic (mpmath).

    Mirrors the engine formula symbol-for-symbol (expressions.py
    great_circle_m) so the golden gates the FORMULA's value, with float
    evaluation noise absorbed by the gate tolerance.
    """
    f = mpf(1) / mpf("298.257223563")
    a = mpf(6378137)
    deg = mp.pi / 180
    p1, l1, p2, l2 = (mpf(repr(v)) * deg for v in (lat1, lon1, lat2, lon2))
    b1 = atan((1 - f) * tan(p1))
    b2 = atan((1 - f) * tan(p2))
    dl = l2 - l1
    y = sqrt((cos(b2) * sin(dl)) ** 2
             + (cos(b1) * sin(b2) - sin(b1) * cos(b2) * cos(dl)) ** 2)
    x = sin(b1) * sin(b2) + cos(b1) * cos(b2) * cos(dl)
    sigma = atan2(y, x)
    sin_sigma = sin(sigma)
    sp2 = sin((b1 + b2) / 2) ** 2
    sq2 = sin((b2 - b1) / 2) ** 2
    cp2 = 1 - sp2
    cq2 = 1 - sq2
    ch2 = cos(sigma / 2) ** 2
    sh2 = sin(sigma / 2) ** 2
    X = (sigma - sin_sigma) * sp2 * cq2 / ch2 if ch2 > 0 else mpf(0)
    Y = (sigma + sin_sigma) * cp2 * sq2 / sh2 if sh2 > 0 else mpf(0)
    return a * (sigma - (f / 2) * (X + Y))


# ---------------------------------------------------------------------------
# independent scalar Douglas-Peucker (pure python math)
# ---------------------------------------------------------------------------

def _hav(p1, l1, p2, l2):
    h = (math.sin((p2 - p1) / 2) ** 2
         + math.cos(p1) * math.cos(p2) * math.sin((l2 - l1) / 2) ** 2)
    return 2 * math.asin(math.sqrt(min(max(h, 0.0), 1.0)))


def _brg(p1, l1, p2, l2):
    dl = l2 - l1
    return math.atan2(math.sin(dl) * math.cos(p2),
                      math.cos(p1) * math.sin(p2)
                      - math.sin(p1) * math.cos(p2) * math.cos(dl))


def seg_dist_m(la1, lo1, la2, lo2, la, lo):
    """Great-circle distance point -> SEGMENT 1->2, meters (same metric
    as simplify_path._xtrack, scalar)."""
    p1, l1 = math.radians(la1), math.radians(lo1)
    p2, l2 = math.radians(la2), math.radians(lo2)
    p, l = math.radians(la), math.radians(lo)
    d13 = _hav(p1, l1, p, l)
    d12 = _hav(p1, l1, p2, l2)
    if d12 < 1e-12:
        return d13 * R_MEAN
    dt = _brg(p1, l1, p, l) - _brg(p1, l1, p2, l2)
    xt = abs(math.asin(min(max(math.sin(d13) * math.sin(dt), -1.0), 1.0)))
    at = math.atan2(math.sin(d13) * math.cos(dt), math.cos(d13))
    if at < 0:
        return d13 * R_MEAN
    if at > d12:
        return _hav(p2, l2, p, l) * R_MEAN
    return xt * R_MEAN


def douglas_peucker(coords, epsilon_m):
    """coords: list of (lat, lon); returns kept index set (recursive
    scalar split — deliberately different code shape from the engine's
    numpy stack loop; identical decisions => identical kept set)."""
    n = len(coords)
    keep = {0, n - 1}
    if n <= 2:
        return keep

    def rec(i, j):
        if j - i < 2:
            return
        best_d, best_k = -1.0, -1
        for k in range(i + 1, j):
            d = seg_dist_m(coords[i][0], coords[i][1],
                           coords[j][0], coords[j][1],
                           coords[k][0], coords[k][1])
            if d > best_d:  # strict >: first max wins (np.argmax parity)
                best_d, best_k = d, k
        if best_d > epsilon_m:
            keep.add(best_k)
            rec(i, best_k)
            rec(best_k, j)

    rec(0, n - 1)
    return keep


def valid_geo(span):
    """Mirror extract_geo_spans: kind='geo', payload 'lat,lon' parses to
    in-range doubles."""
    if span["kind"] != "geo" or span["text"] is None:
        return None
    parts = span["text"].split(",")
    if len(parts) < 2:
        return None
    try:
        lat, lon = float(parts[0]), float(parts[1])
    except ValueError:
        return None
    if not (-90.0 <= lat <= 90.0 and -180.0 <= lon <= 180.0):
        return None
    return lat, lon


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    tbl = pq.read_table(DOCS)
    docs = tbl.to_pylist()

    sp_rows = {"doc_id": [], "n_points": [], "path_m": [], "net_m": []}
    dp_rows = {"doc_id": [], "span_idx": []}
    n_legs = 0
    for doc in docs:
        pts = []  # (span_idx, lat, lon)
        for idx, span in enumerate(doc["spans"] or []):
            g = valid_geo(span)
            if g is not None:
                pts.append((idx, g[0], g[1]))
        if not pts:
            continue
        # --- span_path golden -------------------------------------------
        path = mpf(0)
        for (_, la1, lo1), (_, la2, lo2) in zip(pts, pts[1:]):
            path += al_great_circle(la1, lo1, la2, lo2)
            n_legs += 1
        net = al_great_circle(pts[0][1], pts[0][2], pts[-1][1], pts[-1][2])
        sp_rows["doc_id"].append(doc["doc_id"])
        sp_rows["n_points"].append(len(pts))
        sp_rows["path_m"].append(float(path))
        sp_rows["net_m"].append(float(net))
        # --- simplify golden --------------------------------------------
        kept = douglas_peucker([(la, lo) for _, la, lo in pts], EPSILON_M)
        for k in sorted(kept):
            dp_rows["doc_id"].append(doc["doc_id"])
            dp_rows["span_idx"].append(pts[k][0])

    pq.write_table(pa.table({
        "doc_id": pa.array(sp_rows["doc_id"], pa.string()),
        "n_points": pa.array(sp_rows["n_points"], pa.int64()),
        "path_m": pa.array(sp_rows["path_m"], pa.float64()),
        "net_m": pa.array(sp_rows["net_m"], pa.float64()),
    }), os.path.join(OUT_DIR, "span_path.parquet"))
    pq.write_table(pa.table({
        "doc_id": pa.array(dp_rows["doc_id"], pa.string()),
        "span_idx": pa.array(dp_rows["span_idx"], pa.int64()),
    }), os.path.join(OUT_DIR, "simplify.parquet"))

    meta = {
        "docs_with_geo": len(sp_rows["doc_id"]),
        "n_legs": n_legs,
        "simplify_kept_rows": len(dp_rows["doc_id"]),
        "simplify_epsilon_m": EPSILON_M,
        "path_tol_m": PATH_TOL_M,
        "net_tol_m": NET_TOL_M,
        "truth": "mpmath dps=30 Andoyer-Lambert (span_path); scalar "
                 "recursive DP with segment-clamped spherical distance "
                 "(simplify)",
    }
    with open(os.path.join(OUT_DIR, "META_docs.json"), "w") as fh:
        json.dump(meta, fh, indent=2)
    print(json.dumps(meta, indent=2))


if __name__ == "__main__":
    main()
