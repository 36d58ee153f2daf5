"""Generate fixtures/golden/inverse_grs80.parquet — mpmath truth
distances for the driver pair points on the GRS-80 ellipsoid.

Round-4 verdict gap #3: every Vincenty driver row bakes WGS-84 into its
closure, so the ellipsoid registry (constants.resolve_ellipsoid) had no
end-to-end CORRECTNESS row. This golden table lets vincenty_pairs carry
a second (ref80_m, ok80) column pair computed via
``geodist(..., ellipsoid='GRS-80')`` — a regression in the registry or
in the (a, f) plumbing flips ok80 and fails the hash gate.

Truth source: tests/truth_geodesic.py exact elliptic integrals with
(a, f) = constants.ELLIPSOIDS['GRS-80'] — same arbiter as
make_golden.py, different ellipsoid.

Run: python scripts/make_golden_grs80.py   (~2 min on 30 procs;
output is committed)
"""

from __future__ import annotations

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
from geodistpy_spark.constants import ELLIPSOIDS  # noqa: E402
from make_golden import N_PAIRS, OUT_DIR, pts  # noqa: E402

A80, F80 = ELLIPSOIDS["GRS-80"]


def _inv80(args):
    from truth_geodesic import geodesic_inverse_truth
    return geodesic_inverse_truth(*args, a=A80, f=F80)


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    ids = np.arange(N_PAIRS, dtype=np.int64)
    lat1, lon1, lat2, lon2 = pts(ids)

    print(f"mpmath GRS-80 inverse x {N_PAIRS} ...", flush=True)
    with Pool(30) as p:
        s_truth = np.array(p.map(_inv80, list(zip(lat1, lon1, lat2, lon2)),
                                 chunksize=4))

    s_kern = K.geodesic_inverse(lat1, lon1, lat2, lon2, a=A80, f=F80)
    err = np.abs(s_kern - s_truth)
    print(f"kernel |s - truth| on GRS-80: mean {err.mean()*1e6:.1f} um, "
          f"max {err.max()*1e6:.1f} um")
    assert err.max() <= 1.5e-4, "GRS-80 kernel distance drifted past 0.15 mm"

    # sanity: GRS-80 and WGS-84 flattenings differ in the 10th digit, so
    # distances differ by O(mm) at most — but they MUST differ (an
    # ellipsoid-plumbing bug that silently ignores (a, f) would make
    # them identical)
    s_wgs = K.geodesic_inverse(lat1, lon1, lat2, lon2)
    assert np.any(np.abs(s_wgs - s_kern) > 0), "GRS-80 == WGS-84 everywhere?"

    pq.write_table(pa.table({"id": ids, "s_m": s_truth}),
                   os.path.join(OUT_DIR, "inverse_grs80.parquet"))
    print("wrote", os.path.join(OUT_DIR, "inverse_grs80.parquet"))


if __name__ == "__main__":
    main()
