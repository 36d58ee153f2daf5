"""Hypothesis property tests for the numerical kernels (fast, no Spark).

Extends the reference's hand-written metamorphic suite
(tests/test_geodist.py:103-118) with generated inputs.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from geodistpy_spark import grid as G
from geodistpy_spark import kernels as K

lat = st.floats(min_value=-89.99, max_value=89.99, allow_nan=False)
lon = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)


@settings(max_examples=150, deadline=None)
@given(lat, lon, lat, lon)
def test_symmetry_and_nonnegativity(la1, lo1, la2, lo2):
    d1 = K.geodesic_inverse([la1], [lo1], [la2], [lo2])[0]
    d2 = K.geodesic_inverse([la2], [lo2], [la1], [lo1])[0]
    assert d1 >= 0.0
    assert abs(d1 - d2) < 1e-3
    # no geodesic exceeds half the longest meridian circumference + slack
    assert d1 <= 20_038_000.0


@settings(max_examples=150, deadline=None)
@given(lat, lon, lat, lon)
def test_vincenty_karney_agree_or_flagged(la1, lo1, la2, lo2):
    s_v, ok = K.vincenty_inverse([la1], [lo1], [la2], [lo2])
    s_k = K.karney_inverse([la1], [lo1], [la2], [lo2])
    if ok[0]:
        # 0.25 mm (sub-mm bar): Karney is sub-um vs the mpmath exact-
        # integral truth (test_kernels.py goldens), so the residual here
        # is Vincenty's own converged error (~80 um max over 200k random
        # pairs, ~17 um in the near-equatorial near-antipodal regime)
        assert abs(s_v[0] - s_k[0]) < 2.5e-4


@settings(max_examples=100, deadline=None)
@given(st.floats(min_value=-1e-3, max_value=1e-3),
       lon,
       st.floats(min_value=-1e-3, max_value=1e-3),
       st.floats(min_value=178.5, max_value=179.5))
def test_vincenty_karney_near_equatorial_antipodal(la1, lo1, la2, dlon):
    # adversarial regime from round 1: tiny |lat|, dlon near pi — the
    # alpha1-quantization zone fixed by the lambda-space secant step
    lo2 = ((lo1 + dlon + 180.0) % 360.0) - 180.0
    s_v, ok = K.vincenty_inverse([la1], [lo1], [la2], [lo2])
    s_k = K.karney_inverse([la1], [lo1], [la2], [lo2])
    if ok[0]:
        assert abs(s_v[0] - s_k[0]) < 2.5e-4


def test_karney_near_equatorial_degenerate_regression():
    # regression: subnormal/zero-mix latitudes used to collapse sigma to 0
    s_v, ok = K.vincenty_inverse([2.225073858507e-311], [0.0], [0.0], [1.0])
    s_k = K.karney_inverse([2.225073858507e-311], [0.0], [0.0], [1.0])
    assert ok[0] and abs(s_v[0] - s_k[0]) < 1e-4


@settings(max_examples=100, deadline=None)
@given(lat, lon, st.floats(min_value=0.0, max_value=359.999),
       st.floats(min_value=0.0, max_value=19_000_000.0))
def test_direct_output_in_range(la1, lo1, az, dist):
    la2, lo2, az2 = K.vincenty_direct([la1], [lo1], [az], [dist])
    assert -90.0 <= la2[0] <= 90.0
    assert -180.0 <= lo2[0] <= 180.0
    assert 0.0 <= az2[0] < 360.0


@settings(max_examples=150, deadline=None)
@given(lat, lon, st.floats(min_value=0.0, max_value=360.0),
       st.floats(min_value=0.0, max_value=20_003_000.0))
def test_direct_inverse_roundtrip_extreme(la1, lo1, az, dist):
    # extreme (azimuth, distance) incl. near-antipodal: direct -> inverse
    # must recover the distance sub-mm (exercises the sigma-iteration
    # sentinel + bisection rescue; reference contract geodesic.py:643-644)
    la2, lo2, _ = K.vincenty_direct([la1], [lo1], [az], [dist])
    s = K.geodesic_inverse([la1], [lo1], la2, lo2)
    # the inverse returns the SHORTEST geodesic. Past the cut locus
    # (azimuth-dependent, between ~19.97e6 m equatorial and ~20.004e6 m
    # meridional) the forward distance exceeds the shortest, so there
    # only the upper bound is provable; below it demand sub-mm equality
    assert s[0] <= dist + 1e-3
    if dist < 19_900_000.0:
        assert abs(s[0] - dist) < 1e-3


@settings(max_examples=100, deadline=None)
@given(lat, lon, st.integers(min_value=0, max_value=20))
def test_cell_id_in_range_and_parent_consistent(la, lo, res):
    c = G.cell_id(la, lo, res)
    assert 0 <= c < (1 << (2 * res))
    if res > 0:
        assert G.parent_cell(c, res, res - 1) == G.cell_id(la, lo, res - 1)


@settings(max_examples=60, deadline=None)
@given(lat, lon, st.floats(min_value=10.0, max_value=5e6))
def test_cover_contains_disk_samples(la, lo, radius):
    res, cover = G.cell_cover(la, lo, radius)
    cover_set = set(cover)
    rng = np.random.default_rng(int(abs(la * 1000) + abs(lo * 10)) + 1)
    az = rng.uniform(0, 360, 24)
    frac = rng.uniform(0, 1, 24)
    pla, plo, _ = K.vincenty_direct(np.full(24, la), np.full(24, lo), az, radius * frac)
    cids = G.cell_id_np(pla, plo, res)
    d = K.geodesic_inverse(np.full(24, la), np.full(24, lo), pla, plo)
    inside = d <= radius
    assert all(c in cover_set for c in cids[inside])


@settings(max_examples=100, deadline=None)
@given(lat, lon, lat, lon)
def test_great_circle_close_to_exact(la1, lo1, la2, lo2):
    gc = K.great_circle([la1], [lo1], [la2], [lo2])[0]
    exact = K.karney_inverse([la1], [lo1], [la2], [lo2])[0]
    # Lambert is ~<1 km away from exact except near antipodes, where the
    # first-order-in-f correction degrades; at EXACT antipodes the
    # spherical central angle itself is ~34 km off the true geodesic
    # (inherent to the fast-approximate formula; the reference's own
    # greatcircle shares this, geodesic.py:676-767)
    bound = 1500.0 if exact < 19_500_000.0 else 40_000.0
    assert abs(gc - exact) < bound
