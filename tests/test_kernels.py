"""Kernel accuracy tests — golden values + metamorphic properties.

Golden constants lifted from the reference's authoritative tests/README
(FIXTURES.md §5; reference tests/test_geodist.py:44-60, README.md:100-110).
Since geographiclib is not installed in-sandbox, the accuracy oracle is
the *independent* Karney-series kernel cross-checked against Vincenty
(replicating reference benchmark.py:204-265).
"""

import numpy as np
import pytest

from geodistpy_spark import kernels as K
from geodistpy_spark.constants import ELLIPSOIDS, resolve_ellipsoid, unit_factor

GOLDEN = [
    ((52.5200, 13.4050), (48.8566, 2.3522), 879699.316),       # Berlin->Paris
    ((90.0, 0.0), (-90.0, 0.0), 20003931.458623),              # pole-to-pole
    ((0.0, 0.0), (0.0, 180.0), 20003931.459),                  # equatorial antipodal
    ((0.5, 0.0), (-0.5, 179.9), 20003008.422),                 # near-antipodal
    ((52.5200, 13.4050), (52.52001, 13.4050), 1.113),          # ~1 m
    ((0.0, 179.9), (0.0, -179.9), 22263.898),                  # cross date line
    ((89.99, 0.0), (89.99, 180.0), 2233.880),                  # high Arctic
    ((-33.8688, 151.2093), (40.7128, -74.0060), 15988007.485), # Sydney->NY
    ((51.5074, -0.1278), (35.6762, 139.6503), 9582151.069),    # London->Tokyo
]


def _pairs():
    p1 = np.array([g[0] for g in GOLDEN])
    p2 = np.array([g[1] for g in GOLDEN])
    exp = np.array([g[2] for g in GOLDEN])
    return p1[:, 0], p1[:, 1], p2[:, 0], p2[:, 1], exp


def _random_pairs(n=5000, seed=100):
    rng = np.random.default_rng(seed)
    return (rng.uniform(-89.9, 89.9, n), rng.uniform(-180, 180, n),
            rng.uniform(-89.9, 89.9, n), rng.uniform(-180, 180, n))


class TestGolden:
    def test_combined_inverse_sub_mm(self):
        la1, lo1, la2, lo2, exp = _pairs()
        s = K.geodesic_inverse(la1, lo1, la2, lo2)
        assert np.all(np.abs(s - exp) < 1e-3), np.abs(s - exp)

    def test_karney_alone_sub_mm(self):
        la1, lo1, la2, lo2, exp = _pairs()
        s = K.karney_inverse(la1, lo1, la2, lo2)
        assert np.all(np.abs(s - exp) < 1e-3)

    def test_vincenty_flags_antipodal_nonconvergence(self):
        la1, lo1, la2, lo2, _ = _pairs()
        _, ok = K.vincenty_inverse(la1, lo1, la2, lo2)
        assert not ok[2] and not ok[3]          # the two antipodal-ish rows
        assert ok[[0, 1, 4, 5, 6, 7, 8]].all()

    def test_coincident_zero(self):
        s = K.geodesic_inverse([10.0], [20.0], [10.0], [20.0])
        assert s[0] == 0.0

    def test_great_circle_error_envelope(self):
        la1, lo1, la2, lo2 = _random_pairs()
        gc = K.great_circle(la1, lo1, la2, lo2)
        exact = K.karney_inverse(la1, lo1, la2, lo2)
        err = np.abs(gc - exact)
        assert err.mean() < 25.0      # reference README.md:92: mean 19.23 m
        assert err.max() < 1000.0     # reference max 462.88 m


class TestCrossValidation:
    """Vincenty and Karney are independent implementations; sub-mm mutual
    agreement replicates the reference's geographiclib accuracy gate
    (mean 9 um / max 0.108 mm, README.md:85-90)."""

    def test_vincenty_vs_karney_5000(self):
        la1, lo1, la2, lo2 = _random_pairs()
        sv, ok = K.vincenty_inverse(la1, lo1, la2, lo2)
        sk = K.karney_inverse(la1, lo1, la2, lo2)
        d = np.abs(sv - sk)[ok]
        assert d.mean() < 5e-5 and d.max() < 1e-3

    def test_azimuth_agreement(self):
        la1, lo1, la2, lo2 = _random_pairs(2000, 7)
        _, a1v, a2v, ok = K.vincenty_inverse(la1, lo1, la2, lo2, full=True)
        _, a1k, a2k = K.karney_inverse(la1, lo1, la2, lo2, full=True)
        d1 = np.abs(((a1v - a1k + 180) % 360) - 180)[ok]
        d2 = np.abs(((a2v - a2k + 180) % 360) - 180)[ok]
        assert d1.max() < 1e-6 and d2.max() < 1e-6


class TestMetamorphic:
    """Property tests mirroring reference tests/test_geodist.py:103-118,
    :616-623, :718-726, :797-804, :824-834."""

    def test_symmetry(self):
        la1, lo1, la2, lo2 = _random_pairs(1000, 1)
        assert np.allclose(K.geodesic_inverse(la1, lo1, la2, lo2),
                           K.geodesic_inverse(la2, lo2, la1, lo1), atol=1e-6)

    def test_triangle_inequality(self):
        rng = np.random.default_rng(2)
        a = rng.uniform(-80, 80, (500, 2)); b = rng.uniform(-80, 80, (500, 2))
        c = rng.uniform(-80, 80, (500, 2))
        ab = K.geodesic_inverse(a[:, 0], a[:, 1], b[:, 0], b[:, 1])
        bc = K.geodesic_inverse(b[:, 0], b[:, 1], c[:, 0], c[:, 1])
        ac = K.geodesic_inverse(a[:, 0], a[:, 1], c[:, 0], c[:, 1])
        assert np.all(ac <= ab + bc + 1e-6)

    def test_inverse_direct_roundtrip(self):
        la1, lo1, la2, lo2 = _random_pairs(1000, 3)
        s, az1, _ = K.geodesic_inverse_full(la1, lo1, la2, lo2)
        la2r, lo2r, _ = K.vincenty_direct(la1, lo1, az1, s)
        err = K.haversine(la2r, lo2r, la2, lo2)
        assert err.max() < 1e-3

    def test_midpoint_equidistant(self):
        la1, lo1, la2, lo2 = _random_pairs(200, 4)
        mla, mlo = K.interpolate_points(la1, lo1, la2, lo2, 1)
        d1 = K.geodesic_inverse(la1, lo1, mla[:, 0], mlo[:, 0])
        d2 = K.geodesic_inverse(mla[:, 0], mlo[:, 0], la2, lo2)
        assert np.allclose(d1, d2, rtol=1e-9, atol=1e-4)

    def test_interpolate_equal_segments(self):
        la1, lo1, la2, lo2 = _random_pairs(50, 5)
        n = 3
        wla, wlo = K.interpolate_points(la1, lo1, la2, lo2, n)
        total = K.geodesic_inverse(la1, lo1, la2, lo2)
        seg0 = K.geodesic_inverse(la1, lo1, wla[:, 0], wlo[:, 0])
        assert np.allclose(seg0, total / (n + 1), rtol=1e-8, atol=1e-4)

    def test_destination_bearing_roundtrip(self):
        la1, lo1, la2, lo2 = _random_pairs(500, 6)
        s, az1, _ = K.geodesic_inverse_full(la1, lo1, la2, lo2)
        dla, dlo, _ = K.vincenty_direct(la1, lo1, az1, s)
        assert np.allclose(dla, la2, atol=1e-7)


class TestContracts:
    def test_ellipsoid_registry(self):
        assert resolve_ellipsoid("WGS-84") == (6378137.0, 1 / 298.257223563)
        assert len(ELLIPSOIDS) == 6
        assert resolve_ellipsoid((6378137.0, 0.0033)) == (6378137.0, 0.0033)
        with pytest.raises(ValueError):
            resolve_ellipsoid("nope")
        with pytest.raises(ValueError):
            resolve_ellipsoid((-1.0, 0.003))
        with pytest.raises(ValueError):
            resolve_ellipsoid((6378137.0, 1.5))

    def test_unit_factors(self):
        assert unit_factor("meter") == 1.0
        assert unit_factor("km") == 1e-3
        assert unit_factor("mile") == 1 / 1609.344
        assert unit_factor("nmi") == 1 / 1852.0
        with pytest.raises(ValueError):
            unit_factor("furlong")

    def test_non_wgs84_ellipsoid(self):
        # GRS-80 differs from WGS-84 by <1 mm on this line but must not error
        s1 = K.geodesic_inverse([52.52], [13.405], [48.8566], [2.3522],
                                *resolve_ellipsoid("GRS-80"))
        s2 = K.geodesic_inverse([52.52], [13.405], [48.8566], [2.3522],
                                *resolve_ellipsoid("Airy (1830)"))
        assert abs(s1[0] - 879699.316) < 0.5
        assert abs(s1[0] - s2[0]) > 1.0  # Airy is measurably different

    def test_lon_normalization_in_direct(self):
        # eastward from near the date line crosses it
        _, lon, _ = K.vincenty_direct([0.0], [179.5], [90.0], [200000.0])
        assert -180.0 <= lon[0] <= 180.0 and lon[0] < 0
