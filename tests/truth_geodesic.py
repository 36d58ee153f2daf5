"""High-precision geodesic-inverse ground truth (test-only; mpmath).

Solves the inverse problem with EXACT elliptic integrands evaluated by
mpmath.quad at 40 significant digits, bisecting on alpha1 at full
precision. No series truncation, no float64 cancellation — this is the
arbiter for the production kernels' accuracy claims (replaces
geographiclib, which is absent in this environment; the reference uses
it as its oracle in geodistpy benchmark.py).

Formulation: auxiliary-sphere reduction for an ellipsoid of revolution
(public derivation — Karney, "Algorithms for geodesics", J. Geodesy 2013,
eqs. 5-8 in their exact integral form, NOT the truncated series):

    beta   = atan((1-f) tan(phi))           reduced latitude
    sin(alpha0) = sin(alpha1) cos(beta1)    Clairaut constant
    sigma_i = atan2(sin(beta_i), cos(alpha_i) cos(beta_i))
    omega_i = atan2(sin(alpha0) sin(sigma_i), cos(sigma_i))
    s   = b * int_{sigma1}^{sigma2} sqrt(1 + k^2 sin^2 t) dt,  k = e' cos(alpha0)
    lam = omega12 - f sin(alpha0) * int_{sigma1}^{sigma2}
              (2 - f) / (1 + (1-f) sqrt(1 + k^2 sin^2 t)) dt

The same canonicalization as the production kernel (swap so |beta1| >=
|beta2|, beta1 <= 0, lam12 in [0, pi]) keeps the alpha1 root in (0, pi)
and lam12(alpha1) monotone decreasing in the canonical frame.
"""

from __future__ import annotations

import mpmath as mp

from geodistpy_spark.constants import WGS84_A, WGS84_F

mp.mp.dps = 40


def _lam_s_for_alpha1(alp1, bet1, bet2, f, ep2):
    """Exact (lam12, s) for trial alpha1 in the canonical frame."""
    sbet1, cbet1 = mp.sin(bet1), mp.cos(bet1)
    sbet2, cbet2 = mp.sin(bet2), mp.cos(bet2)
    salp1, calp1 = mp.sin(alp1), mp.cos(alp1)

    salp0 = salp1 * cbet1
    calp0 = mp.sqrt(calp1 ** 2 + (salp1 * sbet1) ** 2)

    sig1 = mp.atan2(sbet1, calp1 * cbet1)
    omg1 = mp.atan2(salp0 * mp.sin(sig1), mp.cos(sig1))

    # alpha2 with the canonical positive-cos branch (beta2 in [beta1,-beta1])
    if cbet2 == 0:
        salp2, calp2 = salp1, abs(calp1)
    else:
        salp2 = salp0 / cbet2
        t = (cbet2 - cbet1) * (cbet1 + cbet2) if cbet1 < cbet2 else (sbet1 - sbet2) * (sbet1 + sbet2)
        under = (calp1 * cbet1) ** 2 + t
        calp2 = mp.sqrt(under if under > 0 else mp.mpf(0)) / cbet2
    sig2 = mp.atan2(sbet2, calp2 * cbet2)
    omg2 = mp.atan2(salp0 * mp.sin(sig2), mp.cos(sig2))

    sig12 = (sig2 - sig1) % (2 * mp.pi)
    omg12 = (omg2 - omg1) % (2 * mp.pi)

    k2 = calp0 ** 2 * ep2
    b = (1 - f)

    def ds(t):
        return mp.sqrt(1 + k2 * mp.sin(t) ** 2)

    def dlam(t):
        return (2 - f) / (1 + (1 - f) * mp.sqrt(1 + k2 * mp.sin(t) ** 2))

    s_unit = b * mp.quad(ds, [sig1, sig1 + sig12])
    i3 = mp.quad(dlam, [sig1, sig1 + sig12])
    lam12 = omg12 - f * salp0 * i3
    return lam12, s_unit


def geodesic_direct_truth(lat1, lon1, az1_deg, s_m,
                          a: float = WGS84_A, f: float = WGS84_F):
    """Exact direct problem: (lat2, lon2) in degrees, ~30 correct digits
    internally. Same exact-integral formulation as the inverse:
    arc-length root-find on sigma2, then the auxiliary-sphere relations
    sin(beta) = cos(alpha0) sin(sigma), tan(omega) = sin(alpha0) tan(sigma)
    (continuity handled via |omega - sigma| <= pi/2).
    """
    fm = mp.mpf(f)
    a_m = mp.mpf(a)
    b = 1 - fm
    ep2 = (1 / b) ** 2 - 1

    phi1 = mp.radians(mp.mpf(lat1))
    alp1 = mp.radians(mp.mpf(az1_deg))
    bet1 = mp.atan(b * mp.tan(phi1))
    sbet1, cbet1 = mp.sin(bet1), mp.cos(bet1)
    salp1, calp1 = mp.sin(alp1), mp.cos(alp1)

    salp0 = salp1 * cbet1
    calp0 = mp.sqrt(calp1 ** 2 + (salp1 * sbet1) ** 2)
    k2 = calp0 ** 2 * ep2

    sig1 = mp.atan2(sbet1, calp1 * cbet1)

    def ds(t):
        return mp.sqrt(1 + k2 * mp.sin(t) ** 2)

    def dlam(t):
        return (2 - fm) / (1 + (1 - fm) * mp.sqrt(1 + k2 * mp.sin(t) ** 2))

    target = mp.mpf(s_m) / (a_m * b)  # arc in integrand units
    lo, hi = sig1, sig1 + mp.pi + mp.mpf("0.1")
    # expand hi until the arc exceeds target (s_m <= half circumference+)
    while mp.quad(ds, [sig1, hi]) < target:
        hi += mp.pi
    for _ in range(130):
        mid = (lo + hi) / 2
        if mp.quad(ds, [sig1, mid]) < target:
            lo = mid
        else:
            hi = mid
    sig2 = (lo + hi) / 2

    def omega_true(sig):
        w = mp.atan2(salp0 * mp.sin(sig), mp.cos(sig))
        d = w - sig
        d = (d + mp.pi) % (2 * mp.pi) - mp.pi  # |omega - sigma| <= pi/2
        return sig + d

    sbet2 = calp0 * mp.sin(sig2)
    # cos(beta2) from the alpha2 relation (always >= 0)
    calp2_cbet2 = calp0 * mp.cos(sig2)
    cbet2 = mp.sqrt(salp0 ** 2 + calp2_cbet2 ** 2)
    bet2 = mp.atan2(sbet2, cbet2)
    lat2 = mp.degrees(mp.atan(mp.tan(bet2) / b))

    dome = omega_true(sig2) - omega_true(sig1)
    i3 = mp.quad(dlam, [sig1, sig2])
    lam12 = dome - fm * salp0 * i3
    lon2 = mp.mpf(lon1) + mp.degrees(lam12)
    lon2 = (lon2 + 180) % 360 - 180
    return float(lat2), float(lon2)


def geodesic_inverse_truth(lat1, lon1, lat2, lon2,
                           a: float = WGS84_A, f: float = WGS84_F) -> float:
    """Exact geodesic distance in meters (float return, ~30 correct digits
    internally). Slow (seconds per pair) — golden-fixture generation only.
    """
    a_m = mp.mpf(a)
    fm = mp.mpf(f)
    ep2 = ((1 / (1 - fm)) ** 2 - 1)

    phi1, phi2 = mp.radians(mp.mpf(lat1)), mp.radians(mp.mpf(lat2))
    dlon = mp.radians(mp.mpf(lon2) - mp.mpf(lon1))
    lam12 = mp.atan2(mp.sin(dlon), mp.cos(dlon))  # wrap to (-pi, pi]
    lam12 = abs(lam12)

    bet1 = mp.atan((1 - fm) * mp.tan(phi1))
    bet2 = mp.atan((1 - fm) * mp.tan(phi2))
    if abs(bet1) < abs(bet2):
        bet1, bet2 = bet2, bet1
    if bet1 > 0:
        bet1, bet2 = -bet1, -bet2

    # specials where the alpha1 parametrization degenerates
    if lam12 == 0 and bet1 == bet2:
        return 0.0
    if bet1 == 0 and bet2 == 0 and lam12 <= (1 - fm) * mp.pi:
        return float(a_m * lam12)  # equatorial segment is the geodesic
    if lam12 == 0 or mp.cos(bet1) == 0:
        # meridional arc (or pole start): integrate with alpha0 = 0
        def dsm(t):
            return mp.sqrt(1 + ep2 * mp.sin(t) ** 2)
        s = (1 - fm) * mp.quad(dsm, [bet1, bet2])
        return float(a_m * abs(s))

    # lam12(alpha1) is monotone increasing on (0, pi) in this frame
    lo, hi = mp.mpf("1e-30"), mp.pi - mp.mpf("1e-30")
    for _ in range(140):
        mid = (lo + hi) / 2
        lam_t, _ = _lam_s_for_alpha1(mid, bet1, bet2, fm, ep2)
        if lam_t < lam12:
            lo = mid
        else:
            hi = mid
    alp1 = (lo + hi) / 2
    _, s_unit = _lam_s_for_alpha1(alp1, bet1, bet2, fm, ep2)
    return float(a_m * s_unit)
