"""Hierarchical lat/lon quad-grid cell index (H3/S2 stand-in).

No h3/s2 wheels exist in this environment, so the engine implements a
hierarchical equirectangular quad-grid natively (SURVEY.md §2.4):

- resolution ``r`` divides the globe into ``2^r × 2^r`` cells
  (lon ∈ [-180, 180) wrapping, lat ∈ [-90, 90] clamped),
- ``cell_id = y * 2^r + x`` as a 64-bit integer — *plain integer math*,
  identically computable as a Spark Column expression, in ANSI SQL
  (DuckDB oracle), and in numpy,
- parent cell at ``r-1`` is ``(y >> 1) * 2^(r-1) + (x >> 1)``,
- neighbor enumeration wraps in x (antimeridian) and clamps in y
  (polar caps).

Driver-side generators (:func:`cell_cover`, :func:`k_ring`) produce the
small cell-id sets that get broadcast into joins; they only ever touch
cell ids, never data rows. Cover conservativeness (every point within
``radius_m`` geodesic meters of the center lands in a covered cell) is
what makes the cell-prefilter + exact-refine join strategy *exact*
(reference punts at >100k candidates: docs/spatial-queries.md:286-289).
"""

from __future__ import annotations

import math

import numpy as np

MAX_RES = 25

# conservative meters-per-degree bounds on WGS-84:
# meridian arc per degree ranges ~110,574 (equator) .. ~111,694 (pole);
# using the MINIMUM means we never under-estimate the degree-span of a
# geodesic radius.
MIN_M_PER_DEG_LAT = 110_567.0
# equatorial meters per degree of longitude (a * pi / 180)
M_PER_DEG_LON_EQ = 111_319.49079327358


def nx(res: int) -> int:
    return 1 << res


def cell_xy(lat: float, lon: float, res: int) -> tuple[int, int]:
    """(x, y) cell coordinates of a point; lon wraps, lat clamps."""
    n = nx(res)
    x = int(math.floor(((lon + 180.0) % 360.0) / 360.0 * n))
    x = min(max(x, 0), n - 1)
    y = int(math.floor((lat + 90.0) / 180.0 * n))
    y = min(max(y, 0), n - 1)
    return x, y


def cell_id(lat: float, lon: float, res: int) -> int:
    x, y = cell_xy(lat, lon, res)
    return y * nx(res) + x


def cell_id_np(lat, lon, res: int) -> np.ndarray:
    """Vectorized cell ids (numpy) — same math as the Column expression,
    including its non-finite contract: NaN/±Inf coordinates yield -1
    (the numpy stand-in for the Column's NULL — np.clip(NaN) would
    otherwise floor/clip into a garbage-but-valid cell id, making the
    two API surfaces disagree on the same bad input)."""
    n = nx(res)
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    with np.errstate(invalid="ignore"):
        x = np.floor(np.mod(lon + 180.0, 360.0) / 360.0 * n)
        x = np.clip(x, 0, n - 1).astype(np.int64)
        y = np.floor((lat + 90.0) / 180.0 * n)
        y = np.clip(y, 0, n - 1).astype(np.int64)
    cells = y * n + x
    bad = ~(np.isfinite(lat) & np.isfinite(lon))
    if bad.any():
        cells = np.where(bad, np.int64(-1), cells)
    return cells


def parent_cell(cell: int, res: int, parent_res: int) -> int:
    """Cell id of the ancestor at a coarser resolution."""
    n = nx(res)
    y, x = divmod(cell, n)
    shift = res - parent_res
    return (y >> shift) * nx(parent_res) + (x >> shift)


def cell_bounds(cell: int, res: int) -> tuple[float, float, float, float]:
    """(lat_min, lat_max, lon_min, lon_max) of a cell."""
    n = nx(res)
    y, x = divmod(cell, n)
    lat_min = -90.0 + 180.0 * y / n
    lat_max = -90.0 + 180.0 * (y + 1) / n
    lon_min = -180.0 + 360.0 * x / n
    lon_max = -180.0 + 360.0 * (x + 1) / n
    return lat_min, lat_max, lon_min, lon_max


def cell_center(cell: int, res: int) -> tuple[float, float]:
    la0, la1, lo0, lo1 = cell_bounds(cell, res)
    return (la0 + la1) / 2.0, (lo0 + lo1) / 2.0


def compact_cells(cells, res: int, min_res: int = 0) -> list[tuple[int, int]]:
    """H3-``compact`` analog: replace every COMPLETE group of 4 sibling
    cells by its parent, recursively up to ``min_res``. Input: uniform
    ``res`` cell ids; output: sorted (res', cell') pairs, res' in
    [min_res, res] — the minimal mixed-resolution set covering exactly
    the same area. Lossless: :func:`uncompact_cells` inverts it.

    Driver-side (covers are small by construction); the distributed
    twin for corpus-scale cell relations is
    ``operators.indexing.compact_cell_set``.
    """
    out: list[tuple[int, int]] = []
    cur = set(int(c) for c in cells)
    r = res
    while r > min_res and cur:
        n = nx(r)
        pn = nx(r - 1)
        groups: dict[int, int] = {}
        for c in cur:
            y, x = divmod(c, n)
            p = (y >> 1) * pn + (x >> 1)
            groups[p] = groups.get(p, 0) + 1
        full = {p for p, cnt in groups.items() if cnt == 4}
        for c in cur:
            y, x = divmod(c, n)
            if (y >> 1) * pn + (x >> 1) not in full:
                out.append((r, c))
        cur = full
        r -= 1
    out.extend((r, c) for c in cur)
    return sorted(out)


def uncompact_cells(mixed, res: int) -> list[int]:
    """Inverse of :func:`compact_cells`: expand (res', cell') pairs to
    the uniform ``res`` cell set (res' <= res required)."""
    out: set[int] = set()
    for r, c in mixed:
        if r > res:
            raise ValueError(f"cell at res {r} finer than target {res}")
        shift = res - r
        n = nx(r)
        tn = nx(res)
        y, x = divmod(int(c), n)
        for dy in range(1 << shift):
            for dx in range(1 << shift):
                out.add(((y << shift) + dy) * tn + (x << shift) + dx)
    return sorted(out)


def k_ring(lat: float, lon: float, res: int, k: int) -> list[int]:
    """Cell ids within Chebyshev distance k of the point's cell.

    x wraps across the antimeridian; y clamps at the poles (rows past a
    pole don't exist — polar coverage is handled by the cover radius
    math which switches to full rows near the poles).
    """
    n = nx(res)
    cx, cy = cell_xy(lat, lon, res)
    out = []
    for dy in range(-k, k + 1):
        y = cy + dy
        if y < 0 or y >= n:
            continue
        for dx in range(-k, k + 1):
            x = (cx + dx) % n
            out.append(y * n + x)
    return sorted(set(out))


def pick_resolution(radius_m: float, max_cover: int = 512) -> int:
    """Resolution whose cell height is ~ the search radius.

    Cell height in meters ≈ 2.0e7 / 2^r (half meridian / 2^r). Choosing
    cell ≈ radius keeps covers at ~3x3 cells away from the poles.
    """
    if radius_m <= 0:
        return MAX_RES
    r = int(math.floor(math.log2(2.0e7 / radius_m)))
    return min(max(r, 0), MAX_RES)


# Smallest radius of curvature anywhere on WGS-84 is the meridional radius
# at the equator, ~6,335,439 m. A geodesic of length d therefore subtends a
# haversine-style central angle (on geodetic lat/lon treated as spherical)
# of at most ~d / 6.33e6 rad; using this UNDER-estimate of the radius makes
# the cap angle an over-estimate, i.e. the cover conservative.
MIN_CURVATURE_RADIUS_M = 6_330_000.0


def polar_cap_cells(lat: float, lon: float, sigma: float, res: int,
                    y_lo: int, y_hi: int) -> list[int]:
    """Cells of a pole-containing spherical cap with PER-ROW longitude
    spans: inside a pole-cap the boundary's longitude half-width grows
    monotonically toward the pole (full circle past
    phi_full = pi - |lat| - sigma), so the row edge NEAREST the pole
    bounds the whole row — conservative. Round-1 emitted all 2^res
    longitudes for EVERY row (16k cells for 1 km at lat 89.99, res 14).
    South caps are handled by mirroring latitudes; a cap containing both
    poles is the whole band.
    """
    n = nx(res)
    sigma_deg = math.degrees(sigma)
    if (sigma_deg - abs(lat)) >= 90.0:  # both poles: full band
        return [y * n + x for y in range(y_lo, y_hi + 1) for x in range(n)]
    north = lat >= 0.0
    alat = abs(math.radians(lat))
    phi_full = math.pi - alat - sigma  # full-circle latitude (mirrored frame)
    cells: list[int] = []
    for y in range(y_lo, y_hi + 1):
        # row's pole-nearest edge, mirrored into the north frame
        if north:
            edge = -90.0 + 180.0 * (y + 1) / n
        else:
            edge = -(-90.0 + 180.0 * y / n)
        phi_e = math.radians(min(max(edge, -90.0), 90.0))
        if phi_e >= phi_full:
            span = n
            lo_x = 0
        else:
            num = math.cos(sigma) - math.sin(phi_e) * math.sin(alat)
            c = num / max(math.cos(phi_e) * math.cos(alat), 1e-300)
            dl = math.degrees(math.acos(min(max(c, -1.0), 1.0)))
            span = min(int(math.ceil(2.0 * dl / (360.0 / n))) + 2, n)
            lo_x = int(math.floor(((lon - dl + 180.0) % 360.0) / 360.0 * n))
        cells.extend(y * n + ((lo_x + i) % n) for i in range(span))
    return sorted(set(cells))


def cell_cover(lat: float, lon: float, radius_m: float, res: int | None = None,
               margin: float = 1.002, max_cover: int = 2048) -> tuple[int, list[int]]:
    """Conservative disk cover: every point whose geodesic distance to
    (lat, lon) is <= radius_m lies in one of the returned cells.

    Returns ``(res, cell_ids)``. Uses the standard spherical-cap bounding
    box: lat band ±σ, lon half-width asin(sin σ / cos lat) when no pole is
    inside the cap, full rows otherwise — with σ = radius over the
    *minimum* curvature radius of the ellipsoid (over-estimates the cap,
    never under). Verified empirically against brute-force geodesic
    distances in tests (tests/test_grid.py).

    When ``res`` is not forced by the caller, the resolution is coarsened
    until the cover fits in ``max_cover`` cells — a small polar cap
    otherwise degenerates to full 2^res-wide longitude rows (e.g. 1 km at
    lat 89.99 was ~16k cells at res 14), which would bloat the pushed-down
    IN predicate. Coarser cells keep the cover conservative; the exact
    refine absorbs the extra candidates.
    """
    auto = res is None
    if auto:
        res = pick_resolution(radius_m)

    while True:
        n = nx(res)
        sigma = min(radius_m * margin / MIN_CURVATURE_RADIUS_M, math.pi)
        sigma_deg = math.degrees(sigma)

        lat_lo = max(lat - sigma_deg, -90.0)
        lat_hi = min(lat + sigma_deg, 90.0)
        y_lo = int(math.floor((lat_lo + 90.0) / 180.0 * n))
        y_hi = int(math.floor((lat_hi + 90.0 - 1e-12) / 180.0 * n))
        y_lo = min(max(y_lo, 0), n - 1)
        y_hi = min(max(y_hi, 0), n - 1)
        rows = y_hi - y_lo + 1

        pole_in_cap = (abs(lat) + sigma_deg) >= 90.0
        if pole_in_cap:
            cells = polar_cap_cells(lat, lon, sigma, res, y_lo, y_hi)
            if auto and res > 0 and len(cells) > max_cover:
                res -= 1
                continue
            return res, cells
        else:
            sin_ratio = math.sin(sigma) / max(math.cos(math.radians(lat)), 1e-15)
            dlam_deg = math.degrees(math.asin(min(sin_ratio, 1.0)))
            cell_w = 360.0 / n
            span = min(int(math.ceil(2.0 * dlam_deg / cell_w)) + 2, n)
            lo_x = int(math.floor(((lon - dlam_deg + 180.0) % 360.0) / 360.0 * n))

        if auto and res > 0 and rows * span > max_cover:
            res -= 1
            continue

        cells: list[int] = []
        for y in range(y_lo, y_hi + 1):
            cells.extend(y * n + ((lo_x + i) % n) for i in range(span))
        return res, sorted(set(cells))


def cover_min_exterior_distance(lat: float, lon: float, radius_m: float) -> float:
    """Lower bound on the geodesic distance from (lat, lon) to any point
    *outside* ``cell_cover(lat, lon, radius_m)`` — by construction the
    cover contains the full geodesic disk, so the bound is ``radius_m``.

    Exposed for the kNN ring-closure argument: after searching a cover of
    radius R and finding >= k candidates with k-th distance <= R, no
    uncovered point can beat the k-th candidate.
    """
    return radius_m
