"""Point-in-polygon spatial join + raster<->vector zonal assignment.

Polygon sets are small by contract (the broadcast side — north rule:
"broadcast of small polygon sets"); points/tiles are the big side.

Plan shape:
  1. driver: per-polygon conservative cell cover (cells intersecting the
     ring's antimeridian-unwrapped bbox) at a shared resolution,
  2. broadcast equi-join (cell -> candidate poly_id) against the points'
     cell ids — integer-key join, no geometry at this stage,
  3. exact refine: vectorized ray-cast inside an Arrow batch, polygons
     closed over by the UDF (grouped by poly_id inside each batch so the
     edge loop is over <= ~20 edges, vectorized over points).

Semantics: planar even-odd ray-cast in an unwrapped (lon, lat) frame per
polygon — rings crossing the antimeridian are unwrapped relative to
their first vertex; polar-cap rings (unwrapped lon span ~360) are closed
through the pole so the cap interior is the region poleward of the ring.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import grid
from ..functions.expressions import cell_id_col


def _unwrap(lons: np.ndarray, ref: float) -> np.ndarray:
    return np.mod(lons - ref + 180.0, 360.0) - 180.0


def _prep_polygon(vlat: np.ndarray, vlon: np.ndarray):
    """Unwrap ring; close polar caps through the pole.

    Returns (vlat, vlon_unwrapped, ref_lon).
    """
    ref = float(vlon[0])
    u = _unwrap(vlon, ref)
    # cumulative unwrap so consecutive vertices never jump > 180
    for i in range(1, len(u)):
        d = u[i] - u[i - 1]
        if d > 180.0:
            u[i:] -= 360.0
        elif d < -180.0:
            u[i:] += 360.0
    # pole-encircling detection: total longitudinal winding of the closed
    # ring is ±360 for a cap, 0 for an ordinary polygon
    closing = np.mod(u[0] - u[-1] + 180.0, 360.0) - 180.0
    winding = (u[-1] - u[0]) + closing
    if abs(winding) > 180.0:  # polar cap: close through the nearer pole
        pole = 90.0 if vlat.mean() > 0 else -90.0
        # continue the winding to the pole so the two added meridional
        # edges seal the cap (the lat==pole edge is skipped by ray-cast)
        u_end = u[-1] + closing
        vlat = np.concatenate([vlat, [pole, pole]])
        u = np.concatenate([u, [u_end, u[0]]])
    return vlat, u, ref


def _ring_bbox(vlat: np.ndarray, vlon_u: np.ndarray):
    return float(vlat.min()), float(vlat.max()), float(vlon_u.min()), float(vlon_u.max())


def _map_lon_into_ring(plon_u: np.ndarray, ring_lon_min: float) -> np.ndarray:
    """Map unwrapped point longitudes into [ring_min, ring_min + 360).

    A ring (possibly pole-encircling) occupies one 360-wide window in its
    unwrapped frame; placing every point in that window preserves
    inside/outside for ordinary polygons (width < 360 ⇒ the extra strip
    is edge-free) and aligns all longitudes for caps.
    """
    return ring_lon_min + np.mod(plon_u - ring_lon_min, 360.0)


def _raycast(vlat: np.ndarray, vlon_u: np.ndarray,
             plat: np.ndarray, plon: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray-cast of mapped points against one prepped
    ring (edge loop over <= ~20 edges, vectorized over points)."""
    acc = np.zeros(len(plat), dtype=bool)
    x2 = np.roll(vlon_u, -1)
    y2 = np.roll(vlat, -1)
    for e in range(len(vlat)):
        xi, yi, xj, yj = vlon_u[e], vlat[e], x2[e], y2[e]
        if yi == yj:
            continue
        cond = (yi > plat) != (yj > plat)
        xint = (xj - xi) * (plat - yi) / (yj - yi) + xi
        acc ^= cond & (plon < xint)
    return acc


def _classify_cover(vlat: np.ndarray, vlon_u: np.ndarray, ref: float,
                    ys: np.ndarray, xs: np.ndarray, n: int) -> np.ndarray:
    """Per cover cell: 0 = fully outside the ring, 1 = fully inside,
    2 = boundary (a ring edge may cross the cell).

    Conservative: a cell is 'boundary' whenever ANY edge's AABB touches
    the closed cell rect (cheap vectorized test; over-marks diagonal-edge
    neighborhoods, never under-marks). If no edge touches the cell, every
    point of the closed cell shares the cell CENTER's inside/outside
    status, so interior cells skip the per-point refine entirely and
    outside cells never reach the candidate join — Arrow/refine volume
    scales with polygon PERIMETER cells, not area cells.
    """
    w_lat = 180.0 / n
    w_lon = 360.0 / n
    cy = -90.0 + (ys + 0.5) * w_lat
    cx = _map_lon_into_ring(
        _unwrap(-180.0 + (xs + 0.5) * w_lon, ref), float(vlon_u.min()))
    # tiny inflation: an edge grazing a rect corner must classify as
    # touching even under float roundoff (uniformity needs the OPEN
    # complement of every edge)
    eps = 1e-12 * max(w_lon, w_lat)
    bx0, bx1 = cx - w_lon / 2.0 - eps, cx + w_lon / 2.0 + eps
    by0, by1 = cy - w_lat / 2.0 - eps, cy + w_lat / 2.0 + eps
    # the shortcut's uniformity argument needs the refine UDF's lon
    # mapping to be continuous across the cell: only cells whose rect
    # lies wholly inside the 360-wide mapping window qualify; straddlers
    # (possible when a near-global ring's padded cover wraps) stay
    # 'boundary' so the per-point refine keeps deciding them
    lo_min = float(vlon_u.min())
    in_window = (bx0 >= lo_min) & (bx1 < lo_min + 360.0 - 1e-9)
    # exact segment-rect intersection (vectorized Liang-Barsky over
    # cells x edges): an AABB-only test over-marks every diagonal
    # edge's whole bounding rect as boundary
    ex1 = vlon_u
    ey1 = vlat
    dx = (np.roll(vlon_u, -1) - vlon_u)[None, :]
    dy = (np.roll(vlat, -1) - vlat)[None, :]
    t0 = np.zeros((len(ys), len(vlat)))
    t1 = np.ones_like(t0)
    ok = np.ones(t0.shape, dtype=bool)
    for p, q in (
        (np.broadcast_to(-dx, t0.shape), ex1[None, :] - bx0[:, None]),
        (np.broadcast_to(dx, t0.shape), bx1[:, None] - ex1[None, :]),
        (np.broadcast_to(-dy, t0.shape), ey1[None, :] - by0[:, None]),
        (np.broadcast_to(dy, t0.shape), by1[:, None] - ey1[None, :]),
    ):
        par = p == 0.0
        ok &= ~(par & (q < 0.0))
        with np.errstate(divide="ignore", invalid="ignore"):
            t = q / p
        t0 = np.where(p < 0.0, np.maximum(t0, t), t0)
        t1 = np.where(p > 0.0, np.minimum(t1, t), t1)
    touches = (ok & (t0 <= t1)).any(axis=1)
    out = np.full(len(ys), 2, dtype=np.int8)
    quiet = ~touches & in_window
    if quiet.any():
        inside = _raycast(vlat, vlon_u, cy[quiet], cx[quiet])
        out[quiet] = np.where(inside, 1, 0)
    return out


def _cover_entries(vlat: np.ndarray, vlon_u: np.ndarray, ref: float,
                   res: int) -> tuple[np.ndarray, np.ndarray]:
    """(cell_ids, full_flags) — classified conservative cover of one
    prepped ring at ``res``: all cells intersecting the unwrapped bbox
    inflated by one cell, MINUS cells proven fully outside; ``full``
    marks cells proven fully inside (their points skip the per-point
    refine)."""
    n = 1 << res
    la0, la1, lo0, lo1 = _ring_bbox(vlat, vlon_u)
    pad_lat = 180.0 / n
    y0 = max(int((la0 - pad_lat + 90.0) / 180.0 * n), 0)
    y1 = min(int((la1 + pad_lat + 90.0) / 180.0 * n), n - 1)
    x0f = lo0 - 360.0 / n
    x1f = lo1 + 360.0 / n
    span_cells = min(int(math.ceil((x1f - x0f) / (360.0 / n))) + 1, n)
    # map unwrapped lon back to absolute for cell x
    x_start = int(math.floor((((x0f + ref) + 180.0) % 360.0) / 360.0 * n))
    ys, xs = np.meshgrid(np.arange(y0, y1 + 1),
                         (x_start + np.arange(span_cells)) % n,
                         indexing="ij")
    ys, xs = ys.ravel(), xs.ravel()
    status = _classify_cover(vlat, vlon_u, ref, ys, xs, n)
    keep = status > 0
    return ys[keep].astype(np.int64) * n + xs[keep], status[keep] == 1


def polygon_cover_pairs(polys: list[dict]):
    """[(res, cell_id, poly_id, full)] candidate pairs, one classified
    cover per polygon at its own resolution (cells a bit smaller than
    the ring bbox — a shared resolution would let the largest ring, e.g.
    a polar cap, blow up every small ring's cover slop).

    ``polys``: [{poly_id, lat: ndarray, lon: ndarray}].
    """
    prepped = {}
    pairs = []
    for p in polys:
        vlat, vlon_u, ref = _prep_polygon(np.asarray(p["lat"], float), np.asarray(p["lon"], float))
        pid = p["poly_id"]
        prepped[pid] = (vlat, vlon_u, ref)
        la0, la1, lo0, lo1 = _ring_bbox(vlat, vlon_u)
        res = _poly_res(max(la1 - la0, lo1 - lo0))
        cells, full = _cover_entries(vlat, vlon_u, ref, res)
        pairs.extend(
            (res, int(c), pid, bool(f)) for c, f in zip(cells, full))
    return pairs, prepped


def _pip_refine_udf(prepped: dict):
    """(lat, lon, poly_id, full) -> bool, vectorized even-odd ray-cast.

    ``full`` rows (cover cells proven fully interior) short-circuit to
    True without touching the edge loop — Python compute follows
    boundary-cell rows only, while the plan stays a SINGLE candidate
    scan (a full/boundary union split would re-scan and re-join the
    whole point side under a broadcast join, where there is no
    exchange to reuse)."""

    @F.pandas_udf(T.BooleanType())
    def _refine(lat: pd.Series, lon: pd.Series, poly_id: pd.Series,
                full: pd.Series) -> pd.Series:
        la = lat.to_numpy()
        lo = lon.to_numpy()
        pid = poly_id.to_numpy()
        inside = full.to_numpy(dtype=bool).copy()
        todo = ~inside
        for p in np.unique(pid[todo]):
            vlat, vlon_u, ref = prepped[p]
            sel = todo & (pid == p)
            plat = la[sel]
            plon = _map_lon_into_ring(_unwrap(lo[sel], ref), vlon_u.min())
            inside[sel] = _raycast(vlat, vlon_u, plat, plon)
        return pd.Series(inside)

    return _refine


def _poly_res(span_deg: float) -> int:
    """Per-polygon cover resolution: ~16 cells across the ring's bbox
    (covers stay a few hundred cells). Finer cells buy two things at
    once: most cover cells classify as provably-interior (points skip
    the Python refine) and provably-outside cells prune tighter (fewer
    false candidates through the join)."""
    return min(max(int(math.floor(math.log2(360.0 / max(span_deg, 1e-3)))) + 4, 0),
               grid.MAX_RES)


_PREP_SCHEMA = T.StructType([
    T.StructField("poly_id", T.LongType()),
    T.StructField("__res", T.IntegerType()),
    T.StructField("vlat", T.ArrayType(T.DoubleType())),
    T.StructField("vlon_u", T.ArrayType(T.DoubleType())),
    T.StructField("ref", T.DoubleType()),
    T.StructField("cover", T.ArrayType(T.LongType())),
    T.StructField("cover_full", T.ArrayType(T.BooleanType())),
])


def _prep_polygons_rel(polygons: DataFrame) -> DataFrame:
    """Distributed polygon prep: unwrap/close each ring, pick a per-ring
    cover resolution, and emit the conservative cell cover — one row per
    polygon, NO driver collect (the relational analog of
    :func:`polygon_cover_pairs`, same bbox + one-cell-pad construction).
    """
    def _prep(pdfs):
        for pdf in pdfs:
            out = {k.name: [] for k in _PREP_SCHEMA.fields}
            for pid, ring in zip(pdf["poly_id"], pdf["ring"]):
                if ring is None or len(ring) < 3:
                    continue  # no interior — same rule as _load_polygons
                vlat = np.asarray([v["lat"] for v in ring], float)
                vlon = np.asarray([v["lon"] for v in ring], float)
                vlat, u, ref = _prep_polygon(vlat, vlon)
                la0, la1, lo0, lo1 = _ring_bbox(vlat, u)
                res = _poly_res(max(la1 - la0, lo1 - lo0))
                cells, full = _cover_entries(vlat, u, ref, res)
                out["poly_id"].append(pid)
                out["__res"].append(res)
                out["vlat"].append(vlat.tolist())
                out["vlon_u"].append(u.tolist())
                out["ref"].append(ref)
                out["cover"].append(cells.tolist())
                out["cover_full"].append(full.tolist())
            if out["poly_id"]:
                # an all-skipped batch would hand Arrow empty OBJECT
                # columns it cannot cast to list<double>
                yield pd.DataFrame(out)

    return polygons.select("poly_id", "ring").mapInPandas(_prep, _PREP_SCHEMA)


@F.pandas_udf(T.BooleanType())
def _pip_refine_rel_udf(lat: pd.Series, lon: pd.Series, poly_id: pd.Series,
                        vlat: pd.Series, vlon_u: pd.Series,
                        ref: pd.Series, full: pd.Series) -> pd.Series:
    """Row-carried-ring variant of the even-odd ray-cast: the polygon
    arrays arrive as columns (carried on the exploded cover-pair
    relation), grouped by poly_id inside the batch so the edge loop
    vectorizes over that polygon's points exactly like the broadcast
    path. ``full`` rows short-circuit to True — same single-scan
    rationale as :func:`_pip_refine_udf`."""
    la = lat.to_numpy()
    lo = lon.to_numpy()
    pid = poly_id.to_numpy()
    inside = full.to_numpy(dtype=bool).copy()
    todo = ~inside
    for p in pd.unique(pid[todo]):
        sel = todo & (pid == p)
        first = int(np.flatnonzero(sel)[0])
        vla = np.asarray(vlat.iloc[first], dtype=float)
        vlo = np.asarray(vlon_u.iloc[first], dtype=float)
        rf = float(ref.iloc[first])
        plat = la[sel]
        plon = _map_lon_into_ring(_unwrap(lo[sel], rf), vlo.min())
        inside[sel] = _raycast(vla, vlo, plat, plon)
    return pd.Series(inside)


def _no_hits(pts: DataFrame) -> DataFrame:
    """Empty hit relation with the operator's output schema (point
    columns + poly_id) — the degenerate result when no usable polygons
    exist (empty table, or every ring null/<3 vertices). Without this
    guard an empty cover set builds a zero-element F.array() whose VOID
    element type fails analysis at the explode."""
    return pts.where(F.lit(False)).withColumn(
        "poly_id", F.lit(None).cast("long"))


def _pip_join_relational(pts: DataFrame, polygons: DataFrame,
                         lat_col: str, lon_col: str) -> DataFrame:
    """(point rows x containing poly_id) with NO driver-side polygon
    state: prep + cover are computed distributedly, candidates come from
    a (res, cell) equi-join, refine reads the ring arrays off the joined
    row. Scales to arbitrarily many polygons (the broadcast path walls at
    the driver with ~10^5 rings).

    Plan: one polygon scan (prep -> cover explode, ring arrays carried
    on the pair rows), ONE point scan (ancestor cell per ACTIVE res —
    the distinct-res list is the only driver action, bounded by
    grid.MAX_RES values), one shuffle equi-join on (res, cell), Arrow
    ray-cast refine with interior-cell rows short-circuited.
    """
    prepped = _prep_polygons_rel(polygons)
    # ring arrays ride on the exploded pair relation: its shuffle volume
    # is polygons x cover cells (never points), and carrying them here
    # means ONE point-side join and ONE candidate scan — a separate
    # rings join would consume the candidate relation twice (the point
    # scan + explode + join would re-execute; no exchange reuse
    # materialized in the static plan)
    pairs = prepped.select(
        "poly_id", "__res", "vlat", "vlon_u", "ref",
        F.explode(F.arrays_zip(
            F.col("cover").alias("c"), F.col("cover_full").alias("f"),
        )).alias("__cf"),
    ).select("poly_id", "__res", "vlat", "vlon_u", "ref",
             F.col("__cf.c").alias("__cell"), F.col("__cf.f").alias("__full"))
    # the only driver round-trip: WHICH resolutions are active (<= 26
    # ints, metadata not data)
    res_list = sorted(
        r["__res"] for r in prepped.select("__res").distinct().collect())
    if not res_list:
        return _no_hits(pts)
    cells = F.array(*[
        F.struct(F.lit(r).cast("int").alias("r"),
                 cell_id_col(lat_col, lon_col, r).alias("c"))
        for r in res_list
    ])
    ptsx = (
        pts.withColumn("__rc", F.explode(cells))
        .withColumn("__res", F.col("__rc.r"))
        .withColumn("__cell", F.col("__rc.c"))
        .drop("__rc")
    )
    cand = ptsx.join(pairs, on=["__res", "__cell"], how="inner") \
        .drop("__res", "__cell")
    hit = cand.filter(_pip_refine_rel_udf(
        F.col(lat_col), F.col(lon_col), F.col("poly_id"),
        F.col("vlat"), F.col("vlon_u"), F.col("ref"), F.col("__full")))
    return hit.drop("vlat", "vlon_u", "ref", "__full")


def _load_polygons(polygons: DataFrame, _rows=None) -> list[dict]:
    rows = polygons.select("poly_id", "ring").collect() if _rows is None else _rows
    # null rings and <3-vertex rings have no interior: skip them (the
    # relational prep applies the same rule)
    return [
        {
            "poly_id": r["poly_id"],
            "lat": np.array([v["lat"] for v in r["ring"]]),
            "lon": np.array([v["lon"] for v in r["ring"]]),
        }
        for r in rows
        if r["ring"] is not None and len(r["ring"]) >= 3
    ]


def point_in_polygon_join(points: DataFrame, polygons: DataFrame,
                          lat_col: str = "lat", lon_col: str = "lon",
                          how: str = "inner",
                          strategy: str = "auto",
                          broadcast_max_polys: int = 512,
                          point_id_cols: list[str] | None = None) -> DataFrame:
    """Join each point to the polygon(s) containing it.

    ``polygons``: (poly_id, name?, ring: array<struct<lat,lon>>).
    ``how='left'`` keeps non-matching points with null poly_id (used by
    zonal stats to count unassigned tiles). On the left path,
    ``point_id_cols`` names columns forming a unique per-row key: hits
    are joined back on those key columns directly (null-safe equality)
    and no localCheckpoint materialization happens — prefer this
    whenever a natural key exists (at 10^12 rows the checkpoint is the
    dominant cost; without keys the nondeterministic-id + checkpoint
    fallback pins row identity against task retries).

    Two physical strategies, identical results:

    - ``broadcast`` — rings collected driver-side, cover pairs + refine
      closure broadcast. Fastest for small polygon sets (the north
      rule's case) but walls at the driver around ~10^5 rings (the
      reference punts here entirely, docs/spatial-queries.md:286-289).
    - ``relational`` — polygon prep, cover and refine all stay
      distributed (no driver polygon state); per-polygon adaptive cover
      resolution, one shuffle equi-join on (res, cell). Use for large
      polygon sets (census tracts & co).
    - ``auto`` (default) — probes ``limit(broadcast_max_polys + 1)`` and
      picks.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    if strategy not in ("auto", "broadcast", "relational"):
        raise ValueError(f"unknown strategy={strategy!r}")
    preloaded_rows = None
    if strategy == "auto":
        # one limited collect serves as BOTH the size probe and (when
        # the broadcast path wins, i.e. the common small-polygon-set
        # case) the ring load — the r5 shape ran a limit().count() job
        # and then a second full collect of the same rows
        probe = polygons.select("poly_id", "ring") \
            .limit(broadcast_max_polys + 1).collect()
        if len(probe) <= broadcast_max_polys:
            strategy = "broadcast"
            preloaded_rows = probe
        else:
            strategy = "relational"

    # surrogate row id: the left join below must be per-ROW (duplicate
    # coordinates would multiply and null-valued columns never equal
    # themselves under a join on all point columns)
    left = how == "left"
    pts = points
    if left:
        if point_id_cols:
            # caller names a natural key (unique per row by contract):
            # hits join back on the KEY COLUMNS THEMSELVES, so no
            # materialization and no hashed surrogate (a 64-bit hash of
            # the key is NOT injective — at the 10^12-row scale this
            # path exists for, birthday collisions are certain and
            # would silently mis-assign poly_id). Null-safe equality:
            # a null key component still identifies its row.
            pass
        else:
            # monotonically_increasing_id is NONdeterministic: base and
            # hit below both read this plan, and a task retry / AQE
            # re-shuffle could assign different ids per evaluation,
            # silently mis-joining. localCheckpoint pins one
            # materialized assignment for both subtrees (eager: runs a
            # job here, acceptable fallback when no natural key exists).
            pts = pts.withColumn(
                "__pt", F.monotonically_increasing_id()).localCheckpoint()

    if strategy == "relational":
        hit = _pip_join_relational(pts, polygons, lat_col, lon_col)
    else:
        spark = points.sparkSession
        polys = _load_polygons(polygons, _rows=preloaded_rows)
        pairs, prepped = polygon_cover_pairs(polys)
        if not pairs:
            hit = _no_hits(pts)
        else:
            pairs_df = spark.createDataFrame(
                pairs,
                schema="__res int, __cell long, poly_id long, __full boolean")
            res_list = sorted({r for r, _, _, _ in pairs})
            cells_arr = F.array(*[
                F.struct(F.lit(r).cast("int").alias("r"),
                         cell_id_col(lat_col, lon_col, r).alias("c"))
                for r in res_list
            ])
            ptsx = (
                pts.withColumn("__rc", F.explode(cells_arr))
                .withColumn("__res", F.col("__rc.r"))
                .withColumn("__cell", F.col("__rc.c"))
                .drop("__rc")
            )
            cand = ptsx.join(F.broadcast(pairs_df), on=["__res", "__cell"],
                             how="inner")
            # one candidate scan; the UDF short-circuits interior-cell
            # rows so the Python ray-cast follows polygon PERIMETER
            # cells only
            refine = _pip_refine_udf(prepped)
            hit = cand.filter(
                refine(F.col(lat_col), F.col(lon_col), F.col("poly_id"),
                       F.col("__full"))
            ).drop("__res", "__cell", "__full")
    if how == "inner":
        return hit
    if point_id_cols:
        import functools
        import operator

        keyed = [f"__k_{i}" for i in range(len(point_id_cols))]
        hit_k = hit.select(
            *[F.col(c).alias(a) for c, a in zip(point_id_cols, keyed)],
            "poly_id")
        cond = functools.reduce(operator.and_, [
            F.col(c).eqNullSafe(F.col(a))
            for c, a in zip(point_id_cols, keyed)
        ])
        return pts.join(hit_k, cond, "left").drop(*keyed)
    return pts.join(hit.select("__pt", "poly_id"), on="__pt", how="left").drop("__pt")


def geodesic_buffer(points: DataFrame, radius, metric: str = "meter",
                    n_vertices: int = 32, exact: bool = False,
                    ellipsoid="WGS-84",
                    lat_col: str = "lat", lon_col: str = "lon",
                    out: str = "ring") -> DataFrame:
    """Per-row circular buffer polygon: ``out`` = array<struct<lat,lon>>
    of ``n_vertices`` spherical-destination points at equal bearings
    around the row's coordinate — the geofence-CONSTRUCTION primitive
    (point + radius -> zone ring consumable by
    :func:`point_in_polygon_join`, :func:`polygon_area`, or
    ``streaming.stream_geofence``).

    Default mode is pure whole-stage-codegen column math (``transform``
    over a literal bearing sequence + the spherical direct formula) —
    no UDFs, no shuffle, no driver state; rings wrap the antimeridian
    and encircle poles naturally (the ray-cast join's unwrap/cap-closure
    handles both). Sphere-exact radii are within ~0.6% of the geodesic;
    ``exact=True`` swaps in the Vincenty-direct kernel (one Arrow UDF,
    vertices at the exact ellipsoidal radius).
    """
    from ..constants import unit_factor
    from ..functions.expressions import destination_sphere

    radius_m = float(radius) / unit_factor(metric)
    if radius_m < 0:
        raise ValueError(f"radius must be >= 0, got {radius}")
    if n_vertices < 3:
        raise ValueError(f"n_vertices must be >= 3, got {n_vertices}")
    step = 360.0 / n_vertices
    if not exact:
        ring = F.transform(
            F.sequence(F.lit(0), F.lit(n_vertices - 1)),
            lambda i: destination_sphere(
                F.col(lat_col), F.col(lon_col),
                i.cast("double") * F.lit(step), F.lit(radius_m)),
        )
        return points.withColumn(out, ring)

    from .. import kernels as K
    from ..constants import resolve_ellipsoid

    a, f = resolve_ellipsoid(ellipsoid)
    bearings = np.arange(n_vertices) * step

    @F.pandas_udf(T.ArrayType(T.StructType([
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
    ])))
    def _ring(lat: pd.Series, lon: pd.Series) -> pd.Series:
        B = len(lat)
        la = np.repeat(lat.to_numpy(float), n_vertices)
        lo = np.repeat(lon.to_numpy(float), n_vertices)
        az = np.tile(bearings, B)
        la2, lo2, _ = K.vincenty_direct(
            la, lo, az, np.full(B * n_vertices, radius_m), a=a, f=f)
        la2 = la2.reshape(B, n_vertices)
        lo2 = lo2.reshape(B, n_vertices)
        return pd.Series([
            [{"lat": float(la2[i, j]), "lon": float(lo2[i, j])}
             for j in range(n_vertices)]
            for i in range(B)
        ])

    return points.withColumn(out, _ring(F.col(lat_col), F.col(lon_col)))


SPHERE_R_M = 6_371_009.0


def polygon_area(polygons: DataFrame, out: str = "area_km2") -> DataFrame:
    """Spherical shoelace area per polygon: (poly_id, ``out``) in km².

    Fully relational — posexplode + window-based cumulative longitude
    unwrap (the same antimeridian/polar-cap handling as the ray-cast
    join: rings whose unwrapped winding exceeds 180° are closed through
    the nearer pole) + the trapezoidal sin(lat)–lon edge model
    A = R²/2 · |Σ Δλ (sin φ₁ + sin φ₂)| on the R=6371009 sphere. Exact
    for graticule-aligned edges (rectangles, polar caps); O(|edge|²)
    edge-model approximation for oblique edges. Per-edge terms round to
    integer m² BEFORE the sum, so the aggregate is addition-order-
    independent (bit-reproducible; mirrored 1:1 by the SQL oracle).
    No UDFs, no driver collection: one window chain + one groupBy.
    """
    w = Window.partitionBy("poly_id").orderBy("idx")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # full-frame ordered window: deterministic "first vertex" lookups
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    v0 = polygons.select(
        "poly_id", F.posexplode("ring").alias("idx", "v")
    ).select("poly_id", "idx",
             F.col("v.lat").alias("vlat"), F.col("v.lon").alias("vlon"))
    ref = v0.withColumn("ref", F.first("vlon").over(w))
    rel = ref.withColumn(
        "rlon", F.pmod(F.col("vlon") - F.col("ref") + 180.0, F.lit(360.0)) - 180.0)
    dd = rel.withColumn(
        "dd", F.col("rlon") - F.coalesce(F.lag("rlon").over(w), F.col("rlon")))
    u = dd.withColumn(
        "ulon",
        F.col("rlon") - 360.0 * F.sum(
            F.when(F.col("dd") > 180.0, 1)
            .when(F.col("dd") < -180.0, -1).otherwise(0)).over(wcum))

    agg = u.groupBy("poly_id").agg(
        F.max("idx").alias("n"),
        F.avg("vlat").alias("mlat"),
        F.max_by("ulon", "idx").alias("ulast"),
        F.min_by("ulon", "idx").alias("u0"),
        F.min_by("vlat", "idx").alias("flat"),
    ).withColumn(
        "closing",
        F.pmod(F.col("u0") - F.col("ulast") + 180.0, F.lit(360.0)) - 180.0,
    ).withColumn(
        "pole", F.when(F.col("mlat") > 0.0, 90.0).otherwise(-90.0)
    ).withColumn(
        "is_cap", F.abs(F.col("ulast") - F.col("u0") + F.col("closing")) > 180.0)

    # pole-encircling rings close through the pole with THREE extra
    # vertices: the wrapped first vertex (finishing the ring's full
    # winding at its own latitude), then up to the pole, across, and the
    # final meridional descent comes from the cyclic edge back to vertex
    # 0 (Δλ = 0). A diagonal ring-end -> pole closure would undercount
    # the cap (wrong sin-lat weight on the missing ring segment).
    caps = agg.filter("is_cap")
    extra = caps.select(
        "poly_id", (F.col("n") + 1).alias("idx"),
        F.col("flat").alias("vlat"), (F.col("ulast") + F.col("closing")).alias("ulon"),
    ).unionByName(caps.select(
        "poly_id", (F.col("n") + 2).alias("idx"),
        F.col("pole").alias("vlat"), (F.col("ulast") + F.col("closing")).alias("ulon"),
    )).unionByName(caps.select(
        "poly_id", (F.col("n") + 3).alias("idx"),
        F.col("pole").alias("vlat"), F.col("u0").alias("ulon")))
    verts = u.select("poly_id", "idx", "vlat", "ulon").unionByName(extra)

    # cyclic edge pairing: lead within the ring, last edge wraps to the
    # first vertex
    paired = (
        verts.withColumn("nlat", F.coalesce(F.lead("vlat").over(w),
                                            F.first("vlat").over(wfull)))
        .withColumn("nlon", F.coalesce(F.lead("ulon").over(w),
                                       F.first("ulon").over(wfull)))
    )
    term = (
        F.radians(F.col("nlon") - F.col("ulon"))
        * (F.sin(F.radians("vlat")) + F.sin(F.radians("nlat")))
        * F.lit(SPHERE_R_M * SPHERE_R_M / 2.0)
    )
    return (
        paired.withColumn("__t", F.round(term, 0).cast("long"))
        .groupBy("poly_id")
        .agg(F.sum("__t").alias("__s"))
        .select("poly_id",
                F.round(F.abs(F.col("__s")) / 1e6, 3).alias(out))
    )


def zonal_stats(raster: DataFrame, polygons: DataFrame,
                value_col: str = "value",
                lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """Raster->vector zonal assignment + aggregate: each tile joined to
    its containing zone, then per-zone sum/avg/count/min/max of
    ``value_col`` (SURVEY.md §2.4: cell-id equi-join + groupBy(zone)).
    """
    assigned = point_in_polygon_join(raster, polygons, lat_col=lat_col, lon_col=lon_col)
    return assigned.groupBy("poly_id").agg(
        F.count("*").alias("n_tiles"),
        F.sum(value_col).alias("sum_value"),
        F.avg(value_col).alias("avg_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )
