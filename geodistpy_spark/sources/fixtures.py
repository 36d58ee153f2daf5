"""Deterministic synthetic fixtures (seeded; no external data).

Generates the interleaved documents table of BASELINE.json's
``input_hint`` plus the flat places / polygons / raster tables of
FIXTURES.md, as parquet via pyarrow (no Spark needed — generation is a
test/bench concern, not an engine path).

Coordinate mixture (FIXTURES.md §1): 70% clustered around 20 seeded
urban centers (exercises skew/salting), 25% uniform over the globe,
5% stress (|lat| > 89.9, |lon| > 179.9).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
N_CENTERS = 20

SPAN_STRUCT = pa.struct([
    pa.field("kind", pa.string()),
    pa.field("text", pa.string()),
    pa.field("media_ref", pa.string()),
    pa.field("offset", pa.int32()),
])

DOCS_SCHEMA = pa.schema([
    pa.field("doc_id", pa.string()),
    pa.field("spans", pa.list_(SPAN_STRUCT)),
])

_LOREM = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua enim ad minim veniam "
    "quis nostrud exercitation ullamco laboris nisi aliquip ex ea commodo"
).split()


def urban_centers(rng: np.random.Generator | None = None) -> np.ndarray:
    """20 seeded 'urban' cluster centers, (lat, lon) rows."""
    rng = rng or np.random.default_rng(SEED)
    lat = rng.uniform(-60, 70, N_CENTERS)
    lon = rng.uniform(-180, 180, N_CENTERS)
    return np.column_stack([lat, lon])


def _mixture_coords(rng: np.random.Generator, n: int, centers: np.ndarray,
                    center_weights: np.ndarray | None = None):
    """70/25/5 clustered/uniform/stress coordinate mixture."""
    kind = rng.choice(3, size=n, p=[0.70, 0.25, 0.05])
    lat = np.empty(n)
    lon = np.empty(n)

    m = kind == 0
    idx = rng.choice(N_CENTERS, size=m.sum(), p=center_weights)
    spread = 0.5  # degrees ~ 50 km urban blob
    lat[m] = np.clip(centers[idx, 0] + rng.normal(0, spread, m.sum()), -90, 90)
    lon[m] = ((centers[idx, 1] + rng.normal(0, spread, m.sum()) + 180) % 360) - 180

    m = kind == 1
    lat[m] = np.degrees(np.arcsin(rng.uniform(-1, 1, m.sum())))  # area-uniform
    lon[m] = rng.uniform(-180, 180, m.sum())

    m = kind == 2
    half = rng.random(m.sum()) < 0.5
    slat = np.where(half, rng.uniform(89.9, 90.0, m.sum()), rng.uniform(-40, 40, m.sum()))
    slat = np.where(half | (rng.random(m.sum()) < 0.5), slat,
                    rng.uniform(-90.0, -89.9, m.sum()))
    slon = np.where(half, rng.uniform(-180, 180, m.sum()),
                    np.where(rng.random(m.sum()) < 0.5,
                             rng.uniform(179.9, 180.0, m.sum()),
                             rng.uniform(-180.0, -179.9, m.sum())))
    lat[m] = slat
    lon[m] = slon
    return np.round(lat, 7), np.round(lon, 7)


def generate_documents(n_docs: int, seed: int = SEED,
                       skew_hot_center: bool = True) -> pa.Table:
    """Interleaved documents table: 1-8 spans/doc of kinds text/media/geo.

    ``skew_hot_center`` sends an outsized share of clustered geo spans to
    center 0 (the 'dense urban cell' that exercises salting).
    """
    rng = np.random.default_rng(seed)
    centers = urban_centers()
    weights = np.full(N_CENTERS, 1.0)
    if skew_hot_center:
        weights[0] = 12.0  # hot cell
    weights = weights / weights.sum()

    n_spans = rng.integers(1, 9, size=n_docs)
    total = int(n_spans.sum())
    kinds = rng.choice(["text", "media", "geo"], size=total, p=[0.5, 0.2, 0.3])
    glat, glon = _mixture_coords(rng, total, centers, weights)
    n_words = rng.integers(3, 12, size=total)
    word_idx = rng.integers(0, len(_LOREM), size=(total, 12))
    media_hash = rng.integers(0, 2**48, size=total)

    doc_ids = []
    span_arrays = []
    pos = 0
    for i in range(n_docs):
        doc_ids.append(f"doc{i:010d}")
        spans = []
        offset = 0
        for j in range(n_spans[i]):
            k = kinds[pos]
            if k == "text":
                txt = " ".join(_LOREM[w] for w in word_idx[pos, : n_words[pos]])
                spans.append({"kind": "text", "text": txt, "media_ref": None, "offset": offset})
                offset += len(txt)
            elif k == "media":
                ref = f"media://{media_hash[pos]:012x}"
                spans.append({"kind": "media", "text": None, "media_ref": ref, "offset": offset})
                offset += 1
            else:
                txt = f"{glat[pos]:.7f},{glon[pos]:.7f}"
                spans.append({"kind": "geo", "text": txt, "media_ref": None, "offset": offset})
                offset += len(txt)
            pos += 1
        span_arrays.append(spans)

    return pa.Table.from_pydict({"doc_id": doc_ids, "spans": span_arrays}, schema=DOCS_SCHEMA)


def generate_places(n: int, seed: int = SEED + 1) -> pa.Table:
    """Flat candidate points table (FIXTURES.md §2)."""
    rng = np.random.default_rng(seed)
    centers = urban_centers()
    lat, lon = _mixture_coords(rng, n, centers, None)
    return pa.Table.from_pydict({
        "place_id": pa.array(np.arange(n, dtype=np.int64)),
        "name": pa.array([f"place{i}" for i in range(n)]),
        "lat": pa.array(lat),
        "lon": pa.array(lon),
    })


def generate_polygons(n: int = 50, seed: int = SEED + 2) -> pa.Table:
    """Convex-ish seeded polygons around urban centers; at least 2 cross
    the antimeridian and 1 is a polar cap (FIXTURES.md §3).
    """
    rng = np.random.default_rng(seed)
    centers = urban_centers()
    ring_type = pa.list_(pa.struct([pa.field("lat", pa.float64()), pa.field("lon", pa.float64())]))
    poly_ids, names, rings = [], [], []
    for p in range(n):
        if p == 0:  # polar cap (northern)
            k = 12
            ring = [{"lat": 87.0 + rng.uniform(0, 1.5), "lon": -180.0 + 360.0 * i / k}
                    for i in range(k)]
            names.append("polar_cap_n")
        elif p in (1, 2):  # antimeridian-crossing
            clat = rng.uniform(-50, 50)
            clon = 180.0 if p == 1 else -180.0
            k = int(rng.integers(6, 21))
            ang = np.sort(rng.uniform(0, 2 * np.pi, k))
            rad = rng.uniform(1.0, 4.0, k)
            ring = [{"lat": float(np.clip(clat + rad[i] * np.sin(ang[i]), -89, 89)),
                     "lon": float((((clon + rad[i] * np.cos(ang[i])) + 180) % 360) - 180)}
                    for i in range(k)]
            names.append(f"antimeridian_{p}")
        else:
            c = centers[p % N_CENTERS]
            k = int(rng.integers(6, 21))
            ang = np.sort(rng.uniform(0, 2 * np.pi, k))
            rad = rng.uniform(0.5, 3.0, k)
            ring = [{"lat": float(np.clip(c[0] + rad[i] * np.sin(ang[i]), -89, 89)),
                     "lon": float((((c[1] + rad[i] * np.cos(ang[i])) + 180) % 360) - 180)}
                    for i in range(k)]
            names.append(f"zone_{p}")
        poly_ids.append(p)
        rings.append(ring)
    return pa.Table.from_pydict(
        {"poly_id": pa.array(poly_ids, pa.int64()), "name": names,
         "ring": pa.array(rings, ring_type)})


def generate_raster(res: int = 6, seed: int = SEED + 3) -> pa.Table:
    """Raster tiles at a fixed grid resolution: tile centers + noise field."""
    rng = np.random.default_rng(seed)
    n = 1 << res
    y, x = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    y = y.ravel(); x = x.ravel()
    tile_id = (y * n + x).astype(np.int64)
    lat = -90.0 + 180.0 * (y + 0.5) / n
    lon = -180.0 + 360.0 * (x + 0.5) / n
    value = rng.normal(0, 1, len(tile_id)) + np.sin(np.radians(lat)) * 2.0
    return pa.Table.from_pydict({
        "tile_id": pa.array(tile_id), "lat": pa.array(lat),
        "lon": pa.array(lon), "value": pa.array(value)})


def write_fixtures(out_dir: str, n_docs: int = 2000, n_places: int = 2000,
                   n_polygons: int = 50, raster_res: int = 6, force: bool = False) -> dict:
    """Write all fixture parquets (idempotent unless force)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {
        "documents": os.path.join(out_dir, "documents_interleaved.parquet"),
        "places": os.path.join(out_dir, "places.parquet"),
        "polygons": os.path.join(out_dir, "polygons.parquet"),
        "raster": os.path.join(out_dir, "raster.parquet"),
    }
    if force or not os.path.exists(paths["documents"]):
        pq.write_table(generate_documents(n_docs), paths["documents"])
    if force or not os.path.exists(paths["places"]):
        pq.write_table(generate_places(n_places), paths["places"])
    if force or not os.path.exists(paths["polygons"]):
        pq.write_table(generate_polygons(n_polygons), paths["polygons"])
    if force or not os.path.exists(paths["raster"]):
        pq.write_table(generate_raster(raster_res), paths["raster"])
    return paths


DEFAULT_FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "fixtures")


def ensure_default_fixtures() -> dict:
    """Fixtures used by the driver-contract queries (fixed location so
    oracle_sql strings can reference the same parquet files)."""
    return write_fixtures(DEFAULT_FIXTURE_DIR)
