"""Flat-table coordinate-column resolution (reference parity:
pandas_support.coordinates_from_df, pandas_support.py:25-136).

The reference auto-detects lat/lon columns on pandas DataFrames with a
fixed precedence and threads the index through as result labels. The
Spark analog resolves column names on a pyspark DataFrame and returns a
normalized (key, lat, lon) relation — key columns play the index role
(carried through joins, reference distance.py:455-456, :539).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: detection precedence, mirroring pandas_support.py:101-115
_CANDIDATES = [
    ("lat", "lon"),
    ("latitude", "longitude"),
    ("Lat", "Lon"),
    ("LAT", "LON"),
]


def resolve_coordinate_columns(df: DataFrame, lat_col: str | None = None,
                               lon_col: str | None = None) -> tuple[str, str]:
    """Resolve (lat, lon) column names; explicit args win, else the
    reference's precedence order; ValueError when nothing matches."""
    if lat_col is not None and lon_col is not None:
        missing = [c for c in (lat_col, lon_col) if c not in df.columns]
        if missing:
            raise ValueError(f"columns not found: {missing}; have {df.columns}")
        return lat_col, lon_col
    if (lat_col is None) != (lon_col is None):
        raise ValueError("pass both lat_col and lon_col, or neither")
    cols = set(df.columns)
    for la, lo in _CANDIDATES:
        if la in cols and lo in cols:
            return la, lo
    raise ValueError(
        f"could not auto-detect coordinate columns in {df.columns}; "
        f"expected one of {_CANDIDATES} or explicit lat_col/lon_col"
    )


#: geometry-column detection precedence (the GeoDataFrame-point analog of
#: reference pandas_support.py:79-87, which reads gdf.geometry.x/.y)
_GEOM_CANDIDATES = ["geometry", "geom", "point", "location"]

#: WKT point, e.g. "POINT(2.3522 48.8566)" — x=lon, y=lat (OGC order)
_WKT_POINT_RE = r"^\s*POINT\s*\(\s*(-?[0-9.eE+]+)\s+(-?[0-9.eE+]+)\s*\)\s*$"


def resolve_geometry_column(df: DataFrame, geom_col: str | None = None) -> str | None:
    """Name of a point-geometry column: a struct with lat+lon fields, or
    a WKT string column. Explicit ``geom_col`` wins; else the precedence
    list; None when nothing matches."""
    names = [geom_col] if geom_col else [c for c in _GEOM_CANDIDATES if c in df.columns]
    for name in names:
        if name not in df.columns:
            raise ValueError(f"geometry column not found: {name}; have {df.columns}")
        dt = df.schema[name].dataType
        kind = dt.typeName()
        if kind == "struct":
            fields = {f.name.lower() for f in dt.fields}
            if {"lat", "lon"} <= fields or {"latitude", "longitude"} <= fields:
                return name
        elif kind == "string":
            return name
        if geom_col:
            raise ValueError(
                f"column {name!r} is {kind}, not a struct<lat,lon> or WKT string")
    return None


def coordinates_from_df(df: DataFrame, key_cols: list[str] | None = None,
                        lat_col: str | None = None, lon_col: str | None = None,
                        geom_col: str | None = None,
                        validate: bool = True) -> DataFrame:
    """Normalized coordinate relation (key..., lat, lon) from any flat
    table. ``key_cols`` default to every non-coordinate column (the
    'index label' analog). ``validate`` drops out-of-range rows
    (reference raises; at table scale dropping with a flag is the usable
    contract — use functions.expressions.validate_coords(action='error')
    for strict parity).

    Ingestion paths, in precedence order (reference pandas_support.py:
    named lat/lon columns :101-115, GeoDataFrame point geometry :79-87):
    1. explicit/auto-detected lat+lon columns,
    2. a point-geometry column — struct<lat,lon> (struct field names may
       also be latitude/longitude) or a WKT ``POINT(lon lat)`` string.
    """
    geom = None
    if lat_col is None and lon_col is None:
        try:
            la, lo = resolve_coordinate_columns(df)
        except ValueError:
            geom = resolve_geometry_column(df, geom_col)
            if geom is None:
                raise
            la = lo = None
    else:
        la, lo = resolve_coordinate_columns(df, lat_col, lon_col)
    if geom_col is not None and geom is None and la is None:
        geom = resolve_geometry_column(df, geom_col)

    if geom is not None:
        dt = df.schema[geom].dataType
        if dt.typeName() == "struct":
            fields = {f.name.lower(): f.name for f in dt.fields}
            fla = fields.get("lat", fields.get("latitude"))
            flo = fields.get("lon", fields.get("longitude"))
            lat_expr = F.col(geom)[fla].cast("double")
            lon_expr = F.col(geom)[flo].cast("double")
        else:  # WKT string: POINT(x y) with x=lon, y=lat; non-points -> null
            lon_expr = F.regexp_extract(F.col(geom), _WKT_POINT_RE, 1).try_cast("double")
            lat_expr = F.regexp_extract(F.col(geom), _WKT_POINT_RE, 2).try_cast("double")
        keys = key_cols if key_cols is not None else [c for c in df.columns if c != geom]
        out = df.select(*keys, lat_expr.alias("lat"), lon_expr.alias("lon"))
    else:
        keys = key_cols if key_cols is not None else [c for c in df.columns if c not in (la, lo)]
        out = df.select(*keys, F.col(la).cast("double").alias("lat"),
                        F.col(lo).cast("double").alias("lon"))
    if validate:
        out = out.filter(
            F.col("lat").between(-90.0, 90.0) & F.col("lon").between(-180.0, 180.0)
        )
    return out
