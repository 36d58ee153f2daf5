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


def coordinates_from_df(df: DataFrame, key_cols: list[str] | None = None,
                        lat_col: str | None = None, lon_col: str | None = None,
                        validate: bool = True) -> DataFrame:
    """Normalized coordinate relation (key..., lat, lon) from any flat
    table. ``key_cols`` default to every non-coordinate column (the
    'index label' analog). ``validate`` drops out-of-range rows
    (reference raises; at table scale dropping with a flag is the usable
    contract — use functions.expressions.validate_coords(action='error')
    for strict parity).
    """
    la, lo = resolve_coordinate_columns(df, lat_col, lon_col)
    keys = key_cols if key_cols is not None else [c for c in df.columns if c not in (la, lo)]
    out = df.select(*keys, F.col(la).cast("double").alias("lat"),
                    F.col(lo).cast("double").alias("lon"))
    if validate:
        out = out.filter(
            F.col("lat").between(-90.0, 90.0) & F.col("lon").between(-180.0, 180.0)
        )
    return out
