"""kNN queries: expanding cell-cover search with exact re-rank.

Engine rewrite of the reference's ``geodesic_knn`` (distance.py:463-540:
full scan + argpartition top-k) into an expanding-radius cell-cover
search with a ring-closure guarantee:

    search radius R covers ALL points within geodesic distance R
    (grid.cell_cover is conservative) ⇒ once >= k candidates are found
    inside the cover AND the k-th distance <= R, no uncovered point can
    displace the top k. Otherwise R grows geometrically (a few
    driver-side rounds touching only cell ids / counts — never data rows).

Ordering contract matches the reference: ascending exact distance,
ties broken by candidate id (stable; reference argsort is index-stable,
distance.py:533-537).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import grid
from ..constants import unit_factor
from ..functions.udfs import vincenty_udf
from .radius import point_in_radius, radius_join


def geodesic_knn(df: DataFrame, point: tuple[float, float], k: int,
                 metric: str = "meter", ellipsoid="WGS-84",
                 lat_col: str = "lat", lon_col: str = "lon",
                 id_col: str | None = None,
                 r0_m: float | None = None, max_rounds: int = 12,
                 out: str = "dist") -> DataFrame:
    """k nearest rows to ``point`` by exact geodesic distance, sorted
    ascending (k validated >= 1; reference distance.py:506-507).

    Expanding radius: R, 4R, 16R... each round is a cover-prefiltered
    count; the exact top-k is computed only on the final (small) covered
    subset. Worst case the cover grows to the whole globe, degrading
    gracefully to the reference's full scan.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    order = [F.col(out).asc()] + ([F.col(id_col).asc()] if id_col else [])

    if r0_m is None:
        import math

        n_cand = df.count()
        r0_m = 2.0 * math.sqrt(k * EARTH_AREA_M2 / (math.pi * max(n_cand, 1)))
        r0_m = min(max(r0_m, 1_000.0), 2.1e7)
    R = float(r0_m)
    for _ in range(max_rounds):
        cand = point_in_radius(df, point, R, metric="meter", ellipsoid=ellipsoid,
                               lat_col=lat_col, lon_col=lon_col, out=out)
        top = cand.orderBy(*order).limit(k).select(F.col(out)).collect()
        if len(top) >= k and top[-1][0] <= R:
            result = cand.orderBy(*order).limit(k)
            return result.withColumn(out, F.col(out) * unit_factor(metric))
        R *= 4.0
        if R > 2.1e7:
            break
    # closure not reached within bounded rounds -> exact full scan
    d = vincenty_udf(ellipsoid)(F.lit(float(point[0])), F.lit(float(point[1])),
                                F.col(lat_col), F.col(lon_col))
    full = df.withColumn(out, d)
    return (
        full.orderBy(*order).limit(k)
        .withColumn(out, F.col(out) * unit_factor(metric))
    )


EARTH_AREA_M2 = 5.10072e14


def knn_join(queries: DataFrame, candidates: DataFrame, k: int,
             metric: str = "meter", ellipsoid="WGS-84", exact: bool = True,
             q_id: str = "query_id", q_lat: str = "q_lat", q_lon: str = "q_lon",
             c_lat: str = "lat", c_lon: str = "lon",
             r0_m: float | None = None, max_rounds: int = 5,
             growth: float = 8.0,
             salt: int | None = None, out: str = "dist") -> DataFrame:
    """Many-to-many kNN join: for every query row, its k nearest
    candidates by exact geodesic distance.

    Round-based expanding radius (R, growth*R, growth^2*R, ...): each round runs a
    cover-prefiltered radius join for the still-unresolved queries, takes
    per-query top-k with a ranking window, and resolves queries whose
    k-th neighbor distance <= R (ring closure). The last round uses a
    globe-sized radius, so termination and exactness are unconditional.

    The per-round shuffle key is the cell id; AQE skew-join plus optional
    ``salt`` handles dense urban cells (north rule).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    if r0_m is None:
        # expected k-th-NN radius under a uniform global density, with 2x
        # slack: most queries close in round 1, dense clusters even earlier
        n_cand = candidates.count()
        import math

        r0_m = 2.0 * math.sqrt(k * EARTH_AREA_M2 / (math.pi * max(n_cand, 1)))
        r0_m = min(max(r0_m, 1_000.0), 2.1e7)

    w = Window.partitionBy(q_id).orderBy(F.col(out).asc(), F.col(c_lat).asc(), F.col(c_lon).asc())
    unresolved = queries.select(q_id, q_lat, q_lon)
    resolved_parts: list[DataFrame] = []
    R = float(r0_m)

    for rnd in range(max_rounds):
        last = rnd == max_rounds - 1 or R >= 2.1e7
        radius = 2.1e7 if last else R
        joined = radius_join(
            unresolved, candidates, radius, metric="meter", ellipsoid=ellipsoid,
            q_id=q_id, q_lat=q_lat, q_lon=q_lon, c_lat=c_lat, c_lon=c_lon,
            salt=salt, exact=exact, out=out,
        )
        # cache: topk feeds both the closure test and the result union
        topk = (
            joined.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
        ).cache()
        if last:
            resolved_parts.append(topk.drop("__rn"))
            break
        # a query is closed if it has k neighbors and the k-th <= R
        kth = topk.groupBy(q_id).agg(
            F.count("*").alias("__cnt"), F.max(out).alias("__kth")
        )
        # both sides already hash-partitioned by q_id (window/groupBy) —
        # these joins reuse that partitioning; AQE may still broadcast
        closed_ids = kth.filter((F.col("__cnt") >= k) & (F.col("__kth") <= R)).select(q_id)
        resolved_parts.append(
            topk.join(closed_ids, on=q_id, how="left_semi").drop("__rn")
        )
        # localCheckpoint truncates lineage so later rounds don't recompute
        # every earlier round's join
        unresolved = unresolved.join(closed_ids, on=q_id, how="left_anti").localCheckpoint()
        if unresolved.isEmpty():
            break
        R *= growth

    result = resolved_parts[0]
    for p in resolved_parts[1:]:
        result = result.unionByName(p)
    return result.withColumn(out, F.col(out) * unit_factor(metric))
