from .distances import (
    bearing,
    destination,
    geodist,
    geodist_dimwise,
    geodist_dimwise_harvesine,
    geodist_dimwise_haversine,
    geodist_matrix,
    geodist_to_many,
    greatcircle,
    greatcircle_matrix,
    haversine_dist,
    interpolate,
    midpoint,
)
from .knn import (
    candidate_histogram,
    candidate_histogram_from_layout,
    geodesic_knn,
    knn_join,
)
from .temporal import asof_join
from .indexing import (adaptive_cell_index, cell_density_smooth,
                       compact_cell_set, geo_bbox, geo_centroid)
from .polygons import (
    geodesic_buffer,
    point_in_polygon_join,
    polygon_area,
    zonal_stats,
)
from .radius import point_in_radius, radius_join

__all__ = [
    "bearing", "destination", "geodist", "geodist_dimwise",
    "geodist_dimwise_haversine", "geodist_dimwise_harvesine", "geodist_matrix",
    "geodist_to_many", "greatcircle", "greatcircle_matrix", "haversine_dist", "interpolate",
    "midpoint", "candidate_histogram", "candidate_histogram_from_layout", "geodesic_knn", "knn_join", "asof_join",
    "adaptive_cell_index", "cell_density_smooth", "compact_cell_set",
    "geo_bbox", "geo_centroid",
    "geodesic_buffer", "point_in_polygon_join", "polygon_area",
    "zonal_stats", "point_in_radius", "radius_join",
]
