"""geodistpy_spark — a PySpark-native geospatial distance + spatial-join
engine with the query/data-processing capabilities of pawangeek/geodistpy,
re-expressed Spark-first for 100 TB-scale document tables.

Layers
------
- :mod:`geodistpy_spark.kernels` — vectorized numpy geodesic kernels
  (Vincenty, Karney fallback/oracle, great-circle) — no Spark imports.
- :mod:`geodistpy_spark.grid` — hierarchical quad-grid cell index
  (H3/S2 stand-in): cell ids as plain integer math, covers, k-rings.
- :mod:`geodistpy_spark.functions` — Catalyst Column builders (codegen
  fast path) + Arrow-batched pandas UDFs (exact path).
- :mod:`geodistpy_spark.operators` — distance queries, radius joins,
  kNN joins, point-in-polygon, zonal stats.
- :mod:`geodistpy_spark.sources` — interleaved-document span extraction
  and synthetic fixtures.
- :mod:`geodistpy_spark.textops` — dedup / text-analysis / ANN operators
  for training-data pipelines.
- :mod:`geodistpy_spark.plans` — checkpointed, lineage-tracked chunked
  execution (kill/resume with identical output).
"""

from .constants import ELLIPSOIDS, UNIT_FACTORS, resolve_ellipsoid, unit_factor
from .session import get_spark

__version__ = "0.1.0"
__all__ = ["ELLIPSOIDS", "UNIT_FACTORS", "resolve_ellipsoid", "unit_factor", "get_spark", "__version__"]
