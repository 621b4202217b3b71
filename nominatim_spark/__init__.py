"""nominatim_spark — a from-scratch PySpark-native geocoding & spatial-join engine.

Re-creates the query semantics and data model of the reference geocoder
(ehtick/Nominatim: PostgreSQL/PostGIS index build + Python search API) as an
idiomatic Spark engine: DataFrame/SQL plans, broadcast + salted hash joins on
hierarchical grid-cell keys, vectorized pandas/Arrow UDFs for geometry and
text normalization, per-stage parquet checkpoints with lineage manifests.

Nothing here is a port: the reference tells us WHAT to compute (operators,
ranks, token semantics — see SURVEY.md §2 with file:line citations in each
module); the HOW is Spark-first.
"""

__version__ = "0.1.0"

from nominatim_spark.session import get_spark  # noqa: F401
