"""Geometry layer: WKB codec + vectorized spatial predicates.

The container has no shapely/GEOS, so the engine carries its own minimal,
deterministic geometry kernel implemented on numpy — exactly the subset the
reference uses (SURVEY.md §2.8 geo row): centroid / point-on-surface /
line-interpolate / line-locate / point-in-polygon / bbox / planar & spherical
distance.  All batch entry points operate on arrays and run inside
pandas-UDF batches.
"""

from nominatim_spark.geometry.wkb import (  # noqa: F401
    Geom,
    point_wkb,
    linestring_wkb,
    polygon_wkb,
    parse_wkb,
)
from nominatim_spark.geometry.ops import (  # noqa: F401
    point_in_polygon,
    points_in_polygon,
    polygon_area,
    polygon_centroid,
    point_on_surface,
    line_interpolate_point,
    line_locate_point,
    line_length,
    haversine_m,
    bbox_of,
    get_center_point,
)
