"""Batch reverse geocoding — the tiered cascade as DataFrame stages.

The reference's ReverseGeocoder (/root/reference/src/nominatim_api/
reverse.py:607-645) cascades per point: street/POI distance search within
0.006 deg -> area containment ordered by rank desc -> country fallback.
Here each tier is one distributed join over *all* points at once, and the
cascade is a coalesce over tier outputs:

  tier 1: kNN ring expansion against rank 26-30 places (J6) with the
          reference's max radius (0.006 deg for streets)
  tier 2: point-in-polygon cover join against areas rank 5..25, deepest
          rank_address wins (T5 semantics: rank desc, then smallest area)
  tier 3: country polygon containment (rank 1..4 — reverse.py:520-605)

Returns one row per input point with the chosen place + tier label.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nominatim_spark.operators.spatial import (
    knn_join, point_in_polygon_join_dist)
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

    # ---- tier 2: deepest containing area (distributed PiP cover join —
    # the area table scales with the planet, nothing reaches the driver).
    # Country-level polygons (rank_address <= 4) are tier 3 below.
    areas = placex.filter(
        (F.col("extended_type") == "A") & F.col("rank_address").between(5, 25)
    ).select(
        F.col("place_id").alias("a_id"),
        F.col("rank_address").alias("a_addr"),
        ((F.col("maxx") - F.col("minx"))
         * (F.col("maxy") - F.col("miny"))).alias("a_area"),
        "geometry",
    )
    hit = point_in_polygon_join_dist(
        points, areas, poly_key="a_id", carry=("a_addr", "a_area"),
    )
    w = Window.partitionBy(point_key).orderBy(
        F.col("a_addr").desc(), F.col("a_area").asc(), F.col("a_id")
    )
    tier2 = (
        hit.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .select(point_key, F.col("a_id").alias("t2_place"))
    )

    # ---- tier 3: country containment (the reference's country fallback,
    # reverse.py:520-605 lookup_country) — rank_address 1..4 polygons
    countries = placex.filter(
        (F.col("extended_type") == "A") & F.col("rank_address").between(1, 4)
    ).select(
        F.col("place_id").alias("c_id"),
        F.col("rank_address").alias("c_addr"),
        "geometry",
    )
    chit = point_in_polygon_join_dist(
        points, countries, poly_key="c_id", carry=("c_addr",),
    )
    wc = Window.partitionBy(point_key).orderBy(
        F.col("c_addr").desc(), F.col("c_id")
    )
    tier3 = (
        chit.withColumn("_rn", F.row_number().over(wc))
        .filter("_rn = 1")
        .select(point_key, F.col("c_id").alias("t3_place"))
    )

    # ---- cascade
    out = (
        points.join(tier1, point_key, "left")
        .join(tier2, point_key, "left")
        .join(tier3, point_key, "left")
        .withColumn("place_id", F.coalesce("t1_place", "t2_place", "t3_place"))
        .withColumn(
            "tier",
            F.when(F.col("t1_place").isNotNull(), "street_poi")
            .when(F.col("t2_place").isNotNull(), "area")
            .when(F.col("t3_place").isNotNull(), "country")
            .otherwise("none"),
        )
        .drop("t1_place", "t2_place", "t3_place")
    )
    info = placex.select(
        "place_id", "osm_type", "osm_id", "class", "type",
        "rank_search", "rank_address", "country_code",
    )
    return out.join(info, "place_id", "left")
