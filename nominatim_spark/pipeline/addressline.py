"""place_addressline — the materialized display-address hierarchy.

Re-expresses the reference's place_addressline table
(lib-sql/tables/addressline.sql:10-17, filled by insert_addresslines,
placex_triggers.sql:504-654) and the address-details join for display
(J19 — src/nominatim_api/results.py:570-671):

* for every place, one row per address ancestor:
  (place_id, address_place_id, distance, cached_rank_address, isaddress)
* ancestors = containing areas with rank_address 1..25, ordered by rank;
  per rank only the closest candidate is the address (``isaddress`` —
  the reference's per-rank dedup with min-distance, :560-608)
* ``address_details`` assembles the ordered display chain per place by
  joining back to placex names — two equi-joins + a window dedup, exactly
  the reference's query shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nominatim_spark.operators.spatial import point_in_polygon_join_dist


def build_place_addressline(spark, placex: DataFrame,
                            points: DataFrame | None = None) -> DataFrame:
    """placex -> place_addressline rows (distributed PiP cover join — the
    ancestor-area table scales with the planet, nothing reaches the
    driver; rank/centroid attrs ride the join as carry columns).

    ``points``: optional (place_id) frame restricting the POINT side to a
    response's rows, so an API-path call costs the result size times
    local area depth, never a full-index pass."""
    pts = placex
    if points is not None:
        pts = placex.join(points.select("place_id"), "place_id",
                          "left_semi")
    areas = placex.filter(
        (F.col("extended_type") == "A") & F.col("rank_address").between(1, 25)
    ).select(
        F.col("place_id").alias("addr_id"),
        F.col("rank_address").alias("addr_rank"),
        F.col("lon").alias("a_lon"),
        F.col("lat").alias("a_lat"),
        "geometry",
    )
    joined = point_in_polygon_join_dist(
        pts.select("place_id", "lon", "lat"),
        areas,
        poly_key="addr_id",
        carry=("addr_rank", "a_lon", "a_lat"),
    ).filter(F.col("addr_id") != F.col("place_id")).withColumn(
        "distance",
        F.sqrt(
            (F.col("lon") - F.col("a_lon")) * (F.col("lon") - F.col("a_lon"))
            + (F.col("lat") - F.col("a_lat")) * (F.col("lat") - F.col("a_lat"))
        ),
    )
    # per rank keep all rows but flag the closest as THE address part
    # (insert_addresslines' per-rank min-distance dedup)
    w = Window.partitionBy("place_id", "addr_rank").orderBy(
        "distance", "addr_id"
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .select(
            "place_id",
            F.col("addr_id").alias("address_place_id"),
            F.round("distance", 9).alias("distance"),
            F.col("addr_rank").alias("cached_rank_address"),
            (F.col("_rn") == 1).alias("isaddress"),
        )
    )


def address_details(placex: DataFrame, addressline: DataFrame,
                    locales=None) -> DataFrame:
    """Per place: the ordered display-address parts (J19 display join).

    Returns (place_id, display_name) where display_name joins the place's
    own name with its isaddress ancestors by rank_address descending —
    the reference's locale display line.  ``locales`` (a
    :class:`~nominatim_spark.pipeline.localization.Locales`) selects each
    part's name per the caller's language priority (the reference's
    ``Locales.localize`` applied to address rows, localization.py:101-111).
    """
    from nominatim_spark.pipeline.localization import DEFAULT_LOCALES

    loc = locales or DEFAULT_LOCALES
    names = placex.select(
        F.col("place_id").alias("address_place_id"),
        loc.display_name_expr("name").alias("part_name"),
    )
    parts = (
        addressline.filter(F.col("isaddress"))
        .join(names, "address_place_id")
        .filter(F.col("part_name").isNotNull())
    )
    ordered = parts.groupBy("place_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    (-F.col("cached_rank_address")).alias("neg_rank"),
                    F.col("part_name").alias("nm"),
                )
            )
        ).alias("_parts")
    ).select(
        "place_id",
        F.expr("transform(_parts, p -> p.nm)").alias("addr_parts"),
    )
    own = placex.select(
        "place_id", loc.display_name_expr("name").alias("own_name"),
        F.col("address").getItem("housenumber").alias("own_hnr"),
    )
    return own.join(ordered, "place_id", "left").select(
        "place_id",
        F.concat_ws(
            ", ",
            F.coalesce(F.col("own_name"), F.col("own_hnr")),
            F.expr("concat_ws(', ', coalesce(addr_parts, array()))"),
        ).alias("display_name"),
    )
