"""Postcode table build + postcode query support.

Re-expresses the reference's postcode pipeline
(/root/reference/src/nominatim_db/tools/postcodes.py:181-250):

* gather (country_code, postcode) points from indexed places (a place
  contributes its ``address.postcode`` at its centroid; descendants
  inherit through the containment hierarchy already resolved in placex);
* aggregate per postcode with the 7-digit fixed-point centroid
  (utils/centroid.py:14-48 — integer mean, bit-reproducible, oracle form
  in gate ``centroid_fixedpoint``);
* rank_search from the extent heuristic ``_extent_to_rank``
  (postcodes.py:42-49): <=100 m -> 25, <=3000 m -> 23, else 21;
* postcode-shaped query terms are recognized with per-country patterns
  (the reference's country_settings postcode regexes,
  src/nominatim_api/search/postcode_parser.py:20-104) — here the synthetic
  country 'cv' uses the 5-digit pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nominatim_spark.grid import EARTH_DEG_M

# country -> postcode regex (reference pattern table analog; 'd'->digit)
POSTCODE_PATTERNS: dict[str, str] = {
    "cv": r"^\d{5}$",
    "de": r"^\d{5}$",
    "fr": r"^\d{5}$",
    "us": r"^\d{5}(-\d{4})?$",
    "gb": r"^[A-Z]{1,2}\d[A-Z\d]? ?\d[A-Z]{2}$",
}


def build_postcodes(spark, placex: DataFrame) -> DataFrame:
    """placex -> location_postcodes (country, postcode, centroid, rank)."""
    pts = placex.filter(
        F.col("address").getItem("postcode").isNotNull()
        & F.col("country_code").isNotNull()
    ).select(
        "country_code",
        F.upper(F.col("address").getItem("postcode")).alias("postcode"),
        "lon", "lat",
    )
    agg = pts.groupBy("country_code", "postcode").agg(
        F.sum(F.expr("CAST(ROUND((lon + 180.0) * 1e7) AS BIGINT)")).alias("sx"),
        F.sum(F.expr("CAST(ROUND((lat + 90.0) * 1e7) AS BIGINT)")).alias("sy"),
        F.count(F.lit(1)).alias("n"),
        F.max("lon").alias("_xmax"), F.min("lon").alias("_xmin"),
        F.max("lat").alias("_ymax"), F.min("lat").alias("_ymin"),
    )
    extent_m = (
        F.greatest(
            F.col("_xmax") - F.col("_xmin"), F.col("_ymax") - F.col("_ymin")
        )
        * F.lit(EARTH_DEG_M)
    )
    rank = (
        F.when(extent_m <= 100, 25).when(extent_m <= 3000, 23).otherwise(21)
    )
    return agg.select(
        "country_code",
        "postcode",
        (F.expr("sx DIV n") / 1e7 - 180.0).alias("lon"),
        (F.expr("sy DIV n") / 1e7 - 90.0).alias("lat"),
        rank.cast("int").alias("rank_search"),
        F.lit(5).alias("rank_address"),
        F.col("n").alias("n_points"),
    )


def is_postcode_expr(col: str, country: str = "cv"):
    """Column predicate: does the (uppercased) term match the country's
    postcode pattern (postcode_parser.py semantics)."""
    pat = POSTCODE_PATTERNS[country]
    return F.upper(F.col(col)).rlike(pat)


def postcode_search(
    spark,
    postcodes: DataFrame,
    queries: DataFrame,
    *,
    text_col: str = "qtext",
    country: str = "cv",
) -> DataFrame:
    """Resolve postcode-shaped queries against the postcode table
    (PostcodeSearch analog, src/nominatim_api/search/db_searches/
    postcode_search.py): exact normalized-postcode equi-join."""
    q = queries.withColumn("_pc", F.upper(F.trim(F.col(text_col)))).filter(
        is_postcode_expr("_pc", country)
    )
    return q.join(
        F.broadcast(postcodes.filter(F.col("country_code") == country)),
        q._pc == postcodes.postcode,
    ).select(
        "query_id",
        "postcode",
        "country_code",
        "lon",
        "lat",
        "rank_search",
        "rank_address",
    )
