"""Flagship pipeline: web pages -> extracted mentions -> geocoded places.

This is the north-star flow (BASELINE.json north_star): a Common-Crawl-style
pages table is scanned once; vectorized extraction pulls address mentions and
coordinates per url (byte-identical); the mentions are batch forward-geocoded
against the engine-built place index; the coordinates are batch
reverse-geocoded.  All heavy joins are broadcast/cell-key equi-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nominatim_spark.pipeline.extract import extract_pages
from nominatim_spark.pipeline.interpolation import build_osmline
from nominatim_spark.pipeline.placex import IndexTables, build_index
from nominatim_spark.pipeline.reverse import reverse_geocode
from nominatim_spark.pipeline.search import geocode
from nominatim_spark.sources import synth


def build_synth_index(
    spark: SparkSession,
    *,
    n_cities: int = 8,
    n_streets: int = 12,
    n_houses: int = 10,
    n_pois: int = 5,
    ckpt_root: str | None = None,
    resume: bool = False,
) -> tuple[IndexTables, DataFrame]:
    """Build the index tables + osmline from the synthetic country."""
    place = synth.place_df(
        spark, n_cities=n_cities, n_streets=n_streets,
        n_houses=n_houses, n_pois=n_pois,
    )
    members, assoc_houses = synth.make_associated_streets(
        n_cities=n_cities, n_streets=n_streets
    )
    if len(assoc_houses):
        place = place.unionByName(
            spark.createDataFrame(assoc_houses, schema=synth.PLACE_SCHEMA)
        )
    idx = build_index(spark, place, ckpt_root=ckpt_root, resume=resume,
                      assoc_members=members,
                      label_members=synth.make_label_members(n_cities=n_cities))
    ways, nodes = synth.make_interpolations(n_cities=n_cities)
    osmline = build_osmline(spark, ways, nodes, idx.placex)
    return idx, osmline


def geocode_pages(
    spark: SparkSession,
    *,
    n_pages: int = 2000,
    n_cities: int = 8,
    n_streets: int = 12,
    n_houses: int = 10,
    n_pois: int = 5,
    ckpt_root: str | None = None,
    resume: bool = False,
) -> DataFrame:
    """pages -> geocoded mentions: (url, mention, place_id, class, ...)."""
    idx, osmline = build_synth_index(
        spark, n_cities=n_cities, n_streets=n_streets, n_houses=n_houses,
        n_pois=n_pois, ckpt_root=ckpt_root, resume=resume,
    )
    pages = synth.pages_df(
        spark, n_pages=n_pages, n_cities=n_cities, n_streets=n_streets,
        n_houses=n_houses, n_pois=n_pois,
    )
    mentions = (
        extract_pages(pages)
        .filter(F.col("mention").isNotNull())
        .withColumn(
            "query_id",
            F.concat(F.col("url"), F.lit("#"), F.col("mention_idx")),
        )
        .select("query_id", F.col("url"), F.col("mention").alias("qtext"))
    )
    from nominatim_spark.pipeline.postcodes import build_postcodes

    res = geocode(spark, idx, mentions, osmline=osmline,
                  postcodes=build_postcodes(spark, idx.placex))
    return res.join(mentions.select("query_id", "url", "qtext"), "query_id")


def reverse_pages(
    spark: SparkSession,
    idx: IndexTables,
    pages: DataFrame,
) -> DataFrame:
    """Reverse geocode every page's embedded coordinate."""
    pts = (
        extract_pages(pages)
        .filter(F.col("geo_lat").isNotNull())
        .select(
            F.col("url").alias("point_id"),
            F.col("geo_lon").alias("lon"),
            F.col("geo_lat").alias("lat"),
        )
        .dropDuplicates(["point_id"])
    )
    return reverse_geocode(spark, idx, pts)
