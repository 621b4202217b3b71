"""Rank computation tests — ported from the reference's BDD scenarios
(/root/reference/test/bdd/features/db/import/rank_computation.feature)."""

import pytest
from pyspark.sql import functions as F

from nominatim_spark.pipeline.rank import backfill_categories, compute_place_rank


def _ranks(spark, rows):
    """rows: (place_id, class, type, ext, admin, is_major, cats_or_None)"""
    df = spark.createDataFrame(
        rows,
        "place_id long, class string, type string, extended_type string, "
        "admin_level int, is_major boolean, categories array<string>",
    )
    df = backfill_categories(df)
    df = df.withColumn("country_code", F.lit(None).cast("string"))
    out = compute_place_rank(df)
    return {r.place_id: (r.rank_search, r.rank_address) for r in out.collect()}


def test_place_node_ranks(spark):
    # Scenario: ranks for place nodes assigned according to their type
    rows = [
        (1, "foo", "bar", "N", None, False, None),
        (11, "place", "Continent", "N", None, False, None),
        (12, "place", "continent", "N", None, False, None),
        (13, "place", "sea", "N", None, False, None),
        (14, "place", "country", "N", None, False, None),
        (15, "place", "state", "N", None, False, None),
        (16, "place", "region", "N", None, False, None),
        (17, "place", "county", "N", None, False, None),
        (18, "place", "city", "N", None, False, None),
        (19, "place", "island", "N", None, False, None),
        (36, "place", "house", "N", None, False, None),
        (101, "place", "city", "N", None, True, None),  # capital=yes
    ]
    got = _ranks(spark, rows)
    assert got[1] == (30, 30)
    assert got[11] == (22, 0)  # 'Continent' unmatched -> place default
    assert got[12] == (2, 0)
    assert got[13] == (2, 0)
    assert got[14] == (4, 0)
    assert got[15] == (8, 0)
    assert got[16] == (18, 0)
    assert got[17] == (12, 12)
    assert got[18] == (16, 16)
    assert got[19] == (17, 0)
    assert got[36] == (30, 30)
    assert got[101] == (15, 16)  # capital boost on search rank only


def test_boundary_ranks_by_admin_level(spark):
    # Scenario: ranks for boundaries assigned according to admin level
    rows = [
        (20, "boundary", "administrative", "A", 2, False, None),
        (21, "boundary", "administrative", "A", 32, False, None),
        (22, "boundary", "administrative", "A", 6, False, None),
        (23, "boundary", "administrative", "A", 10, False, None),
    ]
    got = _ranks(spark, rows)
    assert got[20] == (4, 4)
    assert got[21] == (25, 0)  # administrative32 -> boundary default
    assert got[22] == (12, 12)
    assert got[23] == (20, 20)


def test_boundary_with_place_category_base(spark):
    # compute_place_rank skips place.* when boundary.administrative present
    # (ranking.sql:203-214) — the place address rank is merged later by the
    # placex adjustment stage.
    rows = [
        (20, "boundary", "administrative", "A", 3, False,
         ["osm.boundary.administrative", "osm.place.state"]),
        (22, "boundary", "administrative", "A", 6, False,
         ["osm.boundary.administrative", "osm.place.town"]),
    ]
    got = _ranks(spark, rows)
    assert got[20] == (6, 6)
    assert got[22] == (12, 12)


def test_waterway_relation_boost(spark):
    rows = [
        (1, "waterway", "river", "R", None, False, None),
        (2, "waterway", "river", "W", None, False, None),
    ]
    got = _ranks(spark, rows)
    assert got[1] == (18, 0)  # relation boost -1 (ranking.sql:246-248)
    assert got[2] == (19, 0)


def test_special_cases(spark):
    rows = [
        (1, "highway", "motorway", "N", None, False, None),  # node highway
        (2, "highway", "motorway", "W", None, False, None),
        (3, "landuse", "residential", "W", None, False, None),  # non-area landuse
        (4, "landuse", "residential", "A", None, False, None),
    ]
    got = _ranks(spark, rows)
    assert got[1] == (30, 30)
    assert got[2] == (26, 26)
    assert got[3] == (30, 30)
    assert got[4] == (24, 24)


def test_no_osm_category(spark):
    rows = [(1, "x", "y", "N", None, False, ["foo.bar.baz"])]
    got = _ranks(spark, rows)
    assert got[1] == (99, 99)


def test_backfill_sanitization(spark):
    df = spark.createDataFrame(
        [(1, "multi-class", "odd type!", None)],
        "place_id long, class string, type string, categories array<string>",
    )
    out = backfill_categories(df).collect()[0]
    assert out.categories == ["osm.multi_class.yes"]
