"""Postcode pipeline tests (reference shape: db/import/postcodes.feature +
tools/postcodes.py extent ranking)."""

import pytest
from pyspark.sql import functions as F

from nominatim_spark.pipeline.postcodes import (
    build_postcodes,
    is_postcode_expr,
    postcode_search,
)


@pytest.fixture(scope="module")
def pc_index(spark, tmp_path_factory):
    from nominatim_spark.plans.flagship import build_synth_index

    ckpt = str(tmp_path_factory.mktemp("ckpt_pc"))
    idx, _ = build_synth_index(
        spark, n_cities=2, n_streets=2, n_houses=2, n_pois=1, ckpt_root=ckpt
    )
    idx.placex.persist().count()
    return idx


def test_build_postcodes(spark, pc_index):
    pcs = {r.postcode: r for r in build_postcodes(spark, pc_index.placex).collect()}
    # each synthetic city carries postcode 4700i on its boundary
    assert "47000" in pcs and "47001" in pcs
    p0 = pcs["47000"]
    assert p0.country_code == "cv"
    # single contributing point -> extent 0 -> rank 25 (postcodes.py:42-49)
    assert p0.rank_search == 25
    # centroid is the fixed-point mean of contributing points — the city
    # boundary, whose centroid was adopted from its linked label node
    from nominatim_spark.sources.synth import city_center

    cx, cy = city_center(0)
    assert abs(p0.lon - (cx + 0.01)) < 1e-6 and abs(p0.lat - (cy + 0.008)) < 1e-6


def test_postcode_pattern_predicate(spark):
    df = spark.createDataFrame(
        [("a", "47000"), ("b", "4700"), ("c", "birch street"), ("d", "47000x")],
        "query_id string, qtext string",
    )
    got = df.filter(is_postcode_expr("qtext")).collect()
    assert [r.query_id for r in got] == ["a"]


def test_postcode_search(spark, pc_index):
    pcs = build_postcodes(spark, pc_index.placex)
    q = spark.createDataFrame(
        [("q1", "47001"), ("q2", "not a code"), ("q3", "99999")],
        "query_id string, qtext string",
    )
    res = {r.query_id: r for r in postcode_search(spark, pcs, q).collect()}
    assert set(res) == {"q1"}
    assert res["q1"].postcode == "47001"
    assert res["q1"].rank_search == 25


def test_country_pattern_table_ported_shapes():
    """Per-country postcode formats from the reference's full pattern
    table (settings/country_settings.yaml via postcode_parser.py;
    shapes from test_postcode_parser.py)."""
    from nominatim_spark.pipeline.postcodes import match_postcode

    # country-restricted matching
    assert match_postcode("45325", "de") == "45325"
    assert match_postcode("45325", "gb") is None
    # gb multi-token form, case handled by the caller's upper()
    assert match_postcode("EC1R 3HF") == "EC1R 3HF"
    # nl: four digits + two letters
    assert match_postcode("1000 AP", "nl") == "1000 AP"
    # pl: dd-ddd
    assert match_postcode("01-123", "pl") == "01-123"
    # ca: ldl dld with output canonicalizing the space
    assert match_postcode("K1A0B1", "ca") == "K1A 0B1"
    assert match_postcode("K1A 0B1", "ca") == "K1A 0B1"
    # br: ddddd-ddd, dash restored by the output template
    assert match_postcode("12345678", "br") == "12345-678"
    # us ZIP+4 normalizes to the base ZIP (reference output '\\1')
    assert match_postcode("98021-3600", "us") == "98021"
    # country prefix must agree with the pattern's countries
    assert match_postcode("BA 12233") == "12233"
    assert match_postcode("DE-12345") == "12345"
    assert match_postcode("DE-1234") is None
    # all-zero rejected even when a pattern matches
    assert match_postcode("0000", "de") is None


def test_build_postcodes_normalizes_like_sanitizer(spark):
    """build_postcodes and the clean-postcodes sanitizer share one
    normalization: a cc-prefixed tag yields the SAME canonical row the
    search side's own-postcode column carries (ADVICE r3)."""
    from nominatim_spark.pipeline.sanitizers import clean_postcodes

    placex = spark.createDataFrame(
        [(1, "de", {"postcode": "DE-12345"}, 9.0, 47.0),
         (2, "ca", {"postcode": "k1a0b1"}, -75.0, 45.0),
         (3, "de", {"postcode": "notapc"}, 9.1, 47.1),
         (4, "xx", {"postcode": "55555"}, 0.0, 0.0)],
        "place_id long, country_code string, "
        "address map<string,string>, lon double, lat double",
    )
    rows = {r.country_code: r.postcode
            for r in build_postcodes(spark, placex).collect()}
    assert rows == {"de": "12345", "ca": "K1A 0B1"}

    sanitized = {r.place_id: r.address
                 for r in clean_postcodes(placex).collect()}
    assert sanitized[1]["postcode"] == "12345"
    assert sanitized[2]["postcode"] == "K1A 0B1"
    assert "postcode" not in sanitized[3]
    assert sanitized[3]["unofficial_postcode"] == "NOTAPC"
    # unknown country: no official pattern -> unofficial; a
    # default-pattern argument accepts it (reference default-pattern arg)
    assert "postcode" not in sanitized[4]
    with_dflt = {r.place_id: r.address for r in clean_postcodes(
        placex, default_pattern=r"\d{5}").collect()}
    assert with_dflt[4]["postcode"] == "55555"
