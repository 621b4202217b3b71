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
