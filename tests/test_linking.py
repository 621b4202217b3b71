"""Linked-place tests (J12 — reference shapes: db/import/linking.feature)."""

import pytest
from pyspark.sql import functions as F

from nominatim_spark.plans.flagship import build_synth_index
from nominatim_spark.sources import synth


@pytest.fixture(scope="module")
def linked_index(spark, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt_link"))
    idx, _ = build_synth_index(
        spark, n_cities=2, n_streets=2, n_houses=2, n_pois=1, ckpt_root=ckpt
    )
    idx.placex.persist().count()
    return idx


def test_label_node_gets_linked(spark, linked_index):
    px = linked_index.placex
    # label node 3000 (city 0, wikidata Q1000) links to boundary R100
    # (note: IndexTables.placex excludes linked rows; read the checkpointed
    # full table through the boundary side instead)
    bnd = px.filter("osm_id = 100").head()
    node = px.filter("osm_id = 3000").collect()
    assert node == []  # excluded from the search universe


def test_boundary_adopts_node_centroid(spark, linked_index):
    bnd = linked_index.placex.filter("osm_id = 100").head()
    cx, cy = synth.city_center(0)
    # label node sits at (cx+0.01, cy+0.008) — boundary centroid adopted it
    assert abs(bnd.lon - (cx + 0.01)) < 1e-9
    assert abs(bnd.lat - (cy + 0.008)) < 1e-9


def test_linked_node_not_searchable(spark, linked_index):
    sn = linked_index.search_name
    assert sn.filter("osm_id = 3000").count() == 0
    assert sn.filter("osm_id = 100").count() == 1


def test_city_query_resolves_to_boundary(spark, linked_index):
    from nominatim_spark.pipeline.search import geocode

    q = spark.createDataFrame(
        [("q1", f"{synth.city_name(0)}, {synth.COUNTRY_NAME}")],
        "query_id string, qtext string",
    )
    res = geocode(spark, linked_index, q).collect()
    assert len(res) == 1
    assert (res[0].osm_type, res[0].osm_id) == ("R", 100)
