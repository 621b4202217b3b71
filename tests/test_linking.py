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


def test_label_member_lane_links_without_tag_match(spark, tmp_path_factory):
    """Lane 0 (placex_triggers.sql:283-309): a role='label' relation member
    links even when neither wikidata nor name would match — and it beats
    the tag lanes."""
    import pandas as pd

    from nominatim_spark.geometry.wkb import box_wkb, point_wkb
    from nominatim_spark.pipeline.placex import build_index
    from nominatim_spark.sources.synth import PLACE_SCHEMA

    cx, cy = 9.5, 47.5
    place = spark.createDataFrame(
        pd.DataFrame([
            {"osm_type": "R", "osm_id": 500, "class": "boundary",
             "type": "administrative", "admin_level": 8,
             "name": {"name": "Altstadt"}, "address": {}, "extratags": {},
             "geometry": box_wkb(cx - 0.1, cy - 0.1, cx + 0.1, cy + 0.1),
             "categories": ["osm.boundary.administrative", "osm.place.city"]},
            # label node: DIFFERENT name, no wikidata — only the
            # membership can link it
            {"osm_type": "N", "osm_id": 600, "class": "place",
             "type": "city", "admin_level": None,
             "name": {"name": "Oldtown"}, "address": {}, "extratags": {},
             "geometry": point_wkb(cx + 0.02, cy + 0.01),
             "categories": None},
        ]),
        schema=PLACE_SCHEMA,
    )
    labels = pd.DataFrame(
        [{"relation_id": 500, "member_type": "N", "member_id": 600,
          "role": "label"}]
    )
    ckpt = str(tmp_path_factory.mktemp("ckpt_label"))
    idx = build_index(spark, place, ckpt_root=ckpt, label_members=labels)
    bnd = idx.placex.filter("osm_id = 500").head()
    # boundary adopted the label node's centroid
    assert abs(bnd.lon - (cx + 0.02)) < 1e-9
    assert abs(bnd.lat - (cy + 0.01)) < 1e-9
    # the node is linked out of the search universe
    assert idx.search_name.filter("osm_id = 600").count() == 0
