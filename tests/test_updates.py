"""Incremental index updates (diff replay) — streaming/updates.py.

Mirrors the reference's diff-import semantics (place_force_update
invalidation + reindex of dirty rows)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from nominatim_spark.geometry.wkb import point_wkb
from nominatim_spark.pipeline.search import geocode
from nominatim_spark.plans.flagship import build_synth_index
from nominatim_spark.sources import synth
from nominatim_spark.sources.synth import PLACE_SCHEMA
from nominatim_spark.streaming.updates import apply_place_updates

SCALE = dict(n_cities=2, n_streets=2, n_houses=2, n_pois=1)


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt_upd"))
    idx, _ = build_synth_index(spark, ckpt_root=ckpt, **SCALE)
    idx.placex.persist().count()
    idx.search_name.persist().count()
    return idx


def _place_rows(spark, rows):
    pdf = pd.DataFrame(rows)
    pdf["admin_level"] = pd.Series([r.get("admin_level") for r in rows],
                                   dtype=object)
    return spark.createDataFrame(pdf, schema=PLACE_SCHEMA)


def test_new_house_indexes_incrementally(spark, index):
    cx, cy = synth.city_center(0)
    y = cy - 0.1  # street 0 of city 0
    updates = _place_rows(spark, [{
        "osm_type": "N", "osm_id": 9100001, "class": "building",
        "type": "yes", "admin_level": None, "name": {},
        "address": {"housenumber": "99",
                    "street": synth.street_name(0, 0)},
        "extratags": {}, "geometry": point_wkb(cx + 0.01, y + 0.0005),
        "categories": None,
    }])
    idx2 = apply_place_updates(spark, index, updates)
    row = idx2.placex.filter("osm_id = 9100001").head()
    assert row is not None
    assert row.parent_place_id == 10000 * 4 + 1  # parented to Birch Street
    q = spark.createDataFrame(
        [("u1", f"{synth.street_name(0, 0)} 99, {synth.city_name(0)}")],
        "query_id string, qtext string",
    )
    res = geocode(spark, idx2, q).collect()
    assert len(res) == 1 and res[0].osm_id == 9100001


def test_delete_removes_place(spark, index):
    deletes = spark.createDataFrame(
        [("N", 100000)], "osm_type string, osm_id long"
    )
    empty = _place_rows(spark, [{
        # a harmless far-away POI update so the batch is non-empty
        "osm_type": "N", "osm_id": 9100002, "class": "amenity",
        "type": "restaurant", "admin_level": None,
        "name": {"name": "Cafe Nowhere"}, "address": {},
        "extratags": {}, "geometry": point_wkb(10.5, 48.0),
        "categories": None,
    }])
    idx2 = apply_place_updates(spark, index, empty, deletes=deletes)
    assert idx2.placex.filter("osm_id = 100000").count() == 0
    assert idx2.search_name.filter("osm_id = 100000").count() == 0
    assert idx2.search_name.filter("osm_id = 9100002").count() == 1


def test_boundary_update_rejected(spark, index):
    updates = _place_rows(spark, [{
        "osm_type": "R", "osm_id": 100, "class": "boundary",
        "type": "administrative", "admin_level": 8,
        "name": {"name": "Vels"}, "address": {}, "extratags": {},
        "geometry": point_wkb(9.25, 47.25), "categories": None,
    }])
    with pytest.raises(ValueError, match="boundary"):
        apply_place_updates(spark, index, updates)


def test_delete_street_reparents_children(spark, index):
    """Deleting a street invalidates its padded cover: the houses that
    parented to it re-run parenting and fall back (place_force_update
    semantics for removals)."""
    sid = 10000  # street 0 of city 0
    street_pid = sid * 4 + 1
    deletes = spark.createDataFrame(
        [("W", sid)], "osm_type string, osm_id long"
    )
    # non-empty update far away so the batch carries both kinds
    cx, cy = synth.city_center(1)
    updates = _place_rows(spark, [{
        "osm_type": "N", "osm_id": 9400001, "class": "amenity",
        "type": "restaurant", "admin_level": None,
        "name": {"name": "Cafe Far"}, "address": {},
        "extratags": {}, "geometry": point_wkb(cx, cy + 0.05),
        "categories": None,
    }])
    idx2 = apply_place_updates(spark, index, updates, deletes=deletes)
    assert idx2.placex.filter(f"place_id = {street_pid}").count() == 0
    # the street's houses survive but no longer point at the dead street
    orphans = idx2.placex.filter(
        f"osm_id >= {1000000 + sid * 100} and osm_id < {1000000 + sid * 100 + 100}"
    ).collect()
    assert len(orphans) > 0
    assert all(r.parent_place_id != street_pid for r in orphans)


def test_stream_place_updates(spark, index, tmp_path):
    """Structured-Streaming diff replay: a file-sourced micro-batch of
    place rows merges into the standing index via foreachBatch."""
    from nominatim_spark.streaming.updates import stream_place_updates

    cx, cy = synth.city_center(0)
    y = cy - 0.1
    upd = _place_rows(spark, [{
        "osm_type": "N", "osm_id": 9300001, "class": "building",
        "type": "yes", "admin_level": None, "name": {},
        "address": {"housenumber": "55",
                    "street": synth.street_name(0, 0)},
        "extratags": {}, "geometry": point_wkb(cx - 0.02, y + 0.0003),
        "categories": None,
    }])
    src = str(tmp_path / "diff_src")
    upd.write.parquet(src)
    stream = spark.readStream.schema(upd.schema).parquet(src)
    idx_ref = {"idx": index}
    q = stream_place_updates(
        spark, stream, idx_ref, str(tmp_path / "stream_ckpt")
    )
    q.processAllAvailable()
    q.stop()
    merged = idx_ref["idx"]
    row = merged.placex.filter("osm_id = 9300001").head()
    assert row is not None and row.parent_place_id == 10000 * 4 + 1


def test_street_rename_reindexes(spark, index):
    """Renaming a street re-tokenizes it: the new name resolves, and its
    existing houses (invalidated by the padded cover) keep their parent."""
    cx, cy = synth.city_center(1)
    y = cy - 0.1  # street 0 of city 1
    from nominatim_spark.geometry.wkb import linestring_wkb

    sid = 10000 + 1 * 100 + 0
    updates = _place_rows(spark, [{
        "osm_type": "W", "osm_id": sid, "class": "highway",
        "type": "residential", "admin_level": None,
        "name": {"name": "Renamed Boulevard"}, "address": {},
        "extratags": {},
        "geometry": linestring_wkb([(cx - 0.12, y), (cx + 0.12, y)]),
        "categories": None,
    }])
    idx2 = apply_place_updates(spark, index, updates)
    q = spark.createDataFrame(
        [("r1", f"Renamed Boulevard, {synth.city_name(1)}")],
        "query_id string, qtext string",
    )
    res = geocode(spark, idx2, q).collect()
    assert len(res) == 1 and res[0].osm_id == sid
    # houses along the street still have it as parent (re-parented, since
    # their addr:street tag no longer matches the new name they fall back
    # to the containing area OR keep the street through proximity; assert
    # they are still present and parented)
    house = idx2.placex.filter(f"osm_id = {1000000 + sid * 100}").head()
    assert house is not None and house.parent_place_id is not None


def test_place_node_rename_incremental(spark, tmp_path):
    """A place-node update (rank 16..25) is IN the incremental scope: its
    fuzzy-radius cover invalidates every rank>=26 place whose address
    vocabulary carries the node's name (update_place_diameter cascade,
    utils.sql:541-587)."""
    from nominatim_spark.pipeline.placex import build_index

    place = synth.place_df(spark, **SCALE)
    cx, cy = synth.city_center(0)
    suburb = {
        "osm_type": "N", "osm_id": 555000, "class": "place",
        "type": "suburb", "admin_level": None,
        "name": {"name": "Altstadt"}, "address": {}, "extratags": {},
        "geometry": point_wkb(cx - 0.077, cy - 0.0945),
        "categories": None,
    }
    place = place.unionByName(_place_rows(spark, [suburb]))
    idx0 = build_index(spark, place, ckpt_root=str(tmp_path / "nodeupd"))
    idx0.search_name.persist().count()

    poi = synth.poi_name(0, 0)
    q = spark.createDataFrame(
        [("a", f"{poi}, Altstadt"), ("b", f"{poi}, Neustadt")],
        "query_id string, qtext string",
    )
    res0 = {r.query_id: r for r in geocode(spark, idx0, q).collect()}
    assert res0["a"].osm_id == 100000   # precondition: fuzzy node context
    assert "b" not in res0

    renamed = dict(suburb, name={"name": "Neustadt"})
    idx1 = apply_place_updates(spark, idx0,
                               _place_rows(spark, [renamed]))
    res1 = {r.query_id: r for r in geocode(spark, idx1, q).collect()}
    assert res1["b"].osm_id == 100000   # new name reached the vectors
    assert "a" not in res1              # old name gone
    # the node itself re-indexed under its new name
    q2 = spark.createDataFrame([("s", "Neustadt")],
                               "query_id string, qtext string")
    got = geocode(spark, idx1, q2).collect()
    assert len(got) == 1 and got[0].osm_id == 555000


def test_linked_label_node_update_rejected(spark, index):
    """Updating a LINKED label node invalidates linking — full build
    required (documented scope cut)."""
    row = {
        "osm_type": "N", "osm_id": 3000, "class": "place", "type": "city",
        "admin_level": None, "name": {"name": "Vels Renamed"},
        "address": {}, "extratags": {"wikidata": "Q1000"},
        "geometry": point_wkb(*synth.city_center(0)),
        "categories": None,
    }
    with pytest.raises(ValueError, match="linked"):
        apply_place_updates(spark, index, _place_rows(spark, [row]))


def test_linked_label_rename_both_name_and_wikidata_rejected(spark, index):
    """The escape VERDICT r4 flagged: renaming a linked label node AND
    changing its wikidata means neither the name nor the wikidata lane
    matches the standing boundary — the identity lane (standing row has
    linked_place_id set) must still raise."""
    row = {
        "osm_type": "N", "osm_id": 3000, "class": "place", "type": "city",
        "admin_level": None, "name": {"name": "Totally Different"},
        "address": {}, "extratags": {"wikidata": "Q999999"},
        "geometry": point_wkb(*synth.city_center(0)),
        "categories": None,
    }
    with pytest.raises(ValueError, match="linked"):
        apply_place_updates(spark, index, _place_rows(spark, [row]))


def test_linked_label_delete_rejected(spark, index):
    """Deleting a linked label node unlinks its boundary — same cascade."""
    empty = spark.createDataFrame([], PLACE_SCHEMA)
    dele = spark.createDataFrame([("N", 3000)],
                                 "osm_type string, osm_id long")
    with pytest.raises(ValueError, match="linked"):
        apply_place_updates(spark, index, empty, deletes=dele)
