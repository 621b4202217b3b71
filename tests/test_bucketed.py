"""Bucketed index tables — exchange-free repeated-batch joins
(io/bucketed.py; the Spark analog of the reference's standing btree
indexes for a long-lived query service)."""

import pytest
from pyspark.sql import functions as F

from nominatim_spark.io.bucketed import (
    count_shuffle_exchanges, load_bucketed_index, save_bucketed_index)
from nominatim_spark.pipeline.search import geocode
from nominatim_spark.plans.flagship import build_synth_index
from nominatim_spark.sources import synth

SCALE = dict(n_cities=2, n_streets=2, n_houses=2, n_pois=1)


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    idx, osmline = build_synth_index(
        spark, ckpt_root=str(tmp_path_factory.mktemp("ckpt_bkt")), **SCALE)
    root = str(tmp_path_factory.mktemp("bkt_tables"))
    names = save_bucketed_index(spark, idx, root, n_buckets=8)
    return idx, load_bucketed_index(spark, idx, names), osmline, root


def test_candidate_join_elides_exchanges(spark, bucketed):
    """The flagship's hottest shuffle — drive-token postings ⋈
    search_name on place_id — runs with ZERO exchanges off the bucketed
    tables (broadcast semi-join preserves the bucket distribution;
    matching bucket specs elide both SMJ exchanges)."""
    idx, b, _, _ = bucketed
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        toks = idx.word.select("word_id").limit(5)

        def exchanges(i):
            posts = i.name_postings.join(
                F.broadcast(toks), "word_id", "left_semi")
            j = posts.join(
                i.search_name.select("place_id", "norm_name"), "place_id")
            j.collect()
            return count_shuffle_exchanges(j)

        assert exchanges(idx) > 0      # unbucketed: shuffles both sides
        assert exchanges(b) == 0       # bucketed: co-located SMJ
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_geocode_over_bucketed_index_matches(spark, bucketed):
    """Same answers through the bucketed tables — the bucketing is a
    physical-layout change only."""
    idx, b, osmline, _ = bucketed
    q = spark.createDataFrame(
        [("b1", f"{synth.street_name(0, 0)}, {synth.city_name(0)}"),
         ("b2", f"{synth.street_name(0, 0)} 3, {synth.city_name(0)}")],
        "query_id string, qtext string",
    )
    want = {r.query_id: (r.osm_type, r.osm_id, r.housenumber)
            for r in geocode(spark, idx, q, osmline=osmline).collect()}
    got = {r.query_id: (r.osm_type, r.osm_id, r.housenumber)
           for r in geocode(spark, b, q, osmline=osmline).collect()}
    assert got == want and len(got) == 2


def test_fresh_session_reregistration(spark, bucketed):
    """A new process has an empty in-memory catalog: register_bucketed_
    index re-creates the external CLUSTERED BY metadata over the
    existing files, and the join is exchange-free again (simulated by
    dropping the catalog entries — external tables keep their data)."""
    from nominatim_spark.io.bucketed import register_bucketed_index

    idx, _, _, root = bucketed
    for t in ("search_name", "name_postings", "addr_postings", "placex"):
        spark.sql(f"DROP TABLE IF EXISTS nomspark_{t}")
    names = register_bucketed_index(spark, root, n_buckets=8)
    b2 = load_bucketed_index(spark, idx, names)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        toks = idx.word.select("word_id").limit(5)
        posts = b2.name_postings.join(
            F.broadcast(toks), "word_id", "left_semi")
        j = posts.join(
            b2.search_name.select("place_id", "norm_name"), "place_id")
        j.collect()
        assert count_shuffle_exchanges(j) == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
