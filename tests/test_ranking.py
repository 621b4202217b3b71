"""Per-query ranking lists (weigh_search fidelity).

The reference builds FieldRanking penalty lists per query field
(db_search_builder.py:299-366 get_name_ranking/get_addr_ranking) and
weigh_search (lib-sql/functions/ranking.sql:327-345) charges each
candidate the ranked penalty when its vector contains the full-word
token set, the default weight otherwise.  These tests drive the batch
re-expression through geocode() on a hand-built two-candidate index
where ONLY the ranking can discriminate.
"""

import pytest
from pyspark.sql import functions as F

from nominatim_spark.pipeline.placex import IndexTables
from nominatim_spark.pipeline.search import geocode

SN_SCHEMA = (
    "place_id long, osm_type string, osm_id long, class string, "
    "type string, rank_search int, rank_address int, importance double, "
    "lon double, lat double, housenumber string, norm_name string, "
    "parent_place_id long, name_vector array<long>, "
    "nameaddress_vector array<long>"
)

WORD_ROWS = [
    # (word_id, word_token, type, name_count)
    (1, "foo", "w", 10),
    (2, "bar", "w", 10),
    (3, "foo bar", "W", 2),
    (4, "vels", "w", 20),
    (5, "vels", "W", 1),
]


def _index(spark, sn_rows):
    word = spark.createDataFrame(
        WORD_ROWS, "word_id long, word_token string, type string, "
                   "name_count long",
    ).withColumn("addr_count", F.lit(0).cast("long"))
    sn = spark.createDataFrame(sn_rows, SN_SCHEMA)
    posts = sn.select("place_id", F.explode("name_vector").alias("word_id"))
    return IndexTables(
        placex=sn, search_name=sn, word=word,
        name_postings=posts.select("word_id", "place_id"),
        addr_postings=posts.select("word_id", "place_id"),
    )


def _row(pid, name_vec, addr_vec, importance, norm_name="foo bar"):
    return (pid, "N", pid, "place", "locality", 20, 20, importance,
            9.0 + pid / 1000.0, 47.0, None, norm_name, None,
            name_vec, addr_vec)


def test_full_name_match_beats_importance(spark):
    """Candidate A holds the query's full-word token W('foo bar'); B only
    AND-matches the partials (same norm_name, higher importance).  The
    name FieldRanking must charge B the default weight so A wins."""
    idx = _index(spark, [
        _row(101, [1, 2, 3], [4], importance=0.1),
        _row(102, [1, 2], [4], importance=0.9),
    ])
    q = spark.createDataFrame([("q1", "foo bar")], "query_id string, qtext string")
    res = geocode(spark, idx, q).collect()
    assert len(res) == 1 and res[0].place_id == 101
    # sanity: without the ranking the ordering keys tie up to importance,
    # which would pick 102
    assert res[0].penalty < 0.2


def test_addr_phrase_full_match_ranks_first(spark):
    """Comma query 'foo bar, vels': candidate C's nameaddress_vector holds
    W('vels') (the phrase as a whole ancestor name), D only the partial
    w('vels').  get_addr_ranking's default must demote D."""
    idx = _index(spark, [
        _row(201, [1, 2, 3], [4, 5], importance=0.1),
        _row(202, [1, 2, 3], [4], importance=0.9),
    ])
    q = spark.createDataFrame([("q1", "foo bar, vels")],
                              "query_id string, qtext string")
    res = geocode(spark, idx, q).collect()
    assert len(res) == 1 and res[0].place_id == 201


def test_postcode_distance_penalty(spark):
    """'foo bar, vels 47000': both candidates AND-match name+addr; the
    query postcode's centroid sits next to candidate 401, so the
    PlaceSearch postcode penalty (place_search.py:149-163, J16) must
    pick it over the higher-importance 402."""
    idx = _index(spark, [
        _row(401, [1, 2], [4], importance=0.1),   # lon 9.401
        _row(402, [1, 2], [4], importance=0.9),   # lon 9.402
    ])
    pcs = spark.createDataFrame(
        [("cv", "47000", 9.401, 47.0, 23, 5)],
        "country_code string, postcode string, lon double, lat double, "
        "rank_search int, rank_address int",
    )
    q = spark.createDataFrame([("q1", "foo bar, vels 47000")],
                              "query_id string, qtext string")
    res = geocode(spark, idx, q, postcodes=pcs).collect()
    assert len(res) == 1 and res[0].place_id == 401


def test_unranked_candidates_unchanged(spark):
    """When no full-word token exists for the query, every candidate pays
    the same default — ordering falls back to importance as before."""
    idx = _index(spark, [
        _row(301, [1], [], importance=0.2, norm_name="foo"),
        _row(302, [1], [], importance=0.7, norm_name="foo"),
    ])
    q = spark.createDataFrame([("q1", "foo")], "query_id string, qtext string")
    res = geocode(spark, idx, q).collect()
    assert len(res) == 1 and res[0].place_id == 302


def test_addr_ladder_multi_path(spark):
    """get_addr_ranking's multi-path ladder (db_search_builder.py:314-366,
    ported test_name_and_complex_address shapes): a two-word address
    phrase ranks through EVERY full-word segmentation — a candidate
    whose vector carries only W('foo') still beats the default-weight
    candidate via the [W(foo), partial bar] path at 0.1."""
    from nominatim_spark.pipeline.search import _plan_assignments

    word = spark.createDataFrame(
        [(1, "foo", "w", 10), (2, "bar", "w", 10), (3, "foo bar", "W", 2),
         (6, "foo", "W", 3), (4, "vels", "w", 20), (5, "vels", "W", 1)],
        "word_id long, word_token string, type string, name_count long",
    )
    q = spark.createDataFrame(
        [(1, 0, "vels", "foo bar", 0.0, ["foo bar"],
          [{"pos": 0, "sid": 0, "txt": "foo bar"},
           {"pos": 0, "sid": 1, "txt": "foo"},
           {"pos": 0, "sid": 2, "txt": "bar"}],
          [{"pos": 0, "pen": 0.0, "sids": [0]},
           {"pos": 0, "pen": 0.1, "sids": [1]},
           {"pos": 0, "pen": 0.1, "sids": [2]},
           {"pos": 0, "pen": 0.1, "sids": [1, 2]}],
          [0.4])],
        "query_id long, assign_id int, name_norm string, addr_norm string, "
        "apenalty double, addr_phrases array<string>, "
        "addr_spans array<struct<pos:int,sid:int,txt:string>>, "
        "addr_paths array<struct<pos:int,pen:double,sids:array<int>>>, "
        "addr_dflts array<double>",
    )
    plan = _plan_assignments(q, word).head()
    ranks = plan.addr_ranks
    assert len(ranks) == 1  # one ladder per address phrase
    ph = ranks[0]
    assert ph.dflt == pytest.approx(0.4)
    ents = {tuple(e.ids): e.pen for e in ph.entries}
    # whole-phrase W(3) at 0, W(foo)=6 alone at 0.1; paths needing the
    # unindexed W('bar') were dropped
    assert ents == {(3,): pytest.approx(0.0), (6,): pytest.approx(0.1)}


def test_addr_ladder_end_to_end(spark):
    """Candidate with W('foo') in its address vector (ladder path 0.1)
    outranks the default-weight candidate (0.4) — even though neither
    holds the whole-phrase token; higher importance on the loser proves
    the penalty decided it."""
    idx = _index(spark, [
        _row(1, [4, 5], [1, 2, 6], 0.1),  # addr vector carries W('foo')=6
        _row(2, [4, 5], [1, 2], 0.9),     # partials only -> default 0.4
    ])
    # W('foo') id 6 must exist in the dictionary for the ladder probe
    idx = IndexTables(
        placex=idx.placex, search_name=idx.search_name,
        word=idx.word.unionByName(
            idx.word.sparkSession.createDataFrame(
                [(6, "foo", "W", 3, 0)],
                "word_id long, word_token string, type string, "
                "name_count long, addr_count long")),
        name_postings=idx.name_postings, addr_postings=idx.addr_postings)
    q = spark.createDataFrame([("q1", "vels, foo bar")],
                              "query_id string, qtext string")
    res = geocode(spark, idx, q).collect()
    assert len(res) == 1 and res[0].place_id == 1
