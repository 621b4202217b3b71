"""Token-role assignment for unstructured queries + postcode search lane.

Shapes ported from the reference's token-assignment tests
(/root/reference/test/python/api/search/test_token_assignment.py) and
postcode search (db_searches/postcode_search.py)."""

import pytest

from nominatim_spark.pipeline.search import _assignments, geocode
from nominatim_spark.pipeline.postcodes import build_postcodes
from nominatim_spark.plans.flagship import build_synth_index
from nominatim_spark.sources import synth

SCALE = dict(n_cities=4, n_streets=4, n_houses=4, n_pois=2)


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt_assign"))
    idx, osmline = build_synth_index(spark, ckpt_root=ckpt, **SCALE)
    idx.search_name.persist().count()
    return idx, osmline


def _by_roles(assigns):
    # a[3] is the multi-country readings tuple (canonical first) or None
    return {(a[0], a[1], a[2], a[3][0] if a[3] else None): a[4]
            for a in assigns}


def test_comma_query_housenumber_dual_reading():
    # the reference yields BOTH the housenumber reading and the
    # digit-kept-in-name reading (token_assignment.py dual readings)
    a = _assignments("Birch Street 3, Vels")
    assert len(a) == 2
    roles = _by_roles(a)
    assert roles[("birch street", "3", "vels", None)] == 0.0
    assert roles[("birch street 3", None, "vels", None)] == pytest.approx(0.1)


def test_comma_query_no_digit_single_assignment():
    a = _assignments("Birch Street, Vels")
    assert len(a) == 1
    assert _by_roles(a)[("birch street", None, "vels", None)] == 0.0


def test_digit_kept_in_name_reading():
    # 'Studio 54' must be reachable through the name lane, not only the
    # housenumber lane (which requires a street candidate)
    roles = _by_roles(_assignments("Studio 54"))
    assert roles[("studio", "54", "", None)] == 0.0
    assert roles[("studio 54", None, "", None)] == pytest.approx(0.1)


def test_unphrased_splits_both_directions():
    roles = _by_roles(_assignments("Birch Street Vels"))
    # full name, zero penalty
    assert roles[("birch street vels", None, "", None)] == 0.0
    # forward split: name prefix / addr suffix
    assert roles[("birch street", None, "vels", None)] == pytest.approx(0.1)
    # backward split: addr prefix / name suffix
    assert roles[("street vels", None, "birch", None)] == pytest.approx(0.1)
    assert roles[("vels", None, "birch street", None)] == pytest.approx(0.1)


def test_trailing_housenumber_unpenalized():
    roles = _by_roles(_assignments("Vels Birch Street 3"))
    assert roles[("birch street", "3", "vels", None)] == pytest.approx(0.1)
    assert roles[("vels birch street", "3", "", None)] == 0.0


def test_leading_housenumber_penalized():
    roles = _by_roles(_assignments("3 Birch Street"))
    assert roles[("birch street", "3", "", None)] == pytest.approx(0.4)


def test_postcode_only_assignment():
    a = _assignments("47000")
    assert len(a) == 1
    name, hnr, addr, pc, pen, dirn, aphr, nk, qk = a[0]
    assert (name, hnr, addr) == ("", None, "")
    # multi-country readings, canonical spelling first
    # (postcode_parser.py:85-110 keeps the full outcode set)
    assert pc[0] == "47000" and len(pc) > 1
    assert pen == pytest.approx(0.1)


def test_postcode_cc_prefix():
    # 'CV 47000' and 'CV-47000' strip the country prefix
    # (postcode_parser.py norm_pattern / postcode_format.py:29);
    # the explicit prefix pins the country: ONE reading
    assert _assignments("CV 47000")[0][3] == ("47000",)
    assert _assignments("CV-47000")[0][3] == ("47000",)
    # all-zero forms are rejected (postcode_format.py zero_pattern)
    assert _assignments("00000")[0][3] is None


def test_postcode_multi_country_readings():
    """Un-prefixed ambiguous numbers keep every country interpretation
    (reference test_postcode_parser.py multi-country cases)."""
    from nominatim_spark.pipeline.postcodes import match_postcode_all

    # '45325' is Germany's identity AND Sweden/Poland/... groupings
    got = match_postcode_all("45325")
    assert got[0] == "45325"
    assert "453 25" in got and "45-325" in got
    # a country prefix restricts to that country's reading
    assert match_postcode_all("cv 47000") == ["47000"]
    # space-grouped spellings normalize through their own pattern only
    assert match_postcode_all("ec1r 3hf") == ["EC1R 3HF"]


def test_postcode_in_address_phrase():
    # 'street 5, 12345 city' routes the postcode to the postcode role and
    # keeps the city as an address phrase (postcode_parser.py:49-83)
    roles = _by_roles(_assignments("Birch Street 5, 47000 Vels"))
    assert ("birch street", "5", "vels", "47000") in roles
    # the no-postcode fallback reading also exists (penalized)
    assert any(k[3] is None for k in roles)


def test_postcode_parser_ported_shapes():
    """Shapes from the reference's postcode-parser tests
    (test/python/api/search/test_postcode_parser.py)."""
    from nominatim_spark.pipeline.postcodes import match_postcode as \
        _match_postcode

    # case-insensitive multi-token postcode (:93-96)
    assert _match_postcode("ec1r 3hf") == "EC1R 3HF"
    # joined country prefix strips (:139-142)
    assert _match_postcode("cv47000") == "47000"
    # non-matching country prefix is not a postcode (:145-148)
    assert _match_postcode("ky47000") is None
    # all-zero forms rejected (postcode_format zero_pattern)
    assert _match_postcode("00000") is None
    # a gb-shaped phrase becomes the postcode role
    roles = _by_roles(_assignments("Birch Street, ec1r 3hf"))
    assert ("birch street", None, "", "EC1R 3HF") in roles


def test_postcode_whole_phrase():
    roles = _by_roles(_assignments("Birch Street, 47000"))
    assert ("birch street", None, "", "47000") in roles


def test_postcode_trailing_unphrased():
    roles = _by_roles(_assignments("Birch Street 47000"))
    assert ("birch street", None, "", "47000") in roles
    # digit housenumbers still enumerate alongside the postcode
    roles2 = _by_roles(_assignments("Birch Street 3 47000"))
    assert ("birch street", "3", "", "47000") in roles2


def test_geocode_unphrased_queries(spark, index):
    idx, osmline = index
    q = spark.createDataFrame(
        [("f1", f"{synth.street_name(0, 0)} {synth.city_name(0)}"),
         ("b1", f"{synth.city_name(0)} {synth.street_name(0, 0)}"),
         ("h1", f"{synth.city_name(0)} {synth.street_name(0, 0)} 3"),
         ("c1", synth.city_name(1))],
        "query_id string, qtext string",
    )
    res = {r.query_id: r for r in geocode(spark, idx, q, osmline=osmline).collect()}
    street_pid = 10000 * 4 + 1
    assert (res["f1"].osm_type, res["f1"].osm_id) == ("W", 10000)
    assert (res["b1"].osm_type, res["b1"].osm_id) == ("W", 10000)
    assert res["h1"].housenumber == "3"
    assert res["h1"].osm_type == "N"
    assert (res["c1"].osm_type, res["c1"].osm_id) == ("R", 101)
    del street_pid


def test_direction_penalty_disambiguates(spark, index):
    """F14 (query.py:333-346): token name/address stats regress over
    position; 'Vels Birch Street' reads backward (city token is addressy,
    street tokens are namier), so the forward split ('vels' as name) pays
    the direction penalty on top of the split penalty."""
    from nominatim_spark.pipeline.search import (
        _fold_direction_penalty, parse_queries)

    idx, _ = index
    q = spark.createDataFrame(
        [("d1", f"{synth.city_name(0)} {synth.street_name(0, 0)}")],
        "query_id string, qtext string",
    )
    folded = _fold_direction_penalty(parse_queries(q), idx.word)
    pens = {
        (r.name_norm, r.adirection): r.apenalty for r in folded.collect()
    }
    fwd = pens[("vels", 1)]                # 'vels' as name (forward)
    bwd = pens[("birch street", -1)]       # 'birch street' as name
    assert fwd > bwd
    assert bwd == pytest.approx(0.1)       # backward matches the trend


def test_search_knobs(spark, index):
    """viewbox / layers / excluded_place_ids (db_searches/base.py:53-95,
    place_search.py:82-90)."""
    idx, osmline = index
    street_pid = 10000 * 4 + 1
    q = spark.createDataFrame(
        [("k1", f"{synth.street_name(0, 0)}, {synth.city_name(0)}")],
        "query_id string, qtext string",
    )
    base = geocode(spark, idx, q, osmline=osmline).collect()
    assert base[0].place_id == street_pid

    # excluded: the street is skipped, another candidate (or nothing) wins
    excl = geocode(spark, idx, q, osmline=osmline,
                   excluded_place_ids=[street_pid]).collect()
    assert all(r.place_id != street_pid for r in excl)

    # bounded viewbox far away: no result
    far = geocode(spark, idx, q, osmline=osmline,
                  viewbox=(0.0, 0.0, 1.0, 1.0),
                  bounded_viewbox=True).collect()
    assert far == []

    # layer restriction: poi layer excludes highway results
    poi_only = geocode(spark, idx, q, osmline=osmline,
                       layers=["poi"]).collect()
    assert all(r["class"] != "highway" for r in poi_only)

    # unbounded viewbox: result survives with a penalty
    pen = geocode(spark, idx, q, osmline=osmline,
                  viewbox=(0.0, 0.0, 1.0, 1.0)).collect()
    assert pen[0].place_id == street_pid and pen[0].penalty >= 1.0

    # countrycodes restriction (SearchDetails.countries): the index
    # country passes, a foreign-only list removes every candidate
    cc_hit = geocode(spark, idx, q, osmline=osmline,
                     countries=["CV"]).collect()
    assert cc_hit[0].place_id == street_pid
    cc_miss = geocode(spark, idx, q, osmline=osmline,
                      countries=["us", "de"]).collect()
    assert cc_miss == []


def test_geocode_all_adaptive_cut(spark, index):
    """T4 (geocoder.py:174-191): ranked list per query, results beyond
    best-penalty + epsilon dropped."""
    from nominatim_spark.pipeline.search import geocode_all

    idx, osmline = index
    q = spark.createDataFrame(
        [("q1", f"{synth.street_name(0, 0)}, {synth.city_name(0)}")],
        "query_id string, qtext string",
    )
    res = geocode_all(spark, idx, q, osmline=osmline,
                      max_results=5, epsilon=0.5).collect()
    assert len(res) >= 1
    ranks = sorted(r.result_rank for r in res)
    assert ranks == list(range(1, len(res) + 1))
    best = next(r for r in res if r.result_rank == 1)
    assert (best.osm_type, best.osm_id) == ("W", 10000)
    pens = [r.penalty for r in res]
    assert max(pens) <= min(pens) + 0.5
    # no duplicate places in the list
    assert len({r.place_id for r in res}) == len(res)


def test_near_search_category(spark, index):
    """NearSearch (J18, db_searches/near_search.py:75-135): category
    candidates within a radius of each anchor, nearest first."""
    from nominatim_spark.pipeline.search import near_search

    idx, _ = index
    cx, cy = synth.city_center(0)
    # anchor exactly on POI 0 of city 0 (poi p sits at cx-0.08+p*0.04)
    anchors = spark.createDataFrame(
        [("a0", cx - 0.08, cy - 0.1 + 0.003)],
        "anchor_id string, lon double, lat double",
    )
    res = near_search(
        spark, idx, anchors, cls="amenity", typ="restaurant",
        radius_deg=0.08, k=5,
    ).collect()
    assert len(res) == 2  # both city-0 POIs are inside the radius
    best = min(res, key=lambda r: r.rank)
    assert best.osm_id == 100000  # POI 0 is the anchor itself
    assert best.dist2 <= 1e-9
    assert all(r["class"] == "amenity" for r in res)


def test_near_item_assignment():
    a = _assignments("restaurant near Birch Street, Vels")
    near = [x for x in a if x[7] == "amenity|restaurant"]
    plain = [x for x in a if x[7] is None]
    # anchor readings with the category stripped…
    assert ("birch street", None, "vels") in {
        (x[0], x[1], x[2]) for x in near}
    # …and the literal reading survives (dies in the plan stage)
    assert plain
    # category-only query -> PoiSearch assignment
    poi = _assignments("restaurant")
    assert poi == [("", None, "", None, 0.2, 0, [], "amenity|restaurant",
                    None)]


def test_query_preprocessors():
    from nominatim_spark.pipeline.preprocess import (
        compile_chain, split_japanese_phrases)
    # undelimited Japanese address splits at suffix characters
    # (query_preprocessing/split_japanese_phrases.py:18-60)
    assert split_japanese_phrases("東京都千代田区丸の内") == "東京都 千代田区 丸の内"
    assert split_japanese_phrases("千代田区丸の内") == "千代田区 丸の内"
    assert split_japanese_phrases("plain text") == "plain text"
    # ordered regex-replace rules (regex_replace.py:24-50)
    pre = compile_chain([
        {"step": "regex-replace",
         "replacements": [{"pattern": r"\bStret\b", "replace": "Street"}]},
    ])
    assert pre("Birch Stret 3") == "Birch Street 3"


def test_geocode_with_regex_preprocessor(spark, index):
    idx, osmline = index
    q = spark.createDataFrame(
        [("r1", f"Birch Stret, {synth.city_name(0)}")],
        "query_id string, qtext string",
    )
    rules = [{"step": "regex-replace",
              "replacements": [{"pattern": r"\bStret\b",
                                "replace": "Street"}]}]
    res = geocode(spark, idx, q, osmline=osmline,
                  preprocessors=rules).collect()
    assert len(res) == 1 and (res[0].osm_type, res[0].osm_id) == ("W", 10000)


def test_housenumber_letter_suffix_variants(spark):
    """'4a' and '4 a' must both match a house indexed either way — the
    batch analog of the reference's word-boundary RegexpWord housenumber
    match (sqlalchemy_functions.py:204-218): both sides canonicalize to
    the optional-space marker form."""
    from pyspark.sql import functions as F
    from nominatim_spark.pipeline.placex import IndexTables

    sn = spark.createDataFrame(
        [(601, "W", 601, "highway", "residential", 26, 26, 0.2, 9.0, 47.0,
          None, "foo bar", None, [1, 2], [1, 2], []),
         (602, "N", 602, "building", "yes", 30, 30, 0.0, 9.001, 47.0,
          "4␣a", "foo bar", 601, [1, 2], [1, 2], ["4␣a"])],
        "place_id long, osm_type string, osm_id long, class string, "
        "type string, rank_search int, rank_address int, importance double, "
        "lon double, lat double, housenumber string, norm_name string, "
        "parent_place_id long, name_vector array<long>, "
        "nameaddress_vector array<long>, housenumbers array<string>",
    )
    word = spark.createDataFrame(
        [(1, "foo", "w", 5), (2, "bar", "w", 5)],
        "word_id long, word_token string, type string, name_count long",
    ).withColumn("addr_count", F.lit(0).cast("long"))
    posts = sn.select("place_id", F.explode("name_vector").alias("word_id"))
    idx = IndexTables(placex=sn, search_name=sn, word=word,
                      name_postings=posts.select("word_id", "place_id"),
                      addr_postings=posts.select("word_id", "place_id"))
    q = spark.createDataFrame(
        [("a", "foo bar 4a"), ("b", "foo bar 4 a"), ("c", "foo bar 4A")],
        "query_id string, qtext string",
    )
    res = {r.query_id: r for r in geocode(spark, idx, q).collect()}
    for k in ("a", "b", "c"):
        assert res[k].place_id == 602, k


def test_geocode_near_item_routing(spark, index):
    """'restaurant near <street>, <city>' resolves the street as the
    anchor, then returns the nearest amenity/restaurant around it via the
    J18 disk-cell join (db_search_builder near_item chaining)."""
    idx, osmline = index
    q = spark.createDataFrame(
        [("n1", f"restaurant near {synth.street_name(0, 0)}, "
                f"{synth.city_name(0)}")],
        "query_id string, qtext string",
    )
    res = {r.query_id: r for r in geocode(
        spark, idx, q, osmline=osmline, near_radius_deg=0.1).collect()}
    r = res["n1"]
    assert r["class"] == "amenity" and r.type == "restaurant"
    # POI 100001 sits nearer the street-0 centroid than POI 100000
    assert (r.osm_type, r.osm_id) == ("N", 100001)


def test_geocode_poi_search_bounded_viewbox(spark, index):
    idx, osmline = index
    cx, cy = synth.city_center(0)
    q = spark.createDataFrame([("p1", "restaurant")],
                              "query_id string, qtext string")
    res = geocode(spark, idx, q, osmline=osmline,
                  viewbox=(cx - 0.2, cy - 0.2, cx + 0.2, cy + 0.2),
                  bounded_viewbox=True).collect()
    assert len(res) == 1 and res[0]["class"] == "amenity"
    # without a bounded viewbox the PoiSearch is not built (reference
    # build_poi_search guard) — no result
    assert geocode(spark, idx, q, osmline=osmline).isEmpty()


def test_geocode_structured(spark, index):
    """Structured /search params (core.py search_address): typed fields
    become the comma-phrased reading; postalcode routes through the
    postcode role."""
    from nominatim_spark.pipeline.postcodes import build_postcodes
    from nominatim_spark.pipeline.search import geocode_structured

    idx, osmline = index
    q = spark.createDataFrame(
        [("s1", f"{synth.street_name(0, 0)} 3", synth.city_name(0), None),
         ("s2", None, synth.city_name(1), None),
         ("s3", None, None, "47000")],
        "query_id string, street string, city string, postalcode string",
    )
    res = {r.query_id: r for r in geocode_structured(
        spark, idx, q, osmline=osmline,
        postcodes=build_postcodes(spark, idx.placex)).collect()}
    assert res["s1"].housenumber == "3" and res["s1"].osm_type == "N"
    assert (res["s2"].osm_type, res["s2"].osm_id) == ("R", 101)
    assert res["s3"].type == "postcode"


def test_geocode_postcode_lane(spark, index):
    idx, osmline = index
    postcodes = build_postcodes(spark, idx.placex)
    q = spark.createDataFrame(
        [("p1", "47000"), ("p2", "47002"), ("miss", "99999")],
        "query_id string, qtext string",
    )
    res = {
        r.query_id: r
        for r in geocode(
            spark, idx, q, osmline=osmline, postcodes=postcodes
        ).collect()
    }
    assert res["p1"].type == "postcode" and res["p1"].osm_type == "P"
    cx, cy = synth.city_center(0)
    assert abs(res["p1"].lon - cx) < 0.2 and abs(res["p1"].lat - cy) < 0.2
    assert res["p2"].type == "postcode"
    assert "miss" not in res


def test_feature_type_rank_window(spark, index):
    """featureType country/state/city/settlement rank windows
    (v1/helpers.py feature_type_to_rank, VERDICT r4 ask #5)."""
    idx, osmline = index
    q = spark.createDataFrame(
        [("c1", synth.city_name(1))], "query_id string, qtext string")
    res = geocode(spark, idx, q, osmline=osmline,
                  feature_type="city").collect()
    assert len(res) == 1 and res[0].osm_id == 101
    # a city name cannot answer a country-typed search
    res = geocode(spark, idx, q, osmline=osmline,
                  feature_type="country").collect()
    assert res == []
    # the country row does
    qc = spark.createDataFrame(
        [("c2", "Corvania")], "query_id string, qtext string")
    res = geocode(spark, idx, qc, osmline=osmline,
                  feature_type="country").collect()
    assert len(res) == 1 and res[0].osm_id == 1


def test_geocode_all_dedupe(spark, tmp_path):
    """deduplicate_results (v1/helpers.py:126-151): a street split into
    two same-named ways yields ONE result with dedupe (same
    classification), both with dedupe=False."""
    import pandas as pd

    from nominatim_spark.geometry.wkb import linestring_wkb, polygon_wkb
    from nominatim_spark.pipeline.placex import build_index
    from nominatim_spark.pipeline.search import geocode_all
    from nominatim_spark.sources.synth import PLACE_SCHEMA

    rows = [
        {"osm_type": "R", "osm_id": 9, "class": "boundary",
         "type": "administrative", "admin_level": 2,
         "name": {"name": "Testland"}, "address": {"country": "fr"},
         "extratags": {},
         "geometry": polygon_wkb(
             [(5.0, 45.0), (7.0, 45.0), (7.0, 47.0), (5.0, 47.0),
              (5.0, 45.0)]),
         "categories": None},
        {"osm_type": "W", "osm_id": 701, "class": "highway",
         "type": "residential", "admin_level": None,
         "name": {"name": "Split Street"}, "address": {}, "extratags": {},
         "geometry": linestring_wkb([(6.00, 46.0), (6.01, 46.0)]),
         "categories": None},
        {"osm_type": "W", "osm_id": 702, "class": "highway",
         "type": "residential", "admin_level": None,
         "name": {"name": "Split Street"}, "address": {}, "extratags": {},
         "geometry": linestring_wkb([(6.01, 46.0), (6.02, 46.0)]),
         "categories": None},
    ]
    pdf = pd.DataFrame(rows)
    pdf["admin_level"] = pd.Series(
        [r.get("admin_level") for r in rows], dtype=object)
    idx = build_index(spark, spark.createDataFrame(pdf, PLACE_SCHEMA),
                      ckpt_root=str(tmp_path / "dd_idx"))
    q = spark.createDataFrame([("d1", "Split Street")],
                              "query_id string, qtext string")
    both = geocode_all(spark, idx, q, dedupe=False).collect()
    assert sorted(r.osm_id for r in both) == [701, 702]
    one = geocode_all(spark, idx, q).collect()
    assert len(one) == 1 and one[0].result_rank == 1
