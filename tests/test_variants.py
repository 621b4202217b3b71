"""Name-variant expansion + sanitizer chain.

Shapes ported from the reference's token-analysis tests
(/root/reference/test/python/tokenizer/token_analysis/test_generic.py,
test_generic_mutation.py) and sanitizer tests
(test/python/tokenizer/sanitizers/)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from nominatim_spark.functions.variants import (
    MAX_VARIANTS, compile_rules, compute_variants, variants_default)
from nominatim_spark.pipeline.sanitizers import apply_sanitizers
from nominatim_spark.pipeline.search import geocode
from nominatim_spark.plans.flagship import build_synth_index
from nominatim_spark.sources import synth

SCALE = dict(n_cities=4, n_streets=4, n_houses=4, n_pois=2)


def test_simple_replacement_keeps_original():
    rules = compile_rules(["street -> st"])
    assert set(compute_variants("birch street", rules)) == {
        "birch street", "birch st"
    }


def test_replace_only_rule():
    rules = compile_rules(["street => st"])
    got = set(compute_variants("birch street", rules))
    # '=>' replaces, but the original form is always kept as a variant of
    # record (the engine keeps norm_name searchable)
    assert "birch st" in got


def test_reverse_direction_generated():
    # abbreviated data must match expanded queries too
    rules = compile_rules(["street -> st"])
    assert "birch street" in set(compute_variants("birch st", rules))


def test_multi_word_and_sources():
    rules = compile_rules(["avenue,av -> ave"])
    got = set(compute_variants("north avenue", rules))
    assert {"north avenue", "north ave"} <= got


def test_no_partial_word_match():
    rules = compile_rules(["st -> street"])
    # 'st' inside 'strasse' must not match (word-boundary semantics)
    assert compute_variants("strasse", rules) == ["strasse"]


def test_mutations_product():
    rules = compile_rules([], [("ae", ["ae", "a"])])
    got = set(compute_variants("baeder strae", rules))
    assert got == {"baeder strae", "bader strae", "baeder stra", "bader stra"}


def test_variant_cap():
    rules = compile_rules(["a -> a,b,c,d"])
    name = " ".join(["a"] * 8)  # 4^8 >> 128 -> fall back to original
    got = compute_variants(name, rules)
    assert got == [name]


def test_default_rules_street():
    got = set(variants_default("birch street"))
    assert "birch st" in got and "birch street" in got
    assert len(got) <= MAX_VARIANTS


def test_sanitizers_chain(spark):
    pdf = pd.DataFrame({
        "name": [{"name": "Alpha;Beta (old)"}, {"name": None}, {}],
        "address": [{"housenumber": "2;4, 6"}, {}, {"housenumber": "8"}],
    })
    df = spark.createDataFrame(
        pdf, "name map<string,string>, address map<string,string>"
    )
    out = apply_sanitizers(df).select("_names", "_hnrs").collect()
    assert sorted(n.name for n in out[0]._names) == [
        "Alpha", "Beta", "Beta (old)"]
    assert all(n.kind == "name" and n.suffix is None
               for n in out[0]._names)
    assert sorted(out[0]._hnrs) == ["2", "4", "6"]
    assert out[1]._names == [] and out[1]._hnrs == []
    assert out[2]._hnrs == ["8"]


def test_lang_rules_and_suffix_decomposition():
    """Per-language variant tables (settings/icu-rules/variants-*.yaml
    model) incl. '~' word-part suffix rules (config_variants.py
    decomposition)."""
    from nominatim_spark.functions.variants import (
        variants_default, variants_for)

    vs = variants_for("rosengasse", "de")
    assert "roseng" in vs and "rosengasse" in vs
    assert "bahnhofstr" in variants_for("bahnhofstrasse", "de")
    assert "birch av" in variants_for("birch avenue", "en")
    assert "r de rivoli" in variants_for("rue de rivoli", "fr")
    # unknown language falls back to the default rule set
    assert (variants_for("birch street", "xx")
            == variants_default("birch street"))


def test_geocode_lang_abbreviation(spark, index):
    """Country cv defaults to the 'en' table, so 'Maple Av' (an en-only
    abbreviation, not in the default rules) matches the indexed street."""
    idx, osmline = index
    q = spark.createDataFrame(
        [("l1", f"Maple Av, {synth.city_name(0)}")],
        "query_id string, qtext string",
    )
    res = geocode(spark, idx, q, osmline=osmline).collect()
    assert len(res) == 1
    assert (res[0].osm_type, res[0].osm_id) == ("W", 10003)


def test_clean_postcodes_sanitizer(spark):
    """clean-postcodes (sanitizers/clean_postcodes.py): conforming
    postcodes normalize (cc prefix stripped, uppercased), non-conforming
    and all-zero ones move to unofficial_postcode, countryless rows keep
    none official."""
    pdf = pd.DataFrame({
        "country_code": ["cv", "cv", "cv", "cv", "gb", None],
        "name": [{"name": "x"}] * 6,
        "address": [
            {"postcode": "47000", "street": "s"},
            {"postcode": "cv 47000"},
            {"postcode": "473"},
            {"postcode": "00000"},
            {"postcode": "sw1a 1aa"},
            {"postcode": "47000"},
        ],
    })
    df = spark.createDataFrame(
        pdf, "country_code string, name map<string,string>, "
             "address map<string,string>",
    )
    out = [r.address for r in apply_sanitizers(df).collect()]
    assert out[0] == {"postcode": "47000", "street": "s"}
    assert out[1] == {"postcode": "47000"}
    assert out[2] == {"unofficial_postcode": "473"}
    assert out[3] == {"unofficial_postcode": "00000"}
    assert out[4] == {"postcode": "SW1A 1AA"}
    assert out[5] == {"unofficial_postcode": "47000"}


def test_tag_japanese_sanitizer(spark):
    """jp block addresses (sanitizers/tag_japanese.py): block_number +
    housenumber -> housenumber '1-3'; quarter + neighbourhood -> place;
    non-jp rows untouched."""
    pdf = pd.DataFrame({
        "country_code": ["jp", "jp", "cv"],
        "name": [{"name": "x"}] * 3,
        "address": [
            {"block_number": "1", "housenumber": "3", "quarter": "銀座",
             "neighbourhood": "四丁目", "street": "s"},
            {"housenumber": "5"},
            {"block_number": "1", "housenumber": "3"},
        ],
    })
    df = spark.createDataFrame(
        pdf, "country_code string, name map<string,string>, "
             "address map<string,string>",
    )
    out = [r.address for r in
           apply_sanitizers(df, ["tag-japanese"]).collect()]
    assert out[0] == {"housenumber": "1-3", "place": "銀座四丁目",
                      "street": "s"}
    assert out[1] == {"housenumber": "5"}
    assert out[2] == {"block_number": "1", "housenumber": "3"}


def test_delete_names_sanitizer(spark):
    pdf = pd.DataFrame({
        "name": [{"name": "Keep Me;Drop Me"}],
        "address": [{}],
    })
    df = spark.createDataFrame(
        pdf, "name map<string,string>, address map<string,string>"
    )
    chain = ["split-name-list",
             {"step": "delete-names", "name": "Drop .*"}]
    out = apply_sanitizers(df, chain).head()
    assert [n.name for n in out._names] == ["Keep Me"]


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt_variants"))
    idx, osmline = build_synth_index(spark, ckpt_root=ckpt, **SCALE)
    idx.search_name.persist().count()
    return idx, osmline


def test_geocode_abbreviated_street(spark, index):
    """'Birch St' resolves like 'Birch Street' (the reference's variant
    expansion makes abbreviation queries first-class)."""
    idx, osmline = index
    q = spark.createDataFrame(
        [("ab1", f"Birch St, {synth.city_name(0)}"),
         ("ab2", f"Birch St 3, {synth.city_name(0)}"),
         ("full", f"Birch Street, {synth.city_name(0)}")],
        "query_id string, qtext string",
    )
    res = {r.query_id: r for r in geocode(spark, idx, q, osmline=osmline).collect()}
    assert (res["ab1"].osm_type, res["ab1"].osm_id) == ("W", 10000)
    assert res["ab2"].housenumber == "3" and res["ab2"].osm_type == "N"
    assert (res["full"].osm_type, res["full"].osm_id) == ("W", 10000)


def test_reverse_rules_not_transitive():
    """An abbreviation shared by two rules ('street -> st', 'saint -> st')
    must not expand at all — transitive reverse expansion would make
    'Birch St' match 'Birch Saint' queries (reference configs use explicit
    per-direction rules that never produce this)."""
    rules = compile_rules(["street -> st", "saint -> st"])
    assert set(compute_variants("birch st", rules)) == {"birch st"}
    # forward rules still apply independently
    assert "birch st" in set(compute_variants("birch street", rules))
    assert "birch st" in set(compute_variants("birch saint", rules))
    # an unambiguous target keeps its reverse expansion
    lone = compile_rules(["road -> rd"])
    assert "birch road" in set(compute_variants("birch rd", lone))


def test_duplicate_rules_across_tables_still_reverse():
    """The same abbreviation rule appearing in both the default table and
    a language table ('avenue -> ave' + 'avenue -> av,ave') must NOT be
    treated as ambiguous: agreement is judged on source sets, not rule
    instances, so 'birch ave' still expands to 'birch avenue' under the
    per-language compilation (ADVICE r3 high finding)."""
    from nominatim_spark.functions.variants import variants_for

    got = set(variants_for("birch ave", "en"))
    assert "birch avenue" in got
    # all the duplicated default/en rules keep their reverse expansion
    for abbr, full in [("birch rd", "birch road"), ("birch ln", "birch lane"),
                       ("birch dr", "birch drive"), ("birch ct", "birch court"),
                       ("birch pl", "birch place"), ("birch sq", "birch square"),
                       ("birch blvd", "birch boulevard")]:
        assert full in set(variants_for(abbr, "en")), abbr
    # genuinely ambiguous targets stay suppressed ('st': street vs saint)
    assert "birch street" not in set(variants_for("birch st", "en"))
    assert "birch saint" not in set(variants_for("birch st", "en"))


def test_cjk_name_roundtrip(spark, tmp_path):
    """Han names romanize to pinyin on BOTH index and query sides
    (Hans↔Hant folded to one script), and the joined form makes
    latin-written queries match: 北京 finds Beijing and vice versa
    (the reference's ':: Hans-Hant' + ':: Latin' ICU rules,
    settings/icu_tokenizer.yaml:3,19-21)."""
    import pandas as pd

    from nominatim_spark.functions.text import norm_translit
    from nominatim_spark.pipeline.placex import build_index

    assert norm_translit("北京") == "bei jing"
    assert norm_translit("東京") == norm_translit("东京") == "dong jing"

    place = synth.place_df(spark, n_cities=2, n_streets=2, n_houses=2,
                           n_pois=1)
    cx, cy = synth.city_center(0)
    extra = [{
        "osm_type": "N", "osm_id": 950000, "class": "amenity",
        "type": "restaurant", "admin_level": None,
        "name": {"name": "北京"},
        "address": {"street": synth.street_name(0, 0)}, "extratags": {},
        "geometry": synth.point_wkb(cx - 0.01, cy - 0.097),
        "categories": None,
    }]
    place = place.unionByName(spark.createDataFrame(
        pd.DataFrame(extra), schema=synth.PLACE_SCHEMA))
    idx = build_index(spark, place, ckpt_root=str(tmp_path / "cjk"))
    q = spark.createDataFrame(
        [("c1", "北京"), ("c2", "Beijing"),
         ("c3", f"北京, {synth.city_name(0)}")],
        "query_id string, qtext string",
    )
    res = {r.query_id: r for r in geocode(spark, idx, q).collect()}
    assert res["c1"].osm_id == 950000
    assert res["c2"].osm_id == 950000
    assert res["c3"].osm_id == 950000
