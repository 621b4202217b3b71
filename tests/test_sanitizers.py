"""Sanitizer kernels added in round 4 (reference shapes from
test/python/tokenizer/sanitizers/test_{delete_tags,derive_names,
affix_expansion,tag_analyzer_by_language,clean_tiger_tags}.py)."""

import pandas as pd
import pytest

from nominatim_spark.pipeline.sanitizers import apply_sanitizers


def _df(spark, name=None, address=None, cc=None, rank=None):
    cols = "name map<string,string>, address map<string,string>"
    row = [dict(name=name or {}, address=address or {})]
    if cc is not None:
        cols += ", country_code string"
        row[0]["country_code"] = cc
    if rank is not None:
        cols += ", rank_address int"
        row[0]["rank_address"] = rank
    return spark.createDataFrame(pd.DataFrame(row), cols)


def _names(row):
    return sorted(n.name for n in row._names)


def test_seed_kind_suffix(spark):
    out = apply_sanitizers(
        _df(spark, name={"name": "A", "name:de": "B", "alt_name": "C",
                         "name:prefix": "Dr."}),
        chain=[],
    ).head()
    got = {(n.kind, n.suffix): n.name for n in out._names}
    assert got == {("name", None): "A", ("name", "de"): "B",
                   ("alt_name", None): "C", ("name", "prefix"): "Dr."}


def test_delete_tags_name_and_address(spark):
    df = _df(spark, name={"name": "Keep", "old_name": "Drop"},
             address={"street": "S", "tiger:county": "X"})
    out = apply_sanitizers(
        df, chain=[{"step": "delete-tags", "filter-kind": "old_.*"}]).head()
    assert _names(out) == ["Keep"]
    out2 = apply_sanitizers(
        df, chain=[{"step": "delete-tags", "type": "address",
                    "filter-kind": "tiger:.*"}]).head()
    assert dict(out2.address) == {"street": "S"}


def test_delete_names_filters(spark):
    # country/rank gates (delete_tags.py country_code/rank_address args)
    df = _df(spark, name={"name": "Verboten"}, cc="de", rank=26)
    kept = apply_sanitizers(df, chain=[
        {"step": "delete-names", "name": "Verboten",
         "country_code": "fr"}]).head()
    assert _names(kept) == ["Verboten"]
    gone = apply_sanitizers(df, chain=[
        {"step": "delete-names", "name": "Verboten", "country_code": "de",
         "rank_address": "20-30"}]).head()
    assert gone._names == []


def test_derive_names_backrefs(spark):
    # the br country config shape: ref 'BR-101' -> 'Rodovia BR-101'
    df = _df(spark, name={"ref": "BR-101"}, cc="br", rank=26)
    out = apply_sanitizers(df, chain=[
        {"step": "derive-names", "filter-kind": "ref",
         "filter-rank": "26", "name-pattern": r"([A-Z]{2,3}-\d+)",
         "variants": "Rodovia \\1"}]).head()
    assert _names(out) == ["BR-101", "Rodovia BR-101"]
    # keep-original false replaces
    out2 = apply_sanitizers(df, chain=[
        {"step": "derive-names", "name-pattern": r"([A-Z]{2,3}-\d+)",
         "variants": ["Rodovia \\1"], "keep-original": False}]).head()
    assert _names(out2) == ["Rodovia BR-101"]


def test_affix_expansion_modes(spark):
    name = {"name": "Einstein", "name:prefix": "Dr."}
    base = _df(spark, name=name)
    exp = apply_sanitizers(base, chain=[
        {"step": "affix-expansion", "mode": "full-name"}]).head()
    assert _names(exp) == ["Dr. Einstein"]
    allv = apply_sanitizers(base, chain=[
        {"step": "affix-expansion", "mode": "all-variants"}]).head()
    assert _names(allv) == ["Dr. Einstein", "Einstein"]
    # contraction strips a literal prefix; suffix tag with language suffix
    df2 = _df(spark, name={"name:de": "Haupt Strasse",
                           "name:de:suffix": "Strasse"})
    short = apply_sanitizers(df2, chain=[
        {"step": "affix-expansion", "mode": "short-name"}]).head()
    assert _names(short) == ["Haupt"]
    add = apply_sanitizers(base, chain=[
        {"step": "affix-expansion", "mode": "add-expanded"}]).head()
    assert _names(add) == ["Dr. Einstein", "Einstein"]
    # no affix tags -> untouched
    plain = apply_sanitizers(_df(spark, name={"name": "X"}), chain=[
        {"step": "affix-expansion"}]).head()
    assert _names(plain) == ["X"]


def test_tag_analyzer_by_language(spark):
    df = _df(spark, name={"name": "Muenchen", "name:de": "München",
                          "name:xx": "Nope"}, cc="de")
    out = apply_sanitizers(df, chain=["tag-analyzer-by-language"]).head()
    tagged = {(n.name, n.analyzer) for n in out._names}
    # language-suffixed name gains the analyzer copy (append mode keeps
    # the untagged original); unknown language untouched
    assert ("München", "de") in tagged and ("München", None) in tagged
    assert ("Nope", None) in tagged and ("Nope", "xx") not in tagged
    # use-defaults mono: suffix-less names get the country language
    out2 = apply_sanitizers(df, chain=[
        {"step": "tag-analyzer-by-language", "use-defaults": "mono",
         "mode": "replace"}]).head()
    tagged2 = {(n.name, n.analyzer) for n in out2._names}
    assert ("Muenchen", "de") in tagged2
    assert ("München", "de") in tagged2


def test_tag_analyzer_drives_variants(spark):
    """A German-suffixed street name indexes German abbreviation variants
    even in a non-German country — the analyzer selects the variant
    table (token_analysis config selection)."""
    from nominatim_spark.pipeline.tokens import tokenize_places

    df = _df(spark, name={"name:de": "Rosen Strasse"}, cc="us")
    named = tokenize_places(
        df, sanitizer_chain=["tag-analyzer-by-language"]).head()
    assert "rosen str" in set(named.var_names)


def test_clean_tiger_tags(spark):
    df = _df(spark, address={"tiger:county": "Gotham, NY",
                             "tiger:mtfcc": "S1400", "street": "Main"})
    out = apply_sanitizers(df, chain=["clean-tiger-tags"]).head()
    assert dict(out.address) == {"street": "Main", "county": "Gotham"}
    # existing county wins
    df2 = _df(spark, address={"tiger:county": "Gotham, NY",
                              "county": "Metropolis"})
    out2 = apply_sanitizers(df2, chain=["clean-tiger-tags"]).head()
    assert dict(out2.address) == {"county": "Metropolis"}
