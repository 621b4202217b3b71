"""Accept-language localization (VERDICT r4 ask #2).

Shapes ported from the reference's localization tests
(/root/reference/test/python/api/test_localization.py) plus the
engine-side wiring: ``display_name_expr`` as one JVM coalesce and the
``locales=`` knob on the display-address chain.
"""

import pytest
from pyspark.sql import functions as F

from nominatim_spark.pipeline.localization import (
    Locales, localize_results)


def test_output_names_none_localized():
    assert Locales().name_tags == ["name", "_place_name"]


def test_output_names_localized():
    assert Locales(["en", "es"]).name_tags == [
        "name:en", "_place_name:en", "name:es", "_place_name:es",
        "name", "_place_name"]


def test_output_names_localized_and_empty_names():
    assert Locales(["en"], "").name_tags == []


def test_output_names_custom_ordering():
    assert Locales(["en", "fr"], "name:XX,ref").name_tags == [
        "name:en", "_place_name:en", "name:fr", "_place_name:fr",
        "ref", "_place_ref"]


def test_output_names_custom_with_space():
    assert Locales(["en", "es"],
                   names="name:XX,name ,short_name:XX, short_name"
                   ).name_tags == [
        "name:en", "_place_name:en", "name:es", "_place_name:es",
        "name", "_place_name",
        "short_name:en", "_place_short_name:en",
        "short_name:es", "_place_short_name:es",
        "short_name", "_place_short_name"]


def test_from_accept_languages():
    # q-weight sort, region variant also adds the bare language
    # (localization.py:67-99)
    loc = Locales.from_accept_languages("de-CH;q=0.8,en;q=0.9")
    assert loc.languages == ["en", "de-CH", "de"]
    loc = Locales.from_accept_languages("de,en")
    assert loc.languages == ["de", "en"]
    # a present bare language suppresses the variant's expansion
    loc = Locales.from_accept_languages("de-DE,de;q=0.5")
    assert loc.languages == ["de-DE", "de"]
    # forgiving parse: garbage terms are skipped
    assert Locales.from_accept_languages("&&&&").languages == []


def _pick(spark, loc, name_map):
    df = spark.createDataFrame([(name_map,)], "name map<string,string>")
    return df.select(loc.display_name_expr("name").alias("d")).head().d


def test_display_name_none_localized(spark):
    loc = Locales()
    assert _pick(spark, loc, {}) is None
    assert _pick(spark, loc, {"name:de": "DE", "name": "ALL"}) == "ALL"
    # no matching tag -> the map's first value (reference returns '34')
    assert _pick(spark, loc, {"ref": "34"}) == "34"


def test_display_name_localized(spark):
    loc = Locales(["en", "de"])
    assert _pick(spark, loc, {"name:de": "DE", "name": "ALL"}) == "DE"
    assert _pick(spark, loc, {"name:en": "EN", "name:de": "DE"}) == "EN"
    # _place_* merge (the reference's place-name fallback tags)
    assert _pick(spark, loc, {"_place_name:de": "PDE"}) == "PDE"


def test_localize_results_join(spark):
    placex = spark.createDataFrame(
        [(1, {"name:de": "Berlin-DE", "name": "Berlin"}),
         (2, {"name": "Hamburg"})],
        "place_id long, name map<string,string>")
    res = spark.createDataFrame([(1,), (2,)], "place_id long")
    got = {r.place_id: r.locale_name
           for r in localize_results(res, placex, Locales(["de"])).collect()}
    assert got == {1: "Berlin-DE", 2: "Hamburg"}


def test_address_details_localized(spark):
    """A de-locale query returns name:de display lines — the e2e shape of
    the reference's localize_results applied to the address chain."""
    from nominatim_spark.pipeline.addressline import address_details

    placex = spark.createDataFrame(
        [(10, {"name": "Birch Street", "name:de": "Birkenstrasse"}, None),
         (20, {"name": "Vels", "name:de": "Fels"}, None)],
        "place_id long, name map<string,string>, "
        "address map<string,string>")
    addressline = spark.createDataFrame(
        [(10, 20, True, 16)],
        "place_id long, address_place_id long, isaddress boolean, "
        "cached_rank_address int")
    # default locale: plain names
    got = {r.place_id: r.display_name
           for r in address_details(placex, addressline).collect()}
    assert got[10] == "Birch Street, Vels"
    # de locale: name:de picked for every part
    got = {r.place_id: r.display_name
           for r in address_details(placex, addressline,
                                    locales=Locales(["de"])).collect()}
    assert got[10] == "Birkenstrasse, Fels"
