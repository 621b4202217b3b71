"""difflib result rerank — byte-parity with the reference's
``rerank_by_query`` (src/nominatim_api/search/geocoder.py:193-248).

The parity oracle below is a verbatim test-local port of the reference
loop (same difflib calls, same constants); ``rerank_delta`` must match it
bit-for-bit on every shape.  The e2e tests check the opt-in wiring on
``geocode_all(rerank=True)``: exact-match queries keep their penalty,
junk words cost, and the pass only ever touches the top-k rows.
"""

import difflib
import re

import pytest

from nominatim_spark.functions.text import normalize
from nominatim_spark.pipeline.localization import Locales
from nominatim_spark.pipeline.rerank import rerank_delta
from nominatim_spark.plans.flagship import build_synth_index


def _reference_accuracy_bump(qtext, display_name, country_code,
                             rank_address, importance, rank_search,
                             names, locales):
    """Verbatim port of geocoder.py:213-248 for ONE result (rerank_text
    collapsed to the display line, as _get_result_rerank_text does when
    the address rows are already folded into display_name)."""
    qwords = [w for w in re.split("[-,: ]+", normalize(qtext)) if w]
    if not qwords:
        return 0.0
    if not display_name or (importance is not None and importance < 0):
        return 0.0
    norm_query = normalize(" ".join(qwords))
    norm = normalize(" ".join((display_name, country_code or "")))
    words = set(w for w in re.split("[-,: ]+", norm) if w)
    if not words:
        return 0.0
    accuracy = 0.0
    distance = 0.0
    for qword in qwords:
        if qword not in words:
            wdist = max(difflib.SequenceMatcher(a=qword, b=w).quick_ratio()
                        for w in words)
            distance += len(qword) if wdist < 0.4 else 1
    if rank_address == 4:
        if locales and names:
            country_names = {normalize(names[t]) for t in locales.name_tags
                             if names.get(t)}
            if country_code:
                country_names.add(country_code)
            if norm_query not in country_names:
                calc_imp = importance or (0.40001 - rank_search / 75.0)
                accuracy += calc_imp * 0.5
        else:
            distance *= 2
    return accuracy + distance * 0.3 / sum(len(w) for w in qwords)


SHAPES = [
    # (qtext, display, cc, rank_addr, importance, rank_search, names)
    ("birch street vels", "Birch Street, Vels", "xx", 26, 0.2, 26, None),
    ("birch stret vels", "Birch Street, Vels", "xx", 26, 0.2, 26, None),
    ("birch qqqzzz", "Birch Street, Vels", "xx", 26, 0.2, 26, None),
    ("Birch-Street: vels,", "Birch Street, Vels", "xx", 26, 0.2, 26, None),
    ("café marden", "Cafe Brioche, Marden", "xx", 30, None, 30, None),
    ("birch street", None, "xx", 26, 0.2, 26, None),          # no display
    ("birch street", "Birch Street", "xx", 30, -0.1, 30, None),  # dist-order
    ("", "Birch Street", "xx", 26, 0.2, 26, None),             # empty query
    # countries (rank_address == 4): no locales -> distance doubles
    ("deutschland berlin", "Germany", "de", 4, 0.8, 4, None),
    # importance fallback when stored importance is missing
    ("germany", "Allemagne", "de", 4, None, 4, None),
]

COUNTRY_NAMES = {"name": "Germany", "name:de": "Deutschland",
                 "name:fr": "Allemagne"}
LOCALE_SHAPES = [
    # query IS a localized country name -> no importance bump
    ("deutschland", "Germany", "de", 4, 0.8, 4, COUNTRY_NAMES),
    # query is NOT one of the locale names -> importance * 0.5
    ("germania", "Germany", "de", 4, 0.8, 4, COUNTRY_NAMES),
    # bare country code counts as a name
    ("de", "Germany", "de", 4, 0.8, 4, COUNTRY_NAMES),
    # no stored importance -> rank fallback drives the bump
    ("germania", "Germany", "de", 4, None, 4, COUNTRY_NAMES),
]


@pytest.mark.parametrize("shape", SHAPES)
def test_delta_parity_no_locales(shape):
    qt, dn, cc, ra, imp, rs, nm = shape
    got = rerank_delta(qt, dn, cc, ra, imp, rs, nm, [])
    want = _reference_accuracy_bump(qt, dn, cc, ra, imp, rs, nm, None)
    assert got == want  # byte-equal, no tolerance


@pytest.mark.parametrize("shape", LOCALE_SHAPES)
def test_delta_parity_with_locales(shape):
    qt, dn, cc, ra, imp, rs, nm = shape
    loc = Locales(["de", "fr"])
    got = rerank_delta(qt, dn, cc, ra, imp, rs, nm, loc.name_tags)
    want = _reference_accuracy_bump(qt, dn, cc, ra, imp, rs, nm, loc)
    assert got == want


def test_exact_match_distance_is_zero():
    assert rerank_delta("birch street vels", "Birch Street, Vels, Somewhere",
                        "xx", 26, 0.2, 26, None, []) == 0.0


def test_typo_cheaper_than_junk():
    typo = rerank_delta("birch stret", "Birch Street", "xx", 26, 0.2, 26,
                        None, [])
    junk = rerank_delta("birch qqqzzz", "Birch Street", "xx", 26, 0.2, 26,
                        None, [])
    assert 0.0 < typo < junk  # close word costs 1, unmatched costs len()


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("rerank_ckpt"))
    idx, osmline = build_synth_index(
        spark, ckpt_root=ckpt, n_cities=2, n_streets=3, n_houses=3,
        n_pois=1)
    idx.search_name.persist().count()
    return idx, osmline


def _qdf(spark, *texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "query_id long, qtext string")


def test_geocode_all_rerank_e2e(spark, index):
    from nominatim_spark.pipeline.search import geocode_all

    idx, osmline = index
    # query 1's best hit is the bare housenumber point, whose display line
    # ("3, Vels, ...") is missing both street words -> positive bump on
    # the TOP result; query 0's top result matches every word (zero bump)
    # while its rank-2 POI hit is missing "birch street" (positive bump)
    q = _qdf(spark, "birch street vels", "3 birch street vels")
    base = geocode_all(spark, idx, q, osmline=osmline)
    rer = geocode_all(spark, idx, q, osmline=osmline, rerank=True)
    bp = {(r.query_id, r.place_id): r.penalty for r in base.collect()}
    rows = rer.collect()
    rp = {(r.query_id, r.place_id): r.penalty for r in rows}
    assert set(bp) == set(rp)  # rerank never adds or drops results
    # deltas are monotone non-negative (penalty only ever grows)
    assert all(rp[k] >= bp[k] - 1e-12 for k in bp)
    # query 0's full-match top result is untouched
    best0 = min((r for r in rows if r.query_id == 0),
                key=lambda r: r.result_rank)
    assert rp[(0, best0.place_id)] == pytest.approx(
        bp[(0, best0.place_id)], abs=1e-12)
    # ...but at least one of its results pays (the POI missing the words)
    assert any(rp[(0, r.place_id)] > bp[(0, r.place_id)] + 1e-9
               for r in rows if r.query_id == 0)
    # query 1's best result display lacks the street words -> bump
    best1 = min((r for r in rows if r.query_id == 1),
                key=lambda r: r.result_rank)
    assert rp[(1, best1.place_id)] > bp[(1, best1.place_id)] + 1e-9
    # result_rank was renumbered 1..n per query with no gaps
    for qid in (0, 1):
        ranks = sorted(r.result_rank for r in rows if r.query_id == qid)
        assert ranks == list(range(1, len(ranks) + 1))


def test_geocode_all_rerank_matches_port(spark, index):
    """End-to-end byte parity: engine deltas == ported reference bumps
    computed from the same display lines."""
    from nominatim_spark.pipeline.addressline import (
        address_details, build_place_addressline)
    from nominatim_spark.pipeline.search import geocode_all

    idx, osmline = index
    q = _qdf(spark, "birch street vels", "3 birch street vels")
    base = geocode_all(spark, idx, q, osmline=osmline)
    rer = geocode_all(spark, idx, q, osmline=osmline, rerank=True)
    al = build_place_addressline(spark, idx.placex)
    disp = {r.place_id: r.display_name
            for r in address_details(idx.placex, al).collect()}
    meta = {r.place_id: r for r in idx.placex.collect()}
    qtexts = dict(enumerate(("birch street vels", "3 birch street vels")))
    bp = {(r.query_id, r.place_id): r.penalty for r in base.collect()}
    for r in rer.collect():
        pm = meta.get(r.place_id)
        want = _reference_accuracy_bump(
            qtexts[r.query_id], disp.get(r.place_id),
            pm.country_code if pm else None, r.rank_address,
            r.importance, r.rank_search,
            dict(pm.name) if pm and pm.name else None, None)
        got = r.penalty - bp[(r.query_id, r.place_id)]
        assert got == pytest.approx(want, abs=1e-12)
