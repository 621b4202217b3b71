"""TIGER CSV source (S3) + wikimedia importance load (S5)."""

import pytest

from nominatim_spark.pipeline.importance import (
    apply_wikimedia_importance, read_wikimedia_importance)
from nominatim_spark.plans.flagship import build_synth_index
from nominatim_spark.sources import synth
from nominatim_spark.sources.tiger import read_tiger_csv, tiger_osmline

SCALE = dict(n_cities=2, n_streets=2, n_houses=2, n_pois=1)


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt_sources"))
    idx, _ = build_synth_index(spark, ckpt_root=ckpt, **SCALE)
    idx.placex.persist().count()
    return idx


def test_tiger_osmline(spark, index, tmp_path):
    cx, cy = synth.city_center(0)
    y = cy - 0.1  # street 0 of city 0 ("Birch Street")
    csv = tmp_path / "tiger.csv"
    csv.write_text(
        "from;to;interpolation;street;city;state;postcode;geometry\n"
        f"2;8;even;Birch Street;Vels;CV;47000;"
        f"LINESTRING({cx - 0.05} {y + 0.001},{cx + 0.05} {y + 0.001})\n"
        # odd range given with swapped + off-parity endpoints
        f"10;3;odd;Birch Street;Vels;CV;47000;"
        f"LINESTRING({cx - 0.05} {y + 0.002},{cx + 0.05} {y + 0.002})\n"
        # unknown street -> no parent
        f"1;5;all;Nowhere Alley;Vels;CV;47000;"
        f"LINESTRING({cx - 0.05} {y + 0.003},{cx + 0.05} {y + 0.003})\n"
        # broken geometry -> dropped
        "1;5;all;Birch Street;Vels;CV;47000;POINT(1 2)\n"
    )
    tiger = read_tiger_csv(spark, str(csv))
    out = tiger_osmline(spark, tiger, index.placex).collect()
    assert len(out) == 3
    by_range = {(r.startnumber, r.endnumber): r for r in out}
    street_pid = 10000 * 4 + 1
    assert by_range[(2, 8)].step == 2
    assert by_range[(2, 8)].parent_place_id == street_pid
    assert (3, 9) in by_range  # 10..3 swapped, 10 pulled to 9 (odd parity)
    assert by_range[(3, 9)].parent_place_id == street_pid
    assert by_range[(1, 5)].parent_place_id is None  # unknown street


def test_tiger_feeds_search(spark, index, tmp_path):
    """A TIGER range resolves through the same housenumber lane as OSM
    interpolations (tiger_data.py end state)."""
    from nominatim_spark.pipeline.search import geocode

    cx, cy = synth.city_center(0)
    y = cy - 0.1
    csv = tmp_path / "t2.csv"
    csv.write_text(
        "from;to;interpolation;street;city;state;postcode;geometry\n"
        f"100;120;even;Birch Street;Vels;CV;47000;"
        f"LINESTRING({cx - 0.05} {y + 0.001},{cx + 0.05} {y + 0.001})\n"
    )
    lines = tiger_osmline(spark, read_tiger_csv(spark, str(csv)), index.placex)
    q = spark.createDataFrame(
        [("t1", "Birch Street 104, Vels")], "query_id string, qtext string"
    )
    res = geocode(spark, index, q, osmline=lines).collect()
    assert len(res) == 1
    assert res[0].type == "houses" and res[0].housenumber == "104"


def test_wikimedia_importance(spark, index, tmp_path):
    tsv = tmp_path / "wikimedia-importance.csv"
    tsv.write_text(
        "language\ttitle\timportance\twikidata\n"
        "en\tVels\t0.91\tQ1000\n"
        "de\tVels\t0.55\tQ1000\n"   # max wins
        "en\tNope\t0.99\tQ99999\n"
    )
    wiki = read_wikimedia_importance(spark, str(tsv))
    out = apply_wikimedia_importance(index.placex, wiki)
    city0 = out.filter("osm_id = 100").head()
    assert city0.importance == pytest.approx(0.91)
    other = out.filter("osm_id = 101").head()
    base = index.placex.filter("osm_id = 101").head()
    assert other.importance == pytest.approx(base.importance)
