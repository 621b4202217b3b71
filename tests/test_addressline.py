"""place_addressline + display formatting tests (J19 / S7 coverage;
reference shapes: addressing.feature + format.py tests)."""

import json

import pytest
from pyspark.sql import functions as F

from nominatim_spark.functions import format as fmt
from nominatim_spark.pipeline.addressline import (
    address_details,
    build_place_addressline,
)


@pytest.fixture(scope="module")
def small_index(spark, tmp_path_factory):
    from nominatim_spark.plans.flagship import build_synth_index

    ckpt = str(tmp_path_factory.mktemp("ckpt_adr"))
    idx, _ = build_synth_index(
        spark, n_cities=2, n_streets=2, n_houses=2, n_pois=1, ckpt_root=ckpt
    )
    idx.placex.persist().count()
    return idx


def test_place_addressline_hierarchy(spark, small_index):
    pal = build_place_addressline(spark, small_index.placex)
    # street 0 of city 0 (place_id 10000*4+1) is inside city 0, state, country
    rows = pal.filter(F.col("place_id") == 10000 * 4 + 1).collect()
    ranks = sorted(r.cached_rank_address for r in rows if r.isaddress)
    assert 4 in ranks    # country
    assert 8 in ranks    # state
    assert 16 in ranks   # city
    assert all(r.distance >= 0 for r in rows)


def test_address_details_display_name(spark, small_index):
    pal = build_place_addressline(spark, small_index.placex)
    det = address_details(small_index.placex, pal)
    street = det.filter(F.col("place_id") == 10000 * 4 + 1).head()
    # own name first, then ancestors by rank desc: city, state, country
    assert street.display_name == "Birch Street, Vels, Westmark, Corvania"


def test_json_and_geojson_formatters(spark, small_index):
    px = small_index.placex.filter("osm_id = 100").select(
        "place_id", "osm_type", "osm_id", "class", "type", "importance",
        "lon", "lat",
    ).withColumn("display_name", F.lit("Vels, Corvania"))
    row = fmt.to_json_col(px).head()
    doc = json.loads(row.result_json)
    assert doc["osm_type"] == "relation"
    assert doc["display_name"] == "Vels, Corvania"
    assert len(doc["boundingbox"]) == 4

    geo = json.loads(fmt.to_geojson_col(px).head().result_geojson)
    assert geo["type"] == "Feature"
    assert geo["geometry"]["type"] == "Point"

    xml = fmt.to_xml_col(px).head().result_xml
    assert xml.startswith("<place place_id=") and 'osm_type="relation"' in xml
