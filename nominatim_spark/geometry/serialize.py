"""Geometry serialization — the reference's ``polygon_geojson`` /
``polygon_text`` / ``polygon_kml`` / ``polygon_svg`` output formats
(/root/reference/src/nominatim_api/v1/helpers.py:76-82, geometry columns
added in reverse.py/lookup.py ``_add_geometry_columns`` via PostGIS
ST_AsGeoJSON(col, 7) / ST_AsText / ST_AsKML(col, 7) / ST_AsSVG(col, 0, 7)).

Pure-Python kernels over the in-repo WKB codec (the container has no
shapely/GDAL), designed to run inside Arrow-batched pandas UDFs on the
*result* rows only — geometry serialization is an output-path cost, never
a join-path one.
"""

from __future__ import annotations

import json

import numpy as np

from nominatim_spark.geometry.wkb import (
    LINESTRING, MULTILINESTRING, MULTIPOINT, MULTIPOLYGON, POINT, POLYGON,
    Geom, parse_wkb)


def _rnd(arr: np.ndarray, nd: int) -> list:
    """Coordinate array -> rounded [[x, y], ...] python lists.

    Round-trips through repr-shortest floats like ST_AsGeoJSON's
    maxdecimaldigits: trailing zeros drop, ints stay ints in json."""
    return [[round(float(x), nd), round(float(y), nd)] for x, y in arr]


def geom_to_geojson(geom: Geom, ndigits: int = 7) -> dict:
    """GeoJSON geometry object (RFC 7946 shapes for the six WKB kinds)."""
    if geom.kind == POINT:
        x, y = geom.parts[0][0]
        return {"type": "Point",
                "coordinates": [round(float(x), ndigits),
                                round(float(y), ndigits)]}
    if geom.kind == LINESTRING:
        return {"type": "LineString",
                "coordinates": _rnd(geom.parts[0], ndigits)}
    if geom.kind == POLYGON:
        return {"type": "Polygon",
                "coordinates": [_rnd(r, ndigits) for r in geom.parts]}
    if geom.kind == MULTIPOINT:
        return {"type": "MultiPoint",
                "coordinates": [
                    [round(float(p[0][0]), ndigits),
                     round(float(p[0][1]), ndigits)] for p in geom.parts]}
    if geom.kind == MULTILINESTRING:
        return {"type": "MultiLineString",
                "coordinates": [_rnd(p, ndigits) for p in geom.parts]}
    if geom.kind == MULTIPOLYGON:
        return {"type": "MultiPolygon",
                "coordinates": [
                    [_rnd(r, ndigits) for r in (ext, *holes)]
                    for ext, holes in geom.polygons()]}
    raise TypeError(f"unsupported kind {geom.kind}")


def _fmt(v: float, nd: int) -> str:
    s = f"{round(float(v), nd):.{nd}f}".rstrip("0").rstrip(".")
    return s if s not in ("-0", "") else "0"


def _wkt_coords(arr: np.ndarray, nd: int) -> str:
    return ",".join(f"{_fmt(x, nd)} {_fmt(y, nd)}" for x, y in arr)


def geom_to_wkt(geom: Geom, ndigits: int = 7) -> str:
    """WKT text (ST_AsText shape)."""
    if geom.kind == POINT:
        return f"POINT({_wkt_coords(geom.parts[0], ndigits)})"
    if geom.kind == LINESTRING:
        return f"LINESTRING({_wkt_coords(geom.parts[0], ndigits)})"
    if geom.kind == POLYGON:
        rings = ",".join(f"({_wkt_coords(r, ndigits)})" for r in geom.parts)
        return f"POLYGON({rings})"
    if geom.kind == MULTIPOINT:
        pts = ",".join(f"({_wkt_coords(p, ndigits)})" for p in geom.parts)
        return f"MULTIPOINT({pts})"
    if geom.kind == MULTILINESTRING:
        ls = ",".join(f"({_wkt_coords(p, ndigits)})" for p in geom.parts)
        return f"MULTILINESTRING({ls})"
    if geom.kind == MULTIPOLYGON:
        polys = ",".join(
            "(" + ",".join(f"({_wkt_coords(r, ndigits)})"
                           for r in (ext, *holes)) + ")"
            for ext, holes in geom.polygons())
        return f"MULTIPOLYGON({polys})"
    raise TypeError(f"unsupported kind {geom.kind}")


def _kml_coords(arr: np.ndarray, nd: int) -> str:
    return " ".join(f"{_fmt(x, nd)},{_fmt(y, nd)}" for x, y in arr)


def geom_to_kml(geom: Geom, ndigits: int = 7) -> str:
    """KML geometry element (ST_AsKML shape, no namespace prefix)."""
    if geom.kind == POINT:
        return (f"<Point><coordinates>"
                f"{_kml_coords(geom.parts[0], ndigits)}"
                f"</coordinates></Point>")
    if geom.kind == LINESTRING:
        return (f"<LineString><coordinates>"
                f"{_kml_coords(geom.parts[0], ndigits)}"
                f"</coordinates></LineString>")
    if geom.kind == POLYGON:
        return _kml_polygon(geom.parts[0], geom.parts[1:], ndigits)
    if geom.kind == MULTIPOLYGON:
        inner = "".join(_kml_polygon(ext, holes, ndigits)
                        for ext, holes in geom.polygons())
        return f"<MultiGeometry>{inner}</MultiGeometry>"
    if geom.kind in (MULTIPOINT, MULTILINESTRING):
        parts = "".join(
            geom_to_kml(Geom(kind=geom.kind - 3, parts=[p]), ndigits)
            for p in geom.parts)
        return f"<MultiGeometry>{parts}</MultiGeometry>"
    raise TypeError(f"unsupported kind {geom.kind}")


def _kml_polygon(ext: np.ndarray, holes, nd: int) -> str:
    out = ["<Polygon><outerBoundaryIs><LinearRing><coordinates>",
           _kml_coords(ext, nd),
           "</coordinates></LinearRing></outerBoundaryIs>"]
    for h in holes:
        out += ["<innerBoundaryIs><LinearRing><coordinates>",
                _kml_coords(h, nd),
                "</coordinates></LinearRing></innerBoundaryIs>"]
    out.append("</Polygon>")
    return "".join(out)


def geom_to_svg(geom: Geom, ndigits: int = 7) -> str:
    """SVG path data (ST_AsSVG(col, 0, 7) shape: absolute moves, y-axis
    negated per the SVG coordinate convention)."""
    def path(arr: np.ndarray, close: bool) -> str:
        pts = [f"{_fmt(x, ndigits)} {_fmt(-y, ndigits)}" for x, y in arr]
        body = "M " + pts[0] + " L " + " ".join(pts[1:])
        return body + " Z" if close else body

    if geom.kind == POINT:
        x, y = geom.parts[0][0]
        return (f'cx="{_fmt(x, ndigits)}" cy="{_fmt(-y, ndigits)}"')
    if geom.kind == MULTIPOINT:
        return " ".join(
            f'cx="{_fmt(p[0][0], ndigits)}" cy="{_fmt(-p[0][1], ndigits)}"'
            for p in geom.parts)
    if geom.kind == LINESTRING:
        return path(geom.parts[0], close=False)
    if geom.kind == MULTILINESTRING:
        return " ".join(path(p, close=False) for p in geom.parts)
    if geom.kind == POLYGON:
        # drop the duplicated closing coordinate; Z closes the ring
        return " ".join(path(r[:-1], close=True) for r in geom.parts)
    if geom.kind == MULTIPOLYGON:
        return " ".join(path(r[:-1], close=True)
                        for ext, holes in geom.polygons()
                        for r in (ext, *holes))
    raise TypeError(f"unsupported kind {geom.kind}")


GEOMETRY_FORMATS = {
    "geojson": lambda g, nd: json.dumps(
        geom_to_geojson(g, nd), separators=(",", ":")),
    "text": geom_to_wkt,
    "kml": geom_to_kml,
    "svg": geom_to_svg,
}


def serialize_wkb(wkb: bytes | None, fmt: str, ndigits: int = 7,
                  simplify: float = 0.0) -> str | None:
    """One WKB value -> the requested textual format (None passes
    through).  ``simplify`` applies Douglas-Peucker with the given
    tolerance first (the reference's geometry_simplification /
    ST_SimplifyPreserveTopology knob)."""
    if wkb is None:
        return None
    geom = parse_wkb(bytes(wkb))
    if simplify > 0.0:
        from nominatim_spark.geometry.ops import simplify_geom

        geom = simplify_geom(geom, simplify)
    return GEOMETRY_FORMATS[fmt](geom, ndigits)
