"""Minimal WKB (well-known binary) codec.

Supports the geometry types the reference stores in its ``GEOMETRY(Geometry,
4326)`` columns (lib-sql/tables/placex.sql): Point, LineString, Polygon,
MultiPoint, MultiLineString, MultiPolygon.  Little-endian, 2-D, optional
EWKB SRID flag tolerated on read.

A parsed geometry is a lightweight ``Geom`` record holding numpy coordinate
arrays — cheap to produce per row inside an Arrow batch and cheap to hand to
the vectorized predicates in :mod:`nominatim_spark.geometry.ops`.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

POINT, LINESTRING, POLYGON = 1, 2, 3
MULTIPOINT, MULTILINESTRING, MULTIPOLYGON = 4, 5, 6
_EWKB_SRID_FLAG = 0x20000000
_TYPE_NAMES = {1: "Point", 2: "LineString", 3: "Polygon",
               4: "MultiPoint", 5: "MultiLineString", 6: "MultiPolygon"}


@dataclass
class Geom:
    """Parsed geometry: ``kind`` + list of parts.

    * Point: ``parts == [array[[x, y]]]``
    * LineString: ``parts == [array[n, 2]]``
    * Polygon: ``parts == [exterior_ring, hole1, ...]`` each ``array[n, 2]``
      (closed: first == last)
    * Multi*: ``parts`` flattened, with ``part_offsets`` recording polygon
      boundaries for MultiPolygon (index into parts where each polygon's
      ring-list starts).
    """

    kind: int
    parts: list = field(default_factory=list)
    part_offsets: list = field(default_factory=list)  # MultiPolygon only

    @property
    def type_name(self) -> str:
        return _TYPE_NAMES[self.kind]

    def polygons(self):
        """Yield (exterior, holes) ring groups for Polygon/MultiPolygon."""
        if self.kind == POLYGON:
            yield self.parts[0], self.parts[1:]
        elif self.kind == MULTIPOLYGON:
            bounds = list(self.part_offsets) + [len(self.parts)]
            for i in range(len(self.part_offsets)):
                rings = self.parts[bounds[i]:bounds[i + 1]]
                if rings:
                    yield rings[0], rings[1:]
        else:
            raise TypeError(f"not areal: {self.type_name}")

    def all_coords(self) -> np.ndarray:
        """All vertices stacked into one [n, 2] array."""
        if not self.parts:
            return np.empty((0, 2))
        return np.vstack(self.parts)


def _coords(buf: memoryview, off: int, n: int):
    arr = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=off).reshape(n, 2)
    return arr, off + 16 * n


def _read_header(buf: memoryview, off: int):
    byte_order = buf[off]
    if byte_order != 1:
        raise ValueError("only little-endian WKB supported")
    (gtype,) = struct.unpack_from("<I", buf, off + 1)
    off += 5
    if gtype & _EWKB_SRID_FLAG:
        gtype &= ~_EWKB_SRID_FLAG
        off += 4  # skip SRID
    gtype &= 0xFF
    return gtype, off


def _parse_body(buf: memoryview, off: int, gtype: int, geom: Geom) -> int:
    if gtype == POINT:
        pts, off = _coords(buf, off, 1)
        geom.parts.append(pts)
    elif gtype == LINESTRING:
        (n,) = struct.unpack_from("<I", buf, off)
        pts, off = _coords(buf, off + 4, n)
        geom.parts.append(pts)
    elif gtype == POLYGON:
        (nrings,) = struct.unpack_from("<I", buf, off)
        off += 4
        for _ in range(nrings):
            (n,) = struct.unpack_from("<I", buf, off)
            ring, off = _coords(buf, off + 4, n)
            geom.parts.append(ring)
    else:
        raise ValueError(f"unsupported WKB type {gtype}")
    return off


def parse_wkb(data: bytes) -> Geom:
    buf = memoryview(data)
    gtype, off = _read_header(buf, 0)
    geom = Geom(kind=gtype)
    if gtype in (POINT, LINESTRING, POLYGON):
        _parse_body(buf, off, gtype, geom)
    elif gtype in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON):
        (nparts,) = struct.unpack_from("<I", buf, off)
        off += 4
        for _ in range(nparts):
            sub_type, off = _read_header(buf, off)
            if gtype == MULTIPOLYGON:
                geom.part_offsets.append(len(geom.parts))
            off = _parse_body(buf, off, sub_type, geom)
    else:
        raise ValueError(f"unsupported WKB type {gtype}")
    return geom


# ---- writers ----

def point_wkb(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, POINT, x, y)


def _ring_bytes(coords) -> bytes:
    arr = np.asarray(coords, dtype="<f8")
    return struct.pack("<I", len(arr)) + arr.tobytes()


def linestring_wkb(coords) -> bytes:
    return struct.pack("<BI", 1, LINESTRING) + _ring_bytes(coords)


def polygon_wkb(exterior, holes=()) -> bytes:
    """Build a Polygon; rings are auto-closed if needed."""
    rings = [exterior, *holes]
    out = [struct.pack("<BII", 1, POLYGON, len(rings))]
    for r in rings:
        arr = np.asarray(r, dtype="<f8")
        if not np.array_equal(arr[0], arr[-1]):
            arr = np.vstack([arr, arr[:1]])
        out.append(_ring_bytes(arr))
    return b"".join(out)


def multipolygon_wkb(polys) -> bytes:
    """polys: iterable of (exterior, holes) tuples."""
    parts = [polygon_wkb(ext, holes) for ext, holes in polys]
    return struct.pack("<BII", 1, MULTIPOLYGON, len(parts)) + b"".join(parts)


def box_wkb(min_lon: float, min_lat: float, max_lon: float, max_lat: float) -> bytes:
    """Axis-aligned rectangle polygon (CCW)."""
    return polygon_wkb([
        (min_lon, min_lat), (max_lon, min_lat),
        (max_lon, max_lat), (min_lon, max_lat), (min_lon, min_lat),
    ])
