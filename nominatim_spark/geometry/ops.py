"""Vectorized geometry predicates & measures.

Implements the geo-function subset the reference relies on (SURVEY.md §2.8):

* ``point_in_polygon`` / ``points_in_polygon`` — ST_Contains/Intersects
  recheck after the grid cover-join (reverse.py:391-459; placex address
  assignment partition-functions.sql:20-61).
* ``polygon_centroid`` / ``point_on_surface`` / ``get_center_point`` — the
  reference's get_center_point (utils.sql:10-27): point -> itself, line ->
  midpoint vertex-wise interpolation, polygon -> centroid if inside else
  point-on-surface.
* ``line_interpolate_point`` / ``line_locate_point`` — housenumber
  interpolation (ST_LineInterpolatePoint / ST_LineLocatePoint,
  interpolation.sql:270-330, api reverse.py:61-81).
* ``haversine_m`` — spherical distance for kNN ordering (planar degree
  distance is used where the reference uses it, spherical where it uses
  ST_DistanceSpheroid).

Everything operates on numpy arrays; per-geometry loops only over ring
structure, never over vertices.
"""

from __future__ import annotations

import numpy as np

from nominatim_spark.geometry.wkb import (
    Geom,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    parse_wkb,
)

EARTH_RADIUS_M = 6_371_008.8


def _ring_contains(ring: np.ndarray, px, py):
    """Vectorized even-odd ray cast of points against one ring.

    ``ring``: closed [n, 2]; ``px, py``: arrays of shape [m].
    Points exactly on an edge count as inside (matches ST_Intersects
    semantics closely enough for the recheck role; boundary cases are
    deterministic).
    """
    x, y = ring[:, 0], ring[:, 1]
    x0, y0 = x[:-1][:, None], y[:-1][:, None]  # edge starts [e, 1]
    x1, y1 = x[1:][:, None], y[1:][:, None]    # edge ends
    px = np.asarray(px, dtype=np.float64)[None, :]  # [1, m]
    py = np.asarray(py, dtype=np.float64)[None, :]

    cond = (y0 > py) != (y1 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0 + (py - y0) * (x1 - x0) / (y1 - y0)
    crossings = np.sum(cond & (px < xint), axis=0)

    # on-edge test: point within edge bbox and collinear (exact-ish)
    dx, dy = x1 - x0, y1 - y0
    cross = dx * (py - y0) - dy * (px - x0)
    within = (
        (np.minimum(x0, x1) - 1e-12 <= px) & (px <= np.maximum(x0, x1) + 1e-12)
        & (np.minimum(y0, y1) - 1e-12 <= py) & (py <= np.maximum(y0, y1) + 1e-12)
    )
    on_edge = np.any((np.abs(cross) < 1e-12) & within, axis=0)
    return (crossings % 2 == 1) | on_edge


def points_in_polygon(geom: Geom, px, py) -> np.ndarray:
    """Boolean mask: which of the points fall inside the areal geometry."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    result = np.zeros(px.shape[0], dtype=bool)
    for exterior, holes in geom.polygons():
        inside = _ring_contains(exterior, px, py)
        for hole in holes:
            # on-hole-boundary still counts as inside the polygon
            hole_in = _ring_contains(hole, px, py)
            hole_edge = _on_boundary(hole, px, py)
            inside &= ~(hole_in & ~hole_edge)
        result |= inside
    return result


def _on_boundary(ring: np.ndarray, px, py):
    x, y = ring[:, 0], ring[:, 1]
    x0, y0 = x[:-1][:, None], y[:-1][:, None]
    x1, y1 = x[1:][:, None], y[1:][:, None]
    px = np.asarray(px, dtype=np.float64)[None, :]
    py = np.asarray(py, dtype=np.float64)[None, :]
    dx, dy = x1 - x0, y1 - y0
    cross = dx * (py - y0) - dy * (px - x0)
    within = (
        (np.minimum(x0, x1) - 1e-12 <= px) & (px <= np.maximum(x0, x1) + 1e-12)
        & (np.minimum(y0, y1) - 1e-12 <= py) & (py <= np.maximum(y0, y1) + 1e-12)
    )
    return np.any((np.abs(cross) < 1e-12) & within, axis=0)


def point_in_polygon(wkb: bytes, x: float, y: float) -> bool:
    return bool(points_in_polygon(parse_wkb(wkb), [x], [y])[0])


def polygon_area(geom: Geom) -> float:
    """Planar (degree^2) shoelace area, holes subtracted."""
    total = 0.0
    for exterior, holes in geom.polygons():
        total += abs(_shoelace(exterior))
        for h in holes:
            total -= abs(_shoelace(h))
    return total


def _shoelace(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def simplify_coords(coords: np.ndarray, tolerance: float) -> np.ndarray:
    """Douglas–Peucker line simplification (F12 — the reference simplifies
    oversized polygons before storing them, lib-sql/functions/
    utils.sql:394-515 ST_SimplifyPreserveTopology usage).

    Iterative stack implementation (no recursion limit); endpoints are
    always kept, so closed rings stay closed.
    """
    n = len(coords)
    if n <= 2 or tolerance <= 0:
        return coords
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi - lo < 2:
            continue
        seg = coords[lo:hi + 1]
        a, b = seg[0], seg[-1]
        d = b - a
        seg_len2 = float(d @ d)
        if seg_len2 == 0.0:
            dist = np.hypot(seg[1:-1, 0] - a[0], seg[1:-1, 1] - a[1])
        else:
            # perpendicular distance of interior points to chord a-b
            t = ((seg[1:-1] - a) @ d) / seg_len2
            proj = a + np.clip(t, 0.0, 1.0)[:, None] * d
            dist = np.hypot(seg[1:-1, 0] - proj[:, 0],
                            seg[1:-1, 1] - proj[:, 1])
        if len(dist) == 0:
            continue
        imax = int(np.argmax(dist))
        if dist[imax] > tolerance:
            mid = lo + 1 + imax
            keep[mid] = True
            stack.append((lo, mid))
            stack.append((mid, hi))
    return coords[keep]


def simplify_geom(geom: Geom, tolerance: float) -> Geom:
    """Simplify every ring/line of a geometry; rings keep >= 4 points
    (triangle + closure) so they stay valid polygons."""
    from nominatim_spark.geometry.wkb import Geom as _G

    parts = []
    for p in geom.parts:
        s = simplify_coords(np.asarray(p, dtype=np.float64), tolerance)
        if geom.type_name in ("Polygon", "MultiPolygon") and len(s) < 4:
            s = np.asarray(p, dtype=np.float64)  # degenerate: keep original
        parts.append(s)
    return _G(kind=geom.kind, parts=parts,
              part_offsets=list(geom.part_offsets))


def polygon_centroid(geom: Geom) -> tuple[float, float]:
    """Area-weighted centroid over exterior rings minus holes."""
    sa = sx = sy = 0.0
    for exterior, holes in geom.polygons():
        for ring, sign in [(exterior, 1.0), *[(h, -1.0) for h in holes]]:
            x, y = ring[:-1, 0], ring[:-1, 1]
            x1, y1 = ring[1:, 0], ring[1:, 1]
            cross = x * y1 - x1 * y
            a = 0.5 * np.sum(cross)
            if a == 0.0:
                continue
            cx = np.sum((x + x1) * cross) / (6.0 * a)
            cy = np.sum((y + y1) * cross) / (6.0 * a)
            aa = sign * abs(a)
            sa += aa
            sx += cx * aa
            sy += cy * aa
    if sa == 0.0:  # degenerate polygon: fall back to vertex mean
        c = geom.all_coords()
        return float(c[:, 0].mean()), float(c[:, 1].mean())
    return sx / sa, sy / sa


def point_on_surface(geom: Geom) -> tuple[float, float]:
    """A point guaranteed inside the areal geometry.

    Centroid if it tests inside; else scan horizontal line through the
    bbox-middle latitude and take the midpoint of the widest inside span
    (deterministic; mirrors PostGIS ST_PointOnSurface's role in
    get_center_point, utils.sql:19-24).
    """
    cx, cy = polygon_centroid(geom)
    if points_in_polygon(geom, [cx], [cy])[0]:
        return cx, cy
    coords = geom.all_coords()
    y = (coords[:, 1].min() + coords[:, 1].max()) / 2.0
    xs = np.unique(coords[:, 0])
    lo, hi = xs.min(), xs.max()
    cand_x = np.linspace(lo, hi, 257)
    inside = points_in_polygon(geom, cand_x, np.full(cand_x.shape, y))
    if not inside.any():
        # fall back to first vertex (degenerate slivers)
        return float(coords[0, 0]), float(coords[0, 1])
    # widest run of inside samples -> midpoint
    best_len, best_mid, run_start = -1, 0, None
    for i, flag in enumerate(inside):
        if flag and run_start is None:
            run_start = i
        if (not flag or i == len(inside) - 1) and run_start is not None:
            end = i if flag else i - 1
            if end - run_start > best_len:
                best_len = end - run_start
                best_mid = (cand_x[run_start] + cand_x[end]) / 2.0
            run_start = None
    return float(best_mid), float(y)


def line_length(coords: np.ndarray) -> float:
    d = np.diff(coords, axis=0)
    return float(np.sum(np.hypot(d[:, 0], d[:, 1])))


def line_interpolate_point(coords: np.ndarray, frac: float) -> tuple[float, float]:
    """ST_LineInterpolatePoint: point at fraction ``frac`` of line length."""
    d = np.diff(coords, axis=0)
    seg = np.hypot(d[:, 0], d[:, 1])
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    total = cum[-1]
    if total == 0.0:
        return float(coords[0, 0]), float(coords[0, 1])
    target = float(np.clip(frac, 0.0, 1.0)) * total
    i = int(np.searchsorted(cum, target, side="right") - 1)
    i = min(i, len(seg) - 1)
    t = (target - cum[i]) / seg[i] if seg[i] > 0 else 0.0
    p = coords[i] + t * d[i]
    return float(p[0]), float(p[1])


def line_locate_point(coords: np.ndarray, x: float, y: float) -> float:
    """ST_LineLocatePoint: fraction along line of the closest point."""
    p = np.array([x, y])
    a = coords[:-1]
    d = np.diff(coords, axis=0)
    seg_len2 = np.sum(d * d, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.clip(np.sum((p - a) * d, axis=1) / seg_len2, 0.0, 1.0)
    t = np.nan_to_num(t)
    proj = a + t[:, None] * d
    dist2 = np.sum((proj - p) ** 2, axis=1)
    i = int(np.argmin(dist2))
    seg = np.sqrt(seg_len2)
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    total = cum[-1]
    if total == 0.0:
        return 0.0
    return float((cum[i] + t[i] * seg[i]) / total)


def haversine_m(lon1, lat1, lon2, lat2):
    """Vectorized great-circle distance in meters."""
    lon1, lat1, lon2, lat2 = (np.radians(np.asarray(v, dtype=np.float64))
                              for v in (lon1, lat1, lon2, lat2))
    dlon, dlat = lon2 - lon1, lat2 - lat1
    a = np.sin(dlat / 2) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2) ** 2
    return 2 * EARTH_RADIUS_M * np.arcsin(np.sqrt(a))


def bbox_of(geom: Geom) -> tuple[float, float, float, float]:
    c = geom.all_coords()
    return (float(c[:, 0].min()), float(c[:, 1].min()),
            float(c[:, 0].max()), float(c[:, 1].max()))


def get_center_point(wkb: bytes) -> tuple[float, float]:
    """The reference's get_center_point (utils.sql:10-27), re-expressed:

    * Point -> itself
    * LineString -> point at half the line length (ST_LineInterpolatePoint 0.5)
    * Polygon/MultiPolygon -> centroid if inside, else point-on-surface
    * Multi point/line -> centroid of all vertices
    """
    g = parse_wkb(wkb)
    if g.kind == POINT:
        p = g.parts[0][0]
        return float(p[0]), float(p[1])
    if g.kind == LINESTRING:
        return line_interpolate_point(g.parts[0], 0.5)
    if g.kind in (POLYGON, MULTIPOLYGON):
        cx, cy = polygon_centroid(g)
        if points_in_polygon(g, [cx], [cy])[0]:
            return cx, cy
        return point_on_surface(g)
    if g.kind in (MULTIPOINT, MULTILINESTRING):
        c = g.all_coords()
        return float(c[:, 0].mean()), float(c[:, 1].mean())
    raise ValueError(f"unsupported kind {g.kind}")
