"""Hierarchical equal-angle cell grid ("sector grid").

The reference clusters geometry with an integer 1-degree sector grid
(``geometry_sector(partition, place)`` = ``partition*1e6 + (500-x)*1000 +
(500-y)`` over floor'ed lon/lat — /root/reference/lib-sql/functions/
utils.sql:30-37) and per-country ``partition`` buckets (utils.sql:265-279).
This module generalizes that to a *hierarchical* grid — the engine's analog
of H3 res-7/9 cells — used as the equi-join key for every spatial join
(point-in-polygon cover joins, kNN ring expansion, nearest-road parenting).

Design properties (all deliberate):

* **Pure arithmetic** — a cell id at resolution ``r`` is
  ``r*2^56 + iy*2^28 + ix`` with ``ix = floor((lon+180)*2^r)``,
  ``iy = floor((lat+90)*2^r)``.  Resolution 0 is the reference's 1-degree
  sector; each +1 halves the cell edge.  Because the formula is plain
  float->int arithmetic it is (a) vectorizable in numpy inside pandas UDFs,
  (b) expressible as a native Spark SQL column expression (JVM-side, no
  Python in the hot path), and (c) expressible in ANSI SQL for the DuckDB
  correctness oracle — the three implementations are bit-identical.
* **Prefix-free hierarchy** — ``parent(cell, r')`` is integer division of
  ix/iy; children enumerate a 2x2 block.  Cover joins encode polygons at a
  coarse resolution and points at the same resolution.
* **k-ring neighborhoods** — longitude wraps, latitude clamps; ring(k)
  enumerates the hollow square ring used by iterative kNN expansion
  (the reference's doubling-radius loop, reverse.py:160-240).

All functions take/return numpy arrays and are safe to call inside
``mapInPandas`` batches.
"""

from __future__ import annotations

import numpy as np

# Packing layout: res in bits 56+, iy in bits 28..55, ix in bits 0..27.
_RES_SHIFT = np.int64(2**56)
_IY_SHIFT = np.int64(2**28)
MAX_RES = 19  # ix < 360*2^19 < 2^28

EARTH_DEG_M = 111_320.0  # meters per degree at the equator (approx)


def cell_size_deg(res: int) -> float:
    """Edge length of a cell at resolution ``res``, in degrees."""
    return 1.0 / (1 << res)


def nx(res: int) -> int:
    return 360 << res


def ny(res: int) -> int:
    return 180 << res


def encode(lon, lat, res: int):
    """Vectorized (lon, lat) -> int64 cell id at resolution ``res``."""
    if res < 0 or res > MAX_RES:
        raise ValueError(f"resolution out of range: {res}")
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    scale = float(1 << res)
    ix = np.floor((lon + 180.0) * scale).astype(np.int64)
    iy = np.floor((lat + 90.0) * scale).astype(np.int64)
    # Clamp the poles / antimeridian edge (lon=180, lat=90 land in the last
    # cell instead of overflowing).
    np.clip(ix, 0, nx(res) - 1, out=ix)
    np.clip(iy, 0, ny(res) - 1, out=iy)
    return np.int64(res) * _RES_SHIFT + iy * _IY_SHIFT + ix


def decode(cell):
    """int64 cell id -> (res, ix, iy) arrays."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell // _RES_SHIFT
    rem = cell - res * _RES_SHIFT
    iy = rem // _IY_SHIFT
    ix = rem - iy * _IY_SHIFT
    return res, ix, iy


def cell_center(cell):
    """int64 cell id -> (lon, lat) of the cell center."""
    res, ix, iy = decode(cell)
    size = 1.0 / np.exp2(res.astype(np.float64))
    lon = (ix.astype(np.float64) + 0.5) * size - 180.0
    lat = (iy.astype(np.float64) + 0.5) * size - 90.0
    return lon, lat


def cell_bounds(cell):
    """int64 cell id -> (min_lon, min_lat, max_lon, max_lat)."""
    res, ix, iy = decode(cell)
    size = 1.0 / np.exp2(res.astype(np.float64))
    min_lon = ix.astype(np.float64) * size - 180.0
    min_lat = iy.astype(np.float64) * size - 90.0
    return min_lon, min_lat, min_lon + size, min_lat + size


def parent(cell, parent_res: int):
    """Re-encode cells at a coarser resolution (vectorized)."""
    res, ix, iy = decode(cell)
    shift = res - np.int64(parent_res)
    if np.any(shift < 0):
        raise ValueError("parent_res must be <= cell resolution")
    return (
        np.int64(parent_res) * _RES_SHIFT
        + (iy >> shift) * _IY_SHIFT
        + (ix >> shift)
    )


def _pack(res: int, ix, iy):
    return np.int64(res) * _RES_SHIFT + iy.astype(np.int64) * _IY_SHIFT + ix.astype(np.int64)


def disk(cell: int, k: int) -> np.ndarray:
    """All cells within Chebyshev distance ``k`` of ``cell`` (the k-disk).

    Longitude wraps at the antimeridian; latitude rows outside the grid are
    dropped.  Analogous to H3 kRing; used by the reverse-geocode ring
    expansion (reference doubling-radius loop, reverse.py:160-240).
    """
    res, ix, iy = decode(np.int64(cell))
    res, ix, iy = int(res), int(ix), int(iy)
    dxs = np.arange(-k, k + 1)
    dys = np.arange(-k, k + 1)
    gx, gy = np.meshgrid(dxs, dys)
    x = np.mod(ix + gx.ravel(), nx(res))
    y = iy + gy.ravel()
    ok = (y >= 0) & (y < ny(res))
    return _pack(res, x[ok], y[ok])


def ring(cell: int, k: int) -> np.ndarray:
    """The hollow ring at exactly Chebyshev distance ``k`` (ring(0)=cell)."""
    if k == 0:
        return np.asarray([np.int64(cell)], dtype=np.int64)
    res, ix, iy = decode(np.int64(cell))
    res, ix, iy = int(res), int(ix), int(iy)
    xs, ys = [], []
    for dx in range(-k, k + 1):
        xs += [dx, dx]
        ys += [-k, k]
    for dy in range(-k + 1, k):
        xs += [-k, k]
        ys += [dy, dy]
    x = np.mod(ix + np.asarray(xs), nx(res))
    y = iy + np.asarray(ys)
    ok = (y >= 0) & (y < ny(res))
    return _pack(res, x[ok], y[ok])


def cover_bbox(min_lon: float, min_lat: float, max_lon: float, max_lat: float,
               res: int, limit: int = 4096) -> np.ndarray:
    """All cells at ``res`` intersecting the bbox (inclusive edges).

    This is the coarse cover used by polygon cover-joins: polygon -> bbox ->
    cells -> (optional exact polygon/cell intersection filter).  ``limit``
    guards against accidentally exploding a planet-sized polygon at a fine
    resolution — callers should instead pick a coarser res via
    :func:`res_for_extent` (the analog of the reference's recursive
    quad-split bound, utils.sql:394-501).
    """
    scale = float(1 << res)
    ix0 = max(int(np.floor((min_lon + 180.0) * scale)), 0)
    iy0 = max(int(np.floor((min_lat + 90.0) * scale)), 0)
    ix1 = min(int(np.floor((max_lon + 180.0) * scale)), nx(res) - 1)
    iy1 = min(int(np.floor((max_lat + 90.0) * scale)), ny(res) - 1)
    count = (ix1 - ix0 + 1) * (iy1 - iy0 + 1)
    if count > limit:
        raise ValueError(
            f"bbox cover of {count} cells exceeds limit {limit} at res {res}; "
            "use res_for_extent() to pick a coarser resolution"
        )
    gx, gy = np.meshgrid(np.arange(ix0, ix1 + 1), np.arange(iy0, iy1 + 1))
    return _pack(res, gx.ravel(), gy.ravel())


def cover_count(min_lon: float, min_lat: float, max_lon: float,
                max_lat: float, res: int) -> int:
    """Number of cells :func:`cover_bbox` would produce (cheap pre-check
    used by the distributed cover generator to pick a per-polygon tier)."""
    scale = float(1 << res)
    ix0 = max(int(np.floor((min_lon + 180.0) * scale)), 0)
    iy0 = max(int(np.floor((min_lat + 90.0) * scale)), 0)
    ix1 = min(int(np.floor((max_lon + 180.0) * scale)), nx(res) - 1)
    iy1 = min(int(np.floor((max_lat + 90.0) * scale)), ny(res) - 1)
    return max(ix1 - ix0 + 1, 0) * max(iy1 - iy0 + 1, 0)


def res_for_extent(extent_deg: float, max_cells_per_axis: int = 16) -> int:
    """Pick the finest resolution where the extent spans <= N cells/axis.

    Bounds cover-join fan-out the same way the reference bounds polygon
    split depth (quad_split_geometry at 0.25 deg^2, utils.sql:394-501):
    big polygons get coarse cells, small ones fine cells.
    """
    extent_deg = max(extent_deg, 1e-9)
    res = int(np.floor(np.log2(max_cells_per_axis / extent_deg)))
    return int(np.clip(res, 0, MAX_RES))


# --- SQL expression builders (JVM-side encode, no Python in the hot path) ---

def encode_sql(lon_col: str, lat_col: str, res: int) -> str:
    """Spark-SQL/ANSI-SQL expression computing encode() bit-identically.

    Usable both in Spark (F.expr) and in the DuckDB oracle; pure arithmetic
    so both engines produce identical int64 ids.
    """
    scale = 1 << res
    # LEAST/GREATEST mirror np.clip in encode() so points exactly at
    # lon=180 / lat=90 land in the last cell on every code path
    iy = (f"LEAST(GREATEST(CAST(FLOOR(({lat_col} + 90.0) * {scale}) AS BIGINT),"
          f" CAST(0 AS BIGINT)), CAST({ny(res) - 1} AS BIGINT))")
    ix = (f"LEAST(GREATEST(CAST(FLOOR(({lon_col} + 180.0) * {scale}) AS BIGINT),"
          f" CAST(0 AS BIGINT)), CAST({nx(res) - 1} AS BIGINT))")
    return (
        f"(CAST({res} AS BIGINT) * CAST({_RES_SHIFT} AS BIGINT)"
        f" + {iy} * CAST({_IY_SHIFT} AS BIGINT)"
        f" + {ix})"
    )
