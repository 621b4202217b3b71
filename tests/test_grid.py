import numpy as np
import pytest

from nominatim_spark import grid


def test_encode_decode_roundtrip():
    lons = np.array([-179.99, -1.5, 0.0, 9.5226, 179.99])
    lats = np.array([-89.99, -0.5, 0.0, 47.1410, 89.99])
    for res in (0, 3, 7, 12):
        cells = grid.encode(lons, lats, res)
        r, ix, iy = grid.decode(cells)
        assert (r == res).all()
        clon, clat = grid.cell_center(cells)
        size = grid.cell_size_deg(res)
        assert (np.abs(clon - lons) <= size).all()
        assert (np.abs(clat - lats) <= size).all()


def test_res0_is_one_degree_sector():
    # res 0 = the reference's 1-degree geometry_sector grid (utils.sql:30-37)
    c1 = grid.encode([9.2], [47.8], 0)
    c2 = grid.encode([9.9], [47.1], 0)
    c3 = grid.encode([10.1], [47.8], 0)
    assert c1[0] == c2[0]
    assert c1[0] != c3[0]


def test_parent_child_consistency():
    c = grid.encode([9.5226], [47.1410], 9)
    for pr in (7, 3, 0):
        p = grid.parent(c, pr)
        direct = grid.encode([9.5226], [47.1410], pr)
        assert p[0] == direct[0]


def test_disk_and_ring():
    c = int(grid.encode([9.5], [47.1], 7)[0])
    d1 = grid.disk(c, 1)
    assert len(d1) == 9 and c in d1
    r1 = grid.ring(c, 1)
    assert len(r1) == 8 and c not in r1
    assert set(r1) | {c} == set(d1)
    # union of rings 0..k == disk(k)
    union = set()
    for k in range(3):
        union |= set(grid.ring(c, k))
    assert union == set(grid.disk(c, 2))


def test_ring_wraps_longitude_and_clamps_latitude():
    c = int(grid.encode([179.9], [89.9], 2)[0])
    d = grid.disk(c, 1)
    # top row clipped at the pole: 6 cells, with wrap across antimeridian
    assert len(d) == 6
    lons, lats = grid.cell_center(d)
    assert (lats <= 90).all()
    assert any(l < 0 for l in lons)  # wrapped cells


def test_cover_bbox_counts():
    cells = grid.cover_bbox(9.0, 47.0, 9.99, 47.49, 1)
    assert len(cells) == 2 * 1  # 2 cols x 1 row at 0.5 deg
    with pytest.raises(ValueError):
        grid.cover_bbox(-180, -90, 180, 90, 7)


def test_res_for_extent_bounds_fanout():
    for extent in (0.001, 0.1, 1.0, 20.0, 360.0):
        res = grid.res_for_extent(extent)
        # cover of the extent at chosen res stays bounded per axis
        # bound holds except at the clamps (res 0 is the coarsest available)
        assert extent / grid.cell_size_deg(res) <= 16 + 1e-9 or res in (0, grid.MAX_RES)
        assert 0 <= res <= grid.MAX_RES


def test_encode_sql_matches_numpy(spark):
    import pandas as pd

    lons = np.linspace(-179.5, 179.5, 101)
    lats = np.linspace(-89.5, 89.5, 101)
    pdf = pd.DataFrame({"lon": lons, "lat": lats})
    expected = grid.encode(lons, lats, 7)
    df = spark.createDataFrame(pdf)
    got = (
        df.selectExpr(grid.encode_sql("lon", "lat", 7) + " AS cell")
        .toPandas()["cell"]
        .to_numpy()
    )
    assert (got == expected).all()

    import duckdb

    d = duckdb.connect()
    d.register("pts", pdf)
    got_duck = (
        d.execute("SELECT " + grid.encode_sql("lon", "lat", 7) + " AS cell FROM pts")
        .fetchdf()["cell"]
        .to_numpy()
    )
    assert (got_duck == expected).all()
