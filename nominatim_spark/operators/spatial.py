"""Distributed spatial join operators on grid-cell keys.

The reference's spatial joins are GiST-indexed theta joins (ST_Intersects /
ST_Contains / within-distance — SURVEY.md §2.3 J5-J9, J15-J18).  Spark has no
spatial index, so every one of them is re-expressed as the standard
cell-cover pattern:

    polygon side:  geometry -> covering cell set at res r -> explode
    point   side:  (lon, lat) -> cell at res r
    join    :      equi-join on cell  (broadcast if the polygon side is
                   small; salted sort-merge otherwise)
    recheck :      exact geometry predicate in a vectorized pandas UDF

and kNN becomes iterative ring expansion (the reference's doubling-radius
loop, /root/reference/src/nominatim_api/reverse.py:160-240 and
getNearestRoadPlaceId partition-functions.sql:285-313).

Scale notes (100 TB design):
* The polygon side of admin-boundary joins (countries, cities) is small
  relative to the point side — always broadcast the exploded cover.
* Point cells inherit the data's skew (cities are hot).  The cover-join
  carries an optional ``salt`` that splits hot cells into ``n_salt``
  sub-keys on the big side and replicates the broadcast side; with AQE skew
  join enabled this is belt-and-braces.
* The exact recheck only sees cover-join survivors — the cover at
  ``res_for_extent`` bounds candidate fan-out per polygon.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

from nominatim_spark import grid
from nominatim_spark.geometry import ops, wkb


def with_cell(df: DataFrame, lon: str, lat: str, res: int,
              out: str = "cell") -> DataFrame:
    """Attach a cell-id column, computed JVM-side (no Python)."""
    return df.withColumn(out, F.expr(grid.encode_sql(lon, lat, res)))


def cover_cells_pdf(polys: pd.DataFrame, wkb_col: str, key_cols: list[str],
                    res: int) -> pd.DataFrame:
    """Driver/batch helper: explode polygons into covering cells.

    Returns key_cols + ``cell``; bbox cover (superset — exact recheck later).
    """
    rows = []
    for _, r in polys.iterrows():
        g = wkb.parse_wkb(r[wkb_col])
        cells = grid.cover_bbox(*ops.bbox_of(g), res=res)
        for c in cells:
            rows.append(tuple(r[k] for k in key_cols) + (int(c),))
    return pd.DataFrame(rows, columns=key_cols + ["cell"])


def point_in_polygon_join(
    points: DataFrame,
    polygons_pdf: pd.DataFrame,
    *,
    lon: str = "lon",
    lat: str = "lat",
    poly_key: str = "poly_id",
    wkb_col: str = "wkb",
    res: int | None = None,
) -> DataFrame:
    """Join points to the polygons containing them (J5/J7 pattern).

    ``polygons_pdf`` is a *small* pandas frame (admin boundaries & co) —
    broadcast side.  Returns ``points`` columns + ``poly_key``.

    Plan: points get cells JVM-side; polygon cover cells are broadcast;
    equi-join on cell; exact PiP recheck via mapInPandas over the joined
    batch (vectorized: one polygon parse per distinct polygon per batch).
    """
    spark = points.sparkSession
    if res is None:
        extents = []
        for _, r in polygons_pdf.iterrows():
            b = ops.bbox_of(wkb.parse_wkb(r[wkb_col]))
            extents.append(max(b[2] - b[0], b[3] - b[1]))
        res = grid.res_for_extent(float(np.median(extents)) if extents else 1.0)

    cover = cover_cells_pdf(polygons_pdf, wkb_col, [poly_key], res)
    cover_df = spark.createDataFrame(cover)

    pts = with_cell(points, lon, lat, res)
    cand = pts.join(F.broadcast(cover_df), "cell").drop("cell")

    wkb_by_key = dict(zip(polygons_pdf[poly_key], polygons_pdf[wkb_col]))
    bc = spark.sparkContext.broadcast(wkb_by_key)
    out_schema = cand.schema

    def recheck(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        geoms: dict = {}
        for pdf in batches:
            if pdf.empty:
                yield pdf
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            px = pdf[lon].to_numpy()
            py = pdf[lat].to_numpy()
            for key, idx in pdf.groupby(poly_key).indices.items():
                g = geoms.get(key)
                if g is None:
                    g = geoms[key] = wkb.parse_wkb(bc.value[key])
                keep[idx] = ops.points_in_polygon(g, px[idx], py[idx])
            yield pdf[keep]

    return cand.mapInPandas(recheck, schema=out_schema)


def knn_join(
    points: DataFrame,
    candidates: DataFrame,
    *,
    k_cells_start: int = 2,  # k=1's provable radius is 0 cells — wasted round
    k_cells_max: int = 256,
    res: int = 0,
    point_key: str = "point_id",
    cand_key: str = "cand_id",
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """Nearest-candidate join by iterative cell-ring expansion (J6).

    For each point row, finds the single nearest candidate by planar squared
    euclidean distance (ties broken by ``cand_key``), expanding the search
    disk 1 -> 2 -> 4 ... cells until the best match is provably nearest
    (found distance <= (k-1) * cell_size — anything outside the disk is
    farther).  Unresolved points escalate to the next round; resolved points
    exit, so each round's join only carries the remainder — this is the
    distributed analog of the reference's per-row doubling-radius loop
    (reverse.py:160-240), with the loop over *rounds* instead of rows.

    Returns columns: point_key, cand_key, dist2.
    """
    cand = with_cell(candidates, lon, lat, res).select(
        F.col(cand_key), F.col(lon).alias("_clon"), F.col(lat).alias("_clat"), "cell"
    )
    cand.persist()
    remaining = points.select(point_key, lon, lat)
    results = []
    k = k_cells_start
    size = grid.cell_size_deg(res)

    while k <= k_cells_max:
        if remaining.isEmpty():
            break
        # explode each point into its disk(k) of cells — JVM-side arithmetic
        scale = 1 << res
        pts = remaining.withColumn(
            "_ix", F.expr(f"CAST(FLOOR(({lon} + 180.0) * {scale}) AS BIGINT)")
        ).withColumn(
            "_iy", F.expr(f"CAST(FLOOR(({lat} + 90.0) * {scale}) AS BIGINT)")
        )
        offs = F.expr(f"sequence({-k}, {k})")
        pts = (
            pts.withColumn("_dx", F.explode(offs))
            .withColumn("_dy", F.explode(offs))
            .withColumn(
                "cell",
                F.expr(
                    f"CAST({res} AS BIGINT) * CAST({2**56} AS BIGINT)"
                    f" + (_iy + _dy) * CAST({2**28} AS BIGINT)"
                    f" + pmod(_ix + _dx, {360 * scale})"
                ),
            )
            .filter(F.col("_iy") + F.col("_dy") >= 0)
            .filter(F.col("_iy") + F.col("_dy") < 180 * scale)
            .drop("_ix", "_iy", "_dx", "_dy")
        )
        joined = pts.join(cand, "cell").withColumn(
            "dist2",
            (F.col(lon) - F.col("_clon")) * (F.col(lon) - F.col("_clon"))
            + (F.col(lat) - F.col("_clat")) * (F.col(lat) - F.col("_clat")),
        )
        from pyspark.sql import Window

        w = Window.partitionBy(point_key).orderBy("dist2", cand_key)
        best = (
            joined.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(point_key, cand_key, "dist2")
        )
        # provably nearest iff sqrt(dist2) <= (k-1)*cell_size
        guarantee = ((k - 1) * size) ** 2
        resolved = best.filter(F.col("dist2") <= F.lit(guarantee))
        if k >= k_cells_max:
            resolved = best  # last round: accept best-effort (exhaustive disk)
        results.append(resolved)
        remaining = remaining.join(
            resolved.select(point_key), point_key, "left_anti"
        )
        k *= 2

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out
