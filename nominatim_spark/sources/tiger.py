"""TIGER address-range source (S3).

Re-expresses the reference's TIGER loader
(/root/reference/src/nominatim_db/tools/tiger_data.py): ``;``-delimited CSV
files (optionally many of them — pass a glob) with columns
``from;to;interpolation;street;city;state;postcode;geometry`` where
geometry is a WKT LINESTRING.  Rows become osmline-shaped interpolation
segments parented to the nearest same-named street, exactly like OSM
interpolation ways — so the search housenumber lane picks them up through
the same range join.

Spark-first: the CSV scan is the native reader (predicate pushdown,
parallel split reading — a full US TIGER set is ~50 GB of CSV); WKT
parsing and midpoint math run in one Arrow-batched mapInPandas; street
matching reuses the distributed (cell, name-key) cover join.
"""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from nominatim_spark.functions.text import norm_translit
from nominatim_spark.geometry import wkb

TIGER_SCHEMA = (
    "`from` int, `to` int, interpolation string, street string, "
    "city string, state string, postcode string, geometry string"
)

_WKT_LINE = re.compile(r"LINESTRING\s*\(([^)]*)\)", re.IGNORECASE)


def read_tiger_csv(spark, path: str) -> DataFrame:
    """Native CSV scan of TIGER address-range files (';'-separated)."""
    return (
        spark.read
        .option("header", "true")
        .option("sep", ";")
        .schema(TIGER_SCHEMA)
        .csv(path)
    )


def _parse_wkt_line(wkt: str) -> np.ndarray | None:
    m = _WKT_LINE.search(wkt or "")
    if not m:
        return None
    pts = []
    for pair in m.group(1).split(","):
        xy = pair.split()
        if len(xy) < 2:
            return None
        pts.append((float(xy[0]), float(xy[1])))
    return np.asarray(pts) if len(pts) >= 2 else None


def tiger_osmline(spark, tiger: DataFrame, placex: DataFrame) -> DataFrame:
    """TIGER rows -> osmline-schema segments parented to streets.

    Mirrors tiger_data.py's insert path: normalize the range to the
    interpolation parity (tiger SQL uses the same parity pull-in as
    osmline_update), midpoint from the line geometry, parent by
    normalized street name within the 0.015-degree box.
    """
    from nominatim_spark import grid
    from nominatim_spark.operators.spatial import explode_bbox_cells
    from nominatim_spark.pipeline.placex import CELL_RES

    out_schema = (
        "start int, stop int, interpolation string, street string, "
        "postcode string, mid_lon double, mid_lat double, geometry binary"
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                coords = _parse_wkt_line(r.geometry)
                if coords is None or pd.isna(r.start) or pd.isna(r.stop):
                    continue
                mid = coords[len(coords) // 2]
                rows.append((
                    int(r.start), int(r.stop), r.interpolation, r.street,
                    r.postcode, float(mid[0]), float(mid[1]),
                    wkb.linestring_wkb([tuple(c) for c in coords]),
                ))
            yield pd.DataFrame(rows, columns=[
                "start", "stop", "interpolation", "street", "postcode",
                "mid_lon", "mid_lat", "geometry",
            ])

    segs = (
        tiger.withColumnRenamed("from", "start")
        .withColumnRenamed("to", "stop")
        .mapInPandas(parse, schema=out_schema)
    )

    # parity normalization (same rules as interpolation.build_osmline)
    lo = F.least("start", "stop")
    hi = F.greatest("start", "stop")
    parity = (
        F.when(F.col("interpolation") == "odd", 1)
        .when(F.col("interpolation") == "even", 0)
    )
    startnumber = F.when(parity.isNotNull() & (lo % 2 != parity), lo + 1).otherwise(lo)
    endnumber = F.when(parity.isNotNull() & (hi % 2 != parity), hi - 1).otherwise(hi)
    step = F.when(F.col("interpolation").isin("odd", "even"), 2).otherwise(1)

    segs = (
        segs.withColumn("startnumber", startnumber)
        .withColumn("endnumber", endnumber)
        .withColumn("step", step)
        .filter(F.col("startnumber") <= F.col("endnumber"))
        .withColumn(
            # disjoint id namespace: TIGER segments are synthetic — hash the
            # payload; *4+3 keeps them out of the placex id space like osmline
            "osmline_id",
            (F.pmod(F.xxhash64("street", "startnumber", "endnumber",
                               "mid_lon", "mid_lat"), F.lit(1 << 60))
             * 4 + 3),
        )
        .withColumn("way_id", F.lit(None).cast("long"))
    )

    @F.pandas_udf("string")
    def norm_udf(s: pd.Series) -> pd.Series:
        return s.map(lambda v: norm_translit(v) if isinstance(v, str) else "")

    pad = max(0.015, 1.0 / (1 << CELL_RES))
    streets = placex.filter(F.col("rank_search").between(26, 27)).select(
        F.col("place_id").alias("street_pid"),
        norm_udf(F.col("name").getItem("name")).alias("street_key"),
        "minx", "miny", "maxx", "maxy",
    ).filter(F.col("street_key").isNotNull() & (F.col("street_key") != ""))
    street_cells = explode_bbox_cells(streets, res=CELL_RES, pad=pad)

    seg_keyed = segs.withColumn("street_key", norm_udf("street")).withColumn(
        "cell", F.expr(grid.encode_sql("mid_lon", "mid_lat", CELL_RES))
    )
    matched = (
        seg_keyed.select("osmline_id", "street_key", "cell",
                         "mid_lon", "mid_lat")
        .join(street_cells, ["cell", "street_key"])
        .filter(
            (F.col("mid_lon") >= F.col("minx") - pad)
            & (F.col("mid_lon") <= F.col("maxx") + pad)
            & (F.col("mid_lat") >= F.col("miny") - pad)
            & (F.col("mid_lat") <= F.col("maxy") + pad)
        )
        .groupBy("osmline_id")
        .agg(F.min("street_pid").alias("parent_place_id"))
    )
    return segs.join(matched, "osmline_id", "left").select(
        "osmline_id", "way_id", "parent_place_id", "startnumber",
        "endnumber", "step", "mid_lon", "mid_lat", "geometry",
    )
