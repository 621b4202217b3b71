"""Housenumber interpolation build (osmline).

Re-expresses the reference's osmline_update
(/root/reference/lib-sql/functions/interpolation.sql:196-374): an
interpolation way is split at its housenumber nodes into segments; each
segment gets (startnumber, endnumber, step) with parity normalization:

* step: 'odd'/'even' -> 2, 'all' -> 1, digit string -> that digit
* endpoints are pulled inward to the segment parity ('odd' with an even
  endpoint moves it by 1 — interpolation.sql:239-262)
* reversed segments are swapped so startnumber <= endnumber
* segments where start == end collapse (single point, no range)

The reference walks way nodes with DISTINCT ON + ordered cursor (W3,
interpolation.sql:253-267); here the walk is a lag-window over the
node-position explode — per-way ordered pairing, fully parallel across ways.

Parenting reuses the POI street-match cascade (addr:street name within the
0.015-degree box).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nominatim_spark.functions.text import norm_translit
from nominatim_spark.geometry import ops, wkb


def build_osmline(
    spark,
    interp_ways: pd.DataFrame,
    hnr_nodes: pd.DataFrame,
    placex: DataFrame,
) -> DataFrame:
    """interp ways + housenumber nodes + placex(streets) -> osmline table.

    interp_ways: osm_id, type, address(map), nodes(list), geometry(wkb)
    hnr_nodes:   osm_id, housenumber, lon, lat
    """
    ways = spark.createDataFrame(
        interp_ways,
        "osm_id long, type string, address map<string,string>, "
        "nodes array<long>, geometry binary",
    )
    nodes = spark.createDataFrame(
        hnr_nodes, "osm_id long, housenumber string, lon double, lat double"
    )

    # node walk in way order (W3): posexplode keeps the way-relative index
    exploded = ways.select(
        F.col("osm_id").alias("way_id"), "type", "address", "geometry",
        F.posexplode("nodes").alias("pos", "node_id"),
    )
    hn = exploded.join(
        nodes.select(
            F.col("osm_id").alias("node_id"),
            F.col("housenumber").cast("int").alias("hnr"),
            "lon", "lat",
        ),
        "node_id",
    ).filter(F.col("hnr").isNotNull())

    w = Window.partitionBy("way_id").orderBy("pos")
    pairs = (
        hn.withColumn("next_hnr", F.lead("hnr").over(w))
        .withColumn("next_lon", F.lead("lon").over(w))
        .withColumn("next_lat", F.lead("lat").over(w))
        .filter(F.col("next_hnr").isNotNull())
        .withColumn(
            "step",
            F.when(F.col("type").isin("odd", "even"), F.lit(2))
            .when(F.col("type") == "all", F.lit(1))
            .otherwise(F.coalesce(F.col("type").cast("int"), F.lit(1))),
        )
    )

    # orient + parity normalization (interpolation.sql:239-262)
    lo = F.least("hnr", "next_hnr")
    hi = F.greatest("hnr", "next_hnr")
    parity = F.when(F.col("type") == "odd", 1).when(F.col("type") == "even", 0)
    start = F.when(
        parity.isNotNull() & (lo % 2 != parity), lo + 1
    ).otherwise(lo)
    end = F.when(
        parity.isNotNull() & (hi % 2 != parity), hi - 1
    ).otherwise(hi)

    segs = (
        pairs.withColumn("startnumber", start)
        .withColumn("endnumber", end)
        .filter(F.col("startnumber") <= F.col("endnumber"))
        .withColumn(
            "mid_lon", (F.col("lon") + F.col("next_lon")) / 2
        )
        .withColumn("mid_lat", (F.col("lat") + F.col("next_lat")) / 2)
        .withColumn(
            "osmline_id", F.col("way_id") * 100 + F.col("pos")
        )
    )

    # parent street by addr:street normalized-name match against placex
    streets = placex.filter(F.col("rank_search").between(26, 27)).select(
        "place_id", "name", "minx", "maxx", "miny", "maxy"
    ).toPandas()
    name_to_streets: dict[str, list] = {}
    for r in streets.itertuples():
        nm = (r.name or {}).get("name")
        if nm:
            name_to_streets.setdefault(norm_translit(nm), []).append(
                (r.place_id, r.minx - 0.015, r.miny - 0.015,
                 r.maxx + 0.015, r.maxy + 0.015)
            )
    bc = spark.sparkContext.broadcast(name_to_streets)

    seg_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in segs.schema
    ) + ", parent_place_id bigint"

    def parent_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parents = []
            for addr, x, y in zip(pdf["address"], pdf["mid_lon"], pdf["mid_lat"]):
                key = norm_translit((addr or {}).get("street", "") or "")
                pid = None
                for sid, x0, y0, x1, y1 in bc.value.get(key, ()):
                    if x0 <= x <= x1 and y0 <= y <= y1:
                        pid = sid
                        break
                parents.append(pid)
            yield pdf.assign(parent_place_id=pd.array(parents, dtype="Int64"))

    out = segs.mapInPandas(parent_batch, schema=seg_schema)
    return out.select(
        "osmline_id", "way_id", "parent_place_id", "startnumber",
        "endnumber", "step", "mid_lon", "mid_lat", "geometry",
    )


def interpolate_position(line_wkb: bytes, n: int, start: int, end: int
                         ) -> tuple[float, float]:
    """Point for housenumber ``n`` on the segment (uniform fraction, the
    reference's ST_LineInterpolatePoint usage, api reverse.py:61-81)."""
    coords = wkb.parse_wkb(line_wkb).parts[0]
    frac = 0.0 if end == start else (n - start) / (end - start)
    return ops.line_interpolate_point(coords, frac)
