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
            # id namespace: (way_id << 20 | pos) * 4 + 3 — the +3 keeps
            # osmline ids disjoint from placex ids (osm_id*4 + {0,1,2});
            # the 20-bit shift survives ways with up to ~1M nodes
            "osmline_id",
            (F.col("way_id") * F.lit(1 << 20) + F.col("pos")) * 4 + 3,
        )
    )

    # parent street by addr:street normalized-name match against placex —
    # the street side becomes (key, cell) cover rows JVM-side (the round-1
    # driver-built name->bbox dict dies at a planet's ~1e8 streets), the
    # segment midpoint joins on its cell, and the exact padded-bbox
    # predicate rechecks join-side (token_matches_street semantics,
    # partition-functions.sql:150-178)
    from nominatim_spark.operators.spatial import explode_bbox_cells
    from nominatim_spark.pipeline.placex import CELL_RES

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

    from nominatim_spark import grid

    seg_keyed = segs.withColumn(
        "street_key", norm_udf(F.col("address").getItem("street"))
    ).withColumn(
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
    out = segs.join(matched, "osmline_id", "left")
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
