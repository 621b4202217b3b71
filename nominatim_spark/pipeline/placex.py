"""placex index build — the reference's trigger cascade as DataFrame stages.

The reference builds its place universe row-at-a-time through Postgres
triggers in strict rank order (placex_insert/placex_update,
lib-sql/functions/placex_triggers.sql; rank-ordered driver
src/nominatim_db/indexer/indexer.py:54-88).  Here the same dependency order
becomes a short sequence of set-at-a-time DataFrame stages:

  A. base attributes    — centroid (get_center_point parity), extended
                          type, category backfill, grid cells
  B. country & partition — PiP against country polygons (broadcast cover
                          join), hash partition bucket
  C. ranks              — compute_place_rank + the containment adjustments
                          (boundary overtake / place-category override /
                          place-node subpart), iterated in admin-level order
                          exactly like the indexer's rank loop
  D. parenting          — areas by containment; streets by containment;
                          POIs/houses by addr:street token match then
                          nearest road (find_parent_for_poi cascade,
                          placex_triggers.sql:191-268)

Scale notes: stage joins are all cell-key equi-joins with broadcast polygon
sides (admin hierarchies are tiny vs. the POI side); the POI parenting join
is the skew-sensitive one (city cells are hot) and inherits AQE skew
handling plus the salted cover-join helper.  At planet scale the
``areas_pdf`` broadcast (~1M polygons) would switch to the partitioned
cover-join — the code paths are separated so only `_areas_broadcast` changes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nominatim_spark import grid
from nominatim_spark.geometry import ops, wkb
from nominatim_spark.operators.spatial import point_in_polygon_join
from nominatim_spark.pipeline.address_levels import DEFAULT_LEVELS
from nominatim_spark.pipeline.rank import backfill_categories, compute_place_rank

CELL_RES = 7  # centroid locality key (~870 m cells)


# --------------------------------------------------------------- stage A

def base_attributes(place: DataFrame) -> DataFrame:
    """place rows -> placex base: place_id, centroid, extended_type, cells."""

    out_schema = (
        place.schema.simpleString()[7:-1]
        + ",lon double,lat double,minx double,miny double,"
        + "maxx double,maxy double,geom_kind string"
    )

    def geo_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lons, lats = [], []
            bbox = []
            kinds = []
            for g in pdf["geometry"]:
                geom = wkb.parse_wkb(bytes(g))
                x, y = ops.get_center_point(bytes(g))
                lons.append(x)
                lats.append(y)
                bbox.append(ops.bbox_of(geom))
                kinds.append(geom.type_name)
            pdf = pdf.assign(
                lon=lons, lat=lats,
                minx=[b[0] for b in bbox], miny=[b[1] for b in bbox],
                maxx=[b[2] for b in bbox], maxy=[b[3] for b in bbox],
                geom_kind=kinds,
            )
            yield pdf

    df = place.mapInPandas(geo_batch, schema=out_schema)
    df = backfill_categories(df)
    type_num = (
        F.when(F.col("osm_type") == "N", 0)
        .when(F.col("osm_type") == "W", 1)
        .otherwise(2)
    )
    df = (
        df.withColumn("place_id", F.col("osm_id") * 4 + type_num)
        .withColumn(
            "extended_type",
            F.when(
                F.col("geom_kind").isin("Polygon", "MultiPolygon"), F.lit("A")
            ).otherwise(F.col("osm_type")),
        )
        .withColumn(
            "is_major",
            F.coalesce(F.col("extratags").getItem("capital") == "yes", F.lit(False)),
        )
        .withColumn("cell", F.expr(grid.encode_sql("lon", "lat", CELL_RES)))
    )
    return df


# --------------------------------------------------------------- stage B

def assign_country(placex: DataFrame) -> DataFrame:
    """country_code: mapped address.country for country rows
    (placex_triggers.sql:838-846), else PiP against country polygons."""
    countries = placex.filter(
        (F.col("extended_type") == "A")
        & (F.col("admin_level") == 2)
        & F.col("address").getItem("country").isNotNull()
    ).select(
        F.lower(F.col("address").getItem("country")).alias("pip_cc"),
        F.col("geometry"),
    )
    cpdf = countries.toPandas()
    cpdf["geometry"] = cpdf["geometry"].map(bytes)
    if len(cpdf):
        with_cc = point_in_polygon_join(
            placex.select("place_id", "lon", "lat"),
            cpdf.rename(columns={"geometry": "wkb"}),
            poly_key="pip_cc",
            wkb_col="wkb",
        ).select("place_id", "pip_cc")
        placex = placex.join(with_cc, "place_id", "left")
    else:
        placex = placex.withColumn("pip_cc", F.lit(None).cast("string"))
    placex = placex.withColumn(
        "country_code",
        F.coalesce(F.lower(F.col("address").getItem("country")), F.col("pip_cc")),
    ).drop("pip_cc")
    return placex.withColumn(
        "partition", F.pmod(F.xxhash64("country_code"), F.lit(32)).cast("int")
    )


# --------------------------------------------------------------- stage C

_PLACE_ADDR = {
    t: a for (_c, cls, t, _s, a) in DEFAULT_LEVELS if cls == "place" and t
}


def _place_cat_addr_rank():
    """category 'osm.place.X' -> address rank (for the boundary override,
    placex_triggers.sql:1163-1177), as a SQL CASE expression."""
    whens = " ".join(
        f"WHEN 'osm.place.{t}' THEN {a}" for t, a in _PLACE_ADDR.items()
    )
    return f"CASE _bnd_place_cat {whens} ELSE NULL END"


def adjust_ranks(placex: DataFrame) -> DataFrame:
    """Containment-based rank adjustments (placex_triggers.sql:881-978 +
    :1163-1177), iterated over admin levels low->high like the reference's
    rank-ordered indexing loop."""
    spark = placex.sparkSession

    boundaries = placex.filter(
        F.array_contains("categories", "osm.boundary.administrative")
        & (F.col("osm_type") == "R")
        & (F.col("rank_address") > 0)
    ).persist()
    others = placex.join(boundaries.select("place_id"), "place_id", "left_anti")

    levels = sorted(
        r.admin_level
        for r in boundaries.select("admin_level").distinct().collect()
        if r.admin_level is not None
    )
    finalized_pdf = pd.DataFrame(
        columns=["place_id", "admin_level", "rank_address", "wkb"]
    )
    adjusted = []
    for lvl in levels:
        cur = boundaries.filter(F.col("admin_level") == lvl)
        parents = finalized_pdf[
            (finalized_pdf.admin_level > 3)
            & (finalized_pdf.rank_address.between(1, 25))
        ]
        if len(parents):
            hit = point_in_polygon_join(
                cur.select("place_id", "lon", "lat"),
                parents[["place_id", "admin_level", "rank_address", "wkb"]]
                .rename(columns={
                    "place_id": "par_id", "admin_level": "par_adm",
                    "rank_address": "par_addr"}),
                poly_key="par_id",
                wkb_col="wkb",
            )
            # join back polygon attrs, pick deepest parent
            attrs = spark.createDataFrame(
                parents[["place_id", "admin_level", "rank_address"]].rename(
                    columns={"place_id": "par_id", "admin_level": "par_adm",
                             "rank_address": "par_addr"})
            )
            w = Window.partitionBy("place_id").orderBy(F.col("par_adm").desc())
            best_parent = (
                hit.join(F.broadcast(attrs), "par_id")
                .withColumn("_rn", F.row_number().over(w))
                .filter("_rn = 1")
                .select("place_id", "par_addr")
            )
            cur = cur.join(best_parent, "place_id", "left")
        else:
            cur = cur.withColumn("par_addr", F.lit(None).cast("int"))
        # overtake rule (placex_triggers.sql:905-911)
        cur = cur.withColumn(
            "parent_address_level", F.coalesce(F.col("par_addr"), F.lit(3))
        ).withColumn(
            "rank_address",
            F.when(
                F.col("par_addr").isNotNull()
                & (F.col("par_addr") >= F.col("rank_address")),
                F.when(F.col("par_addr") >= 24, 25).otherwise(F.col("par_addr") + 2),
            ).otherwise(F.col("rank_address")),
        ).drop("par_addr")
        # place-category override (placex_triggers.sql:1163-1177)
        cur = cur.withColumn(
            "_bnd_place_cat",
            F.expr("filter(categories, c -> c LIKE 'osm.place.%')").getItem(0),
        ).withColumn(
            "_place_addr", F.expr(_place_cat_addr_rank())
        ).withColumn(
            "rank_address",
            F.when(
                F.col("rank_address").between(4, 25)
                & F.col("_place_addr").isNotNull()
                & (F.col("_place_addr") > F.col("parent_address_level"))
                & (F.col("_place_addr") < 26),
                F.col("_place_addr"),
            ).otherwise(F.col("rank_address")),
        ).drop("_bnd_place_cat", "_place_addr")
        adjusted.append(cur)
        done = cur.select("place_id", "admin_level", "rank_address", "geometry").toPandas()
        done["wkb"] = done["geometry"].map(bytes)
        finalized_pdf = pd.concat(
            [finalized_pdf, done[["place_id", "admin_level", "rank_address", "wkb"]]],
            ignore_index=True,
        )

    out = others.withColumn("parent_address_level", F.lit(3))
    for a in adjusted:
        out = out.unionByName(a)

    # place-node subpart bump (placex_triggers.sql:955-974): a place node
    # inside a boundary of the same address rank becomes a subpart (+2)
    bnd = finalized_pdf
    if len(bnd):
        nodes = out.filter(
            (F.col("osm_type") == "N")
            & F.exists("categories", lambda c: c.startswith("osm.place"))
            & F.col("rank_address").between(16, 23)
        )
        hit = point_in_polygon_join(
            nodes.select("place_id", "lon", "lat", "rank_address"),
            bnd[["place_id", "rank_address", "wkb"]].rename(
                columns={"place_id": "b_id", "rank_address": "b_addr"}),
            poly_key="b_id",
            wkb_col="wkb",
        )
        attrs = spark.createDataFrame(
            bnd[["place_id", "rank_address"]].rename(
                columns={"place_id": "b_id", "rank_address": "b_addr"})
        )
        bumped = (
            hit.join(F.broadcast(attrs), "b_id")
            .filter(F.col("b_addr") == F.col("rank_address"))
            .select("place_id")
            .distinct()
            .withColumn("_bump", F.lit(2))
        )
        out = out.join(bumped, "place_id", "left").withColumn(
            "rank_address",
            F.col("rank_address") + F.coalesce(F.col("_bump"), F.lit(0)),
        ).drop("_bump")
    return out


# --------------------------------------------------------------- stage D

def assign_parents(placex: DataFrame,
                   assoc_members: pd.DataFrame | None = None) -> DataFrame:
    """parent_place_id (placex_triggers.sql find_parent_for_poi :191-268 +
    addressable-area parenting).

    * lane 0: associatedStreet relation members — a house member parents to
      the relation's street member (placex_triggers.sql:119-182); takes
      precedence over the tag lanes
    * areas & nodes rank<=25: deepest containing area with smaller
      rank_address
    * streets (26-27): deepest containing area rank_address 1..25
    * POIs/houses (28-30) with addr:street: nearest street whose normalized
      name matches, searched via street-cover-cell equi-join (the reference's
      0.015-degree box, partition-functions.sql:150-178); addr:place variant
      against named places
    * remaining POIs: nearest road by point-to-segment distance

    ``assoc_members``: (relation_id, member_type, member_id, role) rows.
    """
    from nominatim_spark.functions.text import norm_translit

    spark = placex.sparkSession

    # --- lane 0: associatedStreet relations (J10).  The membership table
    # is relation-shaped metadata (tiny vs. the POI side): resolve
    # house-member -> street-member driver-side, broadcast the mapping.
    type_num = {"N": 0, "W": 1, "R": 2}
    assoc_rows = []
    if assoc_members is not None and len(assoc_members):
        streets_by_rel = {
            r.relation_id: r.member_id * 4 + type_num[r.member_type]
            for r in assoc_members.itertuples() if r.role == "street"
        }
        for r in assoc_members.itertuples():
            if r.role != "street" and r.relation_id in streets_by_rel:
                assoc_rows.append(
                    (r.member_id * 4 + type_num[r.member_type],
                     streets_by_rel[r.relation_id])
                )
    if assoc_rows:
        assoc_parent = spark.createDataFrame(
            pd.DataFrame(assoc_rows, columns=["place_id", "parent_place_id"])
        ).join(placex.select("place_id"), "place_id", "left_semi")
    else:
        assoc_parent = spark.createDataFrame(
            pd.DataFrame(columns=["place_id", "parent_place_id"]),
            "place_id long, parent_place_id long",
        )

    areas_pdf = placex.filter(
        (F.col("extended_type") == "A") & F.col("rank_address").between(1, 25)
    ).select("place_id", "rank_address", "geometry", "minx", "miny", "maxx", "maxy").toPandas()
    areas_pdf["wkb"] = areas_pdf["geometry"].map(bytes)
    areas_pdf["area"] = (areas_pdf.maxx - areas_pdf.minx) * (areas_pdf.maxy - areas_pdf.miny)

    low = placex.filter(F.col("rank_search") <= 27)
    hit = point_in_polygon_join(
        low.select("place_id", "lon", "lat", "rank_address"),
        areas_pdf[["place_id", "wkb"]].rename(columns={"place_id": "a_id"}),
        poly_key="a_id",
        wkb_col="wkb",
    )
    attrs = spark.createDataFrame(
        areas_pdf[["place_id", "rank_address", "area"]].rename(
            columns={"place_id": "a_id", "rank_address": "a_addr", "area": "a_area"})
    )
    w = Window.partitionBy("place_id").orderBy(
        F.col("a_addr").desc(), F.col("a_area").asc(), F.col("a_id")
    )
    low_parent = (
        hit.join(F.broadcast(attrs), "a_id")
        .filter(F.col("a_addr") < F.coalesce(F.col("rank_address"), F.lit(26)))
        .filter(F.col("a_id") != F.col("place_id"))
        .withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .select("place_id", F.col("a_id").alias("parent_place_id"))
    )

    # --- POI/house -> street by addr:street name (J9 token_matches_street)
    streets = placex.filter(F.col("rank_search").between(26, 27)).select(
        "place_id", "name", "geometry", "minx", "miny", "maxx", "maxy"
    )
    streets_pdf = streets.toPandas()
    street_rows = []
    # pad the street cover by the reference's 0.015-degree search box
    # (partition-functions.sql:150-178 token_matches_street window)
    pad = max(0.015, grid.cell_size_deg(CELL_RES))
    for r in streets_pdf.itertuples():
        nm = (r.name or {}).get("name")
        if not nm:
            continue
        key = norm_translit(nm)
        cells = grid.cover_bbox(
            r.minx - pad, r.miny - pad, r.maxx + pad, r.maxy + pad,
            CELL_RES, limit=65536,
        )
        for c in cells:
            street_rows.append((r.place_id, key, int(c)))
    street_cells = spark.createDataFrame(
        pd.DataFrame(street_rows, columns=["street_id", "street_key", "cell"])
    )

    pois = placex.filter(
        (F.col("rank_search") >= 28)
        & F.col("address").getItem("street").isNotNull()
    ).select("place_id", "lon", "lat", "cell", F.col("address").getItem("street").alias("_street"))

    @F.pandas_udf("string")
    def norm_udf(s: pd.Series) -> pd.Series:
        return s.map(lambda v: norm_translit(v) if isinstance(v, str) else "")

    pois = pois.withColumn("street_key", norm_udf("_street"))
    cand = pois.join(F.broadcast(street_cells), ["cell", "street_key"])

    # exact distance to street geometry for the winner
    geom_by_id = {
        int(r.place_id): bytes(r.geometry) for r in streets_pdf.itertuples()
    }
    bc = spark.sparkContext.broadcast(geom_by_id)

    def dist_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                yield pdf.assign(dist=pd.Series(dtype=float))
                continue
            d = np.empty(len(pdf))
            for i, (sid, x, y) in enumerate(
                zip(pdf["street_id"], pdf["lon"], pdf["lat"])
            ):
                coords = wkb.parse_wkb(bc.value[int(sid)]).parts[0]
                f = ops.line_locate_point(coords, float(x), float(y))
                px, py = ops.line_interpolate_point(coords, f)
                d[i] = float(np.hypot(px - float(x), py - float(y)))
            yield pdf.assign(dist=d)

    cand_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in cand.schema)
    with_dist = cand.mapInPandas(dist_batch, schema=cand_schema + ", dist double")
    w2 = Window.partitionBy("place_id").orderBy("dist", "street_id")
    poi_parent = (
        with_dist.withColumn("_rn", F.row_number().over(w2))
        .filter("_rn = 1")
        .select("place_id", F.col("street_id").alias("parent_place_id"))
    )

    # --- addr:place lane (token_matches_place within 0.04 deg,
    # partition-functions.sql:181-207): POIs naming a place instead of a
    # street parent to the nearest same-named place node/area
    place_cands = placex.filter(
        F.col("rank_address").between(16, 25)
        & F.col("name").getItem("name").isNotNull()
    ).select("place_id", "name", "lon", "lat").toPandas()
    place_rows = []
    pad = 0.04
    for r in place_cands.itertuples():
        key = norm_translit((r.name or {}).get("name", ""))
        if not key:
            continue
        for c in grid.cover_bbox(r.lon - pad, r.lat - pad, r.lon + pad,
                                 r.lat + pad, CELL_RES, limit=65536):
            place_rows.append((r.place_id, key, int(c), r.lon, r.lat))
    place_cells = spark.createDataFrame(
        pd.DataFrame(place_rows,
                     columns=["pl_id", "pl_key", "cell", "pl_lon", "pl_lat"])
    )
    pois_pl = placex.filter(
        (F.col("rank_search") >= 28)
        & F.col("address").getItem("place").isNotNull()
        # addr:street wins over addr:place (find_parent_for_poi order)
        & F.col("address").getItem("street").isNull()
    ).select("place_id", "lon", "lat", "cell",
             F.col("address").getItem("place").alias("_pl"))
    pois_pl = pois_pl.withColumn("pl_key", norm_udf("_pl"))
    pl_cand = pois_pl.join(F.broadcast(place_cells), ["cell", "pl_key"])
    pl_cand = pl_cand.withColumn(
        "dist2",
        (F.col("lon") - F.col("pl_lon")) * (F.col("lon") - F.col("pl_lon"))
        + (F.col("lat") - F.col("pl_lat")) * (F.col("lat") - F.col("pl_lat")),
    )
    w3 = Window.partitionBy("place_id").orderBy("dist2", "pl_id")
    place_parent = (
        pl_cand.withColumn("_rn", F.row_number().over(w3))
        .filter("_rn = 1")
        .select("place_id", F.col("pl_id").alias("parent_place_id"))
    )

    # POIs without street/place tag — or whose matches found nothing —
    # fall back to the containing area (find_parent_for_poi last resort)
    matched_so_far = (
        poi_parent.select("place_id")
        .unionByName(place_parent.select("place_id"))
        .unionByName(assoc_parent.select("place_id"))
    )
    poi_rest = (
        placex.filter(F.col("rank_search") >= 28)
        .join(matched_so_far, "place_id", "left_anti")
        .select("place_id", "lon", "lat", "rank_address")
    )
    hit2 = point_in_polygon_join(
        poi_rest,
        areas_pdf[["place_id", "wkb"]].rename(columns={"place_id": "a_id"}),
        poly_key="a_id",
        wkb_col="wkb",
    )
    rest_parent = (
        hit2.join(F.broadcast(attrs), "a_id")
        .withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .select("place_id", F.col("a_id").alias("parent_place_id"))
    )

    # lane-0 wins: drop tag-lane matches for relation-parented places
    poi_parent = poi_parent.join(
        assoc_parent.select("place_id"), "place_id", "left_anti"
    )
    low_parent = low_parent.join(
        assoc_parent.select("place_id"), "place_id", "left_anti"
    )
    parents = (
        assoc_parent.unionByName(low_parent)
        .unionByName(poi_parent)
        .unionByName(place_parent)
        .unionByName(rest_parent)
    )
    # one parent per place (street / place / fallback lanes are disjoint
    # by construction)
    return placex.join(parents, "place_id", "left")


# ------------------------------------------------------------ orchestration

@dataclass
class IndexTables:
    placex: DataFrame
    search_name: DataFrame
    word: DataFrame
    name_postings: DataFrame
    addr_postings: DataFrame


def build_placex(place: DataFrame, ckpt_root: str | None = None,
                 resume: bool = False,
                 assoc_members: pd.DataFrame | None = None) -> DataFrame:
    """place -> fully ranked & parented placex, checkpointed per stage.

    Each stage materializes to parquet with a lineage manifest
    (io.checkpoint) — this both makes the build resumable (``resume=True``
    skips completed stages, the reference's indexed_status analog) and
    truncates the Catalyst plan: without truncation the stacked
    union/window/UDF lineage makes downstream *planning* superlinear.
    """
    import tempfile

    from nominatim_spark.io.checkpoint import (
        checkpoint, has_checkpoint, load_checkpoint)

    spark = place.sparkSession
    if ckpt_root is None:
        ckpt_root = tempfile.mkdtemp(prefix="nominatim_spark_ckpt_")

    def stage(name, fn, inputs):
        if resume and has_checkpoint(ckpt_root, name):
            return load_checkpoint(spark, ckpt_root, name)
        return checkpoint(fn(), ckpt_root, name, inputs=inputs)

    df = stage("placex_base", lambda: assign_country(base_attributes(place)),
               ["place"])
    df2 = stage(
        "placex_ranked",
        lambda: df.join(compute_place_rank(df), "place_id"),
        ["placex_base"],
    )
    df3 = stage("placex_adjusted", lambda: adjust_ranks(df2), ["placex_ranked"])
    df4 = stage("placex_parented", lambda: assign_parents(
        df3, assoc_members=assoc_members
    ).withColumn(
        # default importance (importance.sql:146-206 fallback formula)
        "importance", F.lit(0.40001) - F.col("rank_search") / F.lit(75.0)
    ), ["placex_adjusted"])

    def _linked():
        from nominatim_spark.pipeline.linking import link_places

        out = link_places(spark, df4)
        # boundary centroids may have moved to their label node: refresh
        # the locality cell key
        return out.withColumn("cell", F.expr(grid.encode_sql("lon", "lat", CELL_RES)))

    df5 = stage("placex", _linked, ["placex_parented"])
    return df5


def build_index(spark, place: DataFrame, ckpt_root: str | None = None,
                resume: bool = False,
                assoc_members: pd.DataFrame | None = None) -> IndexTables:
    import tempfile

    from nominatim_spark.io.checkpoint import checkpoint
    from nominatim_spark.pipeline.tokens import build_search_tables

    if ckpt_root is None:
        ckpt_root = tempfile.mkdtemp(prefix="nominatim_spark_ckpt_")
    placex = build_placex(place, ckpt_root, resume=resume,
                          assoc_members=assoc_members)
    idx = build_search_tables(spark, placex)
    word = checkpoint(idx.word, ckpt_root, "word", inputs=["placex"])
    name_post = checkpoint(idx.name_postings, ckpt_root, "name_postings",
                           inputs=["placex", "word"])
    addr_post = checkpoint(idx.addr_postings, ckpt_root, "addr_postings",
                           inputs=["placex", "word"])
    search_name = checkpoint(idx.search_name, ckpt_root, "search_name",
                             inputs=["placex", "word"])
    return IndexTables(
        placex=idx.placex,
        search_name=search_name,
        word=word,
        name_postings=name_post,
        addr_postings=addr_post,
    )
