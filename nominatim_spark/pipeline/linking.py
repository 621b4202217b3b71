"""Linked places (J12) — boundary <-> label-node linking.

Re-expresses find_linked_place (/root/reference/lib-sql/functions/
placex_triggers.sql:271-391) as two prioritized containment joins over all
admin boundaries at once:

  lane 0 (label):    a relation member with role ``label`` is the linked
         node unconditionally (placex_triggers.sql:283-309) — the most
         reliable signal, no containment required;
  lane 1 (wikidata): a place node whose ``extratags.wikidata`` equals the
         boundary's, inside the boundary;
  lane 2 (name):     a place node with the same normalized name whose
         address rank band matches, inside the boundary;

one linkee per boundary (label lane wins, then wikidata, then smallest
node place_id — the reference's deterministic pick).  Effects
(trigger :1113-1160):

* the node gets ``linked_place_id`` = boundary's place_id and is excluded
  from search_name / reverse results (the P5 guard);
* the boundary adopts the node's centroid when it lies inside the
  geometry, the max importance, and the node's capital flag (so the
  capital search-rank boost lands on the boundary).

``label_members``: optional (relation_id, member_type, member_id, role)
rows — the relation membership table feeding lane 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nominatim_spark.operators.spatial import point_in_polygon_join_dist


def link_places(spark, placex: DataFrame,
                label_members: DataFrame | None = None) -> DataFrame:
    """placex -> placex with linked_place_id set and boundary attributes
    adopted from their label nodes.  Must run after rank assignment and
    before search-table build."""
    from nominatim_spark.functions.text import norm_translit

    boundaries = placex.filter(
        F.array_contains("categories", "osm.boundary.administrative")
        & (F.col("osm_type") == "R")
        & (F.col("extended_type") == "A")
        & F.col("rank_address").between(1, 25)
    )
    nodes = placex.filter(
        (F.col("osm_type") == "N")
        & F.exists("categories", lambda c: c.startswith("osm.place"))
    )

    @F.pandas_udf("string")
    def norm_udf(s):
        return s.map(lambda v: norm_translit(v) if isinstance(v, str) else None)

    bnds = boundaries.select(
        F.col("place_id").alias("b_id"),
        F.col("extratags").getItem("wikidata").alias("b_wikidata"),
        norm_udf(F.col("name").getItem("name")).alias("b_norm"),
        F.col("rank_address").alias("b_addr"),
        "geometry",
    )
    if bnds.isEmpty():
        return placex.withColumn("linked_place_id", F.lit(None).cast("long"))

    cand_nodes = nodes.select(
        F.col("place_id").alias("node_id"), "lon", "lat", "rank_address",
        F.col("extratags").getItem("wikidata").alias("n_wikidata"),
        norm_udf(F.col("name").getItem("name")).alias("n_norm"),
        F.col("is_major").alias("n_major"),
        F.col("importance").alias("n_importance"),
    )
    # lane 0: label members (no containment requirement — the relation
    # membership IS the link, placex_triggers.sql:283-309)
    label_links = None
    if label_members is not None and not label_members.isEmpty():
        mem = label_members.filter(F.col("role") == "label").select(
            # boundary relations: place_id = osm_id*4 + 2
            (F.col("relation_id") * 4 + 2).alias("b_id"),
            (F.col("member_id") * 4
             + F.when(F.col("member_type") == "N", 0)
             .when(F.col("member_type") == "W", 1).otherwise(2)
             ).alias("node_id"),
        )
        label_links = (
            mem.join(bnds.select("b_id"), "b_id", "left_semi")
            .join(
                cand_nodes.select(
                    "node_id", "lon", "lat",
                    F.col("n_major"), F.col("n_importance"),
                ),
                "node_id",
            )
            .withColumn("lane", F.lit(0))
        )

    # distributed PiP cover join — boundary attrs ride as carry columns
    scored = point_in_polygon_join_dist(
        cand_nodes, bnds, poly_key="b_id",
        carry=("b_wikidata", "b_norm", "b_addr"),
    ).withColumn(
        "lane",
        F.when(
            F.col("n_wikidata").isNotNull()
            & (F.col("n_wikidata") == F.col("b_wikidata")),
            F.lit(1),
        ).when(
            F.col("n_norm").isNotNull()
            & (F.col("n_norm") == F.col("b_norm"))
            & (
                (F.col("rank_address") == F.col("b_addr"))
                | F.col("rank_address").isin(0, 30)
            ),
            F.lit(2),
        ),
    ).filter(F.col("lane").isNotNull())

    ranked = scored.select(
        "b_id", "node_id", "lon", "lat", "n_major", "n_importance", "lane"
    )
    if label_links is not None:
        ranked = ranked.unionByName(
            label_links.select("b_id", "node_id", "lon", "lat",
                               "n_major", "n_importance", "lane")
        )
    w = Window.partitionBy("b_id").orderBy("lane", "node_id")
    links = (
        ranked.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .select(
            "b_id", "node_id",
            F.col("lon").alias("n_lon"), F.col("lat").alias("n_lat"),
            "n_major", "n_importance",
        )
    )
    # a node links to at most one boundary (deepest/first deterministic)
    w2 = Window.partitionBy("node_id").orderBy("b_id")
    links = links.withColumn("_rn", F.row_number().over(w2)).filter("_rn = 1").drop("_rn")
    links = links.persist()

    # node side: record the link (exclusion from search happens downstream)
    node_link = links.select(
        F.col("node_id").alias("place_id"),
        F.col("b_id").alias("linked_place_id"),
    )
    # boundary side: adopt centroid / importance / capital flag
    bnd_adopt = links.select(
        F.col("b_id").alias("place_id"),
        F.col("n_lon"), F.col("n_lat"), F.col("n_major"), F.col("n_importance"),
    )
    out = (
        placex.join(node_link, "place_id", "left")
        .join(bnd_adopt, "place_id", "left")
        .withColumn("lon", F.coalesce("n_lon", "lon"))
        .withColumn("lat", F.coalesce("n_lat", "lat"))
        .withColumn(
            "is_major", F.col("is_major") | F.coalesce("n_major", F.lit(False))
        )
        .withColumn(
            "importance",
            F.greatest(F.col("importance"), F.coalesce("n_importance", F.lit(-1.0))),
        )
        .drop("n_lon", "n_lat", "n_major", "n_importance")
    )
    return out
