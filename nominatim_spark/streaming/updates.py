"""Incremental index updates — OSM-diff replay as micro-batch merges.

Re-expresses the reference's update flow (osm2pgsql diff import +
place_force_update invalidation, lib-sql/functions/utils.sql:517-560, and
the indexer's reindex-dirty loop, src/nominatim_db/indexer/indexer.py):
a batch of changed ``place`` rows invalidates the places it can affect,
the affected subset is re-run through the SAME build stages, and the
result is merged into the standing index tables.

Scope (documented): changes at street/POI/house level (rank_search >=
26) re-index incrementally — a street rename propagates to its children
because they sit inside the padded invalidation cover.  Place nodes and
non-boundary areas of rank 16..25 (suburbs, villages, localities) are
incremental too: their invalidation cover is the rank-dependent
place-node fuzzy radius (the reference's update_place_diameter cascade,
utils.sql:541-587), so every rank>=26 place whose nameaddress vector
carries the node's name re-tokenizes.  Admin boundaries, rank < 16, and
LINKED label nodes still raise (they change the containment hierarchy /
linking, which only the full build recomputes); callers fall back to
the full build.

Scale notes: every step is a cell-key join against the update batch's
cover cells, and re-parenting runs with the dirty set on the POINT side
of every lane (assign_parents(points=...)) while the context tables stay
full — cost scales with the diff size times local density, never with
the standing index size.  The merge is an anti-join + union (the
DataFrame analog of a MERGE/upsert into the checkpointed parquet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nominatim_spark.pipeline.placex import (
    CELL_RES, IndexTables, assign_country, assign_parents, base_attributes)
from nominatim_spark.pipeline.rank import compute_place_rank

# invalidation pad: the street-parenting search box (token_matches_street,
# partition-functions.sql:150-178) bounds how far a geometry change can
# steal/lose children
_PAD = 0.015


def _is_boundary_update(updates: DataFrame) -> bool:
    return not updates.filter(
        (F.col("class") == "boundary") & (F.col("osm_type") == "R")
    ).isEmpty()


def apply_place_updates(
    spark,
    idx: IndexTables,
    updates: DataFrame,
    deletes: DataFrame | None = None,
    assoc_members=None,
    way_nodes: DataFrame | None = None,
) -> IndexTables:
    """Merge a batch of changed/new place rows (and optional deletes) into
    the standing index; returns fresh IndexTables.

    ``updates``: raw place-schema rows (the diff's create/modify set).
    ``deletes``: (osm_type, osm_id) rows.
    ``assoc_members`` / ``way_nodes``: the relation/way membership tables
    (same shapes as build_index) — required whenever the standing index
    was built with them, otherwise invalidated houses parented through an
    associatedStreet relation (J10) or way membership (J11) would silently
    re-parent through the tag lanes.
    ``ValueError`` on updates outside the incremental scope (admin
    boundaries, any row below rank_search 26) — callers fall back to the
    full build (see module docstring).
    """
    from nominatim_spark.pipeline.tokens import incremental_search_tables

    if _is_boundary_update(updates):
        raise ValueError(
            "admin-boundary update: containment hierarchy invalidated — "
            "run the full build (reference cascades place_force_update)"
        )

    placex = idx.placex
    type_num = (
        F.when(F.col("osm_type") == "N", 0)
        .when(F.col("osm_type") == "W", 1)
        .otherwise(2)
    )
    upd_ids = updates.select((F.col("osm_id") * 4 + type_num).alias("place_id"))
    del_ids = (
        deletes.select((F.col("osm_id") * 4 + type_num).alias("place_id"))
        if deletes is not None else None
    )

    # ---- stage the update rows through base attrs + country + rank
    fresh = assign_country(base_attributes(updates))
    fresh = fresh.join(compute_place_rank(fresh), "place_id")
    # scope guards: rank < 16 changes the containment hierarchy of a
    # whole partition; a LINKED label node changes linking — both
    # cascade to a full rebuild instead of silently diverging
    if not fresh.filter(F.col("rank_search") < 16).isEmpty():
        raise ValueError(
            "update below rank_search 16: outside the incremental scope — "
            "run the full build (see module docstring)"
        )
    # a place NODE that matches a standing boundary by name or wikidata
    # is (or would become) that boundary's linked label node — linking
    # only the full build recomputes (find_linked_place lanes).  Two
    # scalable equi-semijoins, no cross product.
    nodes26 = fresh.filter(
        (F.col("rank_search") < 26) & (F.col("osm_type") == "N")
    ).select(
        F.col("name").getItem("name").alias("_n"),
        (F.col("extratags").getItem("wikidata")
         if "extratags" in fresh.columns
         else F.lit(None).cast("string")).alias("_w"),
    )
    bset = placex.filter(F.col("class") == "boundary").select(
        F.col("name").getItem("name").alias("_n"),
        (F.col("extratags").getItem("wikidata")
         if "extratags" in placex.columns
         else F.lit(None).cast("string")).alias("_w"),
    )
    linked_hit = (
        nodes26.filter(F.col("_n").isNotNull())
        .join(bset.filter(F.col("_n").isNotNull()).select("_n"),
              "_n", "left_semi")
        .unionByName(
            nodes26.filter(F.col("_w").isNotNull())
            .join(bset.filter(F.col("_w").isNotNull()).select("_w"),
                  "_w", "left_semi"),
            allowMissingColumns=True)
    ).select("_n")
    # third lane: identity.  A node whose STANDING row is already linked
    # (linked_place_id set) must raise even when the update renames BOTH
    # name and wikidata — the new values match nothing, but unlinking it
    # is itself a linking change (the reference cascades via
    # place_force_update on the linked place, utils.sql:541-587).
    # Deletes of a linked label node invalidate linking the same way.
    # The linked rows live OUTSIDE the searchable placex (IndexTables
    # excludes them), so the identity comes from idx.linked.
    if idx.linked is not None:
        touched = (upd_ids if del_ids is None
                   else upd_ids.unionByName(del_ids))
        linked_hit = linked_hit.unionByName(
            touched.join(idx.linked.select("place_id"),
                         "place_id", "left_semi")
            .select(F.lit("id-match").alias("_n")))
    if not linked_hit.isEmpty():
        raise ValueError(
            "update touches a linked label node (name/wikidata matches a "
            "standing boundary): linking invalidated — run the full "
            "build (see module docstring)"
        )
    # rank adjustments against the STANDING boundary hierarchy (unchanged
    # by scope guard): parent_address_level from the deepest existing area
    fresh = fresh.withColumn("parent_address_level", F.lit(3))

    # ---- invalidation: standing places whose parenting could change —
    # anything whose cell falls inside the padded cover of an updated OR
    # DELETED geometry (place_force_update semantics: a deleted street's
    # houses must re-parent too)
    dirty_boxes = fresh.select("place_id", "rank_search",
                               "minx", "miny", "maxx", "maxy")
    if del_ids is not None:
        dirty_boxes = dirty_boxes.unionByName(
            placex.join(del_ids, "place_id", "left_semi")
            .select("place_id", "rank_search",
                    "minx", "miny", "maxx", "maxy")
        )
    # rank-dependent invalidation pad: street/POI/house changes reach as
    # far as the street-parenting box; a place node/area of rank 16..25
    # additionally reaches every place inside its fuzzy address radius
    # (place_node_fuzzy_area, utils.sql:338-358 — the update_place_diameter
    # cascade of the reference)
    from nominatim_spark.grid import EARTH_DEG_M

    fuzzy_deg = (
        F.when(F.col("rank_search") <= 16, 15000.0)
        .when(F.col("rank_search") <= 18, 4000.0)
        .when(F.col("rank_search") <= 19, 2000.0)
        .when(F.col("rank_search") <= 20, 1000.0)
        .otherwise(500.0) / F.lit(EARTH_DEG_M)
    )
    pad = F.when(F.col("rank_search") >= 26, F.lit(_PAD)).otherwise(
        fuzzy_deg + F.lit(_PAD))
    pad_cells = (
        dirty_boxes
        .withColumn("minx", F.col("minx") - pad)
        .withColumn("miny", F.col("miny") - pad)
        .withColumn("maxx", F.col("maxx") + pad)
        .withColumn("maxy", F.col("maxy") + pad)
        .withColumn("_sub26", F.col("rank_search") < 26)
    )
    from nominatim_spark.operators.spatial import explode_bbox_cells

    inval_cells = (
        explode_bbox_cells(pad_cells.filter(~F.col("_sub26")), res=CELL_RES)
        .select("cell").distinct())
    # POIs/houses inside a street-level cover re-parent; EVERY rank>=26
    # place inside a place-node/area cover re-tokenizes (its address
    # vocabulary carries the node's name)
    invalidated = (
        placex.filter(F.col("rank_search") >= 28)
        .join(inval_cells, "cell", "left_semi")
        .join(upd_ids, "place_id", "left_anti")
    )
    sub26 = pad_cells.filter(F.col("_sub26"))
    if not sub26.isEmpty():
        node_cells = (explode_bbox_cells(sub26, res=CELL_RES)
                      .select("cell").distinct())
        invalidated = invalidated.unionByName(
            placex.filter(F.col("rank_search") >= 26)
            .join(node_cells, "cell", "left_semi")
            .join(upd_ids, "place_id", "left_anti")
        ).dropDuplicates(["place_id"])
    if del_ids is not None:
        invalidated = invalidated.join(del_ids, "place_id", "left_anti")

    # ---- assemble the post-merge placex universe:
    # standing rows minus (updated ∪ deleted ∪ invalidated) + re-run rows
    drop_ids = upd_ids
    if del_ids is not None:
        drop_ids = drop_ids.unionByName(del_ids)
    survivors = placex.join(
        drop_ids.unionByName(invalidated.select("place_id")),
        "place_id", "left_anti",
    )

    # re-run parenting for (fresh ∪ invalidated) against the merged
    # universe (so a moved house finds its new street and a new street
    # adopts existing houses)
    redo_base = fresh.select(*[c for c in placex.columns
                               if c in fresh.columns])
    for c in placex.columns:
        if c not in redo_base.columns:
            redo_base = redo_base.withColumn(c, F.lit(None))
    redo_base = redo_base.select(placex.columns).unionByName(
        invalidated.select(placex.columns)
    ).drop("parent_place_id", "linked_place_id")

    universe = survivors.drop("parent_place_id", "linked_place_id").unionByName(
        redo_base
    )
    # diff-proportional: only the redo rows sit on the point side of every
    # parenting lane; the universe provides the context (areas, streets,
    # named places) so a moved house finds its new street and a new street
    # adopts existing (invalidated) houses
    redone = assign_parents(
        universe, assoc_members=assoc_members, way_nodes=way_nodes,
        points=redo_base.select("place_id"),
    ).withColumn(
        "importance",
        F.coalesce(
            F.col("importance"),
            F.lit(0.40001) - F.col("rank_search") / F.lit(75.0),
        ),
    ).withColumn("linked_place_id", F.lit(None).cast("long"))
    redone = redone.localCheckpoint()

    # ---- diff-proportional token merge (incremental_search_tables):
    # only the redone rows re-tokenize; genuinely new terms append to the
    # word table; postings/search_name merge by anti-join + union.  Every
    # table is localCheckpointed so a long stream of micro-batches never
    # accumulates lineage.
    replace_ids = (
        drop_ids.unionByName(invalidated.select("place_id")).distinct()
    )
    tables = incremental_search_tables(
        spark, idx, redone.select(survivors.columns), replace_ids, survivors
    )
    return IndexTables(
        placex=tables.placex.localCheckpoint(),
        search_name=tables.search_name.localCheckpoint(),
        word=tables.word.localCheckpoint(),
        name_postings=tables.name_postings.localCheckpoint(),
        addr_postings=tables.addr_postings.localCheckpoint(),
        linked=tables.linked,
    )


def stream_place_updates(spark, updates_stream: DataFrame, idx_ref: dict,
                         checkpoint_dir: str,
                         assoc_members=None,
                         way_nodes: DataFrame | None = None):
    """Structured-Streaming diff replay: each micro-batch of place rows is
    merged via apply_place_updates; ``idx_ref['idx']`` always holds the
    latest IndexTables (foreachBatch — the reference's repeated
    nominatim replication apply loop)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        idx_ref["idx"] = apply_place_updates(
            spark, idx_ref["idx"], batch_df,
            assoc_members=assoc_members, way_nodes=way_nodes,
        )

    return (
        updates_stream.writeStream
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
