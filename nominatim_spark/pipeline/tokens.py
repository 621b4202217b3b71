"""search_name / word-table build.

Re-expresses the reference's tokenizer+indexing output tables
(word: src/nominatim_db/tokenizer/icu_tokenizer.py:238-246; search_name:
lib-sql/tables/search_name.sql:12-20, filled by placex_update's
insert_addresslines + create_poi_search_terms,
lib-sql/functions/placex_triggers.sql:394-654) as three DataFrames:

* ``word``           — (word_id, word_token, type, word): 'W' full names,
                       'w' partial words, 'H' housenumbers, 'C' countries.
                       Ids are dense indexes from zipWithIndex over the
                       globally sorted distinct terms — deterministic and
                       fully parallel (no single-task window stage).
* ``search_name``    — per place: name_vector (own tokens),
                       nameaddress_vector (own + ancestor-area + parent
                       street tokens), ranks, importance, centroid.
* posting tables     — exploded (token_id, place_id) pairs for name and
                       address vectors: the GIN-index analog the LookupAll/
                       LookupAny semijoins drive on
                       (db_search_lookups.py:22-89).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nominatim_spark.functions.housenumbers import canonical_housenumber
from nominatim_spark.functions.text import norm_translit
from nominatim_spark.operators.spatial import point_in_polygon_join_dist
from nominatim_spark.pipeline.placex import IndexTables

# type objects (not DDL strings): usable without an active session at import
norm_name_udf = F.pandas_udf(
    lambda s: s.map(lambda v: norm_translit(v) if isinstance(v, str) else None),
    T.StringType(),
)

canon_hnr_udf = F.pandas_udf(
    lambda s: s.map(
        lambda v: canonical_housenumber(v) if isinstance(v, str) else None
    ),
    T.StringType(),
)


def _norm_arr(arr):
    return [norm_translit(v) for v in arr] if arr is not None else []


norm_names_udf = F.pandas_udf(
    lambda s: s.map(_norm_arr), T.ArrayType(T.StringType()),
)


def _variants_arr(norms, lang=None, analyzers=None):
    from nominatim_spark.functions.variants import variants_for

    out: dict[str, None] = {}
    for i, n in enumerate(norms or []):
        lg = lang if isinstance(lang, str) else None
        if analyzers is not None and i < len(analyzers) \
                and isinstance(analyzers[i], str):
            # per-name analyzer (tag-analyzer-by-language) overrides the
            # country default language
            lg = analyzers[i]
        for v in variants_for(n, lg):
            out.setdefault(v, None)
    return list(out)


variants_udf = F.pandas_udf(
    lambda norms, lang: pd.Series(
        [_variants_arr(n, lg) for n, lg in zip(norms, lang)],
        index=norms.index,
    ),
    T.ArrayType(T.StringType()),
)

def _live_names(names):
    # Arrow may deliver the struct array as a numpy array — no truthiness
    if names is None:
        return []
    return [n for n in names if n is not None and n.get("name")]


def _strs_of(names):
    return [n["name"] for n in _live_names(names)]


# PlaceName-struct inputs: the field extraction happens in Python —
# a transform() in a Python UDF argument tree blocks ArrowEvalPython
# extraction on the .rdd path (word-id assignment)
# marked nondeterministic on purpose (they are in fact deterministic):
# this stops Catalyst inlining the calls into downstream Filter
# predicates, where PythonUDF extraction fails on the .rdd
# (word-id zipWithIndex) path with an INTERNAL_ERROR in Spark 4.1
norm_names_struct_udf = F.pandas_udf(
    lambda names: names.map(lambda arr: _norm_arr(_strs_of(arr))),
    T.ArrayType(T.StringType()),
).asNondeterministic()


def _variants_of_structs(names, lang):
    from nominatim_spark.functions.text import has_han

    live = _live_names(names)
    out = _variants_arr(_norm_arr([n["name"] for n in live]), lang,
                        [n.get("analyzer") for n in live])
    # Han names romanize to space-separated pinyin ('北京' -> 'bei
    # jing'); also index the JOINED form so latin-written queries
    # ('Beijing') match without a name:en tag
    for n in live:
        if has_han(n["name"]):
            norm = norm_translit(n["name"])
            joined = norm.replace(" ", "")
            if joined and joined not in out:
                out.append(joined)
    return out


variants_struct_udf = F.pandas_udf(
    lambda names, lang: pd.Series(
        [_variants_of_structs(n, lg) for n, lg in zip(names, lang)],
        index=names.index,
    ),
    T.ArrayType(T.StringType()),
).asNondeterministic()


def _canon_arr(arr):
    out: dict[str, None] = {}
    for v in (arr or []):
        c = canonical_housenumber(v)
        if c:
            out.setdefault(c, None)
    return list(out)


canon_hnrs_udf = F.pandas_udf(
    lambda s: s.map(_canon_arr), T.ArrayType(T.StringType()),
)


def tokenize_places(placex: DataFrame,
                    sanitizer_chain: list | None = None) -> DataFrame:
    """placex -> placex + sanitizer/normalization/variant columns.

    Sanitizer chain (§2.10) -> _names (PlaceName structs) / _hnrs, then
    normalization and variant expansion (abbreviation trie + mutations,
    generic.py:58-143) — the index carries every spelling variant so
    single-form queries ("Birch St") match.  A name's language analyzer
    (tag-analyzer-by-language, or the country default) selects its
    per-language variant table.  Row-local — safe to run on any subset
    (the incremental path tokenizes only the diff)."""
    from nominatim_spark.functions.variants import COUNTRY_LANG
    from nominatim_spark.pipeline.sanitizers import apply_sanitizers

    if "country_code" in placex.columns:
        # country default language drives the per-language variant table
        # (tag-analyzer-by-language use-defaults semantics)
        lang_map = F.create_map(
            *[F.lit(x) for kv in COUNTRY_LANG.items() for x in kv])
        lang_col = lang_map[F.col("country_code")]
    else:
        lang_col = F.lit(None).cast("string")
    return apply_sanitizers(placex, chain=sanitizer_chain).withColumn(
        "norm_names", norm_names_struct_udf(F.col("_names"))
    ).withColumn(
        "var_names", variants_struct_udf(F.col("_names"), lang_col)
    ).withColumn(
        "norm_name", F.expr("try_element_at(norm_names, 1)")
    ).withColumn(
        "housenumbers", canon_hnrs_udf(F.col("_hnrs"))
    ).withColumn(
        "housenumber", F.expr("try_element_at(housenumbers, 1)")
    ).drop("_names", "_hnrs")


NODE_FUZZY_RES = 5  # ~3.5 km cells: 4 cells per suburb disk, ~100 per city


def _node_fuzzy_ancestors(named: DataFrame,
                          node_areas: DataFrame) -> DataFrame:
    """Address ancestors from place NODES with rank-dependent fuzzy radii
    (place_node_fuzzy_area, utils.sql:338-358: city 15 km, town 4 km,
    village 2 km, hamlet 1 km, else 500 m) — a POI near a suburb node
    gets the suburb's name in its address vector even though no polygon
    exists.  Disk-cover equi-join + exact distance filter (planar
    degrees, the engine's expand_by_meters simplification)."""
    from nominatim_spark.grid import EARTH_DEG_M
    from nominatim_spark.operators.spatial import explode_bbox_cells

    radius_deg = (
        F.when(F.col("rank_search") <= 16, 15000.0)
        .when(F.col("rank_search") <= 18, 4000.0)
        .when(F.col("rank_search") <= 19, 2000.0)
        .when(F.col("rank_search") <= 20, 1000.0)
        .otherwise(500.0) / F.lit(EARTH_DEG_M)
    )
    nodes = node_areas.withColumn("_r", radius_deg).select(
        "anc_id", "anc_name",
        F.col("lon").alias("a_lon"), F.col("lat").alias("a_lat"), "_r",
    )
    cover = explode_bbox_cells(
        nodes.withColumn("minx", F.col("a_lon") - F.col("_r"))
        .withColumn("miny", F.col("a_lat") - F.col("_r"))
        .withColumn("maxx", F.col("a_lon") + F.col("_r"))
        .withColumn("maxy", F.col("a_lat") + F.col("_r")),
        res=NODE_FUZZY_RES,
    ).select("anc_id", "anc_name", "a_lon", "a_lat", "_r", "cell")
    # the disk must intersect the place's GEOMETRY (the reference
    # intersects the fuzzy area with the row geometry — a street running
    # through a suburb qualifies even though its centroid is far); the
    # bbox is the conservative stand-in: point-to-bbox distance <= r
    pts = explode_bbox_cells(
        named.select("place_id", "minx", "miny", "maxx", "maxy"),
        res=NODE_FUZZY_RES,
    )
    dx = F.greatest(
        F.col("minx") - F.col("a_lon"), F.col("a_lon") - F.col("maxx"),
        F.lit(0.0),
    )
    dy = F.greatest(
        F.col("miny") - F.col("a_lat"), F.col("a_lat") - F.col("maxy"),
        F.lit(0.0),
    )
    return (
        pts.join(cover, "cell")
        .filter(dx * dx + dy * dy <= F.col("_r") * F.col("_r"))
        .filter(F.col("anc_id") != F.col("place_id"))
        .select("place_id", "anc_id", "anc_name")
        .distinct()
    )


def place_terms(named: DataFrame, areas: DataFrame,
                parent_names: DataFrame,
                node_areas: DataFrame | None = None
                ) -> tuple[DataFrame, DataFrame]:
    """Per-place (name_terms, addr_terms) for the rows of ``named``.

    ``areas``: (anc_id, anc_name, geometry) candidate ancestor polygons.
    ``parent_names``: (parent_place_id, parent_vars) street-name variants.
    ``node_areas``: (anc_id, anc_name, lon, lat, rank_search) place nodes
    acting as fuzzy address areas (place_node_fuzzy_area).
    All are CONTEXT tables — pass the full sets for a full build, or the
    standing index's for an incremental one.
    """
    ancestors = point_in_polygon_join_dist(
        named.select("place_id", "lon", "lat"),
        areas,
        poly_key="anc_id",
        carry=("anc_name",),
    ).filter(F.col("anc_id") != F.col("place_id")).select(
        "place_id", "anc_id", "anc_name"
    )
    if node_areas is not None:
        ancestors = ancestors.unionByName(
            _node_fuzzy_ancestors(named, node_areas)
        ).distinct()
    with_parent = named.join(parent_names, "parent_place_id", "left")

    # name terms: every variant contributes its full form (W) + words (w)
    name_terms = (
        named.filter(F.size("var_names") > 0)
        .select("place_id", F.explode("var_names").alias("_v"))
        .select(
            "place_id",
            F.explode(
                F.array_union(
                    F.array(F.concat(F.lit("W:"), F.col("_v"))),
                    F.transform(
                        F.split("_v", " "),
                        lambda t: F.concat(F.lit("w:"), t),
                    ),
                )
            ).alias("term"),
        )
        .filter(~F.col("term").isin("W:", "w:"))
        .distinct()
    )
    hnr_terms = named.filter(F.size("housenumbers") > 0).select(
        "place_id",
        F.explode(
            F.transform("housenumbers", lambda h: F.concat(F.lit("H:"), h))
        ).alias("term"),
    )
    name_terms = name_terms.unionByName(hnr_terms)

    # address terms: ancestor-area words + parent street variant words +
    # own variant words (create_poi_search_terms,
    # placex_triggers.sql:394-484)
    addr_sources = (
        ancestors.select("place_id", F.col("anc_name").alias("src_name"))
        .unionByName(
            with_parent.select(
                "place_id", F.explode("parent_vars").alias("src_name")
            ).filter(F.col("src_name").isNotNull())
        )
        .unionByName(
            named.select("place_id", F.explode("var_names").alias("src_name"))
            .filter(F.col("src_name").isNotNull())
        )
    )
    # each address source contributes its words (w:) AND its full form
    # (W:) — the reference's nameaddress_vector carries full-word ids so
    # weigh_search can rank candidates whose address contains the query
    # phrase as a whole name (create_poi_search_terms,
    # placex_triggers.sql:394-484; ranking.sql:327-345)
    addr_terms = addr_sources.select(
        "place_id",
        F.explode(
            F.array_union(
                F.array(F.concat(F.lit("W:"), F.col("src_name"))),
                F.transform(
                    F.split("src_name", " "),
                    lambda t: F.concat(F.lit("w:"), t),
                ),
            )
        ).alias("term"),
    ).filter(~F.col("term").isin("W:", "w:")).distinct()
    return name_terms, addr_terms


def _word_stats(word: DataFrame, name_post: DataFrame,
                addr_post: DataFrame) -> DataFrame:
    """Attach per-token name/address occurrence counts (the reference's
    Token.count/addr_count feeding name_address_ratio, query.py:233-240)."""
    name_counts = name_post.groupBy("word_id").agg(
        F.count(F.lit(1)).alias("name_count")
    )
    addr_totals = addr_post.groupBy("word_id").agg(
        F.count(F.lit(1)).alias("_addr_total")
    )
    return (
        word.drop("name_count", "addr_count")
        .join(name_counts, "word_id", "left")
        .join(addr_totals, "word_id", "left")
        .withColumn("name_count", F.coalesce("name_count", F.lit(0)))
        .withColumn(
            # addr_post unions name_post, so address-only occurrences are
            # the difference
            "addr_count",
            F.greatest(
                F.coalesce("_addr_total", F.lit(0)) - F.col("name_count"),
                F.lit(0),
            ),
        )
        .drop("_addr_total")
    )


def build_search_tables(spark, placex: DataFrame) -> IndexTables:
    # linked label nodes are excluded from the search index — the P5 guard
    # (linked_place_id IS NULL, place_search.py:182-183); their boundary
    # carries the searchable entry.  Their identity is kept on the side
    # (IndexTables.linked) so incremental updates can detect touches.
    from nominatim_spark.pipeline.placex import _linked_slice

    linked = _linked_slice(placex)
    if "linked_place_id" in placex.columns:
        placex = placex.filter(F.col("linked_place_id").isNull())

    named = tokenize_places(placex)
    name_terms, addr_terms = place_terms(
        named, _area_context_from(named), _parent_context_from(named),
        node_areas=_node_area_context_from(named),
    )

    # ---- word table: dense deterministic ids via zipWithIndex over the
    # globally sorted distinct terms (range-partitioned sort keeps every
    # partition in order, so the index is the same dense sequence a global
    # row_number would give — without the single-task window stage)
    all_terms = name_terms.select("term").unionByName(
        addr_terms.select("term")
    ).distinct()
    indexed = (
        all_terms.sort("term")
        .rdd.map(lambda r: r.term)
        .zipWithIndex()
        .map(lambda ti: (ti[1] + 1, ti[0]))
    )
    word = spark.createDataFrame(indexed, "word_id long, term string").select(
        "word_id",
        F.substring("term", 3, 10000).alias("word_token"),
        F.substring("term", 1, 1).alias("type"),
        F.col("term"),
    )
    word = word.persist()

    # ---- vectors & postings
    name_post = (
        name_terms.join(word.select("term", "word_id"), "term")
        .select("place_id", "word_id")
        .distinct()
    )
    addr_post = (
        addr_terms.join(word.select("term", "word_id"), "term")
        .select("place_id", "word_id")
        .unionByName(name_post)
        .distinct()
    )

    # per-token name/address occurrence stats — used by the direction
    # penalty and available to lookup planning
    word = _word_stats(word, name_post, addr_post).persist()

    search_name = _search_name_rows(named, name_post, addr_post)

    return IndexTables(
        placex=named,
        search_name=search_name,
        word=word,
        name_postings=name_post,
        addr_postings=addr_post,
        linked=linked,
    )


SEARCH_NAME_BASE_COLS = [
    "place_id", "osm_type", "osm_id", "class", "type", "norm_name",
    "housenumber", "housenumbers", "parent_place_id", "rank_search",
    "rank_address", "country_code", "partition", "importance",
    "lon", "lat", "cell",
]


def _search_name_rows(named: DataFrame, name_post: DataFrame,
                      addr_post: DataFrame) -> DataFrame:
    name_vec = name_post.groupBy("place_id").agg(
        F.sort_array(F.collect_list("word_id")).alias("name_vector")
    )
    addr_vec = addr_post.groupBy("place_id").agg(
        F.sort_array(F.collect_list("word_id")).alias("nameaddress_vector")
    )
    return (
        named.select(
            *SEARCH_NAME_BASE_COLS,
            # the place's own assigned postcode — PlaceSearch's exact-
            # postcode shortcut (place_search.py:149-163) reads it
            F.upper(F.col("address").getItem("postcode")).alias("postcode"),
        )
        .join(name_vec, "place_id", "left")
        .join(addr_vec, "place_id", "left")
        .filter(F.col("name_vector").isNotNull())
    )


def incremental_search_tables(spark, idx: IndexTables, redo: DataFrame,
                              replace_ids: DataFrame,
                              survivors: DataFrame) -> IndexTables:
    """Diff-proportional search-table merge (the token side of diff
    replay — the reference re-tokenizes exactly the dirty rows,
    indexer.py's reindex loop).

    ``redo``: raw place-schema rows to (re-)tokenize (already parented).
    ``replace_ids``: (place_id) whose index entries must be dropped
    (updated ∪ deleted ∪ invalidated).
    ``survivors``: the tokenized standing placex rows that remain.

    Every step is diff-proportional: tokenization runs on ``redo`` only;
    the ancestor/parent CONTEXT comes from the standing tokenized rows
    plus the diff itself; only genuinely new terms append to the word
    table (ids continue after the current max — deterministic given the
    same diff sequence, though not identical to a fresh full build);
    postings/search_name merge by anti-join + union.  Token stats are
    re-aggregated from the merged postings (pure counts, shuffle-light).
    """
    named_redo = tokenize_places(redo)

    # context = standing tokenized rows ∪ the freshly tokenized diff (a
    # new street in the same diff can parent a new house)
    ctx_cols = ["place_id", "norm_name", "var_names", "extended_type",
                "rank_address", "rank_search", "lon", "lat", "geometry"]
    context = survivors.select(*ctx_cols).unionByName(
        named_redo.select(*ctx_cols)
    )
    name_terms, addr_terms = place_terms(
        named_redo, _area_context_from(context), _parent_context_from(context),
        node_areas=_node_area_context_from(context),
    )

    # ---- word merge: append only genuinely new terms
    old_word = idx.word
    new_terms = (
        name_terms.select("term").unionByName(addr_terms.select("term"))
        .distinct()
        .join(old_word.select("term"), "term", "left_anti")
    )
    max_id = old_word.agg(F.max("word_id")).head()[0] or 0
    appended = (
        new_terms.sort("term")
        .rdd.map(lambda r: r.term)
        .zipWithIndex()
        .map(lambda ti: (ti[1] + 1 + max_id, ti[0]))
    )
    word_cols = ["word_id", "word_token", "type", "term"]
    if appended.isEmpty():
        word = old_word.select(*word_cols)
    else:
        new_word = spark.createDataFrame(
            appended, "word_id long, term string"
        ).select(
            "word_id",
            F.substring("term", 3, 10000).alias("word_token"),
            F.substring("term", 1, 1).alias("type"),
            F.col("term"),
        )
        word = old_word.select(*word_cols).unionByName(new_word)
    word = word.persist()

    # ---- postings merge
    redo_name_post = (
        name_terms.join(word.select("term", "word_id"), "term")
        .select("place_id", "word_id").distinct()
    )
    redo_addr_post = (
        addr_terms.join(word.select("term", "word_id"), "term")
        .select("place_id", "word_id")
        .unionByName(redo_name_post)
        .distinct()
    )
    name_post = idx.name_postings.join(
        replace_ids, "place_id", "left_anti"
    ).unionByName(redo_name_post)
    addr_post = idx.addr_postings.join(
        replace_ids, "place_id", "left_anti"
    ).unionByName(redo_addr_post)

    word = _word_stats(word, name_post, addr_post).persist()

    # ---- search_name merge
    redo_sn = _search_name_rows(named_redo, redo_name_post, redo_addr_post)
    search_name = idx.search_name.join(
        replace_ids, "place_id", "left_anti"
    ).unionByName(redo_sn.select(idx.search_name.columns))

    placex = survivors.unionByName(named_redo.select(survivors.columns))
    # the linked set is unchanged by construction: apply_place_updates
    # rejects any batch that touches a linked label node
    return IndexTables(
        placex=placex,
        search_name=search_name,
        word=word,
        name_postings=name_post,
        addr_postings=addr_post,
        linked=idx.linked,
    )


def _area_context_from(ctx: DataFrame) -> DataFrame:
    return ctx.filter(
        (F.col("extended_type") == "A") & F.col("rank_address").between(1, 25)
    ).select(
        F.col("place_id").alias("anc_id"),
        F.col("norm_name").alias("anc_name"),
        "geometry",
    )


def _parent_context_from(ctx: DataFrame) -> DataFrame:
    return ctx.select(
        F.col("place_id").alias("parent_place_id"),
        F.col("var_names").alias("parent_vars"),
    )


def _node_area_context_from(ctx: DataFrame) -> DataFrame:
    """Place nodes acting as fuzzy address areas (rank 16..25 points —
    suburbs/villages/hamlets; unlinked town/city nodes)."""
    return ctx.filter(
        (F.col("extended_type") != "A")
        & F.col("rank_address").between(16, 25)
        & F.col("norm_name").isNotNull()
    ).select(
        F.col("place_id").alias("anc_id"),
        F.col("norm_name").alias("anc_name"),
        "lon", "lat", "rank_search",
    )
