"""Sanitizer surface — composable name/housenumber cleanups (§2.10).

Re-expresses the reference's sanitizer plugin chain
(/root/reference/src/nominatim_db/tokenizer/sanitizers/*) as pure-JVM
DataFrame transforms over two array columns:

* ``_names`` — the searchable names of a place as typed structs
  ``(name, kind, suffix, analyzer)`` — the reference's PlaceName model
  (data/place_name.py): seeded from EVERY ``name``-map entry, the tag
  key splitting into kind (before the first ':') and suffix (after it),
  exactly how the reference's lua output delivers them;
* ``_hnrs``  — the housenumber strings (seeded from
  address['housenumber']).

Each sanitizer is a ``DataFrame -> DataFrame`` function registered in
``SANITIZERS``; ``apply_sanitizers`` runs a configurable chain in order,
exactly the reference's ``sanitizers:`` config-list semantics
(sanitizer_config.py).  All transforms are Spark SQL array expressions —
no Python in the hot path.

Implemented kernels (reference file in parentheses):
* split-name-list         (split_name_list.py)
* strip-brace-terms       (strip_brace_terms.py)
* clean-names             (whitespace collapse)
* clean-housenumbers      (clean_housenumbers.py)
* clean-postcodes         (clean_postcodes.py)
* delete-names            (delete_names.py — name/kind/suffix/country/
                           rank filters)
* delete-tags             (delete_tags.py — deprecated alias; also
                           handles type=address via the address map)
* derive-names            (derive_names.py — regex variants with
                           backreferences)
* affix-expansion         (affix_expansion.py — <kind>:prefix/:suffix
                           tags, all five modes)
* tag-analyzer-by-language (tag_analyzer_by_language.py — language
                           suffix -> per-name analyzer; use-defaults
                           from the country language)
* clean-tiger-tags        (clean_tiger_tags.py)
* tag-japanese            (tag_japanese.py)
"""

from __future__ import annotations

import re
from typing import Callable

from pyspark.sql import DataFrame, functions as F

NAME_STRUCT_T = ("array<struct<name:string,kind:string,suffix:string,"
                 "analyzer:string>>")


def _nstruct(name_expr: str, kind: str = "n.kind", suffix: str = "n.suffix",
             analyzer: str = "n.analyzer") -> str:
    return (f"struct({name_expr} AS name, {kind} AS kind, "
            f"{suffix} AS suffix, {analyzer} AS analyzer)")


def seed_columns(placex: DataFrame) -> DataFrame:
    """Initialize _names/_hnrs from the raw tag columns.  Every name-map
    entry becomes a PlaceName struct; 'name:de' -> (kind 'name',
    suffix 'de')."""
    return placex.withColumn(
        "_names",
        F.expr(
            "filter(transform(map_entries(coalesce(name, map())), e -> "
            "struct(e.value AS name, "
            "CASE WHEN instr(e.key, ':') > 0 "
            "THEN substring_index(e.key, ':', 1) ELSE e.key END AS kind, "
            "CASE WHEN instr(e.key, ':') > 0 "
            "THEN substring(e.key, instr(e.key, ':') + 1) "
            "ELSE CAST(NULL AS string) END AS suffix, "
            "CAST(NULL AS string) AS analyzer)), "
            "n -> n.name IS NOT NULL AND n.name <> '')"
        ),
    ).withColumn(
        "_hnrs",
        F.expr(
            "filter(array(address['housenumber']), "
            "n -> n IS NOT NULL AND n <> '')"
        ),
    )


def split_name_list(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "_names",
        F.expr(
            "filter(flatten(transform(_names, n -> "
            "transform(split(n.name, ';'), p -> "
            + _nstruct("trim(p)") + "))), n -> n.name <> '')"
        ),
    )


def strip_brace_terms(df: DataFrame) -> DataFrame:
    # keep the original and add the brace-stripped form when it differs
    return df.withColumn(
        "_names",
        F.expr(
            "array_distinct(flatten(transform(_names, n -> "
            "filter(array(n, "
            + _nstruct("trim(regexp_replace(n.name, ' *\\\\([^)]*\\\\)', ''))")
            + "), v -> v.name <> ''))))"
        ),
    )


def clean_names(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "_names",
        F.expr(
            "array_distinct(filter(transform(_names, n -> "
            + _nstruct("trim(regexp_replace(n.name, '\\\\s+', ' '))")
            + "), n -> n.name <> ''))"
        ),
    )


def clean_housenumbers(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "_hnrs",
        F.expr(
            "array_distinct(filter(transform("
            "flatten(transform(_hnrs, h -> split(h, '[;,]'))), "
            "h -> trim(h)), h -> h <> ''))"
        ),
    )


def clean_postcodes(df: DataFrame, convert_to_address: bool = True,
                    default_pattern: str | None = None) -> DataFrame:
    """Filter address postcodes by their official per-country pattern
    (sanitizers/clean_postcodes.py + data/postcode_format.py:18-58).

    Conforming postcodes are normalized (uppercased, output template
    applied, optional country-code prefix stripped); non-conforming ones
    move to the non-centroid ``unofficial_postcode`` key
    (``convert_to_address``, the default) or are dropped.  All-zero forms
    are rejected (zero_pattern).  ``default_pattern`` (the reference's
    ``default-pattern`` argument) accepts values for countries without a
    configured format; without it those rows keep no official postcode.
    Rows without a country keep no postcode (country_without_postcode
    default).  No-op when the frame carries no country_code column
    (sanitizer unit-tests on bare name frames).

    Shares its normalization with build_postcodes
    (postcodes.with_normalized_postcode) so the exact-postcode search
    shortcut and the postcode table always agree."""
    from nominatim_spark.pipeline.postcodes import with_normalized_postcode

    if "country_code" not in df.columns:
        return df
    pc = F.upper(F.trim(F.col("address").getItem("postcode")))
    df = with_normalized_postcode(df, pc)
    norm = F.col("_pc_norm")
    if default_pattern is not None:
        fallback = F.regexp_extract(pc, f"^({default_pattern})$", 1)
        norm = F.coalesce(
            norm,
            F.when((fallback != "") & ~fallback.rlike(r"^[0\- ]+$"),
                   fallback),
        )
    keep_bad = (
        F.create_map(F.lit("unofficial_postcode"), pc)
        if convert_to_address
        else F.expr("map()").cast("map<string,string>")
    )
    rewritten = F.map_concat(
        F.expr("map_filter(address, (k, v) -> "
               "k NOT IN ('postcode', 'unofficial_postcode'))"),
        F.when(pc.isNull(), F.expr("map()").cast("map<string,string>"))
        .when(norm.isNotNull(), F.create_map(F.lit("postcode"), norm))
        .otherwise(keep_bad),
    )
    return df.withColumn(
        "address",
        F.when(F.col("address").isNull(), F.col("address"))
        .otherwise(rewritten),
    ).drop("_pc_norm")


# ---- filter helpers (sanitizers/config.py get_filter semantics:
# regexes are FULL matches; an absent filter matches everything)

def _sql_rx(s: str) -> str:
    """Escape a regex for embedding in a Spark SQL string literal (the
    parser consumes one level of backslashes)."""
    return s.replace("\\", "\\\\").replace("'", "\\'")


def _rx_pred(field: str, patterns) -> str:
    if patterns is None:
        return "true"
    if isinstance(patterns, str):
        patterns = [patterns]
    alt = "|".join(f"(?:{p})" for p in patterns)
    return f"({field} IS NOT NULL AND {field} rlike '^(?:{_sql_rx(alt)})$')"


def _rank_pred(spec) -> "F.Column":
    """'26' / '4-25' / list thereof over rank_address
    (sanitizer config rank parsing)."""
    if spec is None:
        return F.lit(True)
    if isinstance(spec, (str, int)):
        spec = [spec]
    cond = F.lit(False)
    for part in spec:
        part = str(part)
        m = re.fullmatch(r"(\d+)-(\d+)", part)
        if m:
            cond = cond | F.col("rank_address").between(
                int(m.group(1)), int(m.group(2)))
        else:
            cond = cond | (F.col("rank_address") == int(part))
    return cond


def _country_pred(spec) -> "F.Column":
    if spec is None:
        return F.lit(True)
    if isinstance(spec, str):
        spec = [spec]
    return F.col("country_code").isin([c.lower() for c in spec])


def _row_gate(df: DataFrame, country_code=None, rank_address=None):
    gate = F.lit(True)
    if country_code is not None and "country_code" in df.columns:
        gate = gate & _country_pred(country_code)
    if rank_address is not None and "rank_address" in df.columns:
        gate = gate & _rank_pred(rank_address)
    return gate


def delete_names(df: DataFrame, name: str | list | None = None,
                 kind: str | list | None = None,
                 suffix: str | list | None = None,
                 country_code=None, rank_address=None) -> DataFrame:
    """Remove searchable names matching ALL given filters
    (sanitizers/delete_names.py via _derived_name_sanitizer.py): name /
    kind / suffix are full-match regexes over the PlaceName fields;
    country_code / rank_address gate which rows the removal applies to."""
    if name is None and kind is None and suffix is None:
        return df
    drop = " AND ".join([
        _rx_pred("n.name", name) if name is not None else "true",
        _rx_pred("n.kind", kind) if kind is not None else "true",
        _rx_pred("n.suffix", suffix) if suffix is not None else "true",
    ])
    kept = F.expr(f"filter(_names, n -> NOT ({drop}))")
    return df.withColumn(
        "_names",
        F.when(_row_gate(df, country_code, rank_address), kept)
        .otherwise(F.col("_names")),
    )


def delete_tags(df: DataFrame, type: str = "name",
                filter_kind: str | list | None = None,
                suffix: str | list | None = None,
                name: str | list | None = None,
                country_code=None, rank_address=None) -> DataFrame:
    """Deprecated alias of delete-names (sanitizers/delete_tags.py);
    ``type='address'`` removes matching entries from the address map
    instead (kind = map key, name = map value)."""
    if type == "name":
        return delete_names(df, name=name, kind=filter_kind, suffix=suffix,
                            country_code=country_code,
                            rank_address=rank_address)
    # address tags: filter the map by key (kind) and value (name)
    def _alt(p):
        if p is None:
            return None
        return "|".join(f"(?:{x})" for x in
                        ([p] if isinstance(p, str) else p))

    kpat, vpat = _alt(filter_kind), _alt(name)
    kcond = f"k rlike '^(?:{_sql_rx(kpat)})$'" if kpat else "true"
    vcond = f"v rlike '^(?:{_sql_rx(vpat)})$'" if vpat else "true"
    rewritten = F.expr(
        f"map_filter(address, (k, v) -> NOT ({kcond} AND {vcond}))")
    return df.withColumn(
        "address",
        F.when(
            _row_gate(df, country_code, rank_address)
            & F.col("address").isNotNull(),
            rewritten,
        ).otherwise(F.col("address")),
    )


def derive_names(df: DataFrame, name_pattern: str = "",
                 variants: str | list | None = None,
                 filter_kind=None, filter_suffix=None,
                 filter_country=None, filter_rank=None,
                 keep_original: bool = True) -> DataFrame:
    """Create additional name variants from a regex with backreferences
    (sanitizers/derive_names.py): a name fully matching ``name_pattern``
    gains one variant per template ('Rodovia \\\\1' style); the original
    is kept unless ``keep_original`` is false."""
    if not name_pattern or not variants:
        return df
    if isinstance(variants, str):
        variants = [variants]
    match = " AND ".join([
        f"n.name rlike '^(?:{_sql_rx(name_pattern)})$'",
        _rx_pred("n.kind", filter_kind) if filter_kind is not None
        else "true",
        _rx_pred("n.suffix", filter_suffix) if filter_suffix is not None
        else "true",
    ])
    outs = []
    for v in variants:
        tpl = re.sub(r"\\(\d)", lambda m: f"${m.group(1)}", v)
        tpl = _sql_rx(tpl)
        outs.append(_nstruct(
            f"regexp_replace(n.name, "
            f"'^(?:{_sql_rx(name_pattern)})$', '{tpl}')"))
    if keep_original:
        outs.append("n")
    derived = F.expr(
        "array_distinct(flatten(transform(_names, n -> "
        f"CASE WHEN {match} THEN array({', '.join(outs)}) "
        "ELSE array(n) END)))"
    )
    return df.withColumn(
        "_names",
        F.when(_row_gate(df, filter_country, filter_rank), derived)
        .otherwise(F.col("_names")),
    )


def affix_expansion(df: DataFrame, mode: str = "all-variants",
                    prefix_tags: str | list = "prefix",
                    suffix_tags: str | list = "suffix") -> DataFrame:
    """Expand/contract names using <kind>:prefix / <kind>:suffix tags
    (sanitizers/affix_expansion.py).  The affix pseudo-name entries are
    consumed; matching names gain/lose the affixed form per ``mode``:
    full-name | short-name | all-variants | add-expanded |
    add-contracted."""
    if isinstance(prefix_tags, str):
        prefix_tags = [prefix_tags]
    if isinstance(suffix_tags, str):
        suffix_tags = [suffix_tags]
    ptag, stag = prefix_tags[0], suffix_tags[0]

    def _affix(tag: str) -> str:
        # value of the affix tag paired with name struct n:
        # kind:tag (no suffix) | kind:tag:sfx | kind:sfx:tag
        return (
            f"CASE WHEN n.suffix IS NULL THEN name[concat(n.kind, ':{tag}')]"
            f" ELSE coalesce(name[concat(n.kind, ':{tag}:', n.suffix)], "
            f"name[concat(n.kind, ':', n.suffix, ':{tag}')]) END"
        )

    is_affix = (
        f"n.suffix IS NOT NULL AND (n.suffix IN ('{ptag}', '{stag}') "
        f"OR n.suffix LIKE '{ptag}:%' OR n.suffix LIKE '%:{ptag}' "
        f"OR n.suffix LIKE '{stag}:%' OR n.suffix LIKE '%:{stag}')"
    )
    pfx, sfx = _affix(ptag), _affix(stag)
    expanded = _nstruct(
        f"trim(concat_ws(' ', {pfx}, n.name, {sfx}))")
    has_affix = f"({pfx} IS NOT NULL OR {sfx} IS NOT NULL)"
    # plain string stripping (no regex — affix values are literals)
    strip_p = (
        f"CASE WHEN {pfx} IS NOT NULL "
        f"AND startswith(n.name, concat({pfx}, ' ')) "
        f"THEN trim(substring(n.name, length({pfx}) + 2)) "
        f"ELSE n.name END"
    )
    contracted = _nstruct(
        f"CASE WHEN {sfx} IS NOT NULL "
        f"AND endswith(({strip_p}), concat(' ', {sfx})) "
        f"THEN trim(left(({strip_p}), "
        f"length(({strip_p})) - length({sfx}) - 1)) "
        f"ELSE ({strip_p}) END")
    if mode == "full-name":
        body = f"IF({has_affix}, array({expanded}), array(n))"
    elif mode == "short-name":
        body = f"IF({has_affix}, array({contracted}), array(n))"
    elif mode == "all-variants":
        body = (f"IF({has_affix}, array({expanded}, {contracted}), "
                "array(n))")
    elif mode == "add-expanded":
        body = f"IF({has_affix}, array(n, {expanded}), array(n))"
    elif mode == "add-contracted":
        body = f"IF({has_affix}, array(n, {contracted}), array(n))"
    else:
        raise ValueError(f"affix-expansion: unknown mode {mode!r}")
    return df.withColumn(
        "_names",
        F.expr(
            f"array_distinct(filter(flatten(transform("
            f"filter(_names, n -> NOT ({is_affix})), n -> {body})), "
            "v -> v.name <> ''))"
        ),
    )


def tag_analyzer_by_language(df: DataFrame,
                             filter_kind: str | list | None = None,
                             whitelist: list | None = None,
                             use_defaults: str = "no",
                             mode: str = "append") -> DataFrame:
    """Tag names with their language analyzer
    (sanitizers/tag_analyzer_by_language.py): a name whose suffix is a
    language code gets that analyzer (selecting the per-language variant
    table downstream); ``use_defaults`` = 'mono' assigns the country's
    default language to suffix-less names.  ``mode`` 'append' keeps the
    untagged original alongside, 'replace' swaps it."""
    from nominatim_spark.functions.variants import COUNTRY_LANG, LANG_RULES

    langs = whitelist if whitelist is not None else list(LANG_RULES)
    lang_in = ", ".join(f"'{lg}'" for lg in langs)
    kpred = (_rx_pred("n.kind", filter_kind)
             if filter_kind is not None else "true")
    is_lang = f"({kpred} AND n.suffix IN ({lang_in}))"
    tagged = _nstruct("n.name", suffix="n.suffix", analyzer="n.suffix")
    if mode == "append":
        body = f"IF({is_lang}, array(n, {tagged}), array(n))"
    else:
        body = f"IF({is_lang}, array({tagged}), array(n))"
    out = df.withColumn(
        "_names",
        F.expr(f"array_distinct(flatten(transform(_names, n -> {body})))"),
    )
    if use_defaults in ("mono", "multi") and "country_code" in df.columns:
        cmap = F.create_map(
            *[F.lit(x) for kv in COUNTRY_LANG.items() for x in kv])
        out = out.withColumn("_def_lang", cmap[F.col("country_code")])
        out = out.withColumn(
            "_names",
            F.expr(
                "transform(_names, n -> IF("
                "n.analyzer IS NULL AND n.suffix IS NULL "
                "AND _def_lang IS NOT NULL, "
                + _nstruct("n.name", analyzer="_def_lang") + ", n))"
            ),
        ).drop("_def_lang")
    return out


def clean_tiger_tags(df: DataFrame) -> DataFrame:
    """Remove TIGER-import address tags ('tiger:county' etc. —
    sanitizers/clean_tiger_tags.py; the county value keeps its
    ',state'-less form as addr:county like the reference does)."""
    county = F.expr(
        "regexp_replace(address['tiger:county'], ', .*', '')")
    rewritten = F.map_concat(
        F.expr("map_filter(address, (k, v) -> k NOT LIKE 'tiger:%')"),
        F.when(
            F.col("address").getItem("tiger:county").isNotNull()
            & F.col("address").getItem("county").isNull(),
            F.create_map(F.lit("county"), county),
        ).otherwise(F.expr("map()").cast("map<string,string>")),
    )
    return df.withColumn(
        "address",
        F.when(F.col("address").isNull(), F.col("address"))
        .otherwise(rewritten),
    )


def tag_japanese(df: DataFrame) -> DataFrame:
    """Japanese block addresses (sanitizers/tag_japanese.py:19-117):
    for country 'jp', ``block_number``+``housenumber`` recombine into
    ``housenumber`` ('1-3'), ``quarter``+``neighbourhood`` into ``place``
    (quarter∥neighbourhood); the source keys are consumed."""
    if "country_code" not in df.columns:
        return df
    addr = F.col("address")
    hnr = addr.getItem("housenumber")
    block = addr.getItem("block_number")
    quarter = addr.getItem("quarter")
    neigh = addr.getItem("neighbourhood")
    new_hnr = F.when(
        block.isNotNull() & hnr.isNotNull(),
        F.concat(block, F.lit("-"), hnr),
    ).otherwise(F.coalesce(block, hnr))
    new_place = F.when(
        quarter.isNotNull() & neigh.isNotNull(), F.concat(quarter, neigh)
    ).otherwise(F.coalesce(quarter, neigh))
    empty = F.expr("map()").cast("map<string,string>")
    rewritten = F.map_concat(
        F.expr(
            "map_filter(address, (k, v) -> k NOT IN "
            "('housenumber', 'block_number', 'quarter', 'neighbourhood', "
            "'place'))"
        ),
        F.when(new_hnr.isNotNull(),
               F.create_map(F.lit("housenumber"), new_hnr)).otherwise(empty),
        F.when(
            new_place.isNotNull(),
            F.create_map(F.lit("place"), new_place),
        ).otherwise(
            # keep a pre-existing place tag when nothing recombines
            F.when(addr.getItem("place").isNotNull(),
                   F.create_map(F.lit("place"), addr.getItem("place")))
            .otherwise(empty)
        ),
    )
    return df.withColumn(
        "address",
        F.when(
            (F.col("country_code") == "jp") & F.col("address").isNotNull(),
            rewritten,
        ).otherwise(F.col("address")),
    )


SANITIZERS: dict[str, Callable[..., DataFrame]] = {
    "split-name-list": split_name_list,
    "strip-brace-terms": strip_brace_terms,
    "clean-names": clean_names,
    "clean-housenumbers": clean_housenumbers,
    "clean-postcodes": clean_postcodes,
    "delete-names": delete_names,
    "delete-tags": delete_tags,
    "derive-names": derive_names,
    "affix-expansion": affix_expansion,
    "tag-analyzer-by-language": tag_analyzer_by_language,
    "clean-tiger-tags": clean_tiger_tags,
    "tag-japanese": tag_japanese,
}

DEFAULT_CHAIN: list = [
    "split-name-list", "strip-brace-terms", "clean-names",
    "clean-housenumbers", "clean-postcodes",
]


def apply_sanitizers(placex: DataFrame,
                     chain: list | None = None) -> DataFrame:
    """Seed _names/_hnrs and run the sanitizer chain in order.

    Chain entries are either a sanitizer name or a config dict
    ``{"step": <name>, **kwargs}`` — the reference's ``sanitizers:``
    config-list semantics (sanitizer_config.py)."""
    df = seed_columns(placex)
    for entry in (chain if chain is not None else DEFAULT_CHAIN):
        if isinstance(entry, str):
            df = SANITIZERS[entry](df)
        else:
            kw = {k.replace("-", "_"): v
                  for k, v in entry.items() if k != "step"}
            df = SANITIZERS[entry["step"]](df, **kw)
    return df
