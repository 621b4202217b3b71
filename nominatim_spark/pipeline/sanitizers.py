"""Sanitizer surface — composable name/housenumber cleanups (§2.10).

Re-expresses the reference's sanitizer plugin chain
(/root/reference/src/nominatim_db/tokenizer/sanitizers/*) as pure-JVM
DataFrame transforms over two array columns:

* ``_names`` — the searchable names of a place (seeded from name['name'])
* ``_hnrs``  — the housenumber strings (seeded from address['housenumber'])

Each sanitizer is a ``DataFrame -> DataFrame`` function registered in
``SANITIZERS``; ``apply_sanitizers`` runs a configurable chain in order,
exactly the reference's ``sanitizers:`` config-list semantics
(sanitizer_config.py).  All transforms are Spark SQL array expressions —
no Python in the hot path.

Implemented kernels (reference file in parentheses):
* split-name-list     (sanitizers/split_name_list.py) — ``;``-separated
  name lists become separate names
* strip-brace-terms   (sanitizers/strip_brace_terms.py) — ``Name (old)``
  additionally indexes as ``Name``
* clean-housenumbers  (sanitizers/clean_housenumbers.py) — split ``;``/``,``
  lists, trim, drop empties
* tag-japanese style whitespace cleanup (clean names) — collapse runs of
  whitespace, trim
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, functions as F


def seed_columns(placex: DataFrame) -> DataFrame:
    """Initialize _names/_hnrs arrays from the raw tag columns."""
    return placex.withColumn(
        "_names",
        F.expr("filter(array(name['name']), n -> n IS NOT NULL AND n <> '')"),
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
            "filter(transform(flatten(transform(_names, n -> split(n, ';'))), "
            "n -> trim(n)), n -> n <> '')"
        ),
    )


def strip_brace_terms(df: DataFrame) -> DataFrame:
    # keep the original and add the brace-stripped form when it differs
    return df.withColumn(
        "_names",
        F.expr(
            "array_distinct(flatten(transform(_names, n -> "
            "filter(array(n, trim(regexp_replace(n, ' *\\\\([^)]*\\\\)', ''))), "
            "v -> v <> ''))))"
        ),
    )


def clean_names(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "_names",
        F.expr(
            "array_distinct(filter(transform(_names, "
            "n -> trim(regexp_replace(n, '\\\\s+', ' '))), n -> n <> ''))"
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


def delete_names(df: DataFrame, name: str = "",
                 ) -> DataFrame:
    """Remove searchable names fully matching the ``name`` regex
    (sanitizers/delete_tags.py / delete-names: filter-name semantics for
    the batch engine's flat _names list)."""
    if not name:
        return df
    return df.withColumn(
        "_names",
        F.filter("_names", lambda n: ~n.rlike(f"^(?:{name})$")),
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
