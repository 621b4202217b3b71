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


SANITIZERS: dict[str, Callable[[DataFrame], DataFrame]] = {
    "split-name-list": split_name_list,
    "strip-brace-terms": strip_brace_terms,
    "clean-names": clean_names,
    "clean-housenumbers": clean_housenumbers,
}

DEFAULT_CHAIN = [
    "split-name-list", "strip-brace-terms", "clean-names",
    "clean-housenumbers",
]


def apply_sanitizers(placex: DataFrame,
                     chain: list[str] | None = None) -> DataFrame:
    """Seed _names/_hnrs and run the sanitizer chain in order."""
    df = seed_columns(placex)
    for name in (chain if chain is not None else DEFAULT_CHAIN):
        df = SANITIZERS[name](df)
    return df
