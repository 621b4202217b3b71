"""Wikimedia importance load + application (S5).

Re-expresses the reference's importance pipeline
(/root/reference/src/nominatim_db/tools/refresh.py:100-160 — the
``wikimedia-importance.csv.gz`` TSV load — and
lib-sql/functions/importance.sql compute_importance): places matching a
wikipedia/wikidata entry adopt that importance; everything else keeps the
rank-derived default formula ``0.40001 - rank_search/75``
(importance.sql:146-206).

Spark-first: the TSV is a native CSV scan (splittable, predicate
pushdown); the match is one equi-join on the wikidata id with the max
importance per id pre-aggregated (map-side combine) — at planet scale
the importance table is ~10M rows, comfortably a shuffle-join side that
AQE will broadcast when filtered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

WIKIMEDIA_SCHEMA = (
    "language string, title string, importance double, wikidata string"
)


def read_wikimedia_importance(spark, path: str) -> DataFrame:
    """Native scan of the wikimedia-importance TSV (refresh.py:142-153
    column order: language, title, importance, wikidata)."""
    return (
        spark.read
        .option("header", "true")
        .option("sep", "\t")
        .option("quote", "|")
        .schema(WIKIMEDIA_SCHEMA)
        .csv(path)
    )


def apply_wikimedia_importance(placex: DataFrame,
                               wiki: DataFrame) -> DataFrame:
    """placex + wikimedia table -> placex with importance overridden for
    wikidata matches (compute_importance's wikipedia branch)."""
    best = (
        wiki.filter(F.col("wikidata").isNotNull())
        .groupBy("wikidata")
        .agg(F.max("importance").alias("_wiki_importance"))
    )
    joined = placex.withColumn(
        "_wd", F.col("extratags").getItem("wikidata")
    ).join(best, F.col("_wd") == best.wikidata, "left")
    return joined.withColumn(
        "importance",
        F.coalesce(F.col("_wiki_importance"), F.col("importance")),
    ).drop("_wd", "wikidata", "_wiki_importance")
