"""Bucketed index tables — exchange-free candidate joins for repeated
query batches.

The flagship's hottest shuffle is the candidate join: posting rows for
the batch's drive tokens ⋈ ``search_name`` on ``place_id``
(pipeline/search.py score_hits).  Per batch, both sides re-shuffle on
``place_id``.  When the standing tables are written BUCKETED by
``place_id`` with the same bucket count, that exchange disappears:

* ``search_name`` scans pre-bucketed — no shuffle, no sort, per batch;
* ``name_postings`` scans pre-bucketed; the drive-token prefilter is a
  broadcast semi-join, which PRESERVES the bucket distribution, so the
  posting side reaches the sort-merge join exchange-free too.

This is the long-lived-service shape: a geocoding cluster answering
query batches all day re-pays the shuffle of the 10^9-row posting and
search tables on every batch unless they are bucketed once at build
time.  The reference gets the same effect from its PostgreSQL btree
indexes; Spark's analog is the bucketed table (SPARK-19256 semantics:
matching bucket spec on both SMJ sides elides both exchanges).

Mechanics: bucketed metadata lives in the session catalog, so tables
write via ``saveAsTable`` with an explicit ``path``.  Reloading in a new
session re-registers from the warehouse (``register_bucketed_index``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from nominatim_spark.pipeline.placex import IndexTables

# tables worth bucketing, with their join key.  placex buckets by
# place_id too (lookup/details joins); word stays unbucketed (it joins
# via broadcast everywhere).
_BUCKET_SPECS = (
    ("search_name", "place_id"),
    ("name_postings", "place_id"),
    ("addr_postings", "place_id"),
    ("placex", "place_id"),
)


def save_bucketed_index(spark, idx: IndexTables, root: str, *,
                        n_buckets: int = 64,
                        prefix: str = "nomspark") -> dict[str, str]:
    """Write the index's hot join tables bucketed by their join key.

    Returns {logical_name: catalog_table_name}.  ``n_buckets`` should be
    sized so each bucket's rows fit an executor core's working memory at
    the target scale (64 here for local[32]; a 100 TB deployment sizes
    it like shuffle partitions — thousands).
    """
    os.makedirs(root, exist_ok=True)
    names: dict[str, str] = {}
    for logical, key in _BUCKET_SPECS:
        df: DataFrame = getattr(idx, logical)
        tbl = f"{prefix}_{logical}"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (df.write.mode("overwrite")
         .bucketBy(n_buckets, key)
         .sortBy(key)
         .option("path", os.path.join(root, logical))
         .format("parquet")
         .saveAsTable(tbl))
        names[logical] = tbl
    return names


def register_bucketed_index(spark, root: str, *, n_buckets: int = 64,
                            prefix: str = "nomspark") -> dict[str, str]:
    """Re-register previously written bucketed tables in a FRESH session.

    The default in-memory catalog dies with the process, so a new
    session (CLI invocation, restarted service) re-creates the external
    table metadata over the existing files — CLUSTERED BY DDL with the
    schema inferred from the parquet footers.  The data is not touched;
    the bucket layout on disk is what makes the join exchange-free."""
    names: dict[str, str] = {}
    for logical, key in _BUCKET_SPECS:
        path = os.path.join(root, logical)
        schema = spark.read.parquet(path).schema
        cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                         for f in schema)
        tbl = f"{prefix}_{logical}"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(
            f"CREATE TABLE {tbl} ({cols}) USING PARQUET "
            f"CLUSTERED BY ({key}) SORTED BY ({key}) "
            f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
        )
        names[logical] = tbl
    return names


def load_bucketed_index(spark, idx: IndexTables,
                        names: dict[str, str]) -> IndexTables:
    """IndexTables whose hot tables read from the bucketed catalog
    tables (word and the linked side table carry over untouched)."""
    return IndexTables(
        placex=spark.table(names["placex"]),
        search_name=spark.table(names["search_name"]),
        word=idx.word,
        name_postings=spark.table(names["name_postings"]),
        addr_postings=spark.table(names["addr_postings"]),
        linked=idx.linked,
    )


def count_shuffle_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the executed plan (AQE-resolved) —
    the bucketing tests pin the candidate join's exchange count."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")
