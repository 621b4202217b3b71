#!/usr/bin/env python
"""Benchmark runner: headline engine queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "cpus": N}

Each query is fully materialized via the noop datasource (compute measured,
driver-collect excluded).  A warmup query absorbs session/JIT startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# headline set: scan/agg, joins, window, spatial cover-join, kNN, tokens,
# dedup, similarity — the engine's operator families under load
HEADLINE = [
    "q1_pricing_summary",
    "top_orders_join",
    "topk_per_group",
    "events_tumbling_window",
    "cell_assign",
    "pip_cover_join",
    "knn_reverse",
    "interval_join",
    "centroid_fixedpoint",
    "word_freq",
    "lookup_all",
    "dedup_exact",
    "minhash_lsh_pairs",
    "embed_topk_cosine",
]


def materialize(df) -> int:
    try:
        df.write.format("noop").mode("overwrite").save()
        return -1
    except Exception:  # noqa: BLE001 — noop source unavailable: fall back
        return df.count()


def main() -> None:
    from nominatim_spark.plans.gate import QUERIES
    from nominatim_spark.session import get_spark

    spark = get_spark("bench", cpus=CPUS)

    # warmup: JVM/codegen/Arrow init
    fn, _ = QUERIES["q1_pricing_summary"]
    materialize(fn(spark, SF_DIR))

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn, _ = QUERIES[name]
        t0 = time.time()
        materialize(fn(spark, SF_DIR))
        timings[name] = round(time.time() - t0, 3)

    # flagship throughput: steady-state pages -> extract -> geocode
    # (one warmup for codegen/JIT, then timed; same protocol as
    # bench_scaling.py)
    from pyspark.sql import functions as Fn

    from nominatim_spark.pipeline.extract import extract_pages
    from nominatim_spark.pipeline.search import geocode
    from nominatim_spark.plans.flagship import build_synth_index
    from nominatim_spark.sources import synth

    idx, osmline = build_synth_index(
        spark, ckpt_root="/tmp/nominatim_bench_ckpt_v3", resume=True,
        n_cities=8, n_streets=12, n_houses=10, n_pois=5,
    )
    idx.search_name.persist().count()
    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "100000"))
    pages = synth.pages_df_dist(spark, n_pages, n_filler=15).persist()
    pages.count()

    def geocode_job():
        m = (
            extract_pages(pages)
            .filter(Fn.col("mention").isNotNull())
            .withColumn("query_id", Fn.col("url"))
            .select("query_id", Fn.col("mention").alias("qtext"))
        )
        return geocode(spark, idx, m, osmline=osmline).count()

    geocode_job()  # warmup
    spark.catalog.clearCache()
    idx.search_name.persist()
    pages.persist().count()
    t0 = time.time()
    geocode_job()
    geocode_sec = time.time() - t0
    timings["flagship_geocode"] = round(geocode_sec, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "geocode_docs_per_sec": round(n_pages / geocode_sec, 1),
                "geocode_n_pages": n_pages,
                "sf": sf_val,
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
