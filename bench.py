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
                "sf": sf_val,
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
