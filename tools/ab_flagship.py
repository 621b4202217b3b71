#!/usr/bin/env python
"""Whole-job interleaved flagship A/B runner (VERDICT r4 ask #1).

Usage:
    python tools/ab_flagship.py <repo_tree> <ckpt_root> [n_timed]

Runs the EXACT bench.py flagship protocol against the code in
``<repo_tree>`` (a git worktree at any commit): build/resume the synth
index, persist, one warmup geocode job, clearCache, then ``n_timed``
timed geocode jobs in the same session.  Prints one JSON line with the
per-run seconds.

The driver script ``tools/ab_interleave.sh`` alternates this runner
between two trees (fresh JVM per invocation) so host drift affects both
arms equally — the attribution method VERDICT r4 requires for the
flagship regression question.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    tree = os.path.abspath(sys.argv[1])
    ckpt = sys.argv[2]
    n_timed = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sys.path.insert(0, tree)

    from pyspark.sql import functions as Fn

    from nominatim_spark.pipeline.extract import extract_pages
    from nominatim_spark.pipeline.search import geocode
    from nominatim_spark.plans.flagship import build_synth_index
    from nominatim_spark.session import get_spark
    from nominatim_spark.sources import synth

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("ab_flagship", cpus=cpus)

    idx, osmline = build_synth_index(
        spark, ckpt_root=ckpt, resume=True,
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

    geocode_job()  # warmup (codegen/JIT)
    runs = []
    for _ in range(n_timed):
        spark.catalog.clearCache()
        idx.search_name.persist()
        pages.persist().count()
        t0 = time.time()
        geocode_job()
        runs.append(round(time.time() - t0, 3))

    print(json.dumps({"tree": tree, "runs": runs,
                      "median": sorted(runs)[len(runs) // 2],
                      "n_pages": n_pages, "cpus": cpus}))
    spark.stop()


if __name__ == "__main__":
    main()
