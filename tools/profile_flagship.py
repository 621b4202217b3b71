#!/usr/bin/env python
"""Flagship stage-level profile (guide §1.1/§7.1): replicate bench.py's
flagship protocol with the UI enabled, then dump per-stage wall/task
metrics from the REST API so we can see where the 100k-page geocode
spends its time.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import functions as Fn

    from nominatim_spark.pipeline.extract import extract_pages
    from nominatim_spark.pipeline.search import geocode
    from nominatim_spark.plans.flagship import build_synth_index
    from nominatim_spark.session import get_spark
    from nominatim_spark.sources import synth

    spark = get_spark("profile_flagship", cpus=CPUS,
                      extra_conf={"spark.ui.enabled": "true"})

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

    # mark the timed window by job id
    st = spark.sparkContext.statusTracker()
    jobs_before = set(st.getJobIdsForGroup(None) or [])
    t0 = time.time()
    geocode_job()
    wall = time.time() - t0
    print(f"flagship timed run: {wall:.3f}s", flush=True)

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    stages = json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"))
    jobs = json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/jobs"))
    timed_jobs = [j for j in jobs if j["jobId"] not in jobs_before]
    timed_stage_ids = {s for j in timed_jobs for s in j["stageIds"]}

    rows = []
    for s in stages:
        if s["stageId"] not in timed_stage_ids:
            continue
        dur = (s.get("executorRunTime") or 0) / 1000.0
        sub = s.get("submissionTime"); comp = s.get("completionTime")
        det = s.get("details") or ""
        frame = next((ln.strip() for ln in det.splitlines()
                      if "/nominatim_spark/" in ln or "/repo/" in ln), "")
        rows.append((
            s["stageId"], s["numTasks"], dur,
            (s.get("executorCpuTime") or 0) / 1e9,
            (s.get("shuffleReadBytes") or 0) / 1e6,
            (s.get("shuffleWriteBytes") or 0) / 1e6,
            ((s.get("name") or "")[:40] + " | " + frame[-70:]),
            sub, comp,
        ))
    rows.sort(key=lambda r: -r[2])
    print(f"{'stage':>5} {'tasks':>5} {'taskTime_s':>10} {'cpu_s':>8} "
          f"{'shRd_MB':>8} {'shWr_MB':>8}  name")
    for r in rows[:40]:
        print(f"{r[0]:>5} {r[1]:>5} {r[2]:>10.2f} {r[3]:>8.2f} "
              f"{r[4]:>8.1f} {r[5]:>8.1f}  {r[6]}")
    total_task = sum(r[2] for r in rows)
    print(f"total executor task time: {total_task:.1f}s over wall "
          f"{wall:.1f}s -> parallelism {total_task / max(wall, 1e-9):.1f}x "
          f"of {CPUS}")
    # job timeline: submission -> completion per job, with wall duration
    from datetime import datetime

    def _ts(s):
        return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f")

    tj = sorted((j for j in timed_jobs if j.get("submissionTime")),
                key=lambda j: j["submissionTime"])
    t_origin = _ts(tj[0]["submissionTime"]) if tj else None
    print(f"{'job':>4} {'t0_s':>7} {'t1_s':>7} {'dur_s':>6}  stages / name")
    for j in tj:
        t0 = (_ts(j["submissionTime"]) - t_origin).total_seconds()
        t1 = ((_ts(j["completionTime"]) - t_origin).total_seconds()
              if j.get("completionTime") else -1)
        print(f"{j['jobId']:>4} {t0:>7.2f} {t1:>7.2f} {t1 - t0:>6.2f}  "
              f"{sorted(j['stageIds'])} {(j.get('name') or '')[:60]}")
    spark.stop()


if __name__ == "__main__":
    main()
