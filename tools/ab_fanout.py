#!/usr/bin/env python
"""Interleaved A/B of the small-scan fan-out (SPARK_GRAFT_FANOUT toggle).

One session; per query, rounds alternate arm order (ABBA) so host drift
cancels.  Per arm the FIRST run is that plan-shape's cold (codegen) run —
the same cost the driver's one-shot bench pays — and later runs are warm.
Prints cold + warm-median per arm.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROUNDS = int(os.environ.get("AB_ROUNDS", "4"))

HEADLINE = [
    "q1_pricing_summary", "top_orders_join", "topk_per_group",
    "events_tumbling_window", "cell_assign", "pip_cover_join",
    "knn_reverse", "interval_join", "centroid_fixedpoint", "word_freq",
    "lookup_all", "dedup_exact", "minhash_lsh_pairs", "embed_topk_cosine",
]


def main() -> None:
    from nominatim_spark.plans.gate import QUERIES
    from nominatim_spark.session import get_spark

    names = sys.argv[1:] or HEADLINE
    spark = get_spark("ab_fanout", cpus=CPUS)
    fn, _ = QUERIES["q1_pricing_summary"]
    os.environ["SPARK_GRAFT_FANOUT"] = "0"
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    for name in names:
        fn, _ = QUERIES[name]
        samples: dict[str, list[float]] = {"0": [], "1": []}
        for r in range(ROUNDS):
            arms = ["0", "1"] if r % 2 == 0 else ["1", "0"]
            for arm in arms:
                os.environ["SPARK_GRAFT_FANOUT"] = arm
                spark.sparkContext.setJobDescription(f"{name} arm{arm} r{r}")
                t0 = time.time()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                samples[arm].append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        c0, c1 = samples["0"][0], samples["1"][0]
        w0 = statistics.median(samples["0"][1:])
        w1 = statistics.median(samples["1"][1:])
        verdict = "FANOUT" if (c1 + w1) < (c0 + w0) else "plain "
        print(f"{name:26s} {verdict} cold0={c0:6.2f} cold1={c1:6.2f} "
              f"warm0={w0:6.2f} warm1={w1:6.2f}  "
              f"all0={samples['0']} all1={samples['1']}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
