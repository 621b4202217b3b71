#!/usr/bin/env python
"""Per-query profiling harness (guide §1: measure first, noop sink).

Runs each headline query N times against $SPARK_GRAFT_SF_DIR, prints all
samples (run 1 = cold, later runs = warm), and optionally dumps
``.explain("formatted")`` per query.  Separate from the FROZEN bench.py —
this is the builder's measurement tool, not the driver's.

Usage:
  python tools/profile_gate.py [query ...]       # default: headline set
  PROFILE_REPEATS=3 PROFILE_EXPLAIN_DIR=plans/r06 python tools/profile_gate.py
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("PROFILE_REPEATS", "3"))
EXPLAIN_DIR = os.environ.get("PROFILE_EXPLAIN_DIR")
SUFFIX = os.environ.get("PROFILE_EXPLAIN_SUFFIX", "_before")

HEADLINE = [
    "q1_pricing_summary", "top_orders_join", "topk_per_group",
    "events_tumbling_window", "cell_assign", "pip_cover_join",
    "knn_reverse", "interval_join", "centroid_fixedpoint", "word_freq",
    "lookup_all", "dedup_exact", "minhash_lsh_pairs", "embed_topk_cosine",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from nominatim_spark.plans.gate import QUERIES
    from nominatim_spark.session import get_spark

    names = sys.argv[1:] or HEADLINE
    spark = get_spark("profile_gate", cpus=CPUS)

    # warmup: JVM/codegen/Arrow init (same protocol as bench.py)
    fn, _ = QUERIES["q1_pricing_summary"]
    materialize(fn(spark, SF_DIR))

    for name in names:
        fn, _ = QUERIES[name]
        samples = []
        for i in range(REPEATS):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            t0 = time.time()
            materialize(fn(spark, SF_DIR))
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(f"{name:28s} {samples}", flush=True)
        if EXPLAIN_DIR:
            os.makedirs(EXPLAIN_DIR, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, SF_DIR).explain("formatted")
            with open(os.path.join(EXPLAIN_DIR, f"{name}{SUFFIX}.txt"),
                      "w") as fh:
                fh.write(buf.getvalue())
    spark.stop()


if __name__ == "__main__":
    main()
