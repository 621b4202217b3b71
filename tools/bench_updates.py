#!/usr/bin/env python
"""Two-size incremental-update bench: is diff replay's cost independent
of the standing-index size?

Builds the synthetic index at a small and a ~10x scale, applies the SAME
single-house diff to both, and times apply_place_updates end-to-end
(materializing the merged search_name).  With diff-proportional
re-parenting (assign_parents(points=...)) the wall time should be nearly
flat across index sizes; before round 3 every micro-batch re-parented
the whole universe.

Prints one JSON line:
  {"small_places": N, "big_places": M, "small_sec": s, "big_sec": s,
   "ratio": big/small}
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import pandas as pd  # noqa: E402

from nominatim_spark import get_spark  # noqa: E402
from nominatim_spark.geometry.wkb import point_wkb  # noqa: E402
from nominatim_spark.plans.flagship import build_synth_index  # noqa: E402
from nominatim_spark.sources import synth  # noqa: E402
from nominatim_spark.sources.synth import PLACE_SCHEMA  # noqa: E402
from nominatim_spark.streaming.updates import apply_place_updates  # noqa: E402

SMALL = dict(n_cities=4, n_streets=6, n_houses=6, n_pois=2)
BIG = dict(n_cities=16, n_streets=12, n_houses=20, n_pois=5)


def _diff(spark):
    cx, cy = synth.city_center(0)
    y = cy - 0.1  # street 0 of city 0
    rows = [{
        "osm_type": "N", "osm_id": 9200001, "class": "building",
        "type": "yes", "admin_level": None, "name": {},
        "address": {"housenumber": "991",
                    "street": synth.street_name(0, 0)},
        "extratags": {}, "geometry": point_wkb(cx + 0.011, y + 0.0005),
        "categories": None,
    }]
    pdf = pd.DataFrame(rows)
    pdf["admin_level"] = pd.Series([None], dtype=object)
    return spark.createDataFrame(pdf, schema=PLACE_SCHEMA)


def run_one(spark, scale):
    with tempfile.TemporaryDirectory() as ckpt:
        idx, _ = build_synth_index(spark, ckpt_root=ckpt, **scale)
        n_places = idx.placex.persist().count()
        idx.search_name.persist().count()
        idx.word.persist().count()
        diff = _diff(spark)
        # warm: run once so codegen/JIT does not pollute the comparison,
        # then time a fresh run
        apply_place_updates(spark, idx, diff).search_name.count()
        t0 = time.time()
        idx2 = apply_place_updates(spark, idx, diff)
        idx2.search_name.count()
        wall = time.time() - t0
        return n_places, wall


def main():
    spark = get_spark(cpus=8, shuffle_partitions=8)
    n_small, t_small = run_one(spark, SMALL)
    n_big, t_big = run_one(spark, BIG)
    print(json.dumps({
        "small_places": n_small, "big_places": n_big,
        "small_sec": round(t_small, 3), "big_sec": round(t_big, 3),
        "ratio": round(t_big / t_small, 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
