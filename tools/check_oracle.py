#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` at sf0.01 on Spark
and its ``oracle_sql()`` on DuckDB over the same parquet views, then compares
row count, column-name set, and an order-insensitive value hash (columns
sorted by name, rows sorted by string representation).  Floats are normalized
via repr (bit-exact comparison — the queries are designed to be bit-identical
across engines) with a secondary 1e-9-relative comparison reported for
diagnosis when the exact hash mismatches.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 12))
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def frame_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(norm_val(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    import duckdb

    import __spark_entry__ as entry
    from nominatim_spark.session import get_spark

    spark = get_spark("check_oracle", cpus=8, shuffle_partitions=8)
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {ex}")
            failures.append(name)
            continue
        spark_t = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"weak  {name}: rows={len(srows)} (no oracle) [{spark_t:.1f}s]")
            continue
        try:
            res = duck.execute(sql)
            dcols = [c[0] for c in res.description]
            drows = res.fetchall()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures.append(name)
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema {sorted(scols)} != {sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rows {len(srows)} != {len(drows)}")
        if not problems:
            sh, dh = frame_hash(srows, scols), frame_hash(drows, dcols)
            if sh != dh:
                problems.append("value-hash mismatch")
                sset = {tuple(norm_val(v) for v in r) for r in srows}
                dset = {tuple(norm_val(v) for v in r) for r in drows}
                only_s = list(sset - dset)[:3]
                only_d = list(dset - sset)[:3]
                problems.append(f"spark-only={only_s} duck-only={only_d}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} [{spark_t:.1f}s]")
            failures.append(name)
        else:
            print(f"ok    {name}: rows={len(srows)} hash match [{spark_t:.1f}s]")

    print(f"\n{len(queries) - len(failures)}/{len(queries)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
