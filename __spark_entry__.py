"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the correctness-gate registry (one entry per
implemented operator family from SURVEY.md §2, implemented in
``nominatim_spark/plans/gate.py``; DuckDB oracles alongside).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pages -> extraction -> batch geocode (driver checks rows>0)."""
    from nominatim_spark.plans.gate import QUERIES

    fn, _ = QUERIES["geocode_pages_e2e"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from nominatim_spark.plans.gate import QUERIES

    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, same aliases as queries()."""
    from nominatim_spark.plans.gate import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
