"""Explicit skew handling: salted aggregations and salted joins.

Geospatial web data is pathologically skewed — ~30% of the synthetic pages
(and real crawls) reference one hot city cell, and at planet scale single
res-7 cells over Manhattan hold orders of magnitude more points than rural
cells.  The engine's first line of defense is structural (broadcast the
polygon/dictionary side, so the hot key never shuffles) and AQE's runtime
skew-join splitting; this module provides the explicit third line for the
cases those don't cover:

* :func:`salted_aggregate` — two-phase aggregation: groupBy(key, salt)
  partial -> groupBy(key) merge.  Matters for holistic aggregates
  (collect_list/collect_set) where Spark's map-side partial agg can't help
  and a hot key lands on one reducer.
* :func:`salted_join` — replicate the small side n_salt times, split the
  big side's hot keys across salt buckets by deterministic hash; the join
  becomes (key, salt) equi-join with bounded per-task fan-in.

Salt assignment is ``pmod(xxhash64(row-unique column), n_salt)`` —
deterministic (no rand(), re-runs and retries produce identical
partitioning; rand() would break resumability and the byte-identity
invariants).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def with_salt(df: DataFrame, unique_col: str, n_salt: int,
              out: str = "_salt") -> DataFrame:
    return df.withColumn(
        out, F.pmod(F.xxhash64(unique_col), F.lit(n_salt)).cast("int")
    )


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    *,
    unique_col: str,
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``: name -> (partial_agg_expr, merge_agg_expr) where the partial
    runs per (keys, salt) and the merge combines partials per keys, e.g.
    ``{"cnt": (F.count(F.lit(1)), F.sum("cnt"))}`` or
    ``{"ids": (F.collect_list("id"), F.flatten(F.collect_list("ids")))}``.
    """
    partial = (
        with_salt(df, unique_col, n_salt)
        .groupBy(*keys, "_salt")
        .agg(*[expr.alias(name) for name, (expr, _m) in aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_p, merge) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    *,
    unique_col: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: big side salted by hash, small side replicated.

    Use when the small side is too large to broadcast but the big side has
    hot join keys (city cells, stop-word tokens).  Per-task fan-in for a
    hot key drops from |big_hot| to |big_hot| / n_salt.
    """
    big_s = with_salt(big, unique_col, n_salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.expr(f"sequence(0, {n_salt - 1})"))
    )
    joined = big_s.join(small_s, [key, "_salt"], how)
    return joined.drop("_salt")
