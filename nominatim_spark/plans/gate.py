"""Driver-facing correctness-gate queries with DuckDB oracles.

Each entry implements one operator family from SURVEY.md §2 using the
engine's real machinery on the Spark side (cell encoding UDFs, cover joins,
ring-expansion kNN, posting-table semijoins, fixed-point centroids,
minhash/LSH dedup ...), paired with a plain ANSI-SQL oracle that DuckDB runs
over the same parquet views.  The driver compares row count + schema +
order-insensitive value hash, so:

* every computed column is aliased identically on both sides;
* float aggregation is done in DECIMAL (exact, order-independent) and cast
  to DOUBLE only for output;
* coordinates/geometry are derived arithmetically (see synthgeo.py) so both
  engines see bit-identical doubles.

Registry: :data:`QUERIES` maps name -> (spark_callable, oracle_sql | None).
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nominatim_spark import grid
from nominatim_spark.geometry.wkb import box_wkb
from nominatim_spark.operators.spatial import (
    knn_join, point_in_polygon_join, point_in_polygon_join_dist)
from nominatim_spark.plans import synthgeo as sg

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _input_bytes(spark: SparkSession, path: str) -> int | None:
    """Total bytes under ``path`` via the Hadoop FS API (works for any
    supported filesystem, ~1 ms for local paths)."""
    try:
        jvm = spark._jvm
        hp = jvm.org.apache.hadoop.fs.Path(path)
        fs = hp.getFileSystem(spark._jsc.hadoopConfiguration())
        return int(fs.getContentSummary(hp).getLength())
    except Exception:  # noqa: BLE001 — unknown FS/missing path: skip fan-out
        return None


# fan-out only inputs big enough that serial per-row work matters; tiny
# inputs are cheaper scanned as-is (the repartition exchange + its AQE
# stage cost more than the serial work they spread — measured A/B,
# tools/ab_fanout.py).  Above the cap the natural splits already occupy
# the cluster well enough that shuffling the whole input to gain the
# last factor of parallelism costs more than it saves.
_FAN_OUT_MIN_BYTES = 256 * 1024
_FAN_OUT_MAX_BYTES = 256 * 1024 * 1024


def load(spark: SparkSession, sf_dir: str, name: str,
         fan_out: bool = False, min_bytes: int = _FAN_OUT_MIN_BYTES,
         ) -> DataFrame:
    """Read a testdata table; optionally fan out an unsplittable scan.

    The driver's tables are single-file single-row-group parquet — an
    UNSPLITTABLE input: the scan yields one task regardless of
    ``maxPartitionBytes``, so every per-row operator fused into the scan
    stage (tokenize+explode, partial aggregation, pandas UDFs) runs
    serially on one core.  Guide §2.5 ("input skew: one huge
    unsplittable file ... repartition immediately after the read"): with
    ``fan_out=True``, when the scan would produce fewer splits than the
    cluster has cores, a round-robin repartition immediately after the
    read spreads the per-row work across all cores for the price of
    shuffling an input that is by definition small.  Opt-in per query:
    the interleaved A/B (tools/ab_fanout.py) shows the extra exchange
    LOSES wherever per-row work is light, and wins only for the
    regex-tokenization scans.  At production scale the split condition
    is false (millions of splits) and this is a no-op either way — the
    decision derives from the measured input size, not a local[32] tune.
    """
    import os

    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if not fan_out or os.environ.get("SPARK_GRAFT_FANOUT", "1") == "0":
        return df
    nbytes = _input_bytes(spark, path)
    if nbytes is None or not (min_bytes <= nbytes <= _FAN_OUT_MAX_BYTES):
        return df
    try:
        max_split = int(spark.conf.get("spark.sql.files.maxPartitionBytes"))
    except ValueError:  # byte-string form ("128m") — parse via the JVM util
        max_split = int(
            spark._jvm.org.apache.spark.network.util.JavaUtils
            .byteStringAsBytes(
                spark.conf.get("spark.sql.files.maxPartitionBytes"))
        )
    par = spark.sparkContext.defaultParallelism
    est_splits = max(1, -(-nbytes // max_split))
    if est_splits < par:
        return df.repartition(par)
    return df


# ---------------------------------------------------------------- relational

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped scan+agg baseline (SURVEY §2.4 A-agg analog).

    Filter pushes to the parquet scan; aggregation is map-side partial.
    DECIMAL sums keep the result order-independent and oracle-exact.
    """
    # fan-out crossover at 32 MB: below it (sf0.1's 11 MB) the interleaved
    # A/B picked the plain serial scan — the agg is cheap enough that the
    # repartition exchange loses; one SF up the serial decimal aggregation
    # dominates and the fan-out wins
    li = load(spark, sf_dir, "lineitem", fan_out=True,
              min_bytes=32 * 1024 * 1024)
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(20,4)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(24,6)")).cast("double").alias("sum_base_price"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(24,6)")
            ).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + group + deterministic top-k (J4 + T1 pattern)."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    li = load(spark, sf_dir, "lineitem", fan_out=True,
              min_bytes=32 * 1024 * 1024)
    rev = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(24,6)")
            ).alias("rev_dec")
        )
    )
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(rev, orders.o_orderkey == rev.l_orderkey)
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(
            F.col("o_orderkey"),
            F.col("c_custkey"),
            F.col("rev_dec").cast("double").alias("revenue"),
        )
        .orderBy(F.col("rev_dec").desc(), F.col("o_orderkey"))
        .limit(10)
    )


Q_TOP_ORDERS_SQL = """
WITH rev AS (
  SELECT l_orderkey, SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,6))) AS rev_dec
  FROM lineitem GROUP BY l_orderkey
)
SELECT o_orderkey, c_custkey, CAST(rev_dec AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey JOIN rev ON o_orderkey = rev.l_orderkey
WHERE o_orderpriority = '1-URGENT'
ORDER BY rev_dec DESC, o_orderkey LIMIT 10
"""


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no URGENT order — left_anti (P4 exclusion / U5)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


Q_ANTI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with at least one 'F' order — left_semi (J15 EXISTS)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey"
    )


Q_SEMI_SQL = """
SELECT c_custkey FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
"""


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-k per group (W4: row_number over partition, LIMIT 1-per-set)."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
        .select("o_orderpriority", "o_orderkey", "rk")
    )


Q_TOPK_SQL = """
SELECT o_orderpriority, o_orderkey, rk FROM (
  SELECT o_orderpriority, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders) t
WHERE rk <= 5
"""


def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling-window aggregation over the events table.

    Batch form of the streaming windowed agg (SURVEY §2.9); bucket is epoch
    arithmetic so the oracle matches bit-for-bit.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.withColumn("bucket", (F.unix_timestamp("ts") / 300).cast("long") * 300)
        .groupBy("bucket", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(24,6)")).cast("double").alias("sum_value"),
        )
    )


Q_EVENTS_SQL = """
SELECT CAST(FLOOR(epoch(ts) / 300) AS BIGINT) * 300 AS bucket, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization over the events stream (§2.9 companion —
    the batch form of session windows: a >30-minute silence starts a new
    session).  lag window + cumulative sum of boundaries; per session:
    event count, span seconds."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact epoch arithmetic: both engines carry the same
    # int64 micros, so boundaries and spans are bit-identical
    sess = (
        ev.withColumn("_prev", F.lag("ts").over(w))
        .withColumn(
            "_new",
            (F.col("_prev").isNull()
             | (F.expr("unix_micros(CAST(ts AS TIMESTAMP)) - unix_micros(CAST(_prev AS TIMESTAMP))")
                > 1800 * 1_000_000)).cast("int"),
        )
        .withColumn("session_seq", F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ))
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("unix_micros(CAST(MAX(ts) AS TIMESTAMP))"
               " - unix_micros(CAST(MIN(ts) AS TIMESTAMP))").alias("span_us"),
    )


Q_SESSIONIZE_SQL = """
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS session_seq
  FROM marked
)
SELECT user_id, session_seq, COUNT(*) AS n_events,
       CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS span_us
FROM sess GROUP BY user_id, session_seq
"""


# ------------------------------------------------------------------- spatial

_CELL_RES = 5


def q_cell_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-cell assignment through the engine's vectorized pandas-UDF path.

    The oracle recomputes the cell id with the pure-SQL formula — proving the
    numpy kernel (grid.py encode) is bit-identical to the declared grid.
    """
    
    @F.pandas_udf(T.LongType())
    def cell_udf(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(grid.encode(lon.to_numpy(), lat.to_numpy(), _CELL_RES))

    pts = load(spark, sf_dir, "customer").selectExpr(
        "c_custkey", f"{sg.CUST_LON} AS lon", f"{sg.CUST_LAT} AS lat"
    )
    return (
        pts.withColumn("cell", cell_udf("lon", "lat"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )


Q_CELL_SQL = f"""
WITH pts AS ({sg.customer_points_sql()})
SELECT {grid.encode_sql('lon', 'lat', _CELL_RES)} AS cell, COUNT(*) AS n_points
FROM pts GROUP BY 1
"""


def q_pip_cover_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon via cell cover-join + exact WKB recheck (J5/J7).

    Spark side: nation rectangles become real WKB polygons, exploded into
    covering cells, broadcast, equi-joined on cell, then rechecked with the
    vectorized ray-cast kernel.  Oracle: plain BETWEEN containment.
    """
    nat = load(spark, sf_dir, "nation").selectExpr(
        "n_nationkey",
        f"{sg.NATION_LON0} AS lon0",
        f"{sg.NATION_LAT0} AS lat0",
    ).toPandas()
    # Spark parses decimal literals as DECIMAL — coerce to float for WKB
    nat["wkb"] = [
        box_wkb(float(r.lon0), float(r.lat0),
                float(r.lon0) + sg.NATION_W, float(r.lat0) + sg.NATION_H)
        for r in nat.itertuples()
    ]
    polys = nat[["n_nationkey", "wkb"]]

    pts = load(spark, sf_dir, "customer").selectExpr(
        "c_custkey", f"{sg.CUST_LON} AS lon", f"{sg.CUST_LAT} AS lat"
    )
    joined = point_in_polygon_join(
        pts, polys, poly_key="n_nationkey", wkb_col="wkb", res=0
    )
    # pandas round-trip widened the key; restore the table's native int32
    return joined.select(F.col("n_nationkey").cast("int"), "c_custkey")


Q_PIP_SQL = f"""
WITH pts AS ({sg.customer_points_sql()}),
     rects AS ({sg.nation_rects_sql()})
SELECT n_nationkey, c_custkey
FROM rects JOIN pts
  ON pts.lon BETWEEN rects.lon0 AND rects.lon1
 AND pts.lat BETWEEN rects.lat0 AND rects.lat1
"""


def q_knn_reverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-place lookup by iterative cell-ring expansion (J6 kNN).

    Each supplier probe point finds its nearest customer point; the oracle
    is the exhaustive cross-join + window-min.  Proves the expansion
    terminates with the true nearest neighbor.
    """
    probes = load(spark, sf_dir, "supplier").selectExpr(
        "s_suppkey", f"{sg.SUPP_LON} AS lon", f"{sg.SUPP_LAT} AS lat"
    )
    cands = load(spark, sf_dir, "customer").selectExpr(
        "c_custkey", f"{sg.CUST_LON} AS lon", f"{sg.CUST_LAT} AS lat"
    )
    out = knn_join(
        probes, cands, res=0, point_key="s_suppkey", cand_key="c_custkey"
    )
    return out.select("s_suppkey", "c_custkey")


Q_KNN_SQL = f"""
WITH probes AS ({sg.supplier_points_sql()}),
     cands AS ({sg.customer_points_sql()}),
     d AS (
       SELECT s_suppkey, c_custkey,
              (probes.lon - cands.lon) * (probes.lon - cands.lon)
            + (probes.lat - cands.lat) * (probes.lat - cands.lat) AS dist2
       FROM probes CROSS JOIN cands)
SELECT s_suppkey, c_custkey FROM (
  SELECT s_suppkey, c_custkey,
         ROW_NUMBER() OVER (PARTITION BY s_suppkey ORDER BY dist2, c_custkey) AS rn
  FROM d) t
WHERE rn = 1
"""


def q_interpolation_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Housenumber interpolation expansion (W3/J13 arithmetic,
    interpolation.sql:196-374): way -> all housenumbers on it."""
    ways = load(spark, sf_dir, "orders").filter(F.expr(sg.WAY_FILTER)).selectExpr(
        "o_orderkey AS way_id",
        f"{sg.WAY_START} AS startnumber",
        f"{sg.WAY_END} AS endnumber",
    )
    return ways.select(
        "way_id",
        F.explode(F.expr("sequence(startnumber, endnumber, 2)")).alias("hnr"),
    )


Q_INTERP_SQL = f"""
WITH ways AS ({sg.interpolation_ways_sql()})
SELECT way_id, CAST(u.hnr AS BIGINT) AS hnr
FROM ways, LATERAL unnest(generate_series(startnumber, endnumber, 2)) AS u(hnr)
"""


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range + step-mod theta join (J13: n BETWEEN start AND end AND
    (n-start) % step = 0), re-expressed as an exact-key equi-join.

    Interval spans here are short (<= 12), so each way explodes into its
    concrete valid housenumbers and the theta join becomes a plain
    equi-join on the number — the 1-D analog of the cell cover-join, and
    the same expansion the reference materializes for interpolations.  For
    wide intervals the engine would switch to coarse bucketing; expansion
    keeps the intermediate at |ways| * span/step instead of
    |queries| * |ways-per-bucket| (measured 9s -> <1s at sf0.1).
    """
    ways = load(spark, sf_dir, "orders").filter(F.expr(sg.WAY_FILTER)).selectExpr(
        "o_orderkey AS way_id",
        f"{sg.WAY_START} AS startnumber",
        f"{sg.WAY_END} AS endnumber",
    )
    expanded = ways.select(
        "way_id",
        F.explode(F.expr("sequence(startnumber, endnumber, 2)")).alias("hnr"),
    )
    # pre-aggregate the probe side by join key BEFORE the join: the output
    # aggregates are distributive over hnr, so the ~20M raw (way, query)
    # matches never materialize — Catalyst does not push aggregations
    # through joins, this restructuring is the engine's job (6.9s -> ~1s)
    qs = (
        load(spark, sf_dir, "lineitem")
        .filter("l_linenumber = 1")
        .selectExpr("l_orderkey % 61 AS hnr")
        .groupBy("hnr")
        .agg(F.count(F.lit(1)).alias("q_cnt"))
    )
    matched = expanded.join(F.broadcast(qs), "hnr")
    return matched.groupBy("way_id").agg(
        F.sum("q_cnt").alias("n_matches"),
        F.count(F.lit(1)).alias("n_distinct_hnr"),
    )


Q_INTERVAL_SQL = f"""
WITH ways AS ({sg.interpolation_ways_sql()}),
     qs AS (SELECT l_orderkey, CAST(l_orderkey % 61 AS INT) AS hnr
            FROM lineitem WHERE l_linenumber = 1)
SELECT way_id, COUNT(*) AS n_matches, COUNT(DISTINCT hnr) AS n_distinct_hnr
FROM ways JOIN qs
  ON qs.hnr BETWEEN ways.startnumber AND ways.endnumber
 AND (qs.hnr - ways.startnumber) % 2 = 0
GROUP BY way_id
"""


def q_centroid_fixedpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-digit fixed-point centroid aggregation (A3 — the reference's
    PointsCentroid, utils/centroid.py:14-48): integer mean of
    round(coord * 1e7), exactly reproducible in any engine."""
    pts = load(spark, sf_dir, "customer").selectExpr(
        "c_custkey", "c_nationkey", f"{sg.CUST_LON} AS lon", f"{sg.CUST_LAT} AS lat"
    )
    # integer (floor) division keeps both engines exact; coords are shifted
    # positive so floor == trunc everywhere
    return (
        pts.groupBy("c_nationkey")
        .agg(
            F.sum(F.expr("CAST(ROUND((lon + 180.0) * 1e7) AS BIGINT)")).alias("sx"),
            F.sum(F.expr("CAST(ROUND((lat + 90.0) * 1e7) AS BIGINT)")).alias("sy"),
            F.count(F.lit(1)).alias("n"),
        )
        .selectExpr("c_nationkey", "sx DIV n AS cx_fp", "sy DIV n AS cy_fp", "n")
    )


Q_CENTROID_SQL = f"""
WITH pts AS (SELECT c_custkey, c_nationkey, {sg.CUST_LON} AS lon, {sg.CUST_LAT} AS lat FROM customer)
SELECT c_nationkey,
       CAST(SUM(CAST(ROUND((lon + 180.0) * 1e7) AS BIGINT)) // COUNT(*) AS BIGINT) AS cx_fp,
       CAST(SUM(CAST(ROUND((lat + 90.0) * 1e7) AS BIGINT)) // COUNT(*) AS BIGINT) AS cy_fp,
       COUNT(*) AS n
FROM pts GROUP BY c_nationkey
"""


# ----------------------------------------------------- tokens / text / dedup

_TOKENIZE = "filter(split(regexp_replace(lower(text), '[^a-z ]+', ' '), ' '), w -> w <> '')"
_DUCK_TOKENIZE = (
    "list_filter(string_split(regexp_replace(lower(text), '[^a-z ]+', ' ', 'g'), ' '), "
    "w -> w <> '')"
)


def q_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-frequency statistics (A1 — icu_tokenizer word stats,
    explode + groupBy + deterministic top-100)."""
    docs = load(spark, sf_dir, "documents", fan_out=True)
    return (
        docs.select(F.explode(F.expr(_TOKENIZE)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word"))
        .limit(100)
    )


Q_WORD_FREQ_SQL = f"""
SELECT w AS word, COUNT(*) AS cnt
FROM documents, LATERAL unnest({_DUCK_TOKENIZE}) AS t(w)
GROUP BY w ORDER BY cnt DESC, word LIMIT 100
"""

_LOOKUP_ALL = ("key", "scan", "merge")
_LOOKUP_ANY = ("vector", "stream", "sketch")


def q_lookup_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LookupAll token semijoin (J1 — name_vector @> tokens via GIN,
    db_search_lookups.py:22-57): explode posting rows, contains-ALL via
    count-distinct == n_tokens."""
    docs = load(spark, sf_dir, "documents")
    toks = list(_LOOKUP_ALL)
    posting = docs.select(
        "doc_id", F.explode(F.array_distinct(F.expr(_TOKENIZE))).alias("word")
    )
    return (
        posting.filter(F.col("word").isin(toks))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("nhit"))
        .filter(F.col("nhit") == len(toks))
        .select("doc_id")
    )


Q_LOOKUP_ALL_SQL = f"""
SELECT doc_id FROM (
  SELECT doc_id, COUNT(DISTINCT w) AS nhit
  FROM documents, LATERAL unnest({_DUCK_TOKENIZE}) AS t(w)
  WHERE w IN {_LOOKUP_ALL!r}
  GROUP BY doc_id) s
WHERE nhit = {len(_LOOKUP_ALL)}
"""


def q_lookup_any(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LookupAny token semijoin (J2 — name_vector && tokens): posting join
    + dropDuplicates."""
    docs = load(spark, sf_dir, "documents")
    posting = docs.select("doc_id", F.explode(F.expr(_TOKENIZE)).alias("word"))
    return (
        posting.filter(F.col("word").isin(list(_LOOKUP_ANY)))
        .select("doc_id")
        .dropDuplicates()
    )


Q_LOOKUP_ANY_SQL = f"""
SELECT DISTINCT doc_id
FROM documents, LATERAL unnest({_DUCK_TOKENIZE}) AS t(w)
WHERE w IN {_LOOKUP_ANY!r}
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-duplicate grouping by content hash (training-data dedup,
    hash-groupBy flavor): docs sharing a 40-char prefix hash, with the
    group's canonical (min) doc_id."""
    docs = load(spark, sf_dir, "documents")
    hashed = docs.select(
        "doc_id", F.md5(F.expr("substr(text, 1, 40)")).alias("h")
    )
    w = Window.partitionBy("h")
    return (
        hashed.withColumn("canonical_id", F.min("doc_id").over(w))
        .withColumn("group_size", F.count(F.lit(1)).over(w))
        .filter(F.col("group_size") > 1)
        .select("doc_id", "canonical_id", "group_size")
    )


Q_DEDUP_SQL = """
SELECT doc_id, canonical_id, group_size FROM (
  SELECT doc_id,
         MIN(doc_id) OVER (PARTITION BY md5(substr(text, 1, 40))) AS canonical_id,
         COUNT(*) OVER (PARTITION BY md5(substr(text, 1, 40))) AS group_size
  FROM documents) t
WHERE group_size > 1
"""


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs (training-data near-dedup).

    Character 12-gram shingles at stride 7; per-doc minhash = lexicographic
    min of md5(seed:shingle) per seed (portable across engines); two bands
    of two hashes; candidate pair = same band value, doc_a < doc_b.
    """
    # shingle generation + 4 md5 per shingle is the heaviest per-row work
    # in the headline set: fan the scan out once the document table grows
    # past the measured crossover (plain wins at sf0.1's 0.6 MB)
    docs = load(spark, sf_dir, "documents", fan_out=True,
                min_bytes=2 * 1024 * 1024)
    sh = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(length(text) - 11, 1), 7), "
                "i -> substr(text, i, 12))"
            )
        ).alias("shingle"),
    )
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("shingle")))).alias(f"h{s}")
            for s in (1, 2, 3, 4)
        ]
    )
    b1 = sig.select("doc_id", F.concat("h1", "h2").alias("band"))
    b2 = sig.select("doc_id", F.concat("h3", "h4").alias("band"))
    bands = b1.unionByName(b2)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates()
    )


Q_MINHASH_SQL = """
WITH sh AS (
  SELECT doc_id, substr(text, CAST(u.i AS INT), 12) AS shingle
  FROM documents, LATERAL unnest(generate_series(1, greatest(length(text) - 11, 1), 7)) AS u(i)
), sig AS (
  SELECT doc_id,
         MIN(md5('1:' || shingle)) AS h1, MIN(md5('2:' || shingle)) AS h2,
         MIN(md5('3:' || shingle)) AS h3, MIN(md5('4:' || shingle)) AS h4
  FROM sh GROUP BY doc_id
), bands AS (
  SELECT doc_id, h1 || h2 AS band FROM sig
  UNION ALL
  SELECT doc_id, h3 || h4 AS band FROM sig
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
"""


def q_embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k ANN baseline over the embeddings table.

    Query vector = embedding of vec_id 0; sequential-fold double dot
    product; ranking on ROUND(cos, 6) so both engines cut the same top-10.
    """
    emb = load(spark, sf_dir, "embeddings")
    qvec = emb.filter("vec_id = 0").select("embedding").head()[0]
    qlit = F.array(*[F.lit(float(v)) for v in qvec])
    dot = F.expr(
        "aggregate(zip_with(embedding, qv, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    norm = F.expr(
        "sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
    )
    qnorm = F.expr(
        "sqrt(aggregate(transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
    )
    return (
        emb.filter("vec_id <> 0")
        .withColumn("qv", qlit)
        .withColumn("cos_r", F.round(dot / (norm * qnorm), 6))
        .orderBy(F.col("cos_r").desc(), F.col("vec_id"))
        .limit(10)
        .select("vec_id", "cos_r")
    )


Q_EMBED_SQL = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
     scored AS (
  SELECT vec_id,
         ROUND(
           list_sum(list_transform(list_zip(e.embedding, q.qv),
                    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
           6) AS cos_r
  FROM embeddings e CROSS JOIN q
  WHERE vec_id <> 0)
SELECT vec_id, cos_r FROM scored ORDER BY cos_r DESC, vec_id LIMIT 10
"""


# --------------------------------------------- text analysis & dedup (batch 2)

_DUCK_TOKS = (
    "list_filter(string_split(regexp_replace(lower(text), '[^a-z0-9 ]+', ' ', 'g'), ' '), "
    "w -> w <> '')"
)


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-analysis bundle: token stats + quality + language-ID +
    rolling-hash fingerprint (operators/textstats.py), all JVM-side."""
    from nominatim_spark.operators import textstats as ts

    docs = load(spark, sf_dir, "documents")
    out = ts.with_token_stats(docs)
    out = ts.with_quality_score(out)
    out = ts.with_lang_id(out)
    out = ts.with_fingerprint(out)
    return out.select(
        "doc_id", "n_tokens", "digit_ratio", "punct_ratio",
        "quality", "lang_pred", "fingerprint",
    )


def _duck_hits(lang_words: list[str]) -> str:
    arr = "[" + ", ".join(f"'{w}'" for w in lang_words) + "]"
    return f"len(list_intersect(list_distinct({_DUCK_TOKS}), {arr}))"


def _q_text_stats_sql() -> str:
    from nominatim_spark.operators.textstats import (
        FP_BASE, FP_MOD, HASH_HEX, LANG_STOPWORDS)

    hits = {l: _duck_hits(ws) for l, ws in LANG_STOPWORDS.items()}
    best = "greatest(" + ", ".join(f"h_{l}" for l in sorted(hits)) + ")"
    lang_case = "CASE " + " ".join(
        f"WHEN h_{l} = {best} AND {best} > 0 THEN '{l}'"
        for l in sorted(hits)
    ) + " ELSE 'und' END"
    return f"""
WITH t AS (
  SELECT doc_id, text, {_DUCK_TOKS} AS toks,
         {hits['en']} AS h_en, {hits['de']} AS h_de,
         {hits['fr']} AS h_fr, {hits['es']} AS h_es
  FROM documents)
SELECT doc_id,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  ROUND(length(regexp_replace(text, '[^0-9]', '', 'g'))
        / greatest(length(text), 1), 6) AS digit_ratio,
  ROUND(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
        / greatest(length(text), 1), 6) AS punct_ratio,
  ROUND(0.4 * least(len(toks) / 100.0, 1.0)
      + 0.3 * least(h_en / 5.0, 1.0)
      + 0.3 * (len(list_distinct(toks)) / greatest(len(toks), 1)), 6) AS quality,
  {lang_case} AS lang_pred,
  list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform(toks,
        w -> CAST('0x' || substr(md5(w), 1, {HASH_HEX}) AS BIGINT))),
    (acc, x) -> (acc * {FP_BASE} + x) % {FP_MOD}) AS fingerprint
FROM t
"""


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidate pairs (dedup family, operators/dedup.py)."""
    from nominatim_spark.operators.dedup import simhash_pairs

    return simhash_pairs(load(spark, sf_dir, "documents"), max_hamming=3)


def _q_simhash_sql() -> str:
    from nominatim_spark.operators.dedup import SIMHASH_BITS

    votes = ", ".join(
        f"SUM(((h >> {b}) & 1) * 2 - 1) AS v{b}" for b in range(SIMHASH_BITS)
    )
    sig = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, t.tok FROM documents,
         LATERAL unnest(list_distinct({_DUCK_TOKS})) AS t(tok)
), hashed AS (
  SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) AS h FROM toks
), votes AS (
  SELECT doc_id, {votes} FROM hashed GROUP BY doc_id
), sigs AS (
  SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM votes
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (dedup family)."""
    from nominatim_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        load(spark, sf_dir, "documents"), n=3, threshold=0.2
    )


Q_JACCARD_SQL = f"""
WITH sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(toks[CAST(u.i AS INT):CAST(u.i AS INT) + 2], ' ') AS shingle
  FROM (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents) t,
       LATERAL unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS u(i)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jacc
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE ROUND(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.2
"""


def q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (brute baseline; the LSH
    bucket variant is operators/dedup.embedding_lsh_buckets)."""
    from nominatim_spark.operators.dedup import embedding_neardup_pairs

    return embedding_neardup_pairs(
        load(spark, sf_dir, "embeddings"), threshold=0.3
    )


Q_EMBED_NEARDUP_SQL = """
WITH pairs AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
         ROUND(
           list_sum(list_transform(list_zip(a.embedding, b.embedding),
                    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
           6) AS cos_r
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
SELECT doc_a, doc_b, cos_r FROM pairs WHERE cos_r >= 0.3
"""


def q_simhash_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded SimHash pair join (the dedup scale path): per-band bucket
    equi-join + exact hamming verify.  The oracle is the BRUTE-force SQL —
    the pigeonhole band split (max_hamming+1 bands) makes the banded result
    provably identical, and this row proves it on real data."""
    from nominatim_spark.operators.dedup import simhash_pairs_banded

    return simhash_pairs_banded(load(spark, sf_dir, "documents"), max_hamming=3)


def q_embed_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded sign-LSH embedding near-dup (the ANN-dedup scale path) over
    the embeddings table augmented with rescaled copies (vec_id+100000,
    vector*2 — cosine exactly 1 with the original).  Scaling preserves
    every hyperplane-projection sign, so the planted duplicates are
    *provably* caught by the bucket join; the exact-cosine verify then
    matches the brute-force oracle bit-for-bit at threshold 0.99 (the
    synthetic embeddings' natural pairs top out at cos 0.513)."""
    from nominatim_spark.operators.dedup import embedding_neardup_lsh

    emb = load(spark, sf_dir, "embeddings")
    scaled = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.expr("transform(embedding, x -> x * CAST(2.0 AS FLOAT))")
        .alias("embedding"),
    )
    return embedding_neardup_lsh(
        emb.select("vec_id", "embedding").unionByName(scaled),
        threshold=0.99, n_planes=16, n_bands=2,
    )


Q_EMBED_LSH_SQL = """
WITH aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000,
         list_transform(embedding, x -> CAST(x * CAST(2.0 AS FLOAT) AS FLOAT))
  FROM embeddings
), pairs AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
         ROUND(
           list_sum(list_transform(list_zip(a.embedding, b.embedding),
                    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
           6) AS cos_r
  FROM aug a JOIN aug b ON a.vec_id < b.vec_id)
SELECT doc_a, doc_b, cos_r FROM pairs WHERE cos_r >= 0.99
"""


def q_ann_top1_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ANN: nearest neighbor for EVERY vector via the banded
    sign-LSH candidate join + exact cosine rerank (the IVF/LSH scale path
    for batch similarity search — one query vector per row, never an
    all-pairs product).  Over the augmented set (rescaled copies), each
    original's true nearest is its exact-direction copy, which the bucket
    join provably catches — so the LSH result equals the brute-force
    oracle."""
    from nominatim_spark.operators.dedup import embedding_neardup_lsh

    emb = load(spark, sf_dir, "embeddings")
    scaled = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.expr("transform(embedding, x -> x * CAST(2.0 AS FLOAT))")
        .alias("embedding"),
    )
    aug = emb.select("vec_id", "embedding").unionByName(scaled)
    pairs = embedding_neardup_lsh(
        aug, threshold=0.99, n_planes=16, n_bands=2
    )
    # symmetrize, then best neighbor per ORIGINAL vector
    sym = pairs.select("doc_a", "doc_b", "cos_r").unionByName(
        pairs.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"),
            "cos_r",
        )
    ).filter(F.col("doc_a") < 100000)
    w = Window.partitionBy("doc_a").orderBy(
        F.col("cos_r").desc(), F.col("doc_b")
    )
    return (
        sym.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .select(F.col("doc_a").alias("vec_id"),
                F.col("doc_b").alias("nn_id"), "cos_r")
    )


Q_ANN_TOP1_SQL = """
WITH aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 100000,
         list_transform(embedding, x -> CAST(x * CAST(2.0 AS FLOAT) AS FLOAT))
  FROM embeddings
), pairs AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
         ROUND(
           list_sum(list_transform(list_zip(a.embedding, b.embedding),
                    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
           6) AS cos_r
  FROM aug a JOIN aug b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < 100000 AND
        ROUND(
           list_sum(list_transform(list_zip(a.embedding, b.embedding),
                    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
           / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
           6) >= 0.99)
SELECT vec_id, nn_id, cos_r FROM (
  SELECT doc_a AS vec_id, doc_b AS nn_id, cos_r,
         ROW_NUMBER() OVER (PARTITION BY doc_a
                            ORDER BY cos_r DESC, doc_b) AS rn
  FROM pairs) t
WHERE rn = 1
"""


def q_pip_cover_join_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fully distributed point-in-polygon cover join (J5 at planet scale):
    polygon side stays a DataFrame, mapInPandas generates classified
    multi-tier cover cells (interior cells skip the exact recheck), points
    explode per tier and equi-join on cell.  Same oracle as pip_cover_join
    — proves the distributed path bit-equal to the broadcast path."""
    nat = load(spark, sf_dir, "nation").selectExpr(
        "CAST(n_nationkey AS BIGINT) AS n_nationkey",
        f"CAST({sg.NATION_LON0} AS DOUBLE) AS lon0",
        f"CAST({sg.NATION_LAT0} AS DOUBLE) AS lat0",
    )

    def mk_wkb(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "n_nationkey": pdf["n_nationkey"],
                "geometry": [
                    box_wkb(float(x), float(y),
                            float(x) + sg.NATION_W, float(y) + sg.NATION_H)
                    for x, y in zip(pdf["lon0"], pdf["lat0"])
                ],
            })

    polys = nat.mapInPandas(mk_wkb, schema="n_nationkey long, geometry binary")
    pts = load(spark, sf_dir, "customer").selectExpr(
        "c_custkey", f"{sg.CUST_LON} AS lon", f"{sg.CUST_LAT} AS lat"
    )
    joined = point_in_polygon_join_dist(
        pts, polys, poly_key="n_nationkey", res_tiers=(0, 4), limit=256,
    )
    return joined.select(F.col("n_nationkey").cast("int"), "c_custkey")


def q_near_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Category near-search (J18 — NearSearch, near_search.py:75-135):
    for each supplier anchor, the 3 nearest BUILDING-segment customers
    within 3 degrees, via the disk-cell cover equi-join + exact distance
    filter (never an all-pairs product).  Oracle: brute cross join."""
    from nominatim_spark.operators.spatial import within_distance_join

    anchors = load(spark, sf_dir, "supplier").selectExpr(
        "s_suppkey", f"{sg.SUPP_LON} AS lon", f"{sg.SUPP_LAT} AS lat"
    )
    cands = load(spark, sf_dir, "customer").filter(
        "c_mktsegment = 'BUILDING'"
    ).selectExpr(
        "c_custkey", f"{sg.CUST_LON} AS lon", f"{sg.CUST_LAT} AS lat"
    )
    hits = within_distance_join(
        anchors, cands, radius_deg=3.0, point_key="s_suppkey",
        cand_key="c_custkey",
    )
    w = Window.partitionBy("s_suppkey").orderBy("dist2", "c_custkey")
    return (
        hits.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("s_suppkey", "c_custkey", F.col("rnk").cast("int").alias("rnk"))
    )


Q_NEAR_CATEGORY_SQL = f"""
WITH anchors AS ({sg.supplier_points_sql()}),
     cands AS (
       SELECT c_custkey, {sg.CUST_LON} AS lon, {sg.CUST_LAT} AS lat
       FROM customer WHERE c_mktsegment = 'BUILDING'),
     d AS (
       SELECT s_suppkey, c_custkey,
              (anchors.lon - cands.lon) * (anchors.lon - cands.lon)
            + (anchors.lat - cands.lat) * (anchors.lat - cands.lat) AS dist2
       FROM anchors CROSS JOIN cands)
SELECT s_suppkey, c_custkey, rnk FROM (
  SELECT s_suppkey, c_custkey,
         CAST(ROW_NUMBER() OVER (PARTITION BY s_suppkey
                                 ORDER BY dist2, c_custkey) AS INT) AS rnk
  FROM d WHERE dist2 <= 9.0) t
WHERE rnk <= 3
"""


def q_window_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-plus-epsilon window pruning (W1 — first_value over ORDER BY,
    place_search.py:124-131): keep customers within 100 of their nation's
    best account balance."""
    cust = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey")
    return (
        cust.withColumn("best", F.max("c_acctbal").over(w))
        .filter(F.col("c_acctbal") >= F.col("best") - 100)
        .select("c_nationkey", "c_custkey", "c_acctbal")
    )


Q_WINDOW_PRUNE_SQL = """
SELECT c_nationkey, c_custkey, c_acctbal FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         MAX(c_acctbal) OVER (PARTITION BY c_nationkey) AS best
  FROM customer) t
WHERE c_acctbal >= best - 100
"""


def q_bbox_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometry-collect aggregation (A4 — ST_Collect -> bbox/centroid,
    reverse.py:583-597): per-nation bounding box of customer points."""
    pts = load(spark, sf_dir, "customer").selectExpr(
        "c_nationkey", f"{sg.CUST_LON} AS lon", f"{sg.CUST_LAT} AS lat"
    )
    # cast to DOUBLE: Spark's decimal-literal arithmetic would otherwise
    # surface DECIMAL strings ('-56.995000') vs DuckDB's ('-56.995')
    return pts.groupBy("c_nationkey").agg(
        F.min("lon").cast("double").alias("min_lon"),
        F.min("lat").cast("double").alias("min_lat"),
        F.max("lon").cast("double").alias("max_lon"),
        F.max("lat").cast("double").alias("max_lat"),
    )


Q_BBOX_SQL = f"""
WITH pts AS (SELECT c_nationkey, {sg.CUST_LON} AS lon, {sg.CUST_LAT} AS lat FROM customer)
SELECT c_nationkey, CAST(MIN(lon) AS DOUBLE) AS min_lon, CAST(MIN(lat) AS DOUBLE) AS min_lat,
       CAST(MAX(lon) AS DOUBLE) AS max_lon, CAST(MAX(lat) AS DOUBLE) AS max_lat
FROM pts GROUP BY c_nationkey
"""


def q_min_dist_penalty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-distance scalar-subquery penalty (J16 — postcode distance,
    place_search.py:152-158): per supplier, min squared distance to a
    same-nation customer, 2.0 default when none exists."""
    probes = load(spark, sf_dir, "supplier").selectExpr(
        "s_suppkey", "s_nationkey", f"{sg.SUPP_LON} AS slon", f"{sg.SUPP_LAT} AS slat"
    )
    cands = load(spark, sf_dir, "customer").selectExpr(
        "c_nationkey", f"{sg.CUST_LON} AS clon", f"{sg.CUST_LAT} AS clat"
    )
    d2 = (F.col("slon") - F.col("clon")) * (F.col("slon") - F.col("clon")) + (
        F.col("slat") - F.col("clat")
    ) * (F.col("slat") - F.col("clat"))
    mind = (
        probes.join(cands, probes.s_nationkey == cands.c_nationkey)
        .groupBy("s_suppkey")
        .agg(F.round(F.min(d2), 6).alias("min_d2"))
    )
    return probes.join(mind, "s_suppkey", "left").select(
        "s_suppkey", F.coalesce(F.col("min_d2"), F.lit(2.0)).alias("penalty")
    )


Q_MIN_DIST_SQL = f"""
WITH probes AS (SELECT s_suppkey, s_nationkey, {sg.SUPP_LON} AS slon, {sg.SUPP_LAT} AS slat FROM supplier),
     cands AS (SELECT c_nationkey, {sg.CUST_LON} AS clon, {sg.CUST_LAT} AS clat FROM customer),
     mind AS (
       SELECT s_suppkey, ROUND(MIN((slon - clon) * (slon - clon)
                             + (slat - clat) * (slat - clat)), 6) AS min_d2
       FROM probes JOIN cands ON s_nationkey = c_nationkey
       GROUP BY s_suppkey)
SELECT probes.s_suppkey, COALESCE(min_d2, 2.0) AS penalty
FROM probes LEFT JOIN mind ON probes.s_suppkey = mind.s_suppkey
"""


def q_array_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set-merge (U2 — array_merge dedup union, utils.sql:41-63):
    token set unioned with a constant vocabulary, distinct size."""
    docs = load(spark, sf_dir, "documents")
    vocab = F.array(*[F.lit(w) for w in ("spark", "query", "zeta", "omega")])
    toks = F.expr(_TOKENIZE)
    return docs.select(
        "doc_id",
        F.size(F.array_distinct(F.concat(toks, vocab))).cast("long").alias("n_merged"),
        F.size(F.array_intersect(F.array_distinct(toks), vocab)).cast("long").alias("n_common"),
    )


Q_ARRAY_MERGE_SQL = f"""
SELECT doc_id,
       CAST(len(list_distinct(list_concat({_DUCK_TOKS},
            ['spark', 'query', 'zeta', 'omega']))) AS BIGINT) AS n_merged,
       CAST(len(list_intersect(list_distinct({_DUCK_TOKS}),
            ['spark', 'query', 'zeta', 'omega'])) AS BIGINT) AS n_common
FROM documents
"""


def q_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-agg of candidate ids (A2 — ArrayAgg(place_id),
    address_search.py:51-52): per customer, sorted order ids."""
    orders = load(spark, sf_dir, "orders")
    # emit the sorted id list as a comma-joined string: the driver's
    # canonicalizer sorts result frames through pandas, which cannot hash
    # array cells (round-1 gate failure) — the aggregate itself (A2) is
    # unchanged, only the wire format is scalar.
    return orders.groupBy("o_custkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("o_orderkey")))
        .alias("order_ids"),
        F.count(F.lit(1)).alias("n_orders"),
    )


Q_COLLECT_SQL = """
SELECT o_custkey,
       list_aggregate(list_sort(list(o_orderkey)), 'string_agg', ',')
           AS order_ids,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_custkey
"""


# ------------------------------------------------- geocoding pipeline (weak)

def q_incremental_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diff-replay incremental index update (streaming/updates.py):
    build a small index, merge a 2-row diff (new house + new POI) plus a
    delete, geocode against the merged index.  Non-SQL-expressible —
    rows-only check; merge semantics are asserted in tests/test_updates.py.
    Expected rows: the new house resolves, the deleted POI is gone."""
    import pandas as pd

    from nominatim_spark.geometry.wkb import point_wkb
    from nominatim_spark.pipeline.search import geocode
    from nominatim_spark.plans.flagship import build_synth_index
    from nominatim_spark.sources import synth
    from nominatim_spark.streaming.updates import apply_place_updates

    idx, _ = build_synth_index(
        spark, n_cities=2, n_streets=2, n_houses=2, n_pois=1,
        ckpt_root="/tmp/nominatim_gate_upd_ckpt_v2", resume=True,
    )
    cx, cy = synth.city_center(0)
    y = cy - 0.1
    upd_pdf = pd.DataFrame([{
        "osm_type": "N", "osm_id": 9200001, "class": "building",
        "type": "yes", "admin_level": None, "name": {},
        "address": {"housenumber": "77", "street": synth.street_name(0, 0)},
        "extratags": {}, "geometry": point_wkb(cx + 0.02, y + 0.0004),
        "categories": None,
    }, {
        "osm_type": "N", "osm_id": 9200002, "class": "amenity",
        "type": "restaurant", "admin_level": None,
        "name": {"name": "Cafe Delta"}, "address": {},
        "extratags": {}, "geometry": point_wkb(cx + 0.03, cy + 0.02),
        "categories": None,
    }])
    upd_pdf["admin_level"] = pd.Series([None, None], dtype=object)
    updates = spark.createDataFrame(upd_pdf, schema=synth.PLACE_SCHEMA)
    deletes = spark.createDataFrame(
        [("N", 100000)], "osm_type string, osm_id long"
    )
    idx2 = apply_place_updates(spark, idx, updates, deletes=deletes)
    q = spark.createDataFrame(
        [("new_house", f"{synth.street_name(0, 0)} 77, {synth.city_name(0)}"),
         ("new_poi", f"Cafe Delta, {synth.city_name(0)}"),
         ("deleted", f"{synth.poi_name(0, 0)}, {synth.city_name(0)}")],
        "query_id string, qtext string",
    )
    return geocode(spark, idx2, q).select(
        "query_id", "osm_type", "osm_id", "class", "type", "housenumber"
    )


def q_geocode_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship end-to-end: synth pages -> extraction -> batch forward
    geocode against the engine-built index.  Non-SQL-expressible (full
    Nominatim index-build semantics) — driver records a rows-only check;
    row-for-row accuracy is asserted against ground truth in
    tests/test_pipeline.py::test_forward_geocode_accuracy."""
    from nominatim_spark.plans.flagship import geocode_pages

    res = geocode_pages(
        spark, n_pages=400, n_cities=4, n_streets=4, n_houses=4, n_pois=2
    )
    return res.select(
        "query_id", "url", "qtext", "osm_type", "osm_id", "class", "type",
        "rank_address", "housenumber", "lon", "lat",
    )


def q_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard pairs with the stop-shingle df-cap engaged (dedup family,
    scale path).  The oracle applies the same cap, proving the capped
    join equals the brute-force form wherever no shingle exceeds it."""
    from nominatim_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        load(spark, sf_dir, "documents"), n=3, threshold=0.2, max_df=500
    )


Q_JACCARD_CAPPED_SQL = f"""
WITH sh0 AS (
  SELECT DISTINCT doc_id,
         array_to_string(toks[CAST(u.i AS INT):CAST(u.i AS INT) + 2], ' ') AS shingle
  FROM (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents) t,
       LATERAL unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS u(i)
), sh AS (
  SELECT sh0.* FROM sh0
  JOIN (SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) <= 500) ok
  USING (shingle)
), sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) AS jacc
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE ROUND(n_inter / (sa.n_sh + sb.n_sh - n_inter), 6) >= 0.2
"""


def q_weigh_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """weigh_search ranking fold (F16/W-family — ranking.sql:327-345):
    each 'candidate' carries a sorted id vector; an ordered ranking list
    charges the first penalty whose token set the vector fully contains,
    else the default weight.  Vector = the order's distinct partkeys."""
    li = load(spark, sf_dir, "lineitem")
    vec = li.groupBy("l_orderkey").agg(
        F.array_sort(F.array_distinct(F.collect_list("l_partkey")))
        .alias("vec")
    )
    return vec.select(
        F.col("l_orderkey").alias("orderkey"),
        F.when(
            F.expr("array_contains(vec, 1L) AND array_contains(vec, 2L)"),
            F.lit(0.1),
        ).when(F.expr("array_contains(vec, 3L)"), F.lit(0.3))
        .otherwise(F.lit(0.5)).alias("penalty"),
    )


Q_WEIGH_SEARCH_SQL = """
SELECT l_orderkey AS orderkey,
       CASE WHEN list_contains(vec, 1) AND list_contains(vec, 2)
              THEN CAST(0.1 AS DOUBLE)
            WHEN list_contains(vec, 3) THEN CAST(0.3 AS DOUBLE)
            ELSE CAST(0.5 AS DOUBLE) END AS penalty
FROM (SELECT l_orderkey, list_distinct(list(l_partkey)) AS vec
      FROM lineitem GROUP BY 1)
"""


def q_addr_ladder_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-path address ranking ladder fold (F16/round-4 —
    db_search_builder.py:314-366 get_addr_ranking + weigh_search): each
    'candidate' carries a sorted id vector; a per-phrase LADDER of
    (penalty, id-set) entries charges the cheapest entry whose ids the
    vector fully contains, else the phrase default.  Same single-pass
    aggregate expression as pipeline/search.py's candidate fold.
    Ladder: whole phrase [1,2] at 0.0, single-word paths [1]/[2] at 0.1,
    default 0.4."""
    li = load(spark, sf_dir, "lineitem")
    vec = li.groupBy("l_orderkey").agg(
        F.array_sort(F.array_distinct(F.collect_list("l_partkey")))
        .alias("vec")
    )
    ladder = (
        "array(struct(CAST(0.4 AS DOUBLE) AS dflt, array("
        "struct(CAST(0.0 AS DOUBLE) AS pen, array(1L, 2L) AS ids), "
        "struct(CAST(0.1 AS DOUBLE) AS pen, array(1L) AS ids), "
        "struct(CAST(0.1 AS DOUBLE) AS pen, array(2L) AS ids)"
        ") AS entries))"
    )
    return vec.select(
        F.col("l_orderkey").alias("orderkey"),
        F.expr(
            f"aggregate({ladder}, 0.0D, (acc, ph) -> acc + "
            "aggregate(ph.entries, ph.dflt, (best, e) -> "
            "IF(e.pen < best AND forall(e.ids, i -> "
            "array_contains(vec, i)), e.pen, best)))"
        ).alias("penalty"),
    )


Q_ADDR_LADDER_SQL = """
SELECT l_orderkey AS orderkey,
       CASE WHEN list_contains(vec, 1) AND list_contains(vec, 2)
              THEN CAST(0.0 AS DOUBLE)
            WHEN list_contains(vec, 1) OR list_contains(vec, 2)
              THEN CAST(0.1 AS DOUBLE)
            ELSE CAST(0.4 AS DOUBLE) END AS penalty
FROM (SELECT l_orderkey, list_distinct(list(l_partkey)) AS vec
      FROM lineitem GROUP BY 1)
"""


def q_postcode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-country postcode normalization, JVM column-pattern path
    (F8/round-4 — postcodes.with_normalized_postcode: 161-row pattern
    dim join + rlike/regexp_replace with output templates).  Synthetic
    cc-prefixed values from customer phone digits: country 'de' rows
    conform (5 digits, prefix strips), country 'ad' rows do not (3-digit
    format) and normalize to NULL."""
    from nominatim_spark.pipeline.postcodes import with_normalized_postcode

    cust = load(spark, sf_dir, "customer")
    digits = F.lpad(((F.col("c_custkey") * 7919) % 100000)
                    .cast("string"), 5, "0")
    df = cust.select(
        F.col("c_custkey").alias("custkey"),
        F.when(F.col("c_custkey") % 2 == 0, "de").otherwise("ad")
        .alias("country_code"),
        F.concat(
            F.when(F.col("c_custkey") % 2 == 0, "DE-").otherwise("AD-"),
            digits,
        ).alias("raw_pc"),
    )
    return with_normalized_postcode(df, F.col("raw_pc")).select(
        "custkey", F.col("_pc_norm").alias("postcode"),
    )


Q_POSTCODE_NORM_SQL = r"""
SELECT c_custkey AS custkey,
       CASE WHEN c_custkey % 2 = 0
              AND NOT regexp_full_match(
                    lpad(CAST((c_custkey * 7919) % 100000 AS VARCHAR), 5, '0'),
                    '[0\- ]+')
            THEN lpad(CAST((c_custkey * 7919) % 100000 AS VARCHAR), 5, '0')
            ELSE NULL END AS postcode
FROM customer
"""


def q_reverse_geocode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reverse-geocode every page coordinate through the tiered cascade
    (kNN ring expansion -> PiP areas -> country)."""
    from nominatim_spark.plans.flagship import build_synth_index, reverse_pages
    from nominatim_spark.sources import synth

    idx, _ = build_synth_index(
        spark, n_cities=4, n_streets=4, n_houses=4, n_pois=2
    )
    pages = synth.pages_df(
        spark, n_pages=400, n_cities=4, n_streets=4, n_houses=4, n_pois=2
    )
    return reverse_pages(spark, idx, pages).select(
        "point_id", "place_id", "tier", "osm_type", "osm_id", "class",
        "rank_address", "country_code",
    )


# ------------------------------------------------------------------ registry

def q_locale_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accept-language display-name selection (the reference's Locales,
    localization.py:16-120): customers carry a synthetic multilingual
    name map; the Locales coalesce kernel — the SAME expression the API
    output path uses — picks per the caller's q-weighted priority list
    ('fr;q=0.8,de' -> de first, then fr, then the default tag)."""
    from nominatim_spark.pipeline.localization import Locales

    cust = load(spark, sf_dir, "customer")
    named = cust.withColumn(
        "name",
        F.expr(
            "map_filter(map("
            "'name', c_name, "
            "'name:de', CASE WHEN c_custkey % 3 = 0 "
            "THEN 'DE ' || c_name END, "
            "'_place_name:fr', CASE WHEN c_custkey % 5 = 0 "
            "THEN 'FR ' || c_name END"
            "), (k, v) -> v IS NOT NULL)"
        ),
    )
    loc = Locales.from_accept_languages("fr;q=0.8,de")
    return named.select(
        "c_custkey", loc.display_name_expr("name").alias("locale_name"))


Q_LOCALE_SQL = """
SELECT c_custkey,
       COALESCE(CASE WHEN c_custkey % 3 = 0 THEN 'DE ' || c_name END,
                CASE WHEN c_custkey % 5 = 0 THEN 'FR ' || c_name END,
                c_name) AS locale_name
FROM customer
"""


def q_geom_geojson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometry output serialization (polygon_geojson, v1/helpers.py:76-82
    / serialize.py): per-nation bbox ring -> polygon WKB -> the
    PRODUCTION GeoJSON serializer -> parsed ring coordinates.  The oracle
    computes the corner sequence independently, so a mismatch anywhere in
    the WKB build / serialize / parse round-trip surfaces."""
    import pandas as pd

    from nominatim_spark.geometry.serialize import serialize_wkb
    from nominatim_spark.geometry.wkb import polygon_wkb

    pts = load(spark, sf_dir, "customer").selectExpr(
        "c_nationkey", f"{sg.CUST_LON} AS lon", f"{sg.CUST_LAT} AS lat")
    boxes = pts.groupBy("c_nationkey").agg(
        F.round(F.min("lon"), 5).alias("minx"),
        F.round(F.min("lat"), 5).alias("miny"),
        F.round(F.max("lon"), 5).alias("maxx"),
        F.round(F.max("lat"), 5).alias("maxy"),
    )

    @F.pandas_udf("string")
    def to_gj(minx: pd.Series, miny: pd.Series, maxx: pd.Series,
              maxy: pd.Series) -> pd.Series:
        return pd.Series([
            serialize_wkb(polygon_wkb(
                [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]),
                "geojson")
            for x0, y0, x1, y1 in zip(minx, miny, maxx, maxy)
        ])

    parsed = boxes.withColumn(
        "_g",
        F.from_json(to_gj("minx", "miny", "maxx", "maxy"),
                    "type string, coordinates array<array<array<double>>>"),
    )
    return parsed.select(
        "c_nationkey",
        F.posexplode(F.col("_g.coordinates").getItem(0)),
    ).select(
        "c_nationkey", F.col("pos").alias("pt_idx"),
        F.col("col").getItem(0).alias("lon"),
        F.col("col").getItem(1).alias("lat"),
    )


Q_GEOM_SQL = f"""
WITH pts AS (
  SELECT c_nationkey, {sg.CUST_LON} AS lon, {sg.CUST_LAT} AS lat
  FROM customer),
b AS (
  SELECT c_nationkey,
         ROUND(MIN(lon), 5) AS minx, ROUND(MIN(lat), 5) AS miny,
         ROUND(MAX(lon), 5) AS maxx, ROUND(MAX(lat), 5) AS maxy
  FROM pts GROUP BY c_nationkey)
SELECT c_nationkey, i AS pt_idx,
       CASE i WHEN 0 THEN minx WHEN 1 THEN maxx WHEN 2 THEN maxx
              WHEN 3 THEN minx ELSE minx END AS lon,
       CASE i WHEN 0 THEN miny WHEN 1 THEN miny WHEN 2 THEN maxy
              WHEN 3 THEN maxy ELSE miny END AS lat
FROM b CROSS JOIN (SELECT UNNEST([0, 1, 2, 3, 4]) AS i) u
"""


def q_postcode_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-country postcode interpretation (round-5 —
    postcode_parser.py:72-110 keeps EVERY country's reading of an
    un-prefixed code): synthetic digit codes of three shapes join the
    161-pattern dimension; all matching countries are kept per code, the
    engine's pc_all shape.  The broadcast nested-loop against the tiny
    dim is the scale path — candidate volume never fans out."""
    from nominatim_spark.pipeline.postcodes import postcode_dim

    cust = load(spark, sf_dir, "customer")
    codes = cust.select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.lpad(((F.col("c_custkey") * 7919) % 10000)
                   .cast("string"), 4, "0"),
        ).when(
            F.col("c_custkey") % 3 == 1,
            F.lpad(((F.col("c_custkey") * 7919) % 100000)
                   .cast("string"), 5, "0"),
        ).otherwise(
            F.lpad(((F.col("c_custkey") * 131) % 10000000)
                   .cast("string"), 7, "0"),
        ).alias("code"),
    )
    dim = F.broadcast(postcode_dim(spark))
    hits = codes.join(dim, F.expr("code rlike _pc_rx"))
    return hits.groupBy("c_custkey", "code").agg(
        F.sort_array(F.collect_set("country_code")).alias("countries"),
        F.countDistinct("country_code").alias("n_readings"),
    )


def _q_postcode_multi_sql() -> str:
    from nominatim_spark.pipeline.postcodes import jvm_postcode_rules

    values = ",\n  ".join(
        f"('{cc}', '{rx}')" for cc, rx, _out in jvm_postcode_rules()
    )
    return f"""
WITH dim(country_code, rx) AS (VALUES
  {values}),
codes AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 3 = 0
              THEN lpad(CAST((c_custkey * 7919) % 10000 AS VARCHAR), 4, '0')
              WHEN c_custkey % 3 = 1
              THEN lpad(CAST((c_custkey * 7919) % 100000 AS VARCHAR), 5, '0')
              ELSE lpad(CAST((c_custkey * 131) % 10000000 AS VARCHAR), 7, '0')
         END AS code
  FROM customer)
SELECT c_custkey, code,
       list_sort(list(DISTINCT country_code)) AS countries,
       COUNT(DISTINCT country_code) AS n_readings
FROM codes JOIN dim ON regexp_full_match(code, rx)
GROUP BY c_custkey, code
"""


def q_reverse_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage reverse refinement (T5 round-4/5 tiers — a STREET
    winner refines to its nearest CHILD house within the house radius,
    reverse.py:242-320): suppliers act as streets, customers as houses
    parented to their nearest street; each probe finds the nearest
    street within 0.006°, then the nearest house OF THAT STREET within
    0.001° answers when one exists.  Both knn stages run the engine's
    cell-ring expansion; the refinement is the same min_by-within-radius
    join the reverse tier uses."""
    streets = load(spark, sf_dir, "supplier").selectExpr(
        "s_suppkey", f"{sg.SUPP_LON} AS lon", f"{sg.SUPP_LAT} AS lat")
    houses = load(spark, sf_dir, "customer").selectExpr(
        "c_custkey", f"{sg.CUST_LON} AS lon", f"{sg.CUST_LAT} AS lat")
    # parent each house to its nearest street (the index-build parenting)
    parents = knn_join(
        houses, streets.selectExpr("s_suppkey AS parent", "lon", "lat"),
        res=0, point_key="c_custkey", cand_key="parent",
    ).select("c_custkey", "parent")
    # probes: every 3rd supplier, nudged off-center
    probes = streets.filter(F.col("s_suppkey") % 3 == 0).select(
        F.col("s_suppkey").alias("probe_id"),
        (F.col("lon") + 0.0004).alias("lon"),
        (F.col("lat") + 0.0003).alias("lat"),
    )
    t1 = knn_join(
        probes, streets.selectExpr("s_suppkey AS street", "lon", "lat"),
        res=0, point_key="probe_id", cand_key="street",
    ).filter(F.col("dist2") <= 0.006 ** 2).select("probe_id", "street")
    hs = houses.join(parents, "c_custkey").select(
        F.col("parent").alias("street"), "c_custkey",
        F.col("lon").alias("h_lon"), F.col("lat").alias("h_lat"))
    refined = (
        t1.join(probes, "probe_id").join(hs, "street")
        .withColumn("_d2", (F.col("h_lon") - F.col("lon")) ** 2
                    + (F.col("h_lat") - F.col("lat")) ** 2)
        .filter(F.col("_d2") <= 0.001 ** 2)
        .groupBy("probe_id")
        .agg(F.expr("min_by(c_custkey, struct(_d2, c_custkey))")
             .alias("house"))
    )
    return (
        t1.join(refined, "probe_id", "left")
        .select(
            "probe_id", "street", "house",
            F.when(F.col("house").isNotNull(), "house")
            .otherwise("street").alias("tier"),
        )
    )


Q_REVERSE_REFINE_SQL = f"""
WITH streets AS ({sg.supplier_points_sql()}),
     houses AS ({sg.customer_points_sql()}),
     parents AS (
       SELECT c_custkey, parent FROM (
         SELECT h.c_custkey, s.s_suppkey AS parent,
                ROW_NUMBER() OVER (
                  PARTITION BY h.c_custkey
                  ORDER BY (h.lon - s.lon) * (h.lon - s.lon)
                         + (h.lat - s.lat) * (h.lat - s.lat), s.s_suppkey
                ) AS rn
         FROM houses h CROSS JOIN streets s) t
       WHERE rn = 1),
     probes AS (
       SELECT s_suppkey AS probe_id, lon + 0.0004 AS lon,
              lat + 0.0003 AS lat
       FROM streets WHERE s_suppkey % 3 = 0),
     t1 AS (
       SELECT probe_id, street FROM (
         SELECT p.probe_id, s.s_suppkey AS street,
                (p.lon - s.lon) * (p.lon - s.lon)
              + (p.lat - s.lat) * (p.lat - s.lat) AS d2,
                ROW_NUMBER() OVER (
                  PARTITION BY p.probe_id
                  ORDER BY (p.lon - s.lon) * (p.lon - s.lon)
                         + (p.lat - s.lat) * (p.lat - s.lat), s.s_suppkey
                ) AS rn
         FROM probes p CROSS JOIN streets s) t
       WHERE rn = 1 AND d2 <= 0.006 * 0.006),
     refined AS (
       SELECT probe_id, house FROM (
         SELECT t1.probe_id, h.c_custkey AS house,
                ROW_NUMBER() OVER (
                  PARTITION BY t1.probe_id
                  ORDER BY (h.lon - p.lon) * (h.lon - p.lon)
                         + (h.lat - p.lat) * (h.lat - p.lat), h.c_custkey
                ) AS rn
         FROM t1
         JOIN probes p ON p.probe_id = t1.probe_id
         JOIN parents pa ON pa.parent = t1.street
         JOIN houses h ON h.c_custkey = pa.c_custkey
         WHERE (h.lon - p.lon) * (h.lon - p.lon)
             + (h.lat - p.lat) * (h.lat - p.lat) <= 0.001 * 0.001) t
       WHERE rn = 1)
SELECT t1.probe_id, t1.street, refined.house,
       CASE WHEN refined.house IS NOT NULL THEN 'house'
            ELSE 'street' END AS tier
FROM t1 LEFT JOIN refined ON refined.probe_id = t1.probe_id
"""


QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "top_orders_join": (q_top_orders, Q_TOP_ORDERS_SQL),
    "anti_join_no_orders": (q_anti_join, Q_ANTI_SQL),
    "semi_join_has_f_order": (q_semi_join, Q_SEMI_SQL),
    "topk_per_group": (q_topk_per_group, Q_TOPK_SQL),
    "events_tumbling_window": (q_events_window, Q_EVENTS_SQL),
    "events_sessionize": (q_sessionize, Q_SESSIONIZE_SQL),
    "cell_assign": (q_cell_assign, Q_CELL_SQL),
    "pip_cover_join": (q_pip_cover_join, Q_PIP_SQL),
    "knn_reverse": (q_knn_reverse, Q_KNN_SQL),
    "interpolation_expand": (q_interpolation_expand, Q_INTERP_SQL),
    "interval_join": (q_interval_join, Q_INTERVAL_SQL),
    "centroid_fixedpoint": (q_centroid_fixedpoint, Q_CENTROID_SQL),
    "word_freq": (q_word_freq, Q_WORD_FREQ_SQL),
    "lookup_all": (q_lookup_all, Q_LOOKUP_ALL_SQL),
    "lookup_any": (q_lookup_any, Q_LOOKUP_ANY_SQL),
    "dedup_exact": (q_dedup_exact, Q_DEDUP_SQL),
    "minhash_lsh_pairs": (q_minhash_lsh, Q_MINHASH_SQL),
    "embed_topk_cosine": (q_embed_topk, Q_EMBED_SQL),
    "text_stats": (q_text_stats, _q_text_stats_sql()),
    "simhash_pairs": (q_simhash_pairs, _q_simhash_sql()),
    "simhash_pairs_banded": (q_simhash_banded, _q_simhash_sql()),
    "ngram_jaccard_pairs": (q_ngram_jaccard, Q_JACCARD_SQL),
    "ngram_jaccard_capped": (q_ngram_jaccard_capped, Q_JACCARD_CAPPED_SQL),
    "weigh_search_fold": (q_weigh_search, Q_WEIGH_SEARCH_SQL),
    "embed_neardup_pairs": (q_embed_neardup, Q_EMBED_NEARDUP_SQL),
    "embed_neardup_lsh": (q_embed_neardup_lsh, Q_EMBED_LSH_SQL),
    "ann_top1_lsh": (q_ann_top1_lsh, Q_ANN_TOP1_SQL),
    "pip_cover_join_dist": (q_pip_cover_join_dist, Q_PIP_SQL),
    "near_category_join": (q_near_category, Q_NEAR_CATEGORY_SQL),
    "window_prune_epsilon": (q_window_prune, Q_WINDOW_PRUNE_SQL),
    "bbox_agg": (q_bbox_agg, Q_BBOX_SQL),
    "min_dist_penalty": (q_min_dist_penalty, Q_MIN_DIST_SQL),
    "array_merge": (q_array_merge, Q_ARRAY_MERGE_SQL),
    "collect_sorted": (q_collect_sorted, Q_COLLECT_SQL),
    "addr_ladder_fold": (q_addr_ladder_fold, Q_ADDR_LADDER_SQL),
    "postcode_normalize_jvm": (q_postcode_normalize, Q_POSTCODE_NORM_SQL),
    "locale_pick": (q_locale_pick, Q_LOCALE_SQL),
    "geom_geojson_roundtrip": (q_geom_geojson, Q_GEOM_SQL),
    "postcode_multi_country": (q_postcode_multi, _q_postcode_multi_sql()),
    "reverse_refine_tiers": (q_reverse_refine, Q_REVERSE_REFINE_SQL),
    "geocode_pages_e2e": (q_geocode_pages, None),
    "reverse_geocode_e2e": (q_reverse_geocode, None),
    "incremental_update_e2e": (q_incremental_update, None),
}
