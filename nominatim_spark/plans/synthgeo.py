"""Deterministic geometry derivation from the driver's testdata tables.

The correctness oracle (DuckDB) can only see the driver's parquet views, so
the spatial gate queries derive coordinates *arithmetically* from table keys
— integer modular arithmetic followed by one double division, which IEEE-754
guarantees bit-identical in Spark and DuckDB.  The Spark side then runs the
real engine machinery (cell encoding, cover joins, ring-expansion kNN, WKB
point-in-polygon rechecks) over those coordinates, while the oracle uses the
plain-SQL equivalent — any divergence in the engine's spatial kernels shows
up as a hash mismatch.

Coordinates live in lon [-60, 60), lat [-70, 70) so longitude wrap-around
(which planar SQL can't express) never comes into play.
"""

from __future__ import annotations

# customer points — the "place" side (candidates)
CUST_LON = "(((c_custkey * 131) % 2400) / 20.0 - 60.0 + 0.005)"
CUST_LAT = "(((c_custkey * 241) % 2800) / 20.0 - 70.0 + 0.005)"

# supplier points — the "query" side (reverse-geocode probes)
SUPP_LON = "(((s_suppkey * 577) % 2400) / 20.0 - 60.0 + 0.015)"
SUPP_LAT = "(((s_suppkey * 709) % 2800) / 20.0 - 70.0 + 0.015)"

# nation rectangles — the "admin boundary" side (15 x 10 degree boxes)
NATION_LON0 = "(((n_nationkey * 277) % 100) - 55.0)"
NATION_LAT0 = "(((n_nationkey * 331) % 120) - 65.0)"
NATION_W = 15.0
NATION_H = 10.0


def customer_points_sql(table: str = "customer") -> str:
    return (
        f"SELECT c_custkey, {CUST_LON} AS lon, {CUST_LAT} AS lat FROM {table}"
    )


def supplier_points_sql(table: str = "supplier") -> str:
    return (
        f"SELECT s_suppkey, {SUPP_LON} AS lon, {SUPP_LAT} AS lat FROM {table}"
    )


def nation_rects_sql(table: str = "nation") -> str:
    return (
        f"SELECT n_nationkey, {NATION_LON0} AS lon0, {NATION_LAT0} AS lat0, "
        f"{NATION_LON0} + {NATION_W} AS lon1, {NATION_LAT0} + {NATION_H} AS lat1 "
        f"FROM {table}"
    )


# interpolation "ways" derived from orders (odd-number interpolation lines,
# reference semantics interpolation.sql:196-374)
WAY_FILTER = "o_orderkey % 10 = 0"
WAY_START = "(2 * (o_orderkey % 30) + 1)"
WAY_END = f"({WAY_START} + 2 * (o_orderkey % 7))"


def interpolation_ways_sql(table: str = "orders") -> str:
    return (
        f"SELECT o_orderkey AS way_id, {WAY_START} AS startnumber, "
        f"{WAY_END} AS endnumber, 2 AS step FROM {table} WHERE {WAY_FILTER}"
    )
