"""Relational aggregation/join queries over the TPC-H-ish tables.

The reference has no SQL surface at all (SURVEY.md §2C); these
demonstrate the engine's relational layer (grouped aggregation with
map-side partials, broadcast dimension joins, top-k) with exact
cross-engine values: money columns are CAST to DECIMAL before SUM so
the aggregate is order-independent (double SUM would differ between
Spark's partial-aggregation tree and DuckDB's sequential fold).
Shared ANSI text runs on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spinix_spark.io.derive import load_tables


def _shared(sql: str, tables):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        load_tables(spark, sf_dir, list(tables))
        return spark.sql(sql)

    return fn, sql


# TPC-H Q1-flavored pricing summary. The SUM runs over DECIMAL so the
# aggregate is order-independent (exact), then the RESULT is cast to
# DOUBLE: Spark and DuckDB render result decimals with different
# scales (DECIMAL(22,2) vs DECIMAL(38,2)), which breaks the driver's
# value hash even when the numbers are equal — an exact decimal casts
# to the same nearest double in both engines.
Q_PRICING = (
    "SELECT l_returnflag, l_linestatus, "
    "CAST(SUM(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty, "
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,2))) AS DOUBLE) AS sum_base_price, "
    "COUNT(*) AS count_order "
    "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
    "GROUP BY l_returnflag, l_linestatus"
)

# broadcast-join revenue per nation (customer ⨝ orders ⨝ nation)
Q_REVENUE_BY_NATION = (
    "SELECT n.n_name AS nation, "
    "CAST(SUM(CAST(o.o_totalprice AS DECIMAL(20,2))) AS DOUBLE) AS revenue, "
    "COUNT(*) AS n_orders "
    "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
    "JOIN nation n ON c.c_nationkey = n.n_nationkey "
    "GROUP BY n.n_name"
)

# top-k customers by order count (deterministic tie-break)
Q_TOP_CUSTOMERS = (
    "SELECT o_custkey, COUNT(*) AS n_orders, "
    "CAST(SUM(CAST(o_totalprice AS DECIMAL(20,2))) AS DOUBLE) AS total "
    "FROM orders GROUP BY o_custkey "
    "ORDER BY n_orders DESC, o_custkey LIMIT 25"
)

# anti-join: parts never ordered (shape the reference cannot express)
# anti-join gate. Round-5 de-vacuation (VERDICT r4 item 2): the plain
# "never ordered at all" form returned 0 rows at EVERY scale factor
# (the generator orders every part), so the gate could never catch an
# anti-join regression. "Never ordered at quantity ≥ 48" keeps the
# same NOT IN anti-join plan shape and returns 21 / 357 / 3297 rows at
# sf 0.001 / 0.01 / 0.1.
Q_PARTS_NEVER_ORDERED = (
    "SELECT p_partkey FROM part WHERE p_partkey NOT IN "
    "(SELECT DISTINCT l_partkey FROM lineitem WHERE l_quantity >= 48.0)"
)


RELATIONAL_QUERIES: dict[str, tuple] = {
    "pricing_summary": _shared(Q_PRICING, ("lineitem",)),
    "revenue_by_nation": _shared(Q_REVENUE_BY_NATION, ("orders", "customer", "nation")),
    "top_customers": _shared(Q_TOP_CUSTOMERS, ("orders",)),
    "parts_never_ordered": _shared(Q_PARTS_NEVER_ORDERED, ("part", "lineitem")),
}
