"""Deterministic device-point derivation from the ``documents`` table.

The correctness gate (driver oracle) can only see the pre-registered
parquet tables, so geo queries derive their device points from
``documents`` with pure integer arithmetic + exact double division —
the same expression text runs in Spark SQL and DuckDB, giving
bit-identical doubles. Points land in the golden-fixture neighborhood
(Brattleboro, VT) so fixed golden geometries have real hits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# SQL expression fragments (valid in both Spark SQL and DuckDB)
LAT_SQL = "(42.905 + CAST((doc_id * 7919) % 6000 AS DOUBLE) / 100000.0)"
LON_SQL = "(-72.315 + CAST((doc_id * 104729) % 9000 AS DOUBLE) / 100000.0)"
SPEED_SQL = "CAST((doc_id * 31) % 200 AS DOUBLE)"
STATUS_SQL = "CAST(doc_id % 5 AS INT)"
DT_SQL = "(1700000000 + (doc_id * 97) % 86400)"

POINTS_SELECT = (
    "SELECT doc_id, "
    f"{LAT_SQL} AS lat, {LON_SQL} AS lon, "
    f"{SPEED_SQL} AS speed, {STATUS_SQL} AS status, {DT_SQL} AS datetime "
    "FROM documents"
)


def load_tables(spark: SparkSession, sf_dir: str, names: list[str]) -> None:
    for n in names:
        spark.read.parquet(f"{sf_dir}/{n}.parquet").createOrReplaceTempView(n)


def derived_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → device points, fully Catalyst (codegen)."""
    load_tables(spark, sf_dir, ["documents"])
    return spark.sql(POINTS_SELECT)
