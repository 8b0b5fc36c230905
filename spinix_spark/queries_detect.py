"""Full-pipeline detect queries for the correctness gate.

These run the actual distributed rules engine (broadcast zones +
compiled rules + mapInPandas refinement) over device points derived
from ``documents``. The stateful variant exercises trigger state
(op #19) — inherently non-SQL-expressible, so the driver records the
rows-only check for it; the stateless variant's match set equals the
``rule_composite`` SQL (same pentagon + speed predicate), giving the
pipeline an indirect value-level oracle as well.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spinix_spark.engine.detect import Engine
from spinix_spark.engine.spark_pipeline import detect_batch_spark, split_output
from spinix_spark.engine.stores import zone_from_ring
from spinix_spark.io.derive import derived_points
from spinix_spark.queries_geo import PENTAGON, Q_RULE_COMPOSITE

PENTAGON_ID = "c5vj26evvhfjvfseaulg"


def _points_as_devices(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = derived_points(spark, sf_dir)
    dev = F.concat(
        F.lit("d"), F.lpad(F.lower(F.conv((F.col("doc_id") % 37).cast("string"), 10, 32)), 19, "0")
    )
    return pts.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        dev.alias("device_id"),
        F.lit("0" * 20).alias("layer_id"),
        "lat",
        "lon",
        "datetime",
        "speed",
        "status",
        F.col("doc_id"),
    )


def _engine() -> Engine:
    import numpy as np

    engine = Engine()
    engine.zones.add(zone_from_ring(PENTAGON_ID, np.array(PENTAGON)))
    return engine


def detect_stateless(spark: SparkSession, sf_dir: str) -> DataFrame:
    """device INTERSECTS pentagon AND speed range [30 .. 120] through
    the real pipeline; doc ids returned so the match set is comparable
    to the rule_composite SQL oracle."""
    engine = _engine()
    engine.add_rule(
        f"device INTERSECTS polygon({PENTAGON_ID}) and speed range [30 .. 120]",
        rule_id="r" + "0" * 19,
    )
    events, _ = split_output(
        detect_batch_spark(_points_as_devices(spark, sf_dir), engine)
    )
    # one row per event (the INTERSECTS match), keyed back to doc_id
    return (
        events.where(F.col("op") == "INTERSECTS")
        .select(
            F.regexp_extract("url", r"doc://(\d+)", 1).cast("bigint").alias("doc_id")
        )
        .orderBy("doc_id")
    )


def detect_stateful_trigger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful trigger-once rule over two consecutive batches: the
    second batch must be fully suppressed. Returns per-batch event
    counts (rows-only driver check; semantics pinned by unit tests)."""
    engine = _engine()
    engine.add_rule(
        f"device INTERSECTS polygon({PENTAGON_ID})"
        " { :center 42.935 -72.27 :radius 5km :trigger once }",
        rule_id="r" + "1" * 19,
    )
    pts = _points_as_devices(spark, sf_dir)
    out1 = detect_batch_spark(pts, engine)
    ev1, st1 = split_output(out1)
    n1 = ev1.count()
    state_rows = [r.asDict() for r in st1.collect()]
    out2 = detect_batch_spark(pts, engine, state_rows=state_rows)
    ev2, _ = split_output(out2)
    n2 = ev2.count()
    return spark.createDataFrame(
        [(1, n1), (2, n2)], "batch int, n_events bigint"
    )


# oracle for the stateless pipeline: same semantics as rule_composite
DETECT_STATELESS_ORACLE = f"SELECT doc_id FROM ({Q_RULE_COMPOSITE}) q ORDER BY doc_id"

DETECT_QUERIES: dict[str, tuple] = {
    "detect_pipeline": (detect_stateless, DETECT_STATELESS_ORACLE),
    "detect_stateful_trigger": (detect_stateful_trigger, None),
}
