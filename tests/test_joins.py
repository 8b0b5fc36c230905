"""Join-based physical strategies: equality against the broadcast
engine path / unsalted join, and plan shape checks."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spinix_spark.engine.joins import (
    near_pairs,
    near_pairs_salted,
    points_in_zones_join,
)
from spinix_spark.engine.stores import zone_from_ring
from spinix_spark.geo.cells import GridScheme
from spinix_spark.geo.rings import circle_ring
from spinix_spark.io.derive import derived_points

SF = "/root/testdata/sf0.001"
FINE = GridScheme(res=9)


@pytest.fixture(scope="module")
def points(spark):
    return (
        derived_points(spark, SF)
        .withColumn("cell", F.expr(FINE.sql_cell_expr("lat", "lon")))
        .cache()
    )


def test_near_pairs_salted_equals_unsalted(spark, points):
    base = {(r.a_id, r.b_id) for r in near_pairs(points, FINE, 250.0).collect()}
    salted = {
        (r.a_id, r.b_id)
        for r in near_pairs_salted(points, FINE, 250.0, n_salt=4).collect()
    }
    assert base == salted
    assert len(base) > 0


def test_points_in_zones_join_matches_kernel(spark, points):
    ring = circle_ring(42.935, -72.27, 1500.0, 5)
    zones = [zone_from_ring("c5vj26evvhfjvfseaulg", ring)]
    scheme = GridScheme(res=8)
    pts = derived_points(spark, SF).withColumn(
        "cell", F.expr(scheme.sql_cell_expr("lat", "lon"))
    )
    got = {
        r.url
        for r in points_in_zones_join(
            pts.withColumnRenamed("doc_id", "url"), zones, scheme
        ).collect()
    }
    # kernel reference
    from spinix_spark.geo.predicates import points_in_ring

    pdf = derived_points(spark, SF).toPandas()
    expected = set(
        pdf.doc_id[points_in_ring(pdf.lat.to_numpy(), pdf.lon.to_numpy(), ring)]
    )
    assert got == expected and len(got) > 0


def test_near_pairs_plan_is_cell_equijoin(spark, points):
    plan = near_pairs(points, FINE, 250.0)._jdf.queryExecution().executedPlan().toString()
    # the join must be an equi-join on the cell key, never a cartesian
    assert "Cartesian" not in plan
    assert "Join" in plan


def test_zone_join_broadcasts_dimension(spark, points):
    ring = circle_ring(42.935, -72.27, 1500.0, 5)
    zones = [zone_from_ring("c5vj26evvhfjvfseaulg", ring)]
    scheme = GridScheme(res=8)
    pts = derived_points(spark, SF).withColumn(
        "cell", F.expr(scheme.sql_cell_expr("lat", "lon"))
    )
    df = points_in_zones_join(pts.withColumnRenamed("doc_id", "url"), zones, scheme)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
