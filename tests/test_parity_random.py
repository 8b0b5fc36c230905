"""Randomized cross-check: the distributed pipeline
(detect_batch_spark, mapInPandas) must produce exactly the local
engine's (Engine.detect_batch) match rows on arbitrary inputs — both
run the same kernel, but partitioning/broadcast/Arrow must not change
results. Also exercises the partitioned parquet sinks."""

from __future__ import annotations

import numpy as np
import pandas as pd

from spinix_spark.engine.detect import Engine
from spinix_spark.engine.spark_pipeline import detect_batch_spark, split_output
from spinix_spark.engine.stores import zone_from_ring
from spinix_spark.geo.rings import circle_ring

K0 = "c5vj26evvhfjvfseauk0"


def _random_world(seed: int, n_points: int = 400, n_zones: int = 6):
    rng = np.random.default_rng(seed)
    zones = []
    for i in range(n_zones):
        clat = 42.90 + rng.random() * 0.1
        clon = -72.32 + rng.random() * 0.1
        r = 200 + rng.random() * 1500
        steps = int(rng.integers(5, 9))
        zones.append((f"z{i:019d}"[:20].replace("z", "c", 1), clat, clon, r, steps))
    pts = pd.DataFrame(
        {
            "url": [f"https://t.test/{K0}/{i}" for i in range(n_points)],
            "device_id": [
                "d" + np.base_repr(i % 37, 32).lower().rjust(19, "0")
                for i in range(n_points)
            ],
            "layer_id": ["0" * 20] * n_points,
            "lat": 42.90 + rng.random(n_points) * 0.1,
            "lon": -72.32 + rng.random(n_points) * 0.1,
            "datetime": np.arange(n_points) + 1000,
            "speed": rng.random(n_points) * 200,
            "status": rng.integers(0, 5, n_points),
        }
    )
    return zones, pts


def _build_engine(zones) -> Engine:
    engine = Engine()
    ids = []
    for zid, clat, clon, r, steps in zones:
        zid = "c5vj26evvhfjvfseau" + np.base_repr(len(ids), 32).lower().rjust(2, "0")
        engine.zones.add(zone_from_ring(zid, circle_ring(clat, clon, r, steps)))
        ids.append(zid)
    engine.add_rule(
        f"device :radius 200m INTERSECTS polygon({', '.join(ids[:3])})"
        " and speed range [20 .. 150]",
        rule_id="r" + "0" * 19,
    )
    engine.add_rule(
        f"device NEAR polygon({ids[3]}) or status in [1, 2]"
        f" {{ :center {zones[3][1]} {zones[3][2]} :radius 100km }}",
        rule_id="r" + "1" * 19,
    )
    # point-device + explicit refs + attribute AND: eligible for the
    # all-Catalyst compiled path (engine/sql_compile.py)
    engine.add_rule(
        f"device INTERSECTS polygon({ids[4]}, {ids[5]}) and speed range [10 .. 180]",
        rule_id="r" + "2" * 19,
    )
    return engine


def _key(rows):
    return sorted(
        (r["url"], r["rule_id"], r["left_kw"], r["right_kw"], r["op"],
         tuple(r["right_refs"]))
        for r in rows
    )


def test_local_vs_distributed_parity(spark):
    for seed in (1, 7, 42, 13, 99):
        zones, pts = _random_world(seed)
        engine_a = _build_engine(zones)
        engine_b = _build_engine(zones)

        # local engine: flatten events to match rows
        local_events = engine_a.detect_batch(pts.copy())
        local_rows = [
            {
                "url": e["url"],
                "rule_id": e["rule_id"],
                "left_kw": m["left_kw"],
                "right_kw": m["right_kw"],
                "op": m["op"],
                "right_refs": m["right_refs"],
            }
            for e in local_events.to_dict("records")
            for m in e["matches"]
        ]

        sdf = spark.createDataFrame(pts).repartition(7)
        events, _ = split_output(detect_batch_spark(sdf, engine_b))
        dist_rows = [r.asDict() for r in events.collect()]

        assert _key(local_rows) == _key(dist_rows), f"seed {seed} diverged"
        assert len(local_rows) > 0, f"seed {seed} produced no matches (weak test)"


def test_sql_path_equals_kernel_path(spark):
    """The all-Catalyst compiled rule path must produce exactly the
    kernel (mapInPandas) path's rows."""
    from spinix_spark.engine.sql_compile import try_compile_rule_sql

    for seed in (3, 11, 29):
        zones, pts = _random_world(seed)
        engine = _build_engine(zones)
        # the eligible rule must actually compile to SQL
        assert try_compile_rule_sql(engine, engine.rules["r" + "2" * 19]) is not None
        sdf = spark.createDataFrame(pts).repartition(5)
        ev_sql, _ = split_output(detect_batch_spark(sdf, engine, prefer_sql=True))
        engine2 = _build_engine(zones)
        ev_kernel, _ = split_output(
            detect_batch_spark(sdf, engine2, prefer_sql=False)
        )
        assert _key([r.asDict() for r in ev_sql.collect()]) == _key(
            [r.asDict() for r in ev_kernel.collect()]
        ), f"seed {seed}: SQL path diverged from kernel path"


def test_partitioned_sinks_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    from spinix_spark.geo.cells import DEFAULT_SCHEME
    from spinix_spark.io.derive import derived_points
    from spinix_spark.io.sink import read_points_region, write_points

    pts = derived_points(spark, "/root/testdata/sf0.001").withColumn(
        "cell", F.expr(DEFAULT_SCHEME.sql_cell_expr("lat", "lon"))
    )
    path = str(tmp_path / "points")
    write_points(pts, path, DEFAULT_SCHEME)
    region = read_points_region(
        spark, path, DEFAULT_SCHEME, 42.92, -72.30, 42.95, -72.26
    )
    got = region.count()
    expected = pts.where(
        "lat >= 42.92 AND lat <= 42.95 AND lon >= -72.30 AND lon <= -72.26"
    ).count()
    assert got == expected and got > 0
    # partition pruning visible in the plan: partition filter on cell_prefix
    plan = region._jdf.queryExecution().executedPlan().toString()
    assert "cell_prefix" in plan
