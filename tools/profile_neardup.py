"""Per-stage profile of bench.py's e2e_neardup lineage (guide §1:
measure first; noop-style isolation via counts on persisted stages).

Usage: python tools/profile_neardup.py [n_pages] [cpus]
Prints one line per stage with wall seconds, plus the CC round count.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    from bench import build_spark

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from spinix_spark.io.pages import synthesize_pages

    # warmup
    synthesize_pages(spark, 20_000).count()

    import spinix_spark.queries_text as qt

    t_all = time.time()
    marks: list[tuple[str, float]] = []

    def mark(name: str, t0: float) -> None:
        marks.append((name, time.time() - t0))
        print(f"{name:28s} {time.time() - t0:7.3f}s", flush=True)

    sc = spark.sparkContext

    pages = synthesize_pages(spark, n_pages)
    funneled = pages.where(
        (F.col("lang") == "en") & (F.length("text") >= 30)
    ).withColumn("doc_id", F.xxhash64("url"))
    corpus = funneled.withColumn("n_chars", F.length("text"))

    # stage 1: signature computation + cache materialization
    corpus.select("doc_id", "text").createOrReplaceTempView("_nd_corpus")
    t0 = time.time()
    sc.setJobDescription("nd: signature cache")
    sig = spark.sql(qt._fast_shingle_sig_sql("_nd_corpus")).cache()
    n_sig = sig.count()
    mark(f"sig cache ({n_sig} rows)", t0)
    sig.createOrReplaceTempView("_nd_sig")

    # stage 2: star edges -> initial checkpoint (cc_two_phase's first job)
    t0 = time.time()
    sc.setJobDescription("nd: star edges + initial checkpoint")
    edges = spark.sql(qt._lsh_star_edges("_nd_sig"))
    cur = (
        edges.selectExpr("a_id AS u", "b_id AS v")
        .where("u <> v")
        .distinct()
        .localCheckpoint(eager=True)
    )
    mark("star edges + dedup ckpt", t0)

    # stage 3: CC rounds, timed per checkpoint job
    from pyspark.sql import Observation

    prev_sig = None
    rounds = 0
    for rnd in range(0, 40, 2):
        t0 = time.time()
        sc.setJobDescription(f"nd: cc round pair {rnd}")
        obs = Observation(f"p_cc_sig_{rnd}")
        small = (
            qt.cc_two_phase.__wrapped__(cur, obs)  # type: ignore[attr-defined]
            if hasattr(qt.cc_two_phase, "__wrapped__")
            else None
        )
        # inline one_round x2 exactly as cc_two_phase does
        def one_round(df):
            sym = df.unionAll(df.selectExpr("v AS u", "u AS v"))
            mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
            mins = mins.withColumn("m", F.least("_mn", F.col("u"))).drop("_mn")
            large = (
                sym.join(mins, "u")
                .where("v > u")
                .selectExpr("v AS u", "m AS v")
                .where("u <> v")
            )
            o = large.selectExpr("greatest(u, v) AS u", "least(u, v) AS v").where(
                "u <> v"
            )
            m2 = o.groupBy("u").agg(F.min("v").alias("m"))
            return (
                o.join(m2, "u")
                .where("v <> m")
                .selectExpr("v AS u", "m AS v")
                .unionAll(m2.selectExpr("u", "m AS v"))
                .where("u <> v")
                .distinct()
            )

        small = (
            one_round(one_round(cur))
            .observe(
                obs,
                F.count(F.lit(1)).alias("c"),
                F.bit_xor(F.xxhash64("u", "v")).alias("s"),
            )
            .localCheckpoint(eager=True)
        )
        cur = small
        sigv = (obs.get["c"], obs.get["s"])
        rounds += 1
        mark(f"cc round pair {rnd} (n={sigv[0]})", t0)
        if sigv == prev_sig:
            break
        prev_sig = sigv

    t0 = time.time()
    sc.setJobDescription("nd: labels + keep window + drop persist")
    labels = (
        cur.selectExpr("u AS node", "v AS label")
        .unionAll(cur.selectExpr("v AS node", "v AS label"))
        .distinct()
    )
    from pyspark.sql.window import Window

    member = labels.join(
        corpus.select(F.col("doc_id").alias("node"), "n_chars"), "node"
    )
    wo = Window.partitionBy("label").orderBy(
        F.col("n_chars").desc(), F.col("node").asc()
    )
    drop = (
        member.withColumn("_rn", F.row_number().over(wo))
        .where(F.col("_rn") > 1)
        .select(F.col("node").alias("doc_id"))
    ).persist()
    n_dropped = drop.count()
    mark(f"keep window + drop ({n_dropped})", t0)
    sig.unpersist()

    from spinix_spark.engine.detect import Engine
    from spinix_spark.engine.spark_pipeline import detect_batch_spark, split_output
    from spinix_spark.engine.stores import zone_from_ring
    from spinix_spark.engine.tiles import point_density_raster
    from spinix_spark.geo.cells import DEFAULT_SCHEME
    from spinix_spark.geo.rings import circle_ring
    from spinix_spark.io.geoparse import cell_column, geoparse_points
    from spinix_spark.io.pages import BASE_LAT, BASE_LON

    t0 = time.time()
    sc.setJobDescription("nd: anti-join + geoparse + persist")
    clean = corpus.join(drop, "doc_id", "left_anti")
    points = (
        geoparse_points(clean.drop("doc_id", "n_chars"))
        .drop("text")
        .withColumn("cell", cell_column(DEFAULT_SCHEME))
        .persist()
    )
    n_clean = points.count()
    mark(f"anti-join+geoparse ({n_clean})", t0)
    drop.unpersist()

    engine = Engine()
    engine.zones.add(
        zone_from_ring("c5vj26evvhfjvfseaulg", circle_ring(BASE_LAT, BASE_LON, 900.0, 6))
    )
    engine.add_rule(
        "device :radius 300m INTERSECTS polygon(c5vj26evvhfjvfseaulg)"
        " and speed range [30 .. 170]",
        rule_id="r" + "8" * 19,
    )
    t0 = time.time()
    sc.setJobDescription("nd: detect")
    events, _ = split_output(detect_batch_spark(points, engine))
    n_ev = events.count()
    mark(f"detect ({n_ev})", t0)
    t0 = time.time()
    sc.setJobDescription("nd: raster")
    n_tiles = point_density_raster(points).count()
    mark(f"raster ({n_tiles})", t0)
    points.unpersist()

    total = time.time() - t_all
    print(f"{'TOTAL':28s} {total:7.3f}s  ({rounds} cc round pairs)")
    spark.stop()


if __name__ == "__main__":
    main()
