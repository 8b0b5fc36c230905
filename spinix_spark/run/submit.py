"""spark-submit entry point + packaging.

Usage on a cluster::

    python -m spinix_spark.run.submit package dist/
    spark-submit --py-files dist/spinix_spark.zip \
        dist/job_detect.py --pages s3://.../pages --out s3://.../events

Locally (this sandbox) the same job runs with ``--master local[N]``.
The job is the flagship pipeline: pages → geoparse → detect → events +
tiles, chunked + checkpointed via ChunkedRunner.
"""

from __future__ import annotations

import argparse
import os
import sys
import zipfile


def package(dist_dir: str) -> str:
    """Zip the spinix_spark package for --py-files."""
    import spinix_spark

    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(spinix_spark.__file__)))
    os.makedirs(dist_dir, exist_ok=True)
    zip_path = os.path.join(dist_dir, "spinix_spark.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(pkg_root, "spinix_spark")):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, pkg_root))
    return zip_path


def run_job(args: argparse.Namespace) -> dict:
    from pyspark.sql import SparkSession

    owns_session = SparkSession.getActiveSession() is None

    from spinix_spark.engine.detect import Engine
    from spinix_spark.engine.spark_pipeline import detect_batch_spark, split_output
    from spinix_spark.engine.stores import zone_from_ring
    from spinix_spark.geo.rings import circle_ring
    from spinix_spark.io.geoparse import geoparse_points
    from spinix_spark.io.pages import BASE_LAT, BASE_LON, synthesize_pages
    from spinix_spark.run.checkpoint import ChunkedRunner

    spark = (
        SparkSession.builder.master(args.master)
        .appName("spinix-spark-detect")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    engine = Engine()
    engine.zones.add(
        zone_from_ring("c5vj26evvhfjvfseaulg", circle_ring(BASE_LAT, BASE_LON, 900.0, 6))
    )
    engine.add_rule(
        "device :radius 300m INTERSECTS polygon(@) { :center 43.4 -71.8 :radius 300km }",
        rule_id="r" + "0" * 19,
    )

    n = args.n_pages

    def make_chunk(spark_, k, n_chunks):
        lo = n * k // n_chunks
        hi = n * (k + 1) // n_chunks
        # chunk = contiguous id range of the synthetic table; on a real
        # lake this is an Iceberg partition predicate
        return synthesize_pages(spark_, n).where(
            f"CAST(regexp_extract(url, '/([0-9]+)$', 1) AS BIGINT) >= {lo} AND "
            f"CAST(regexp_extract(url, '/([0-9]+)$', 1) AS BIGINT) < {hi}"
        )

    def transform(pages):
        points = geoparse_points(pages)
        events, _ = split_output(detect_batch_spark(points, engine))
        return events

    runner = ChunkedRunner(args.out, args.n_chunks)
    summary = runner.run(spark, make_chunk, transform)
    if owns_session:  # don't stop a session we joined (e.g. under pytest)
        spark.stop()
    return summary


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    pk = sub.add_parser("package")
    pk.add_argument("dist_dir")
    job = sub.add_parser("job")
    job.add_argument("--master", default="local[8]")
    job.add_argument("--out", required=True)
    job.add_argument("--n-pages", type=int, default=100_000)
    job.add_argument("--n-chunks", type=int, default=8)
    args = p.parse_args(argv)
    if args.cmd == "package":
        print(package(args.dist_dir))
    else:
        import json

        print(json.dumps(run_job(args)))


if __name__ == "__main__":
    main()
