"""Streaming near-dup ADMISSION filter — the LLM-ingest shape: each
micro-batch of documents is admitted only if it is not a near-duplicate
of anything already admitted (in history OR earlier in the same batch).

Mechanism: a document's MinHash signature yields BANDS band-bucket
keys (the same 16-hash / 4-band family as the batch queries,
queries_text.py); the set of every ADMITTED document's bucket keys is
the stream's state, persisted in a
:class:`~spinix_spark.streaming.state_table.BucketedVersionTable`
hash-bucketed on the bucket key. Per micro-batch:

1. compute the batch's (doc_id, bkey) band buckets (pure Catalyst);
2. read ONLY the state buckets the batch touches (dirty-bucket read —
   O(batch), not O(history));
3. drop docs with any bkey in history, or that lose the
   first-writer-wins race within the batch (min doc_id per bkey —
   deterministic, no chaining: a doc colliding only with a DROPPED
   doc is still dropped, the bucket was claimed);
4. append the admitted docs' bkeys as the touched buckets' next
   version (dirty-bucket write);
5. hand the admitted docs to the sink.

Bucket collision ⇒ near-dup is the standard conservative streaming
admission rule (band probability s^r per band): exact-Jaccard
verification needs the full shingle store and belongs to the batch
pipeline (queries_text.spark_jaccard_lsh / neardup_drop_ids) — run it
as a periodic compaction if admission must be exact.

Replay idempotency rides the state table's per-bucket
"newest version STRICTLY BELOW batch_id" contract: a checkpointed
replay of batch N re-reads the pre-N bucket set, so its admissions
are bit-identical.
"""

from __future__ import annotations

import posixpath
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spinix_spark.queries_text import (
    _SPARK_X,
    BANDS,
    N_HASHES,
    _minhash_sql_wide_noexplode,
    spark_shingles_all,
)
from spinix_spark.streaming.state_table import BucketedVersionTable

BANDS_VIEW = "_sd_batch_docs"


def batch_band_buckets(docs: DataFrame, bands: int = BANDS) -> DataFrame:
    """(doc_id, bkey) — one row per (doc, band): bkey =
    'band:min0,min1,...' over the band's signature rows. Pure
    Catalyst; same hash family/band layout as the batch LSH queries."""
    spark = docs.sparkSession
    docs.select("doc_id", "text").createOrReplaceTempView(BANDS_VIEW)
    rows_per_band = N_HASHES // bands
    # WIDE signature + per-row band stack (round 7): the long form
    # stack-exploded to 16 rows per doc only to re-aggregate them back
    # by (doc, band); the bkey STRINGS are byte-identical (same
    # CONCAT_WS layout), so persisted bucket state is unaffected.
    sig = _minhash_sql_wide_noexplode(
        spark_shingles_all(table=BANDS_VIEW), _SPARK_X
    )
    stack_args = ", ".join(
        f"CAST({b} AS BIGINT), CONCAT_WS(',', "
        + ", ".join(
            f"CAST(mh{b * rows_per_band + r} AS STRING)"
            for r in range(rows_per_band)
        )
        + ")"
        for b in range(bands)
    )
    return spark.sql(
        f"SELECT doc_id, CONCAT_WS(':', CAST(band AS STRING), bucket) AS bkey "
        f"FROM (SELECT doc_id, band, bucket FROM ({sig}) w "
        f"LATERAL VIEW stack({bands}, {stack_args}) t AS band, bucket) b"
    )


def admission_batch(
    batch_df: DataFrame, table: BucketedVersionTable, batch_id: int
) -> DataFrame:
    """One micro-batch of the admission fold (steps 1-4 of the module
    contract): returns the ADMITTED rows of ``batch_df`` and appends
    their band keys as the touched state buckets' version
    ``batch_id``. Shared by the Structured Streaming ``foreachBatch``
    path and the batch-replay gate query
    (queries_text.spark_stream_admission) — one implementation, two
    drivers, so the driver's value oracle exercises the real code."""
    bk = batch_band_buckets(batch_df).cache()
    touched = table.dirty_buckets(bk)
    hist = table.read_latest(batch_id, buckets=touched)
    # historical collision: any band bucket already admitted
    if hist is not None:
        hist_hit = (
            bk.join(hist, "bkey", "left_semi").select("doc_id").distinct()
        )
    else:
        hist_hit = bk.select("doc_id").where(F.lit(False))
    # within-batch first-writer-wins: min doc_id per bkey (NON-chaining:
    # a doc colliding only with a dropped doc is still dropped — the
    # bucket was claimed)
    batch_hit = (
        bk.withColumn("_mn", F.min("doc_id").over(Window.partitionBy("bkey")))
        .where(F.col("doc_id") != F.col("_mn"))
        .select("doc_id")
        .distinct()
    )
    dropped = hist_hit.unionByName(batch_hit).distinct()
    admitted = batch_df.join(dropped, "doc_id", "left_anti").cache()
    # state append: admitted docs' bkeys join their prior buckets; a
    # touched bucket whose docs were ALL dropped gets no new version
    # (history there is already authoritative)
    adm_keys = (
        bk.join(admitted.select("doc_id"), "doc_id", "left_semi")
        .select("bkey")
        .distinct()
    )

    def merge(prior, upd):
        return prior.unionByName(upd).distinct()

    table.merge_write(adm_keys, batch_id, merge=merge)
    bk.unpersist()
    return admitted


def stream_neardup_filter(
    docs_stream: DataFrame,
    sink: Callable[[DataFrame, int], None],
    work_dir: str,
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
    n_buckets: int = 256,
    retain_versions: int = 2,
):
    """Admission-filter a streaming documents DataFrame
    (``doc_id``, ``text``, other columns pass through).
    ``sink(admitted_df, batch_id)`` receives each batch's admitted
    rows. State: the admitted bucket-key set under
    ``work_dir/buckets`` (Hadoop-FS path — object stores fine)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        table = BucketedVersionTable(
            spark,
            posixpath.join(work_dir, "buckets"),
            key_col="bkey",
            n_buckets=n_buckets,
        )
        admitted = admission_batch(batch_df, table, batch_id)
        sink(admitted, batch_id)
        if retain_versions is not None:
            table.prune(retain_versions)
        admitted.unpersist()

    writer = docs_stream.writeStream.foreachBatch(process).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
