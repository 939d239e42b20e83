"""Streaming incremental LSH dedup: the foreachBatch twin of the batch
``dedup_incremental_lsh`` query (queries/corpus_ops.py) — documents
arrive as a stream, each micro-batch is probed against the accumulated
corpus band index, only novel documents are appended to the output
corpus, and the index grows by every arrival so later batches dedup
against earlier ones.

Semantics contract (kept in lockstep with the batch query): a new doc
``n`` matches ``m`` iff they share an LSH band bucket AND (``m`` is in
the base corpus OR ``m.doc_id < n.doc_id``). With doc_id-ordered
micro-batches this is exactly the batch query's result set, so the
batch query IS the oracle for the streaming path (asserted in
tests/test_streaming.py).

100 TB shape: the base index is built once (one banding shuffle) and
stored bucketed by band key; each micro-batch broadcasts ITS band keys
(a daily batch is ~1% of corpus) and probes the index where it sits —
no corpus shuffle at probe time. The per-batch index append is
batch-sized. This mirrors the reference's watermark-incremental
extract contract (etl_sales/extract.py:8-28: process only what is new,
idempotently) applied to dedup.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def band_index(docs: DataFrame, *, is_base: bool) -> DataFrame:
    """(band, band_key, doc_id, is_base) LSH index rows for ``docs`` —
    the same hash family/banding as the whole dedup stack (16 minhashes,
    4 rows/band), so streaming buckets equal batch buckets."""
    from osmart_etl_spark.ops.dedup import minhash_band_keys, shingle_sets

    sets = shingle_sets(docs, "doc_id", "text", k=5)
    bands = minhash_band_keys(sets, "doc_id", num_hashes=16, rows_per_band=4)
    return bands.select(
        "band", "band_key", "doc_id", F.lit(is_base).alias("is_base")
    )


def run_lsh_dedup_stream(
    spark: SparkSession,
    stream_df: DataFrame,
    base_docs: DataFrame,
    workdir: str,
) -> tuple[DataFrame, DataFrame]:
    """Drain ``stream_df`` (availableNow) through foreachBatch LSH
    dedup against ``base_docs``. Returns (matches, novel):
    matches = (id_new, id_match, from_base) band collisions, novel =
    the streamed documents with no collision (the deduped additions).

    foreachBatch is the exactly-once-ish sink recipe (T6): batch
    outputs are plain appends keyed by batch content, and the
    checkpoint makes redelivery re-run the same deterministic probe.
    """
    index_dir = os.path.join(workdir, "band_index")
    matches_dir = os.path.join(workdir, "matches")
    novel_dir = os.path.join(workdir, "novel")
    ckpt = os.path.join(workdir, "ckpt")

    # Seed the index with the base corpus (one banding pass).
    band_index(base_docs, is_base=True).write.mode("overwrite").parquet(index_dir)

    def probe_batch(batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df.persist()
        bands_b = band_index(b, is_base=False).persist()
        new_b = bands_b.select(
            "band", "band_key", F.col("doc_id").alias("id_new")
        )
        idx = spark.read.parquet(index_dir).select(
            "band", "band_key", F.col("doc_id").alias("id_match"), "is_base"
        )
        # cross-batch probe: index rows are base docs or earlier
        # arrivals; earlier-NEW rows qualify only with a smaller id
        # (the batch query's tie-break), base rows always do.
        cross = idx.join(F.broadcast(new_b), ["band", "band_key"]).filter(
            F.col("is_base") | (F.col("id_match") < F.col("id_new"))
        )
        # in-batch probe: earlier arrivals within this micro-batch.
        me = bands_b.select(
            "band", "band_key", F.col("doc_id").alias("id_match")
        )
        within = me.join(F.broadcast(new_b), ["band", "band_key"]).filter(
            F.col("id_match") < F.col("id_new")
        )
        matches = (
            cross.select(
                "id_new", "id_match", F.col("is_base").alias("from_base")
            )
            .unionByName(
                within.select(
                    "id_new", "id_match", F.lit(False).alias("from_base")
                )
            )
            .distinct()
            .persist()
        )
        matches.write.mode("append").parquet(matches_dir)
        matched_ids = matches.select(F.col("id_new").alias("doc_id")).distinct()
        b.join(matched_ids, "doc_id", "left_anti").write.mode("append").parquet(
            novel_dir
        )
        # grow the index by EVERY arrival (novel or not): the batch
        # semantics match against all earlier news, not only novel ones.
        bands_b.write.mode("append").parquet(index_dir)
        matches.unpersist()
        bands_b.unpersist()
        b.unpersist()

    q = (
        stream_df.writeStream.foreachBatch(probe_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    matches = spark.read.parquet(matches_dir)
    try:
        novel = spark.read.parquet(novel_dir)
    except Exception:  # every streamed doc matched; no novel output
        novel = stream_df.sparkSession.createDataFrame([], stream_df.schema)
    return matches, novel
