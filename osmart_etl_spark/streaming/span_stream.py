"""Streaming incremental ExactSubstr span dedup: the foreachBatch twin
of the batch ``ops.dedup.span_excision`` (Lee et al. 2022) — documents
arrive as a stream, each micro-batch's k-gram windows are probed
against the accumulated gram inventory (base corpus + earlier
arrivals), duplicated-window positions are appended, and — the part
LSH dedup does not need — positions of EARLIER arrivals are marked
RETROACTIVELY when a later batch first duplicates their grams, so the
consolidated result equals the batch computation exactly.

Semantics contract (proved in tests/test_streaming.py): after draining,
``consolidate_spans`` over the emitted hit positions equals the batch
``span_excision`` over (base ∪ streamed docs) restricted to the
streamed side. The base corpus is treated as immutable (already
shipped), mirroring the batch query's cross-doc rule: a window is
excised iff its gram occurs in ≥2 DISTINCT documents overall.

100 TB shape: the inventory is a parquet relation keyed by gram digest
(bucketable); each micro-batch broadcasts ITS gram keys for the probe
and appends batch-sized rows — no inventory rewrite, no corpus
shuffle. Retro marking reads only inventory rows colliding with the
current batch's grams (digest-keyed join).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_span_dedup_stream(
    spark: SparkSession,
    stream_df: DataFrame,
    base_docs: DataFrame,
    workdir: str,
    k: int = 8,
) -> DataFrame:
    """Drain ``stream_df`` (availableNow) through foreachBatch span
    dedup against ``base_docs``; returns the consolidated per-doc
    excision spans for the STREAMED documents (same columns as
    ``ops.dedup.span_excision``)."""
    from osmart_etl_spark.ops.dedup import span_occurrences

    base_dir = os.path.join(workdir, "base_grams")
    inv_dir = os.path.join(workdir, "inventory")
    hits_dir = os.path.join(workdir, "hits")
    ckpt = os.path.join(workdir, "ckpt")

    # distinct gram digests of the immutable base corpus
    span_occurrences(base_docs, "doc_id", "text", k).select(
        "g"
    ).distinct().write.mode("overwrite").parquet(base_dir)

    def probe_batch(batch_df: DataFrame, batch_id: int) -> None:
        occ_b = span_occurrences(batch_df, "doc_id", "text", k).persist()
        base_g = spark.read.parquet(base_dir)
        batch_grams = occ_b.select("g").distinct().persist()

        # 1. batch positions whose gram is in the base corpus
        h_base = occ_b.join(base_g, "g").select("doc_id", "pos")

        # 2. batch positions whose gram occurs in an EARLIER arrival
        #    (different doc), plus 3. RETRO: those earlier arrivals'
        #    positions — their dup status may be established only now
        try:
            inv = spark.read.parquet(inv_dir)
        except Exception:  # first batch: empty inventory
            inv = None
        if inv is not None:
            coll = inv.join(F.broadcast(batch_grams), "g").persist()
            h_prev = (
                occ_b.alias("b")
                .join(
                    coll.select(F.col("doc_id").alias("__od"), "g").distinct(),
                    "g",
                )
                .filter(F.col("__od") != F.col("doc_id"))
                .select("doc_id", "pos")
            )
            b_docs = occ_b.select("doc_id", "g").distinct().select(
                F.col("doc_id").alias("__bd"), "g"
            )
            h_retro = (
                coll.join(b_docs, "g")
                .filter(F.col("__bd") != F.col("doc_id"))
                .select("doc_id", "pos")
            )
        else:
            h_prev = h_retro = None

        # 4. within-batch cross-doc duplicates
        gd = (
            occ_b.select("doc_id", "g")
            .distinct()
            .groupBy("g")
            .agg(F.count(F.lit(1)).alias("__nd"))
            .filter(F.col("__nd") >= 2)
            .select("g")
        )
        h_within = occ_b.join(gd, "g").select("doc_id", "pos")

        hits = h_base.unionByName(h_within)
        if h_prev is not None:
            hits = hits.unionByName(h_prev).unionByName(h_retro)
        hits.distinct().write.mode("append").parquet(hits_dir)
        occ_b.write.mode("append").parquet(inv_dir)
        if inv is not None:
            coll.unpersist()  # round 14: was leaked once per batch
        batch_grams.unpersist()
        occ_b.unpersist()

    q = (
        stream_df.writeStream.foreachBatch(probe_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    try:
        hits = spark.read.parquet(hits_dir)
    except Exception:
        return spark.createDataFrame(
            [],
            "doc_id bigint, span_start bigint, span_end bigint, "
            "span_len bigint, n_windows bigint",
        )
    return consolidate_spans(hits.distinct(), k)


def consolidate_spans(hits: DataFrame, k: int) -> DataFrame:
    """Gaps-and-islands merge of (doc_id, pos) hit windows into maximal
    spans — identical to the batch ``span_excision`` merge step."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    flagged = hits.withColumn(
        "__ns",
        F.when(
            F.lag("pos").over(w).isNull()
            | (F.col("pos") - F.lag("pos").over(w) > k),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    islands = flagged.withColumn(
        "__isl",
        F.sum("__ns").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy("doc_id", "__isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k)).cast("bigint").alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_len"),
            "n_windows",
        )
    )
