"""Streaming twin of ``hll_portable_registers``: the register table as
incrementally-merged micro-batch state.

This is the operational form of the sketch's merge contract — each
micro-batch computes ITS OWN register table (a bounded ≤ groups×m-row
aggregate of the batch, never the users), and folds it into the
persisted state with a MAX groupBy. Because max-merge is associative
and commutative, the drained state equals the batch computation over
the full event history regardless of batch boundaries — proved in
tests/test_hll_stream.py.

100 TB shape: state size is groups × 256 rows FOREVER (the whole point
of a sketch); per batch the shuffle carries at most that many rows, so
a year of streamed events costs the same state I/O as a day. Contrast
``streaming/incremental.py`` watermark state (grows with keys) — the
sketch is the degenerate-size end of the state-management spectrum.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def batch_registers(ev: DataFrame) -> DataFrame:
    """(event_type, bucket, reg) portable-HLL registers of ``ev`` —
    identical arithmetic to the registered batch query."""
    hx = F.md5(F.col("user_id").cast("string"))
    v = F.conv(F.substring(hx, 3, 12), 16, 10).cast("bigint")
    rho = (
        F.when(v == 0, F.lit(49))
        .otherwise(F.lit(49) - F.length(F.bin(v)))
        .cast("bigint")
    )
    return (
        ev.select(
            "event_type",
            F.conv(F.substring(hx, 1, 2), 16, 10).cast("bigint").alias("bucket"),
            rho.alias("r"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.max("r").alias("reg"))
    )


def run_hll_stream(
    spark: SparkSession, stream_df: DataFrame, workdir: str
) -> DataFrame:
    """Drain ``stream_df`` (availableNow) folding each micro-batch's
    registers into the state table; returns the final registers."""
    state_dir = os.path.join(workdir, "hll_state")
    ckpt = os.path.join(workdir, "ckpt")

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        regs_b = batch_registers(batch_df)
        if os.path.exists(os.path.join(state_dir, "_SUCCESS")):
            prev = spark.read.parquet(state_dir)
            merged = (
                prev.unionByName(regs_b)
                .groupBy("event_type", "bucket")
                .agg(F.max("reg").alias("reg"))
            )
        else:
            merged = regs_b
        # bounded state: groups × 256 rows — one file is the right layout
        merged.coalesce(1).write.mode("overwrite").parquet(state_dir + "_next")
        spark.read.parquet(state_dir + "_next").coalesce(1).write.mode(
            "overwrite"
        ).parquet(state_dir)

    (
        stream_df.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.read.parquet(state_dir)
