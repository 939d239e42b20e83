"""Streaming twin of ``hll_portable_registers``: the register table as
incrementally-merged micro-batch state.

This is the operational form of the sketch's merge contract — each
micro-batch computes ITS OWN register table (a bounded ≤ groups×m-row
aggregate of the batch, never the users), and folds it into the
persisted state with a MAX groupBy. Because max-merge is associative
and commutative, the drained state equals the batch computation over
the full event history regardless of batch boundaries — proved in
tests/test_hll_stream.py.

Crash safety: state is written as VERSIONED directories
``<state>_v<batch_id>`` (each sealed by parquet's ``_SUCCESS``), never
overwritten in place. A batch reads the latest COMPLETE version, folds,
writes its own version, then garbage-collects older ones — so a crash
at any point leaves the previous complete version intact, and a replay
of the same batch against state that already absorbed it is a no-op
(MAX-merge is idempotent). This is the same staged-publish discipline
as ``io/atomic.py``, specialized to bounded sketch state.

Limitation: version discovery uses driver-side ``os``/``glob``, so the
state directory must live on a filesystem the driver sees as POSIX
(local disk or a mounted NFS). On HDFS/S3, swap the listing for the
Hadoop FileSystem API (``spark._jvm.org.apache.hadoop.fs.FileSystem``);
the versioning protocol itself is object-store-safe (no rename-based
overwrite, no read-after-overwrite).

100 TB shape: state size is groups × 256 rows FOREVER (the whole point
of a sketch); per batch the shuffle carries at most that many rows, so
a year of streamed events costs the same state I/O as a day. Contrast
``streaming/incremental.py`` watermark state (grows with keys) — the
sketch is the degenerate-size end of the state-management spectrum.
"""

from __future__ import annotations

import glob
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_VERSION_RE = re.compile(r"_v(\d+)$")


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


def _latest_complete_version(state_base: str) -> str | None:
    """Path of the highest-numbered ``<state_base>_v<N>`` directory that
    carries a ``_SUCCESS`` marker, or None if no complete state exists.
    Incomplete versions (crash mid-write) are invisible here."""
    best_path, best_id = None, -1
    for d in glob.glob(state_base + "_v*"):
        m = _VERSION_RE.search(d)
        if m and os.path.exists(os.path.join(d, "_SUCCESS")):
            vid = int(m.group(1))
            if vid > best_id:
                best_id, best_path = vid, d
    return best_path


def run_hll_stream(
    spark: SparkSession, stream_df: DataFrame, workdir: str
) -> DataFrame:
    """Drain ``stream_df`` (availableNow) folding each micro-batch's
    registers into the versioned state table; returns the final
    registers."""
    state_base = os.path.join(workdir, "hll_state")
    ckpt = os.path.join(workdir, "ckpt")

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        regs_b = batch_registers(batch_df)
        prev_dir = _latest_complete_version(state_base)
        if prev_dir is not None:
            merged = (
                spark.read.parquet(prev_dir)
                .unionByName(regs_b)
                .groupBy("event_type", "bucket")
                .agg(F.max("reg").alias("reg"))
            )
        else:
            merged = regs_b
        # bounded state: groups × 256 rows — one file is the right layout.
        # mode=overwrite clears a partial (_SUCCESS-less) leftover of a
        # crashed earlier attempt at this same batch_id.
        out = f"{state_base}_v{batch_id}"
        merged.coalesce(1).write.mode("overwrite").parquet(out)
        # GC strictly AFTER the new version is sealed: a crash here
        # leaves extra complete versions behind, which is harmless (the
        # next batch reads only the latest).
        for d in glob.glob(state_base + "_v*"):
            m = _VERSION_RE.search(d)
            if m and int(m.group(1)) < batch_id:
                shutil.rmtree(d, ignore_errors=True)

    (
        stream_df.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    final = _latest_complete_version(state_base)
    if final is None:
        raise FileNotFoundError(f"no complete HLL state under {state_base}_v*")
    return spark.read.parquet(final)
