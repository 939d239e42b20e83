"""Streaming CDC → SCD2 dimension maintenance: a foreachBatch pipeline
that applies each micro-batch of changes through ``scd2_apply``
(read-modify-overwrite with a localCheckpoint barrier, the same
self-overwrite discipline as merge_upsert_partitioned) must converge to
exactly the history a one-shot batch apply over the full change log
produces — the T5/T6 stream==batch twin for versioned dimensions.

Micro-batch order is made deterministic by writing one parquet file per
ts-quartile slice and giving the files strictly increasing mtimes:
Spark's file stream source processes files in modification-time order,
so with maxFilesPerTrigger=1 the CDC feed arrives in event-time order,
as a real change-data capture stream does."""

from __future__ import annotations

import pytest

import os
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

KEYS = ["user_id"]
ATTRS = ["event_type", "value"]


def _change_log(spark):
    """Events as a CDC feed over a user dimension, ties pre-deduped by
    event_id (scd2_apply's tie rule is for cross-batch redelivery, not
    intra-log duplicates)."""
    from osmart_etl_spark.io.sources import read_table

    ev = read_table(spark, SF_SMALL, "events")
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    return (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "ts", "event_type", "value")
    )


def _norm(df):
    return sorted(
        (
            r["user_id"],
            r["event_type"],
            r["value"],
            r["valid_from"],
            r["valid_to"],
            r["is_current"],
        )
        for r in df.collect()
    )


@pytest.mark.slow
def test_streaming_cdc_scd2_matches_batch(spark, tmp_path):
    from osmart_etl_spark.io.sinks import scd2_apply
    from osmart_etl_spark.io.sources import path_exists

    log = _change_log(spark).cache()

    # one file per ts-quartile (ntile over event order), strictly
    # increasing mtimes
    feed = tmp_path / "cdc_feed"
    feed.mkdir()
    wq = Window.orderBy("ts", "user_id")
    sliced = log.withColumn("__q", F.ntile(4).over(wq)).cache()
    t0 = time.time()
    for i in range(1, 5):
        tmp_out = tmp_path / f"slice_out_{i}"
        sliced.filter(F.col("__q") == i).drop("__q").coalesce(1).write.parquet(
            str(tmp_out)
        )
        part = next(tmp_out.glob("part-*.parquet"))
        p = feed / f"slice_{i}.parquet"
        part.rename(p)
        os.utime(p, (t0 + i * 10, t0 + i * 10))

    sink = str(tmp_path / "dim_scd2")

    def apply_batch(batch_df, batch_id):
        cur = spark.read.parquet(sink) if path_exists(spark, sink) else None
        merged = scd2_apply(cur, batch_df, KEYS, "ts", ATTRS)
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(sink)

    schema = spark.read.parquet(str(feed)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed))
    )
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    want = _norm(scd2_apply(None, log, KEYS, "ts", ATTRS))
    got = _norm(spark.read.parquet(sink))
    assert got == want

    # chain invariants on the streamed result
    hist = spark.read.parquet(sink)
    opens = hist.filter(F.col("is_current")).groupBy("user_id").count()
    assert opens.filter(F.col("count") != 1).count() == 0


def test_streaming_cdc_scd2_redelivery_noop(spark, tmp_path):
    """Redelivering an entire already-applied slice leaves the history
    byte-identical (idempotent CDC apply — T6 for dimensions)."""
    from osmart_etl_spark.io.sinks import scd2_apply

    log = _change_log(spark).cache()
    wq = Window.orderBy("ts", "user_id")
    first = (
        log.withColumn("__q", F.ntile(2).over(wq))
        .filter(F.col("__q") == 1)
        .drop("__q")
    )
    dim1 = scd2_apply(None, first, KEYS, "ts", ATTRS).localCheckpoint(eager=True)
    dim2 = scd2_apply(dim1, first, KEYS, "ts", ATTRS)
    assert _norm(dim2) == _norm(dim1)
