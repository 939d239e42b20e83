"""Streaming MERGE twin == batch keep-latest, regardless of micro-batch
boundaries; a replayed batch (foreachBatch retry semantics) is a
no-op on table contents."""

from __future__ import annotations

import pytest

from osmart_etl_spark.io.sinks import read_merge_table, upsert_keep_latest
from osmart_etl_spark.streaming.merge_stream import run_merge_stream
from tests.conftest import SF_SMALL


def _kv(df):
    return {
        (r["user_id"], r["d"]): (r["value"],)
        for r in df.select("user_id", "d", "value").collect()
    }


@pytest.mark.slow
def test_merge_stream_matches_batch_upsert(spark, tmp_path):
    from pyspark.sql import functions as F

    from osmart_etl_spark.io.sources import read_table

    ev = read_table(spark, SF_SMALL, "events").select(
        "user_id", F.to_date("ts").alias("d"), "value", "ts"
    )
    # 5 files -> 5 micro-batches; rows arrive in arbitrary order
    src = str(tmp_path / "cdc_stream")
    ev.repartition(5).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    table = str(tmp_path / "merged")
    run_merge_stream(
        spark,
        stream,
        table,
        ["user_id", "d"],
        "ts",
        n_buckets=8,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )

    got = _kv(read_merge_table(spark, table))
    want = _kv(
        upsert_keep_latest(
            ev.limit(0), ev, ["user_id", "d"], "ts"
        )
    )
    assert got == want and len(got) > 0


def test_merge_stream_replayed_batch_is_noop(spark, tmp_path):
    """foreachBatch retry semantics: merging the SAME batch twice
    leaves table contents unchanged (keep-latest idempotence through
    the versioned bucket protocol)."""
    from osmart_etl_spark.io.sinks import merge_upsert_partitioned

    table = str(tmp_path / "merged2")
    batch = spark.createDataFrame(
        [(1, "2024-01-01", 5.0, 10), (2, "2024-01-01", 7.0, 11)],
        "user_id bigint, d string, value double, ts bigint",
    )
    merge_upsert_partitioned(spark, batch, table, ["user_id", "d"], "ts", n_buckets=4)
    first = _kv(read_merge_table(spark, table))
    merge_upsert_partitioned(spark, batch, table, ["user_id", "d"], "ts", n_buckets=4)
    assert _kv(read_merge_table(spark, table)) == first
