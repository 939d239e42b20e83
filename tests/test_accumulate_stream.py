"""Streaming additive twin == batch aggregate regardless of micro-batch
boundaries; kill-and-resume completes exactly-once; a redelivered epoch
is absorbed by the committed ledger (round 12, VERDICT r11 #6)."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from osmart_etl_spark.io.atomic import current_version, read_committed
from osmart_etl_spark.streaming.accumulate_stream import run_accumulate_stream
from tests.conftest import SF_SMALL


def _totals(spark, table):
    return {
        r["user_id"]: (str(r["value"]), r["n"])
        for r in read_committed(spark, table).collect()
    }


def _want(ev):
    agg = ev.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("value"),
        F.sum("n").alias("n"),
    )
    return {r["user_id"]: (str(r["value"]), r["n"]) for r in agg.collect()}


def _prep(spark, tmp_path, n_files, name="ev_stream"):
    from osmart_etl_spark.io.sources import read_table

    ev = read_table(spark, SF_SMALL, "events").select(
        "user_id",
        F.col("value").cast("decimal(18,2)").alias("value"),
        F.lit(1).cast("bigint").alias("n"),
    )
    src = str(tmp_path / name)
    ev.repartition(n_files).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    return ev, src, stream


@pytest.mark.slow
def test_accumulate_stream_matches_batch_aggregate(spark, tmp_path):
    """5 micro-batches of additive folds == the one-shot groupBy sum,
    and the ledger ends as ONE high-water-mark entry (not 5)."""
    ev, _src, stream = _prep(spark, tmp_path, 5)
    table = str(tmp_path / "agg_stream")
    run_accumulate_stream(
        spark, stream, table, keys=["user_id"], sum_cols=["value", "n"],
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    got = _totals(spark, table)
    want = _want(ev)
    assert got == want and len(got) > 0

    cur = current_version(spark, table)
    with open(f"{table}/_v-{cur[1]}/_ledger.json") as fh:
        led = json.load(fh)
    assert led["hwm"] == {"stream": 4}  # epochs 0..4, one entry forever
    assert led["ids"] == []


@pytest.mark.slow
def test_accumulate_stream_kill_and_resume_exactly_once(spark, tmp_path):
    """Crash-injection in the test_sales_pipeline_crash_mid_publish
    discipline: the stream dies AFTER epoch 0's sink commit but BEFORE
    its checkpoint commit. The restart redelivers epoch 0; the
    committed ledger absorbs it, the remaining epochs fold, and the
    final table equals the batch aggregate — no loss, no double count."""
    from osmart_etl_spark.io.sinks import merge_accumulate_versioned

    ev, _src, stream = _prep(spark, tmp_path, 4)
    table = str(tmp_path / "agg_crash_stream")
    ckpt = str(tmp_path / "ckpt_crash")

    class Boom(RuntimeError):
        pass

    def fold_then_die(batch_df, batch_id):
        # the real fold commits (table + ledger, one CAS publish) ...
        merge_accumulate_versioned(
            spark, batch_df, table, keys=["user_id"], sum_cols=["value", "n"],
            batch_id=("stream", int(batch_id)),
        )
        # ... then the "process" dies before the checkpoint commits
        raise Boom(f"killed after folding epoch {batch_id}")

    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException):
        (
            stream.writeStream.foreachBatch(fold_then_die)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
    # epoch 0 is in the table+ledger, NOT in the checkpoint
    assert len(_totals(spark, table)) > 0

    # resume with the production twin on the SAME checkpoint/writer_id
    # (and the SAME source dir — the checkpoint pins the source path)
    schema = spark.read.parquet(_src).schema
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(_src)
    )
    run_accumulate_stream(
        spark, stream2, table, keys=["user_id"], sum_cols=["value", "n"],
        checkpoint_dir=ckpt,
    )
    assert _totals(spark, table) == _want(ev)


@pytest.mark.slow
def test_accumulate_stream_fresh_checkpoint_same_writer_raises(spark, tmp_path):
    """A FRESH checkpoint replaying epochs the same writer_id already
    advanced past is a state/checkpoint MISMATCH, not a quiet no-op:
    epoch boundaries need not reproduce the original batching, so
    silently skipping could drop new rows (round-12 review — the same
    loud-failure rule as hll_stream). Table contents stay unchanged,
    and a DIFFERENT writer_id is a genuinely new stream, which folds."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    ev, _src, stream = _prep(spark, tmp_path, 3)
    table = str(tmp_path / "agg_redeliver")
    run_accumulate_stream(
        spark, stream, table, keys=["user_id"], sum_cols=["value", "n"],
        checkpoint_dir=str(tmp_path / "ckpt_a"),
    )
    once = _totals(spark, table)
    assert once == _want(ev)

    _ev2, _src2, stream2 = _prep(spark, tmp_path, 3, name="ev_replay")
    with pytest.raises(StreamingQueryException, match="mismatch"):
        run_accumulate_stream(  # same writer, fresh checkpoint -> loud
            spark, stream2, table, keys=["user_id"], sum_cols=["value", "n"],
            checkpoint_dir=str(tmp_path / "ckpt_b"),
        )
    assert _totals(spark, table) == once  # nothing double-counted

    _ev3, _src3, stream3 = _prep(spark, tmp_path, 3, name="ev_backfill")
    run_accumulate_stream(  # different writer -> a real second stream
        spark, stream3, table, keys=["user_id"], sum_cols=["value", "n"],
        checkpoint_dir=str(tmp_path / "ckpt_c"), writer_id="backfill",
    )
    doubled = {
        u: (str(sum((__import__("decimal").Decimal(t) for t in (tot, tot)))), n * 2)
        for u, (tot, n) in once.items()
    }
    assert _totals(spark, table) == doubled
