"""Streaming HLL register fold must equal the batch registers exactly,
regardless of micro-batch boundaries (max-merge associativity is the
sketch's whole operational contract)."""

from __future__ import annotations

import pytest

from osmart_etl_spark.streaming.hll_stream import batch_registers, run_hll_stream
from tests.conftest import SF_SMALL


@pytest.mark.slow
def test_hll_stream_matches_batch(spark, tmp_path):
    from osmart_etl_spark.io.sources import read_table

    ev = read_table(spark, SF_SMALL, "events").select("event_type", "user_id")
    # 5 files -> 5 micro-batches with maxFilesPerTrigger=1
    src = str(tmp_path / "ev_stream")
    ev.repartition(5).write.parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    got = run_hll_stream(spark, stream, str(tmp_path / "wd"))
    want = batch_registers(ev)

    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w and len(g) > 0


def test_hll_stream_registers_match_registry_query(spark, tmp_path):
    """The stream state feeds the same summary the registry query
    emits: fold the drained registers into (n_buckets_set, s_scaled)
    and compare against hll_portable_registers' columns."""
    from pyspark.sql import functions as F

    from osmart_etl_spark.io.sources import read_table
    from osmart_etl_spark.queries.base import REGISTRY

    ev = read_table(spark, SF_SMALL, "events").select("event_type", "user_id")
    src = str(tmp_path / "ev_stream2")
    ev.repartition(3).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    regs = run_hll_stream(spark, stream, str(tmp_path / "wd2"))
    summary = {
        (r.event_type): (r.n_buckets_set, r.s_scaled)
        for r in regs.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_buckets_set"),
            (
                F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 50 - CAST(reg AS INT))"))
                + (F.lit(256) - F.count(F.lit(1)))
                * F.expr("shiftleft(CAST(1 AS BIGINT), 50)")
            ).alias("s_scaled"),
        )
        .collect()
    }
    batch = {
        r.event_type: (r.n_buckets_set, r.s_scaled)
        for r in REGISTRY["hll_portable_registers"].fn(spark, SF_SMALL).collect()
    }
    assert summary == batch


@pytest.mark.slow
def test_hll_state_recovery_skips_incomplete_version(spark, tmp_path):
    """Crash-injection: a version directory WITHOUT _SUCCESS (crash
    mid-write) must be invisible to recovery — the previous complete
    version is the one read, so accumulated registers survive."""
    import os

    from osmart_etl_spark.streaming.hll_stream import _latest_complete_version

    base = str(tmp_path / "hll_state")
    complete = spark.createDataFrame(
        [("a", 0, 5)], "event_type string, bucket bigint, reg bigint"
    )
    complete.coalesce(1).write.parquet(base + "_v3")
    # simulate crash mid-write of v4: parquet data present, no _SUCCESS
    partial = spark.createDataFrame(
        [("a", 0, 1)], "event_type string, bucket bigint, reg bigint"
    )
    partial.coalesce(1).write.parquet(base + "_v4")
    os.remove(os.path.join(base + "_v4", "_SUCCESS"))

    assert _latest_complete_version(spark, base) == base + "_v3"
    got = spark.read.parquet(_latest_complete_version(spark, base)).collect()
    assert [(r.event_type, r.bucket, r.reg) for r in got] == [("a", 0, 5)]


def test_hll_replay_of_sealed_batch_short_circuits(spark, tmp_path):
    """Crash-injection: version _v<batch_id> sealed but the checkpoint
    never committed (crash after write+GC, before commit). On restart
    foreachBatch replays the same batch_id; the fold must SKIP instead of
    lazily reading the sealed dir while overwriting it (which raises
    'Cannot overwrite a path that is also being read from')."""
    from osmart_etl_spark.io.sources import read_table
    from osmart_etl_spark.streaming.hll_stream import batch_registers

    ev = read_table(spark, SF_SMALL, "events").select("event_type", "user_id")
    src = str(tmp_path / "ev_stream3")
    ev.coalesce(1).write.parquet(src)  # one file -> one micro-batch (id 0)

    wd = str(tmp_path / "wd3")
    # Simulate the crashed first attempt: _v0 sealed, checkpoint absent.
    state_base = wd + "/hll_state"
    batch_registers(ev).coalesce(1).write.parquet(state_base + "_v0")

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    got = run_hll_stream(spark, stream, wd)  # must not raise
    want = batch_registers(ev)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_hll_fresh_checkpoint_on_stale_state_raises_loudly(spark, tmp_path):
    """Round-12 (ADVICE low): state versions AHEAD of the incoming batch
    id cannot be crash-replay (a checkpoint never replays past its last
    commit) — they mean a FRESH checkpoint was pointed at a PRIOR run's
    state directory. The old `>=` guard silently dropped every early
    batch; the fold must now raise a state/checkpoint-mismatch error
    instead of committing data loss."""
    import pytest

    from osmart_etl_spark.io.sources import read_table
    from osmart_etl_spark.streaming.hll_stream import batch_registers

    ev = read_table(spark, SF_SMALL, "events").select("event_type", "user_id")
    src = str(tmp_path / "ev_stream4")
    ev.coalesce(1).write.parquet(src)  # one file -> one micro-batch (id 0)

    wd = str(tmp_path / "wd4")
    # stale state from a prior run: sealed _v7, but NO checkpoint in wd,
    # so the new query's first batch id is 0 < 7
    state_base = wd + "/hll_state"
    batch_registers(ev).coalesce(1).write.parquet(state_base + "_v7")

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(
        (RuntimeError, StreamingQueryException), match="mismatch"
    ):
        run_hll_stream(spark, stream, wd)


def test_hll_refold_same_batch_is_idempotent(spark):
    """Replaying a batch against state that already absorbed it is a
    no-op (MAX-merge idempotence) — the property that makes the
    versioned protocol exactly-once under foreachBatch retries."""
    from pyspark.sql import functions as F

    from osmart_etl_spark.io.sources import read_table
    from osmart_etl_spark.streaming.hll_stream import batch_registers
    from tests.conftest import SF_SMALL

    ev = read_table(spark, SF_SMALL, "events").select("event_type", "user_id")
    regs = batch_registers(ev)
    refolded = (
        regs.unionByName(regs)
        .groupBy("event_type", "bucket")
        .agg(F.max("reg").alias("reg"))
    )
    assert sorted(map(tuple, refolded.collect())) == sorted(
        map(tuple, regs.collect())
    )
