"""Custom Python DataSource tests: determinism across partition counts,
filter pushdown correctness (pushed vs post-filtered must agree), and
executor-side generation (io/pydatasource.py)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(autouse=True)
def _restore_pushdown_conf(spark):
    """_register flips a session conf on the shared fixture; restore it
    after every test so later tests see the vanilla session."""
    key = "spark.sql.python.filterPushdown.enabled"
    prior = spark.conf.get(key, None)
    yield
    if prior is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, prior)


def _register(spark):
    from osmart_etl_spark.io.pydatasource import SyntheticEventsDataSource

    # required whenever a Python source implements pushFilters (reader
    # init fails otherwise); get_spark sets it by default, the vanilla
    # test session does not
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsDataSource)


def test_same_rows_for_any_partitioning(spark):
    _register(spark)
    a = (
        spark.read.format("synthetic_events")
        .option("n_rows", 500)
        .option("partitions", 2)
        .load()
    )
    b = (
        spark.read.format("synthetic_events")
        .option("n_rows", 500)
        .option("partitions", 7)
        .load()
    )
    assert a.count() == 500
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb
    assert a.rdd.getNumPartitions() == 2
    assert b.rdd.getNumPartitions() == 7


def test_pushdown_matches_post_filter(spark):
    """The rows surviving source-side pushdown must equal applying the
    same predicates to the unfiltered read — pushdown is an
    optimization, never a semantics change."""
    _register(spark)
    full = (
        spark.read.format("synthetic_events").option("n_rows", 1000).load()
    )
    want = sorted(
        map(
            tuple,
            full.filter(
                (F.col("event_type") == "purchase") & (F.col("user_id") >= 500)
            ).collect(),
        )
    )
    pushed = (
        spark.read.format("synthetic_events")
        .option("n_rows", 1000)
        .load()
        .filter((F.col("event_type") == "purchase") & (F.col("user_id") >= 500))
    )
    got = sorted(map(tuple, pushed.collect()))
    assert got == want
    assert len(got) > 0


def test_unsupported_filters_still_applied(spark):
    """A predicate the source does NOT accept (value range) must still
    hold on the result — Spark re-applies yielded-back filters."""
    _register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", 800)
        .load()
        .filter((F.col("value") > 100.0) & (F.col("event_type") == "click"))
    )
    rows = df.collect()
    assert rows
    assert all(r["value"] > 100.0 and r["event_type"] == "click" for r in rows)


def test_joins_with_parquet_tables(spark):
    """The synthetic feed must compose with the lake tables like any
    other source (mixed-source join, as multi_source_union does for
    files)."""
    from osmart_etl_spark.io.sources import read_table
    from tests.conftest import SF_SMALL

    _register(spark)
    feed = (
        spark.read.format("synthetic_events").option("n_rows", 300).load()
    )
    ev = read_table(spark, SF_SMALL, "events").select("user_id").distinct()
    j = feed.join(ev, "user_id").groupBy("event_type").count()
    assert j.count() > 0


@pytest.mark.slow
def test_stream_reader_incremental_drain_exactly_once(spark, tmp_path):
    """The streaming side of the synthetic source: repeated availableNow
    runs against ONE checkpoint must advance through the ledger batch
    by batch (cron-style incremental runs) and deliver every row
    EXACTLY once — offsets are event_ids, so recovery replay
    (readBetweenOffsets) can never invent or lose rows. The final
    streamed set must equal the batch read bit-for-bit."""
    _register(spark)
    ck = str(tmp_path / "ck_synth")
    total = 230  # deliberately not a multiple of batch_rows

    out = str(tmp_path / "out_synth")

    def drain_once() -> int:
        s = (
            spark.readStream.format("synthetic_events")
            .option("n_rows", total)
            .option("batch_rows", 100)
            .load()
        )
        q = (
            s.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).count()

    counts = [drain_once() for _ in range(4)]
    assert counts[-1] == total, counts
    assert counts == sorted(counts), counts  # monotone progress
    streamed = {tuple(r) for r in spark.read.parquet(out).collect()}
    batch = {
        tuple(r)
        for r in spark.read.format("synthetic_events")
        .option("n_rows", total)
        .load()
        .collect()
    }
    assert streamed == batch
    assert len(streamed) == total  # no duplicates across drains


def test_writer_two_phase_commit(spark, tmp_path):
    """The Python writer's commit protocol: after a successful save the
    directory holds only published part files + the _SUCCESS manifest
    (no staging debris), the manifest row counts add up, and the data
    round-trips."""
    import json
    import os

    _register(spark)
    out = str(tmp_path / "jsonl_out")
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", 200)
        .option("partitions", 3)
        .load()
    )
    df.write.format("synthetic_events").option("path", out).mode("append").save()

    names = sorted(os.listdir(out))
    assert "_SUCCESS" in names
    assert not any(n.startswith("_staged-") for n in names), names
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert sum(f["n_rows"] for f in manifest["files"]) == 200
    assert {f["file"] for f in manifest["files"]} == {
        n for n in names if n.startswith("part-")
    }

    back = spark.read.json(os.path.join(out, "part-*.jsonl"))
    assert back.count() == 200
    assert set(back.columns) == {"event_id", "ts", "user_id", "event_type", "value"}
    got_ids = {r["event_id"] for r in back.select("event_id").collect()}
    assert got_ids == set(range(200))


def test_writer_abort_leaves_no_debris(spark, tmp_path):
    """A failing task must abort the job and leave no published files —
    a reader honoring _SUCCESS sees nothing."""
    import os

    import pytest

    _register(spark)
    out = str(tmp_path / "jsonl_fail")
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", 50)
        .load()
        .select(
            "event_id",
            (F.col("value") / F.when(F.col("event_id") == 33, 0).otherwise(1)).alias(
                "boom"
            ),
        )
    )
    # ANSI division by zero fails the task mid-write
    with pytest.raises(Exception):
        df.write.format("synthetic_events").option("path", out).mode("append").save()
    if os.path.isdir(out):
        names = os.listdir(out)
        assert "_SUCCESS" not in names
        assert not any(n.startswith("part-") for n in names), names


def test_chained_filters_combine_not_overwrite(spark):
    """Two >= bounds on the same column must BOTH hold (the consumed
    set folds to the max); a second, different equality must yield
    back to Spark and produce zero rows — the overwrite bug returned
    916 rows for the chained-bounds case."""
    _register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", 1000)
        .load()
    )
    both = df.filter(F.col("user_id") >= 900).filter(F.col("user_id") >= 100)
    rows = both.collect()
    assert rows and all(r["user_id"] >= 900 for r in rows)
    want = df.filter(F.col("user_id") >= 900).count()
    assert len(rows) == want

    contradiction = df.filter(F.col("event_type") == "click").filter(
        F.col("event_type") == "purchase"
    )
    assert contradiction.count() == 0


def test_writer_append_does_not_clobber(spark, tmp_path):
    """Two append saves to one path must yield the union of both jobs:
    per-job part naming and a cumulative manifest (the deterministic
    part-00000 naming silently overwrote the first job)."""
    import json
    import os

    _register(spark)
    out = str(tmp_path / "jsonl_append2")
    feed = spark.read.format("synthetic_events").option("n_rows", 120).load()
    feed.write.format("synthetic_events").option("path", out).mode("append").save()
    feed.write.format("synthetic_events").option("path", out).mode("append").save()
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert sum(f["n_rows"] for f in manifest["files"]) == 240
    back = spark.read.json(os.path.join(out, "part-*.jsonl"))
    assert back.count() == 240

    # overwrite retires the older jobs' files
    feed.write.format("synthetic_events").option("path", out).mode(
        "overwrite"
    ).save()
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert sum(f["n_rows"] for f in manifest["files"]) == 120
    assert spark.read.json(os.path.join(out, "part-*.jsonl")).count() == 120


def test_writer_abort_removes_staging_debris(spark, tmp_path):
    """After a failed job, no _staged files may remain (abort receives
    None slots for unfinished tasks and must skip them, not crash)."""
    import os

    import pytest as _pytest

    _register(spark)
    out = str(tmp_path / "jsonl_debris")
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", 60)
        .option("partitions", 3)
        .load()
        .select(
            "event_id",
            (F.col("value") / F.when(F.col("event_id") == 55, 0).otherwise(1)).alias(
                "boom"
            ),
        )
    )
    with _pytest.raises(Exception):
        df.write.format("synthetic_events").option("path", out).mode("append").save()
    if os.path.isdir(out):
        assert not any(n.startswith("_staged-") for n in os.listdir(out)), os.listdir(out)
