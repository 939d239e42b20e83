"""Physical-plan regression tests — the scale properties SCALE.md
documents must not silently regress: pushdown reaching the scan,
broadcast-only star joins, the single-exchange replay."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def _formatted_plan(df) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )


def test_filter_pushdown_reaches_scan(spark):
    from osmart_etl_spark.queries.relational import filter_range_pushdown

    plan = _formatted_plan(filter_range_pushdown(spark, SF_SMALL))
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    # projection pruned to exactly the 5 selected columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," in plan


def test_star_join_all_broadcast(spark):
    from osmart_etl_spark.queries.relational import star_join_revenue

    plan = _formatted_plan(star_join_revenue(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_replay_single_exchange(spark):
    """The W2 flagship must stay ONE exchange + stacked same-partition
    windows (SCALE.md) — the (key, segment) formulation would re-add a
    second shuffle."""
    from osmart_etl_spark.queries.temporal import segmented_replay

    plan = _formatted_plan(segmented_replay(spark, SF_SMALL))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Window") >= 3


def test_anti_join_broadcast(spark):
    from osmart_etl_spark.queries.relational import anti_join_exclusions

    plan = _formatted_plan(anti_join_exclusions(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_simhash_zero_shuffle(spark):
    """The fold-based SimHash must stay a pure projection: no
    hash-partitioning exchange anywhere (the only exchange is the
    round-robin repartition off the single input file)."""
    from osmart_etl_spark.ops.dedup import simhash60
    from osmart_etl_spark.io.sources import read_table

    df = simhash60(read_table(spark, SF_SMALL, "documents"), "doc_id", "text")
    plan = _formatted_plan(df)
    assert "Exchange hashpartitioning" not in plan, plan


def test_minhash_bands_single_hash_exchange(spark):
    """Signature + band keys = ONE hash exchange (the groupBy-min);
    the former stack + groupBy(id, band) second shuffle must not
    reappear."""
    from osmart_etl_spark.ops.dedup import minhash_band_keys, shingle_sets

    # Fresh local input: reading the shared documents table here can hit
    # another test's persisted shingle_sets, and the cached plan's
    # printed lineage double-counts exchanges.
    docs = spark.createDataFrame(
        [(i, f"some deterministic text body number {i} with shingles") for i in range(50)],
        ["doc_id", "text"],
    )
    sets = shingle_sets(docs, "doc_id", "text")
    plan = _formatted_plan(minhash_band_keys(sets, "doc_id"))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    # map-side combine before the exchange
    assert "partial_min" in plan or "HashAggregate" in plan


def test_contamination_benchmark_broadcast(spark):
    """The benchmark n-gram set must broadcast — the corpus-side gram
    table must not shuffle for the overlap join."""
    from osmart_etl_spark.queries.text import contamination_check

    plan = _formatted_plan(contamination_check(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan, plan


def test_replay_chunked_bounded_partitions(spark):
    """The skew-proof W2 must keep every per-row window partitioned by
    (key, chunk) — a window partitioned by the key alone over the row
    stream would reintroduce the unbounded hot-key partition. The only
    key-alone windows allowed are on the tiny chunk-summary side."""
    from osmart_etl_spark.queries.temporal import segmented_replay_chunked

    plan = _formatted_plan(segmented_replay_chunked(spark, SF_SMALL))
    # per-row exchanges carry the chunk column alongside the key
    assert "hashpartitioning(user_id" in plan
    assert "__chunk" in plan, plan
    # windowed per-row passes: every Window block that orders by event_id
    # (the row stream) must list __chunk in its partition spec
    import re

    for m in re.finditer(r"Window \[([^\]]*)\], \[([^\]]*)\], \[([^\]]*)\]", plan):
        spec_cols, part, _order = m.groups()
        if "event_id" in _order or "event_id" in spec_cols:
            assert "__chunk" in part, f"row-stream window missing chunk: {m.group(0)}"


def test_pii_scrub_zero_shuffle(spark):
    """The cheapest-possible shape claimed in SCALE.md: one projection
    over one scan — no exchange of any kind, no join."""
    from osmart_etl_spark.queries.cleaning import pii_scrub

    plan = _formatted_plan(pii_scrub(spark, SF_SMALL))
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_paragraph_dedup_bounded_exchanges(spark):
    """First-occurrence resolution must stay aggregate-then-join: one
    digest MIN aggregate + the join-back + per-doc reassembly — never a
    window over all occurrences, and never more than 3 hash exchanges
    regardless of how the stages are recomposed."""
    from osmart_etl_spark.queries.cleaning import paragraph_dedup

    plan = _formatted_plan(paragraph_dedup(spark, SF_SMALL))
    assert plan.count("Exchange hashpartitioning") <= 3, plan
    assert "Window" not in plan, plan


def test_training_pipeline_single_shuffle_pair(spark):
    """The composed pipeline's whole per-row work (quality filter,
    redaction, chunking) fuses around ONE dedup shuffle pair — a pass
    per stage would show up here as extra exchanges."""
    from osmart_etl_spark.queries.cleaning import corpus_training_pipeline

    plan = _formatted_plan(corpus_training_pipeline(spark, SF_SMALL))
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "Window" not in plan, plan
