"""Physical-plan regression tests — the scale properties SCALE.md
documents must not silently regress: pushdown reaching the scan,
broadcast-only star joins, the single-exchange replay."""

from __future__ import annotations

import pytest

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


def _synth_skewed_movements(spark, n_rows: int, hot_rows: int):
    """Deterministic movement log with one hot key (key 0) owning
    ``hot_rows`` of ``n_rows`` events — miniature of tools/skew_smoke.py."""
    from pyspark.sql import functions as F

    return (
        spark.range(0, n_rows, 1, 8)
        .select(
            F.col("id").alias("event_id"),
            F.when(F.col("id") < hot_rows, F.lit(0))
            .otherwise(F.col("id") % 37 + 1)
            .alias("user_id"),
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000) + F.col("id") * 60_000_000
            ).alias("ts"),
            (F.pmod(F.xxhash64("id"), F.lit(11)) == 0).alias("is_abs"),
            F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100)).cast("double").alias("abs_value"),
            (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(9)) - 4).cast("double").alias("delta"),
        )
        .withColumn("abs_value", F.when(F.col("is_abs"), F.col("abs_value")))
        .withColumn(
            "delta", F.when(F.col("is_abs"), F.lit(0.0)).otherwise(F.col("delta"))
        )
    )


def test_replay_auto_dispatch_plan_shapes(spark):
    """The W2 skew dispatch (round 11): a 50%-hot-key input through the
    SAME entry point must plan the CHUNKED shape (every row-stream
    window partitioned by (key, chunk)), a uniform input the FLAT shape
    (one exchange, no join) — and both dispatches return results
    bit-equal to the flat reference on the same input."""
    import re

    from pyspark.sql import functions as F

    from osmart_etl_spark.ops.windows import (
        replay_running_balance,
        replay_running_balance_auto,
    )

    kw = dict(
        key="user_id", order=["ts", "event_id"],
        delta_col="delta", is_absolute_col="is_abs", abs_value_col="abs_value",
    )
    chunk = F.floor(F.unix_micros("ts") / F.lit(86_400 * 1_000_000))

    hot = _synth_skewed_movements(spark, 400, 200)
    auto_hot = replay_running_balance_auto(hot, chunk=chunk, task_row_budget=100, **kw)
    plan = _formatted_plan(auto_hot)
    assert "__chunk" in plan, plan
    for m in re.finditer(r"Window \[([^\]]*)\], \[([^\]]*)\], \[([^\]]*)\]", plan):
        spec_cols, part, _order = m.groups()
        if "event_id" in _order or "event_id" in spec_cols:
            assert "__chunk" in part, f"row-stream window missing chunk: {m.group(0)}"

    uniform = _synth_skewed_movements(spark, 400, 0)
    auto_uni = replay_running_balance_auto(uniform, chunk=chunk, task_row_budget=100, **kw)
    plan_uni = _formatted_plan(auto_uni)
    assert plan_uni.count("Exchange hashpartitioning") == 1, plan_uni
    assert "Join" not in plan_uni, plan_uni

    # dispatch never changes results: both equal the flat reference
    def rows(df):
        return sorted(
            (r.event_id, r.running, r.effective_delta) for r in df.collect()
        )

    assert rows(auto_hot) == rows(replay_running_balance(hot, **kw))
    assert rows(auto_uni) == rows(replay_running_balance(uniform, **kw))


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


@pytest.mark.slow
def test_jaccard_verify_dispatch(spark):
    """Size dispatch for the exact-verify stage (VERDICT r3 #4): sparse
    candidates over a big corpus must take the candidate-pruned
    array_intersect shape (cost ∝ |candidates|); the dense-tiny regime
    keeps the corpus-explode hash-join. The decision rule is pure and
    pinned here; the plan-lock asserts the candidate-id semi-join is
    broadcast above the crossover. Both shapes must return identical
    rows."""
    from osmart_etl_spark.ops.dedup import (
        choose_jaccard_verify,
        estimate_corpus_shingles,
        jaccard_verify_auto,
        jaccard_verify_hybrid,
        jaccard_verify_sets,
        shingle_sets,
    )

    # decision table, three tiers (round 9): whole-corpus broadcast
    # below the budget (measured fastest at every test SF AND the OOM
    # guard — the forced broadcast died at sf0.1×10 amplified volume),
    # corpus-explode hybrid in the middle band, candidate-pruned sets
    # in the web-corpus regime (sparse or high-degree + huge)
    assert choose_jaccard_verify(5_000, 1_021_477, 4_368) == "bcast"
    assert choose_jaccard_verify(5_000, 1_021_477, 100) == "bcast"
    assert choose_jaccard_verify(5_000, 1_021_477, 4_368, n_pairs=47_900) == "bcast"
    # mid band (past the broadcast budget, under the corpus floor): hybrid
    assert choose_jaccard_verify(50_000, 8_000_000, 40_000) == "hybrid"
    assert choose_jaccard_verify(10_000_000, 2_000_000_000, 40_000) == "sets"
    # huge but dense: pruning buys nothing
    assert choose_jaccard_verify(10_000_000, 2_000_000_000, 9_000_000) == "hybrid"
    # round-9 degree guard: dense AND high candidate degree — hybrid's
    # pairs-side expansion shuffles degree × corpus shingles, so the
    # sf0.1×100 configuration (500k docs, 87% dense, |pairs| ≫ 2·|docs|)
    # must fall to sets regardless of density
    assert (
        choose_jaccard_verify(
            500_000, 102_000_000, 435_000, n_pairs=5_000_000
        )
        == "sets"
    )
    # dense but LOW degree (pairs ≈ docs): explode volume ≈ corpus — hybrid ok
    assert (
        choose_jaccard_verify(
            500_000, 102_000_000, 435_000, n_pairs=500_000
        )
        == "hybrid"
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(30))) for i in range(60)],
        ["doc_id", "text"],
    )
    n_docs, n_sh = estimate_corpus_shingles(docs, "text", k=5)
    assert n_docs == 60 and n_sh > 0
    sets = shingle_sets(docs, "doc_id", "text", k=5).persist()
    pairs = spark.createDataFrame([(0, 7), (3, 10)], ["id_a", "id_b"])

    # above the crossover (force via budget=floor=0): sets shape, with
    # the broadcast candidate-id prune BEFORE any explode
    sparse = jaccard_verify_auto(
        sets, pairs, "doc_id", n_docs=n_docs, n_corpus_shingles=n_sh,
        corpus_floor=0, bcast_budget=0,
    )
    plan = _formatted_plan(sparse)
    assert "array_intersect" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "explode" not in plan.lower(), plan

    # mid band (budget=0, floor default): hybrid (corpus-explode) shape
    dense = jaccard_verify_auto(
        sets, pairs, "doc_id", n_docs=n_docs, n_corpus_shingles=n_sh,
        bcast_budget=0,
    )
    dplan = _formatted_plan(dense)
    assert "array_intersect" not in dplan, dplan

    # tiny corpus, defaults: the zero-shuffle whole-corpus-broadcast
    # form — array_intersect with NO hash exchange anywhere
    bc = jaccard_verify_auto(
        sets, pairs, "doc_id", n_docs=n_docs, n_corpus_shingles=n_sh
    )
    bplan = _formatted_plan(bc)
    assert "array_intersect" in bplan, bplan
    assert "Exchange hashpartitioning" not in bplan, bplan

    rows = lambda df: sorted(  # noqa: E731
        (r["id_a"], r["id_b"], round(r["jaccard"], 12)) for r in df.collect()
    )
    direct_sets = jaccard_verify_sets(sets, pairs, "doc_id")
    direct_hybrid = jaccard_verify_hybrid(sets, pairs, "doc_id")
    assert (
        rows(sparse) == rows(dense) == rows(bc)
        == rows(direct_sets) == rows(direct_hybrid)
    )
    sets.unpersist()


def test_rfm_scalable_no_global_sort(spark):
    """The quantile-threshold RFM must contain NO window at all (the
    NTILE sibling has three single-partition global sorts — the one
    non-scaling shape this variant retires): one hash exchange for the
    user aggregate, a 1-row broadcast for thresholds, projections
    otherwise."""
    from osmart_etl_spark.queries.tpch_more import rfm_segmentation_scalable

    plan = _formatted_plan(rfm_segmentation_scalable(spark, SF_SMALL))
    assert "Window" not in plan, plan
    assert "Exchange SinglePartition" not in plan or "percentile" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    # the user_id aggregate appears in both branches (thresholds + final
    # projection) — same exchange, deduped by runtime ReusedExchange;
    # anything beyond those two would be a new shuffle
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_srp_neardup_bounded_plan(spark):
    """SRP-LSH near-dup must stay candidate-blocked: no cartesian
    product anywhere, no window, broadcast verification joins, and a
    bounded number of hash exchanges (candidate distinct + at most the
    band self-join pair at real scale)."""
    from osmart_etl_spark.queries.similarity import embedding_srp_neardup

    plan = _formatted_plan(embedding_srp_neardup(spark, SF_SMALL))
    assert "Cartesian" not in plan, plan
    assert "Window" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 3, plan


def test_cms_plan_bounded(spark):
    """The CMS build must stay a map-side-combined aggregate (sketch =
    256 counters regardless of input): no window, <=3 hash exchanges
    (sketch build, exact heavy-hitter agg, final min-merge), and the
    only single-partition exchange is the 20-row top-k/1-row total."""
    from osmart_etl_spark.queries.aggregates import cms_heavy_hitters

    plan = _formatted_plan(cms_heavy_hitters(spark, SF_SMALL))
    assert "Window" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 3, plan


def test_interpolation_single_exchange(spark):
    """All four ignore-nulls frames of the interpolation must stack in
    Window node(s) over ONE user_id exchange — a second shuffle would
    mean the forward/backward frames stopped sharing the sort."""
    from osmart_etl_spark.queries.temporal import linear_interpolation_fill

    plan = _formatted_plan(linear_interpolation_fill(spark, SF_SMALL))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_q18_semi_join_before_final_agg(spark):
    """Q18's HAVING subquery must reach the plan as a LeftSemi (the
    ~1%-of-orders filter), with broadcast dims and no window."""
    from osmart_etl_spark.queries.tpch_more import tpch_q18_large_volume

    plan = _formatted_plan(tpch_q18_large_volume(spark, SF_SMALL))
    assert "LeftSemi" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "Window" not in plan, plan


def test_q4_semi_join_with_residual(spark):
    """Q4's EXISTS must plan as ONE semi join carrying the cross-side
    date comparison as a join residual — no pre-aggregation or
    dedup of lineitem below it, and the orders date range pushed to
    the scan."""
    from osmart_etl_spark.queries.tpch_final import tpch_q4_order_priority

    plan = _formatted_plan(tpch_q4_order_priority(spark, SF_SMALL))
    assert "LeftSemi" in plan, plan
    assert "INTERVAL '30' DAY" in plan, plan
    assert "GreaterThanOrEqual(o_orderdate" in plan, plan
    # the semi join consumes raw lineitem — exactly one aggregate (the
    # final priority count) in the whole plan
    assert plan.count("functions=[partial_count") == 1, plan


def test_q16_broadcast_anti_exclusion(spark):
    """Q16's NOT IN denylist must be a broadcast LEFT ANTI (map-side,
    free) — not a shuffled join against the full supplier table."""
    from osmart_etl_spark.queries.tpch_final import tpch_q16_supplier_cnt

    plan = _formatted_plan(tpch_q16_supplier_cnt(spark, SF_SMALL))
    assert "LeftAnti, BuildRight" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "count(distinct l_suppkey" in plan, plan


def test_q19_disjunctive_pushdown(spark):
    """Q19's OR-of-ANDs must factor per-side: the lineitem scan gets
    the quantity-range union pushed down (NOT a full scan with a
    post-join OR only), part broadcasts, and no cartesian appears."""
    from osmart_etl_spark.queries.tpch_final import tpch_q19_disjunctive_join

    plan = _formatted_plan(tpch_q19_disjunctive_join(spark, SF_SMALL))
    assert "Or(Or(And(GreaterThanOrEqual(l_quantity" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q22_anti_join_after_scalar_broadcast(spark):
    """Q22: the scalar average must enter as a broadcast (nested-loop
    over a 1-row build side is fine), the dormancy check as an ANTI
    join against the date-filtered orders slice — with the date filter
    pushed to the orders scan, not applied post-join."""
    from osmart_etl_spark.queries.tpch_final import (
        tpch_q22_global_sales_opportunity,
    )

    plan = _formatted_plan(tpch_q22_global_sales_opportunity(spark, SF_SMALL))
    assert "LeftAnti" in plan, plan
    assert "GreaterThanOrEqual(o_orderdate,2000-01-01" in plan, plan


def test_incremental_lsh_broadcast_probe(spark):
    """Incremental dedup must probe the corpus band index via a
    BROADCAST of the new batch's keys — if this ever becomes a
    SortMergeJoin, every daily batch re-shuffles the whole corpus
    index and the incremental path loses its reason to exist."""
    from osmart_etl_spark.queries.corpus_ops import dedup_incremental_lsh

    plan = _formatted_plan(dedup_incremental_lsh(spark, SF_SMALL))
    assert "BroadcastHashJoin [band" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_stratified_split_single_exchange(spark):
    """Split assignment is a pure projection: the ONLY exchange is the
    tiny (lang, split) summary aggregate."""
    from osmart_etl_spark.queries.corpus_ops import stratified_split_assign

    plan = _formatted_plan(stratified_split_assign(spark, SF_SMALL))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_aqe_runtime_broadcast_conversion(spark):
    """AQE must convert a sort-merge join to broadcast AT RUNTIME when a
    filter leaves the build side tiny but the static size estimate
    (full table) exceeds the broadcast threshold. This is the 100 TB
    safety net for selective dim filters the static planner can't see
    through — pin it so a config regression (AQE off, threshold 0)
    can't silently bring the shuffle back."""
    from pyspark.sql import functions as F

    from osmart_etl_spark.io.sources import read_table

    old_aqe = spark.conf.get("spark.sql.adaptive.enabled", None)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # static threshold too small for ANY estimate -> static plan is
        # SMJ; AQE's OWN threshold stays generous, so only the RUNTIME
        # (post-filter, exact) size can trigger the broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10MB")
        cust = read_table(spark, SF_SMALL, "customer").filter(
            F.col("c_mktsegment") == "BUILDING"
        )
        orders = read_table(spark, SF_SMALL, "orders")
        j = orders.join(cust, orders["o_custkey"] == cust["c_custkey"]).groupBy(
            "c_mktsegment"
        ).count()
        j.collect()  # materialize so AQE finalizes the plan
        final = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final, final
        assert "BroadcastHashJoin" in final, final[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        if old_aqe is None:
            spark.conf.unset("spark.sql.adaptive.enabled")
        else:
            spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_lsh_hot_bucket_cap(spark):
    """The hot-bucket guard must (a) drop only over-cap buckets, (b)
    keep every pair that collides in some OTHER under-cap band, and
    (c) exclude via a broadcast ANTI join against the (small) hot set
    — never a shuffle against the keep-set."""
    from pyspark.sql import functions as F

    from osmart_etl_spark.ops.dedup import candidate_pairs

    rows = []
    # one hot bucket: 12 docs share band 0 key "HOT" (66 pairs)
    rows += [(i, 0, "HOT") for i in range(12)]
    # docs 0 and 1 also collide in band 1 (survives the cap)
    rows += [(0, 1, "pair01"), (1, 1, "pair01")]
    # an independent small bucket in band 2
    rows += [(20, 2, "small"), (21, 2, "small")]
    bk = spark.createDataFrame(rows, ["doc_id", "band", "band_key"])

    uncapped = {
        (r["id_a"], r["id_b"]) for r in candidate_pairs(bk, "doc_id").collect()
    }
    assert (0, 1) in uncapped and (20, 21) in uncapped and len(uncapped) == 67

    capped_df = candidate_pairs(bk, "doc_id", max_bucket=10)
    capped = {(r["id_a"], r["id_b"]) for r in capped_df.collect()}
    assert capped == {(0, 1), (20, 21)}, capped

    plan = _formatted_plan(capped_df)
    assert "LeftAnti" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_struct_max_latest_no_window(spark):
    """The max(struct) latest-per-key must plan as partial+final hash
    aggregate — no Window, no Sort, and the exchange carries one row
    per key per map partition (partial_max before it)."""
    from osmart_etl_spark.queries.aggregates import latest_via_struct_max

    plan = _formatted_plan(latest_via_struct_max(spark, SF_SMALL))
    assert "Window" not in plan, plan
    assert "partial_max" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_semdedup_cluster_blocked(spark):
    """SemDedup's pair space must stay label-blocked equi-joins — a
    cartesian across clusters is the failure mode the blocking exists
    to prevent."""
    from osmart_etl_spark.queries.corpus_ops import semdedup_keep_list

    plan = _formatted_plan(semdedup_keep_list(spark, SF_SMALL))
    assert "CartesianProduct" not in plan, plan
    assert "Join" in plan


def test_entity_fuzzy_match_blocked(spark):
    """Entity resolution must join on the blocking key (never
    all-pairs) and keep trigram sets as a projection — no exchange
    below the block join other than the scan."""
    from osmart_etl_spark.queries.corpus_ops import entity_fuzzy_match

    plan = _formatted_plan(entity_fuzzy_match(spark, SF_SMALL))
    assert "CartesianProduct" not in plan, plan
    assert "block" in plan


def test_cumulative_distinct_single_real_shuffle(spark):
    """The linear rewrite's whole point: one user-keyed exchange; the
    final running sum must ride over the tiny per-day series (a
    single-partition window is expected and fine there)."""
    from osmart_etl_spark.queries.aggregates import cumulative_distinct_users

    plan = _formatted_plan(cumulative_distinct_users(spark, SF_SMALL))
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "Window" in plan


def test_q8_snowflake_all_broadcast(spark):
    """TPC-H Q8's seven-table join must keep the fact side shuffle-free:
    every dimension is a BroadcastHashJoin, never SortMergeJoin."""
    from osmart_etl_spark.queries.tpch_final import tpch_q8_market_share

    plan = _formatted_plan(tpch_q8_market_share(spark, SF_SMALL))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 6


def test_join_view_ivm_no_fact_shuffle(spark):
    """The IVM delta DAG must be broadcast-only at this SF: the three
    join terms never hash-shuffle the fact slices (at 100 TB bucketing
    takes over — but a SortMergeJoin HERE would mean the delta terms
    lost their broadcastability)."""
    from osmart_etl_spark.queries.analytics2 import join_view_incremental

    plan = _formatted_plan(join_view_incremental(spark, SF_SMALL))
    assert "SortMergeJoin" not in plan


def test_feature_standardize_broadcast_projection(spark):
    """Pass-2 must be a broadcast join + projection: no shuffle of the
    fact table after the moment aggregate."""
    from osmart_etl_spark.queries.mlprep import feature_standardize

    plan = _formatted_plan(feature_standardize(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ewma_single_window_exchange(spark):
    """The 8-term lag chain must share ONE window over one exchange —
    a per-lag window would multiply shuffles."""
    from osmart_etl_spark.queries.scale_ops import ewma_lag_chain

    plan = _formatted_plan(ewma_lag_chain(spark, SF_SMALL))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Window") == 1


def test_no_forced_broadcast_of_fact_proportional_tables(spark):
    """The 100 TB plan-defect lock (round 9, widened round 10): orders
    (1.5M·SF), customer (150k·SF), part (200k·SF) and supplier (10k·SF)
    ALL scale linearly with SF — same exponent as lineitem, smaller
    constants — so no query may carry an explicit F.broadcast() hint on
    any of them: a hint both forces a multi-GB build at scale AND
    disables AQE's size-based fallback. Only nation (25 rows) and
    region (5 rows) are constant and may keep hints.

    Deterministic simulation of "beyond the size threshold at amplified
    volume": with autoBroadcastJoinThreshold=-1 nothing is broadcast by
    SIZE, so any surviving BroadcastHashJoin must come from an explicit
    hint. For each formerly-defective query we assert (a) at least one
    SortMergeJoin exists (the fact-proportional joins degraded cleanly)
    and (b) the BroadcastHashJoin count equals the number of CONSTANT-
    dim hints the query keeps (nation/region), so a reintroduced hint
    on orders/customer/part/supplier fails the exact count."""
    from osmart_etl_spark.queries.aggregates import (
        cube_revenue,
        proportional_allocation,
        revenue_share_two_level,
        rollup_revenue,
        yoy_revenue_delta,
    )
    from osmart_etl_spark.queries.dq import referential_integrity_audit
    from osmart_etl_spark.queries.relational import star_join_revenue
    from osmart_etl_spark.queries.scale_ops import bloom_prefilter_join
    from osmart_etl_spark.queries.tpch_final import tpch_q8_market_share
    from osmart_etl_spark.queries.tpch_more import tpch_q7_nation_volume

    # (query, expected explicit-hint BroadcastHashJoins surviving -1 threshold)
    cases = [
        (tpch_q8_market_share, 3),   # nc, r, ns (p and s de-hinted r10)
        (tpch_q7_nation_volume, 2),  # ns, nc (s de-hinted r10)
        (star_join_revenue, 2),      # n, r
        (rollup_revenue, 2),         # n, r
        (cube_revenue, 2),           # n, r
        # n — appears twice: the rev subtree (orders⋈customer⋈nation) is
        # referenced by both the quota branch and the scalar total, and
        # simple-mode plan text prints the shared subtree once per parent
        (proportional_allocation, 2),
        (yoy_revenue_delta, 1),      # n
        (revenue_share_two_level, 2),  # n, r
        (referential_integrity_audit, 0),  # no hints at all
        (bloom_prefilter_join, 0),   # bloom prefilter, AQE-decided join
    ]
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        for fn, n_hinted in cases:
            plan = _formatted_plan(fn(spark, SF_SMALL))
            got = plan.count("BroadcastHashJoin")
            assert got == n_hinted, (
                f"{fn.__name__}: expected {n_hinted} hint-driven broadcasts "
                f"under -1 threshold, saw {got} — an F.broadcast() hint on a "
                f"fact-proportional table (orders/customer) crept back in?\n{plan}"
            )
            assert "SortMergeJoin" in plan, (
                f"{fn.__name__}: orders/customer joins should degrade to "
                f"SortMergeJoin when broadcast-by-size is off\n{plan}"
            )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)


def test_triangle_count_broadcast_locked(spark):
    """Round 13 (VERDICT r12 #1): below the edge budget, every join
    after candidate-pair generation must be a broadcast hash join —
    the 4 AQE-flapping SortMergeJoins (degree attach ×2, wedge
    self-join, closing-edge probe) were the 1.1–24.5 s instability.
    The wedge stream must never hit an exchange."""
    from osmart_etl_spark.queries.corpus_ops import graph_triangle_count

    plan = _formatted_plan(graph_triangle_count(spark, SF_SMALL))
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 4, plan


@pytest.mark.slow
def test_triangle_count_paths_agree(spark):
    """The size dispatch never changes results: the shuffle form
    (budget 0 — what a 100 TB candidate graph runs) and the broadcast
    form must produce the identical single row."""
    from osmart_etl_spark.queries.corpus_ops import graph_triangle_count_at

    small = graph_triangle_count_at(spark, SF_SMALL).collect()
    big = graph_triangle_count_at(spark, SF_SMALL, bcast_edge_budget=0).collect()
    assert [r.asDict() for r in small] == [r.asDict() for r in big]
    assert small[0]["n_edges"] > 0


@pytest.mark.slow
def test_kcore_peel_broadcast_locked(spark):
    """Round 13: below the edge budget every peel round's two alive
    joins must be broadcast hash joins of the ALIVE side — left to the
    planner, each of the 16 rounds broadcast the full edge table and
    sort-merge-joined the second probe (the suite's slowest query)."""
    from osmart_etl_spark.queries.linkage import graph_kcore_peel

    plan = _formatted_plan(graph_kcore_peel(spark, SF_SMALL))
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


@pytest.mark.slow
def test_kcore_peel_early_exit_matches_full_unroll(spark):
    """Round 13: the peel fixpoint early-exit (stop when the alive
    count stops shrinking — monotone peeling makes equal counts equal
    sets) must return rows identical to the oracle-shaped full-T
    unroll, on both the broadcast and shuffle dispatch paths."""
    from osmart_etl_spark.queries.linkage import graph_kcore_peel_at

    key = lambda r: (r["part"], r["core_degree"])  # noqa: E731
    for budget in (None, 0):
        kw = {} if budget is None else {"bcast_edge_budget": budget}
        fast = sorted(graph_kcore_peel_at(spark, SF_SMALL, **kw).collect(), key=key)
        full = sorted(
            graph_kcore_peel_at(spark, SF_SMALL, early_exit=False, **kw).collect(),
            key=key,
        )
        assert [r.asDict() for r in fast] == [r.asDict() for r in full]
        assert fast


@pytest.mark.slow
def test_kcore_peel_paths_agree(spark):
    """The size dispatch never changes results: the shuffle form
    (budget 0 — node-sized alive past broadcast reach) and the
    broadcast form must produce identical rows."""
    from osmart_etl_spark.queries.linkage import graph_kcore_peel_at

    key = lambda r: (r["part"], r["core_degree"])  # noqa: E731
    small = sorted(graph_kcore_peel_at(spark, SF_SMALL).collect(), key=key)
    big = sorted(
        graph_kcore_peel_at(spark, SF_SMALL, bcast_edge_budget=0).collect(), key=key
    )
    assert [r.asDict() for r in small] == [r.asDict() for r in big]
    assert small  # non-degenerate: the sf0.001 graph has a 3-core
