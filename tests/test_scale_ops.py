"""Tests for the scale-technique operators (queries/scale_ops.py,
ops/bloom.py): bloom pre-filter guarantees + selectivity, skyline
dominance property, EWMA vs a python fold. Cross-engine value parity
is covered by the oracle gate (tools/check_parity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_bloom_no_false_negatives_and_prunes(spark):
    from osmart_etl_spark.io.sources import read_table
    from osmart_etl_spark.ops.bloom import build_bloom, probe_bloom

    cust = (
        read_table(spark, SF_SMALL, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    member = {r.c_custkey for r in cust.collect()}
    orders = read_table(spark, SF_SMALL, "orders").select("o_custkey")
    bloom = build_bloom(cust, "c_custkey")
    passed = probe_bloom(orders, "o_custkey", bloom)

    total = orders.count()
    kept = passed.count()
    true_hits = orders.filter(F.col("o_custkey").isin(member)).count()

    # No false negatives: every true member order survives the filter.
    assert (
        passed.filter(F.col("o_custkey").isin(member)).count() == true_hits
    )
    # It actually prunes: non-member pass-through (FP) rate is small.
    non_member_total = total - true_hits
    fp = kept - true_hits
    assert kept < total
    assert fp / max(non_member_total, 1) < 0.05


def test_bloom_probe_is_map_side(spark):
    """The probe plan must contain no Exchange between the scan and the
    bloom filter — the whole point is pre-shuffle pruning."""
    from osmart_etl_spark.io.sources import read_table
    from osmart_etl_spark.ops.bloom import build_bloom, probe_bloom

    cust = read_table(spark, SF_SMALL, "customer").select("c_custkey")
    orders = read_table(spark, SF_SMALL, "orders").select("o_custkey")
    plan = probe_bloom(
        orders, "o_custkey", build_bloom(cust, "c_custkey")
    )._jdf.queryExecution().executedPlan().toString()
    # Probe side: scan → BroadcastNestedLoopJoin (1-row bitmap) → Filter.
    # Any Exchange on the probe side would appear above the orders scan.
    probe_section = plan.split("BroadcastNestedLoopJoin")[0]
    assert "Exchange" not in probe_section


def test_skyline_matches_naive_domination(spark):
    from osmart_etl_spark.queries.scale_ops import skyline_pareto_frontier

    rows = skyline_pareto_frontier(spark, SF_SMALL).collect()
    # Naive check against all customer aggregates.
    from osmart_etl_spark.io.sources import read_table

    agg = (
        read_table(spark, SF_SMALL, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("spend"),
            F.max("o_orderdate").alias("last_order"),
        )
        .collect()
    )

    def dominated(s, d):
        return any(
            (o.spend >= s and o.last_order >= d and (o.spend > s or o.last_order > d))
            for o in agg
        )

    frontier = {(r.spend, r.last_order) for r in rows}
    for o in agg:
        assert ((o.spend, o.last_order) in frontier) == (
            not dominated(o.spend, o.last_order)
        )


def test_ewma_matches_python_fold(spark):
    from osmart_etl_spark.queries.scale_ops import ewma_lag_chain

    out = {
        r.event_id: r.ewma8
        for r in ewma_lag_chain(spark, SF_SMALL).collect()
    }
    from osmart_etl_spark.io.sources import read_table

    ev = (
        read_table(spark, SF_SMALL, "events")
        .select("event_id", "user_id", "ts", "value")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in sorted(ev, key=lambda r: (r.user_id, r.ts, r.event_id)):
        by_user.setdefault(r.user_id, []).append(r)
    checked = 0
    for rows in by_user.values():
        for i, r in enumerate(rows):
            expect = 0.0
            # identical left-to-right association as the lag chain
            terms = []
            for d in range(8):
                v = rows[i - d].value if i - d >= 0 else 0.0
                terms.append(v / (1 << d))
            expect = terms[0]
            for t in terms[1:]:
                expect = expect + t
            assert out[r.event_id] == expect
            checked += 1
    assert checked == len(ev)
