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
