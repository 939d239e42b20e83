"""Registry-wide physical-plan audit — the scale-hygiene net.

Every registered query's plan is checked for the antipatterns that kill
100 TB runs regardless of local-test correctness:

- ``CartesianProduct``: an un-broadcast cross join is O(n*m) shuffle —
  always a bug here (tiny sides must be explicit ``F.broadcast``).
- ``BatchEvalPython``: a row-at-a-time Python UDF in a registry query's
  hot path (the engine's rule: Python only via Arrow-batched pandas
  forms, and only where semantics demand it).
- Arrow-batched Python (``FlatMapGroupsInPandas``/``ArrowEvalPython``/
  ``MapInPandas``): allowed ONLY for the explicitly labeled escape
  hatches; anything else must stay JVM-side for whole-stage codegen.
- broadcast hints on unbounded fact-proportional subtrees and global
  windows over unbounded inputs (the round-9/10 defect classes).

Plans are built at sf0.001 (construction only — no execution except the
genuinely iterative graph queries, which run their driver-bounded loop
during plan construction by design).

Round 14 (VERDICT r13 #1): the three audits previously each re-built
all 249 query plans (~6 min of the driver-verify budget between them);
they now share ONE module-scoped build — ``QueryExecution.toString()``
carries both the optimized-logical section (hint audit, window audit)
and the physical section (antipattern markers), so each query is
planned exactly once.
"""

from __future__ import annotations

import re

import pytest

from tests.conftest import SF_SMALL

# Queries whose contract is an Arrow-batched Python stage (documented
# UDF escape hatches). Everything else must be pure JVM.
PANDAS_ALLOWED = {
    "doc_sequence_packing",  # greedy reset accumulator (ops/packing.py)
}


@pytest.fixture(scope="module")
def registry_plans(spark):
    """name -> (optimized logical section, physical section) for every
    registry query, built once for all audits below."""
    import osmart_etl_spark.queries  # noqa: F401
    from osmart_etl_spark.queries.base import REGISTRY

    plans = {}
    for name, qd in REGISTRY.items():
        df = qd.fn(spark, SF_SMALL)
        full = df._jdf.queryExecution().toString()
        opt = re.search(
            r"== Optimized Logical Plan ==\n(.*?)(?:\n== |\Z)", full, re.S
        )
        phys = re.search(r"== Physical Plan ==\n(.*?)(?:\n== |\Z)", full, re.S)
        assert opt and phys, f"{name}: plan sections not found"
        plans[name] = (opt.group(1), phys.group(1))
    return plans


def test_no_scale_antipatterns_in_any_registry_plan(registry_plans):
    offenders = {"cartesian": [], "py_udf": [], "pandas": []}
    n = 0
    for name, (_, plan) in registry_plans.items():
        n += 1
        if "CartesianProduct" in plan:
            offenders["cartesian"].append(name)
        if "BatchEvalPython" in plan:
            offenders["py_udf"].append(name)
        if name not in PANDAS_ALLOWED and any(
            marker in plan
            for marker in ("FlatMapGroupsInPandas", "ArrowEvalPython", "MapInPandas")
        ):
            offenders["pandas"].append(name)
    assert n >= 87  # the audit must actually cover the registry
    assert not offenders["cartesian"], offenders
    assert not offenders["py_udf"], offenders
    assert not offenders["pandas"], offenders


def test_no_broadcast_hint_on_unbounded_fact_subtree(spark, registry_plans):
    """Registry-wide structural lock for the round-9 defect class: no
    query may broadcast-hint a join side whose subtree scans a
    fact-proportional table (orders/customer/lineitem/documents/
    events/embeddings) without a size-bounding operator on the path —
    an Aggregate/Limit (bounded by key cardinality / k) or a literal
    point/prefix filter on the table's dense primary id (bounded query
    batches and seed sets: `vec_id < 64`). A bare Project/Filter on a
    non-key column keeps the side volume-proportional, and a hint there
    both forces a multi-GB build at 100 TB and disables AQE's fallback.

    Unlike test_plans.test_no_forced_broadcast_of_fact_proportional_
    tables (exact hint counts for the ten formerly-defective queries),
    this audits EVERY registry query from the optimized logical plan's
    leftHint=/rightHint= annotations, so a new query cannot reintroduce
    the defect unnoticed."""
    from tools.broadcast_hint_audit import audit_query

    from osmart_etl_spark.io.sources import read_table

    tables = (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split()
    schemas = {t: set(read_table(spark, SF_SMALL, t).columns) for t in tables}
    offenders = []
    n = 0
    for name, (plan, _) in registry_plans.items():
        n += 1
        assert plan, f"{name}: optimized plan section not found"
        for table in audit_query(plan, schemas):
            offenders.append((name, table))
    assert n >= 223
    assert not offenders, (
        "broadcast hint on an unbounded fact-proportional subtree "
        f"(see tools/broadcast_hint_audit.py): {offenders}"
    )


def test_no_unbounded_global_windows(registry_plans):
    """Round-10 structural lock replacing the WindowExec warning noise:
    every GLOBAL (zero-partition) window in every registry query must
    run over a bounded input subtree — an Aggregate on a non-fact key,
    a Limit/Deduplicate, or a point/prefix id filter — because a global
    window over fact-proportional rows is a single-partition sort at
    100 TB. Spark 4.1 constant-folds partitionBy(lit(0)) away, so the
    old silencing idiom can't hide one; this test fails instead.

    Whitelist: queries that size-dispatch the global sort to a
    distributed form beyond a scan-bytes threshold — the plan audited
    here (sf0.001) is deliberately the small-scale branch."""
    from tools.window_audit import audit_windows

    # query -> justification for the below-threshold global window
    whitelist = {
        # plain NTILE below _RFM_DIST_BYTES; ops/windows.distributed_ntile
        # (bit-equal by test_distributed_ntile_equals_window_ntile)
        # takes over beyond it — queries/tpch_more.py
        "rfm_segmentation": "size-dispatched to distributed_ntile",
    }
    offenders = []
    n = 0
    for name, (plan, _) in registry_plans.items():
        n += 1
        if name in whitelist:
            continue
        assert plan, f"{name}: optimized plan section not found"
        bad = audit_windows(plan)
        if bad:
            offenders.append((name, bad))
    assert n >= 223
    assert not offenders, (
        "GLOBAL window over an unbounded input subtree "
        f"(see tools/window_audit.py): {offenders}"
    )


def test_window_audit_parser_rules():
    """The global-window detector itself: partitioned-no-order windows
    print two bracket groups exactly like global ordered windows, so
    classification must come from the windowspecdefinition args."""
    from tools.window_audit import audit_windows, is_global_window

    glob = (
        "Window [row_number() windowspecdefinition(id#0L ASC NULLS FIRST, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) "
        "AS rn#1], [id#0L ASC NULLS FIRST]"
    )
    part_no_order = (
        "Window [count(1) windowspecdefinition(cluster_id#15L, "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), "
        "unboundedfollowing$())) AS _we1#5L], [cluster_id#15L]"
    )
    part_ordered = (
        "Window [lag(v#2, -1, null) windowspecdefinition(user_id#3L, "
        "ts#4 ASC NULLS FIRST, specifiedwindowframe(RowFrame, -1, -1)) "
        "AS p#6], [user_id#3L], [ts#4 ASC NULLS FIRST]"
    )
    assert is_global_window(glob)
    assert not is_global_window(part_no_order)
    assert not is_global_window(part_ordered)
    # global window over an Aggregate-bounded input -> clean
    bounded_plan = (
        glob + "\n"
        "+- Aggregate [event_type#9], [event_type#9, count(1) AS n#10L]\n"
        "   +- Relation [event_type#9,user_id#11L] parquet\n"
    )
    assert audit_windows(bounded_plan) == 0
    # global window directly over a fact scan -> flagged
    unbounded_plan = (
        glob + "\n"
        "+- Project [id#0L]\n"
        "   +- Relation [o_orderkey#3L,o_custkey#4L] parquet\n"
    )
    assert audit_windows(unbounded_plan) == 1
