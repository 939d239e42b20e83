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

Plans are built at sf0.001 (construction only — no execution except the
genuinely iterative graph queries, which run their driver-bounded loop
during plan construction by design).
"""

from __future__ import annotations

from tests.conftest import SF_SMALL

# Queries whose contract is an Arrow-batched Python stage (documented
# UDF escape hatches). Everything else must be pure JVM.
PANDAS_ALLOWED = {
    "doc_sequence_packing",  # greedy reset accumulator (ops/packing.py)
}


def _plans(spark):
    from osmart_etl_spark.queries import REGISTRY

    for name, qd in REGISTRY.items():
        df = qd.fn(spark, SF_SMALL)
        qe = df._jdf.queryExecution()
        jvm = spark._jvm
        yield name, qe.explainString(
            jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )


def test_no_scale_antipatterns_in_any_registry_plan(spark):
    offenders = {"cartesian": [], "py_udf": [], "pandas": []}
    n = 0
    for name, plan in _plans(spark):
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


def test_no_broadcast_hint_on_unbounded_fact_subtree(spark):
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
    from tools.broadcast_hint_audit import audit_query, optimized_section

    import osmart_etl_spark.queries  # noqa: F401
    from osmart_etl_spark.io.sources import read_table
    from osmart_etl_spark.queries.base import REGISTRY

    tables = (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split()
    schemas = {t: set(read_table(spark, SF_SMALL, t).columns) for t in tables}
    offenders = []
    n = 0
    for name, qd in REGISTRY.items():
        n += 1
        plan = optimized_section(qd.fn(spark, SF_SMALL))
        assert plan, f"{name}: optimized plan section not found"
        for table in audit_query(plan, schemas):
            offenders.append((name, table))
    assert n >= 223
    assert not offenders, (
        "broadcast hint on an unbounded fact-proportional subtree "
        f"(see tools/broadcast_hint_audit.py): {offenders}"
    )
