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
