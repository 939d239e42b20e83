"""dedup_soft_weights invariants: each cluster contributes exactly one
unit of expected mass; singletons keep weight 1; the cluster structure
agrees with dedup_components."""

from __future__ import annotations

from collections import Counter

from osmart_etl_spark.queries.base import REGISTRY
from tests.conftest import SF_SMALL


def test_soft_weights_unit_mass_per_cluster(spark):
    rows = REGISTRY["dedup_soft_weights"].fn(spark, SF_SMALL).collect()
    n_docs = spark.read.parquet(SF_SMALL + "/documents.parquet").count()
    assert len(rows) == n_docs  # nothing dropped — that's the point

    by_cluster = Counter()
    for r in rows:
        assert r.sample_weight == 1.0 / r.cluster_size
        by_cluster[r.canonical_id] += 1
    for r in rows:
        assert r.cluster_size == by_cluster[r.canonical_id]
    # Σ weights = number of clusters (each cluster sums to exactly 1
    # in rational arithmetic; 1/n * n is exact in binary for these n)
    total = sum(r.sample_weight for r in rows)
    assert abs(total - len(by_cluster)) < 1e-9

    comp = {
        r.doc_id: r.canonical_id
        for r in REGISTRY["dedup_components"].fn(spark, SF_SMALL).collect()
    }
    for r in rows:
        if r.doc_id in comp:
            assert r.canonical_id == comp[r.doc_id]
        else:
            assert r.canonical_id == r.doc_id and r.cluster_size == 1
