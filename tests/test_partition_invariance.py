"""Partition-count invariance: the float-safety doctrine (queries/
base.py — decimal pre-sums, fixed-order folds, tie-broken windows)
claims results are independent of shuffle partitioning. This test makes
that claim mechanical: each representative query must produce the SAME
rows under different shuffle-partition counts.

The set spans the risk classes: double aggregation (decimal pre-sum),
window order (tiebreakers), iterative state (kmeans, kcore), sketch
merge (hll), prefix sum (shard packing), LSH banding, and the flagship
conditional agg."""

from __future__ import annotations

import pytest

from osmart_etl_spark.queries.base import REGISTRY
from tests.conftest import SF_SMALL

QUERIES = [
    "sales_payment_split",
    "daily_net_agg",
    "tpch_q1_pricing_summary",
    "running_balance",
    "dedup_minhash_lsh",
    "lm_perplexity_filter",
    "kmeans_lloyd",
    "graph_kcore_peel",
    "hll_portable_registers",
    "corpus_shard_packing",
    "weighted_median_price",
    "segmented_replay",
    "dedup_edit_passjoin",
    "jl_projection_audit",
    "lsh_recall_audit",
    "rendezvous_shard_routing",
]


@pytest.mark.parametrize("name", QUERIES)
def test_result_invariant_under_partition_count(spark, name):
    def run(n_parts: int):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
        try:
            df = REGISTRY[name].fn(spark, SF_SMALL)
            return sorted(map(tuple, df.collect()))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    a = run(3)
    b = run(17)
    assert a == b, f"{name}: result depends on shuffle partitioning"
    assert len(a) > 0
