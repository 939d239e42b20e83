"""Rendezvous routing structural contract: adding a shard moves docs
ONLY to the new shard, and the moved mass is ~1/(N+1)."""

from __future__ import annotations

from osmart_etl_spark.queries.base import REGISTRY
from osmart_etl_spark.queries.scale_ops import _HRW_N
from tests.conftest import SF_SMALL


def test_rendezvous_moves_only_to_new_shard(spark):
    rows = REGISTRY["rendezvous_shard_routing"].fn(spark, SF_SMALL).collect()
    total = sum(r.n_docs for r in rows)
    moved = 0
    for r in rows:
        assert 0 <= r.shard_before < _HRW_N
        if r.shard_before != r.shard_after:
            # the HRW guarantee: a doc only moves if the NEW shard wins
            assert r.shard_after == _HRW_N
            moved += r.n_docs
    # E[moved] = total/(N+1); binomial 5-sigma bounds at p=1/9
    import math

    p = 1.0 / (_HRW_N + 1)
    sigma = math.sqrt(total * p * (1 - p))
    assert abs(moved - total * p) < 5 * sigma
