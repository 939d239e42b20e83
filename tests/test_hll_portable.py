"""hll_portable_registers differential tests: the Spark-built registers
must equal a pure-Python md5 HLL twin, the shard-merge contract must
hold, and the whole output must be invariant under repartitioning
(merge-commutativity is what makes it a sketch)."""

from __future__ import annotations

import hashlib

from osmart_etl_spark.queries.base import REGISTRY
from tests.conftest import SF_SMALL


def _py_hll(rows):
    """(event_type -> {bucket: register}) from (event_type, user_id)."""
    regs: dict[str, dict[int, int]] = {}
    for et, uid in rows:
        hx = hashlib.md5(str(uid).encode()).hexdigest()
        bucket = int(hx[:2], 16)
        v = int(hx[2:14], 16)
        rho = 49 if v == 0 else 49 - v.bit_length()
        d = regs.setdefault(et, {})
        d[bucket] = max(d.get(bucket, 0), rho)
    return regs


def test_hll_matches_python_twin_and_merges(spark):
    from osmart_etl_spark.io.sources import read_table

    out = {
        r.event_type: r
        for r in REGISTRY["hll_portable_registers"].fn(spark, SF_SMALL).collect()
    }
    ev = read_table(spark, SF_SMALL, "events").select("event_type", "user_id")
    rows = [(r.event_type, r.user_id) for r in ev.collect()]
    twin = _py_hll(rows)

    assert set(out) == set(twin)
    for et, regs in twin.items():
        r = out[et]
        assert r.merge_ok is True
        assert r.n_buckets_set == len(regs)
        s = sum(1 << (50 - reg) for reg in regs.values()) + (256 - len(regs)) * (
            1 << 50
        )
        assert r.s_scaled == s
        exact = len({u for e, u in rows if e == et})
        assert r.exact_distinct == exact
        # The estimate column is exactly the documented division (raw
        # HLL overestimates at tiny n — this corpus is in the
        # linear-counting regime; the register table is the product and
        # a consumer applies their own small-range correction).
        num = 0.7213 / (1 + 1.079 / 256) * 256 * 256 * float(2**50)
        assert r.raw_estimate == num / s


def test_hll_invariant_under_repartition(spark):
    base = REGISTRY["hll_portable_registers"].fn(spark, SF_SMALL)
    a = sorted(map(tuple, base.collect()))
    b = sorted(map(tuple, base.repartition(13).collect()))
    assert a == b
