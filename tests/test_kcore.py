"""graph_kcore_peel differential: the Spark peel must equal an
independent in-memory peel to convergence (T=16 exceeds the measured
peel depth at every test SF, so the fixed-T result IS the k-core)."""

from __future__ import annotations

from collections import defaultdict

from osmart_etl_spark.queries.base import REGISTRY
from osmart_etl_spark.queries.linkage import _KC_K, _KC_MIN_CO
from tests.conftest import SF_SMALL


def _py_kcore(edges, k):
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    while True:
        dead = [n for n, s in adj.items() if len(s) < k]
        if not dead:
            return {n: len(s) for n, s in adj.items()}
        for n in dead:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]


def test_kcore_matches_python_peel_to_convergence(spark):
    got = {
        r.part: r.core_degree
        for r in REGISTRY["graph_kcore_peel"].fn(spark, SF_SMALL).collect()
    }

    li = spark.read.parquet(SF_SMALL + "/lineitem.parquet")
    baskets = defaultdict(set)
    for r in li.select("l_orderkey", "l_partkey").distinct().collect():
        baskets[r.l_orderkey].add(r.l_partkey)
    co = defaultdict(int)
    for parts in baskets.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                co[(ps[i], ps[j])] += 1
    edges = [e for e, n in co.items() if n >= _KC_MIN_CO]
    want = _py_kcore(edges, _KC_K)
    assert got == want
    assert len(got) > 0  # non-trivial core at this SF
    assert all(d >= _KC_K for d in got.values())
