"""Connected components (ops/graph.py) — the dedup canonicalization
stage. Shapes that break naive propagation: long chains (diameter >
round count if max_iter too small), cycles (must not loop forever),
multiple components (labels must not bleed across), and isolated nodes
(must not appear)."""

from __future__ import annotations

from pyspark.sql import functions as F

from osmart_etl_spark.ops.graph import connected_components


def _components(spark, edges):
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    out = connected_components(df, "id_a", "id_b")
    return {r["node"]: r["component"] for r in out.collect()}


def test_chain_collapses_to_min(spark):
    # 1-2-3-4-5-6-7: diameter 6, min label must walk the whole chain
    got = _components(spark, [(i, i + 1) for i in range(1, 7)])
    assert got == {i: 1 for i in range(1, 8)}


def test_two_components_do_not_bleed(spark):
    got = _components(spark, [(1, 2), (2, 3), (10, 11), (12, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_cycle_terminates(spark):
    got = _components(spark, [(1, 2), (2, 3), (3, 1)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_star_one_round(spark):
    got = _components(spark, [(5, 9), (5, 7), (5, 8)])
    assert got == {5: 5, 7: 5, 8: 5, 9: 5}


def test_edge_order_and_direction_irrelevant(spark):
    a = _components(spark, [(3, 1), (2, 3)])
    b = _components(spark, [(1, 3), (3, 2)])
    assert a == b == {1: 1, 2: 1, 3: 1}


def test_isolated_nodes_absent(spark):
    df = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    out = connected_components(df, "id_a", "id_b")
    assert {r["node"] for r in out.collect()} == {1, 2}


def test_matches_recursive_oracle_on_lsh_pairs(spark, duck):
    """Differential: Spark label propagation == DuckDB recursive CTE on
    the real verified near-dup pairs at sf0.001."""
    import osmart_etl_spark.queries as q

    sf = "/root/testdata/sf0.001"
    got = {
        (r["doc_id"], r["canonical_id"])
        for r in q.REGISTRY["dedup_components"].fn(spark, sf).collect()
    }
    from osmart_etl_spark.queries.text import _NGRAM_JACCARD_SQL

    want = set(
        duck.execute(
            f"""
            WITH RECURSIVE verified AS ({_NGRAM_JACCARD_SQL}),
            edges AS (
              SELECT id_a AS u, id_b AS v FROM verified
              UNION SELECT id_b, id_a FROM verified
            ),
            reach(node, r) AS (
              SELECT u, u FROM edges
              UNION SELECT e.u, rc.r FROM edges e JOIN reach rc ON e.v = rc.node
            )
            SELECT node, MIN(r) FROM reach GROUP BY node
            """
        ).fetchall()
    )
    assert got == want
