"""Unit tests for the broadcast-hint audit's plan-text parser and
bounding rules (tools/broadcast_hint_audit.py) — the registry-wide
gate's own machinery, exercised on hand-built optimized-plan text so a
Spark plan-format drift or a parser bug fails HERE with a readable
diff instead of silently flagging nothing."""

from __future__ import annotations

from tools.broadcast_hint_audit import (
    _is_bounding,
    audit_query,
    parse_plan_tree,
)

SCHEMAS = {
    "orders": {"o_orderkey", "o_custkey", "o_totalprice"},
    "nation": {"n_nationkey", "n_name"},
    "embeddings": {"vec_id", "embedding", "label"},
}


def test_parse_tree_depths_and_parents():
    plan = (
        "Project [a#1]\n"
        "+- Join Inner, (a#1 = b#2), rightHint=(strategy=broadcast)\n"
        "   :- Project [a#1]\n"
        "   :  +- Relation [o_orderkey#3,o_custkey#4] parquet\n"
        "   +- Aggregate [b#2]\n"
        "      +- Relation [n_nationkey#5,n_name#6] parquet\n"
    )
    nodes = parse_plan_tree(plan)
    texts = [t for _, t, _ in nodes]
    assert texts[0].startswith("Project") and texts[1].startswith("Join")
    # Join's children: the two depth-2 nodes, in order (left then right)
    join_idx = 1
    kids = [i for i, (_, _, p) in enumerate(nodes) if p == join_idx]
    assert len(kids) == 2
    assert nodes[kids[0]][1].startswith("Project")
    assert nodes[kids[1]][1].startswith("Aggregate")


def test_flags_unbounded_fact_side_only():
    # right side broadcast-hinted and AGGREGATED -> bounded, no flag
    bounded = (
        "Join Inner, (a#1 = b#2), rightHint=(strategy=broadcast)\n"
        ":- Relation [o_orderkey#3,o_custkey#4] parquet\n"
        "+- Aggregate [b#2]\n"
        "   +- Relation [o_orderkey#5,o_custkey#6] parquet\n"
    )
    assert audit_query(bounded, SCHEMAS) == []
    # LEFT side hinted and a bare Project over a fact scan -> flag
    unbounded = (
        "Join Inner, (a#1 = b#2), leftHint=(strategy=broadcast)\n"
        ":- Project [a#1]\n"
        ":  +- Relation [o_orderkey#3,o_custkey#4] parquet\n"
        "+- Relation [n_nationkey#5,n_name#6] parquet\n"
    )
    assert audit_query(unbounded, SCHEMAS) == ["orders"]
    # unhinted join -> never flagged
    no_hint = unbounded.replace(", leftHint=(strategy=broadcast)", "")
    assert audit_query(no_hint, SCHEMAS) == []
    # dim scan under a hint -> not a fact table, no flag
    dim = (
        "Join Inner, (a#1 = b#2), rightHint=(strategy=broadcast)\n"
        ":- Relation [o_orderkey#3] parquet\n"
        "+- Relation [n_nationkey#5,n_name#6] parquet\n"
    )
    assert audit_query(dim, SCHEMAS) == []


def test_id_literal_filter_bounds_but_other_filters_do_not():
    assert _is_bounding("Filter (isnotnull(vec_id#3L) AND (vec_id#3L < 64))")
    assert _is_bounding("Filter (vec_id#3 = 0)")
    assert _is_bounding("Filter (doc_id#9L <= 100)")
    assert not _is_bounding("Filter (lang#4 = en)")
    assert not _is_bounding("Filter (vec_id#3L > 100)")  # lower bound: unbounded
    assert not _is_bounding("Project [vec_id#3L]")
    assert _is_bounding("Aggregate [k#1], [k#1, min(h#2) AS m#3]")
    assert _is_bounding("GlobalLimit 10")
    # end-to-end: the id-bounded batch pattern must not flag
    batch = (
        "Join Inner, (a#1 = b#2), rightHint=(strategy=broadcast)\n"
        ":- Relation [o_orderkey#3,o_custkey#4] parquet\n"
        "+- Filter (isnotnull(vec_id#5L) AND (vec_id#5L < 64))\n"
        "   +- Relation [vec_id#5,embedding#6,label#7] parquet\n"
    )
    assert audit_query(batch, SCHEMAS) == []


def test_both_sides_hinted_and_shared_marker_ambiguity():
    both = (
        "Join Inner, (a#1 = b#2), leftHint=(strategy=broadcast), "
        "rightHint=(strategy=broadcast)\n"
        ":- Relation [o_orderkey#3] parquet\n"
        "+- Relation [vec_id#5,embedding#6] parquet\n"
    )
    assert sorted(audit_query(both, SCHEMAS)) == ["embeddings", "orders"]
    # a relation whose columns fit NO single table is not classified
    unknown = (
        "Join Inner, (a#1 = b#2), rightHint=(strategy=broadcast)\n"
        ":- Relation [o_orderkey#3] parquet\n"
        "+- Relation [something_else#9] parquet\n"
    )
    assert audit_query(unknown, SCHEMAS) == []


def test_aggregate_on_fact_key_does_not_bound():
    """Round-10 loophole close: an Aggregate whose GROUPING key is a
    fact PK/FK (per-node ranks, per-part degrees) has fact-cardinality
    output and must NOT whitelist a broadcast — while a GLOBAL
    aggregate (single bracket list in Spark 4 plan text, always 1 row)
    and an aggregate on a bounded attribute still bound."""
    # grouped on a fact key -> NOT bounding
    assert not _is_bounding(
        "Aggregate [l_partkey#23L], [l_partkey#23L, count(1) AS n#99L]"
    )
    assert not _is_bounding(
        "Aggregate [user_id#3L, _groupingexpression#42], "
        "[user_id#3L, count(1) AS c#5L]"
    )
    # global aggregate: Spark 4 prints ONE bracket list -> 1 row, bounds
    assert _is_bounding(
        "Aggregate [min(o_custkey#370L) AS lo#1L, max(o_custkey#370L) AS hi#2L]"
    )
    assert _is_bounding("Aggregate [max(doc_id#449L) AS __max_id#455L]")
    # grouped on a bounded attribute -> bounds
    assert _is_bounding(
        "Aggregate [event_type#9], [event_type#9, count(1) AS n#10L]"
    )
    # end-to-end: hinted side = per-fact-key aggregate over a fact scan
    plan = (
        "Join Inner, (a#1 = b#2), rightHint=(strategy=broadcast)\n"
        ":- Relation [o_orderkey#3,o_custkey#4] parquet\n"
        "+- Aggregate [o_custkey#6L], [o_custkey#6L, count(1) AS n#7L]\n"
        "   +- Relation [o_orderkey#5,o_custkey#6] parquet\n"
    )
    assert audit_query(plan, SCHEMAS) == ["orders"]


def test_point_filter_on_user_id_bounds():
    """A `user_id = <literal>` probe pins ONE entity: downstream
    per-entity aggregates are bounded by the attribute domain, not the
    corpus."""
    assert _is_bounding("Filter (isnotnull(user_id#328L) AND (user_id#328L = 1))")
    assert not _is_bounding("Filter (value#4 > 50)")
    # string-typed id point equality also bounds
    assert _is_bounding("Filter (doc_id#9 = abc123)")
