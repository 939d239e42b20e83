"""Registry-wide broadcast-hint audit (round 9): mechanically verify
that NO query carries an explicit broadcast hint whose build side is an
UNBOUNDED fact-table subtree — the 100 TB plan-defect class the round-9
rework removed from the relational and dedup tiers, turned into a
standing structural check over every registered query.

Rule, per optimized logical plan (where explicit ``F.broadcast()`` /
``/*+ BROADCAST */`` hints surface as ``leftHint=/rightHint=
(strategy=broadcast)`` on Join nodes): for every broadcast-hinted join
side, every fact-table scan (orders / customer / lineitem / documents /
events / embeddings — the tables whose row counts scale with the
corpus) inside that side must have an Aggregate or GlobalLimit on its
path to the hinted subtree's root. An aggregate/limit bounds the
broadcast payload by key-cardinality/k regardless of input volume; a
bare Filter/Project does not (its output is volume-proportional unless
the predicate is known-selective, which a plan can't prove).

Sites that ARE volume-bounded by construction but not by plan shape
(e.g. an incremental batch defined as a doc_id range) must be
explicitly whitelisted in the calling test with a justification.

Usage: python tools/broadcast_hint_audit.py [sf_dir]
Prints one line per finding: ``FLAG <query> <table>``; exits 0 always
(the pytest wrapper owns pass/fail).
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

#: logical nodes that bound their output size independent of input
#: volume (Aggregate: |distinct keys| — UNLESS the grouping key is a
#: fact PK/FK, see below; limits: k). Window/Filter/Project/Generate
#: do NOT bound.
_BOUNDING = ("GlobalLimit", "LocalLimit", "Deduplicate")

#: a Filter DOES bound when it pins the table's dense primary id to a
#: literal point/prefix/interval range (query batches, seed sets,
#: codebook training slices: `vec_id == 0`, `vec_id < 64`,
#: `doc_id <= 100`, `doc_id BETWEEN 10 AND 20` — the BETWEEN's `<=`
#: conjunct is what matches) — constant row count by KEY DENSITY, not
#: by volume fraction. A `>=`-only bound does NOT bound (unbounded
#: above on a growing key space). Point equality on a STRING-typed id
#: bounds too (`= <literal>` with a non-numeric literal). A filter on
#: any non-key column (lang = 'en', hash-mod sampling) stays
#: proportional and does NOT bound.
#: user_id is here for POINT probes (`user_id = 7`): one user's
#: post-aggregate profile is bounded by the attribute domain (bigram
#: types), not by corpus volume.
_ID_COLS = (
    "vec_id",
    "doc_id",
    "event_id",
    "o_orderkey",
    "c_custkey",
    "l_orderkey",
    "user_id",
)
_ID_BOUND_RE = re.compile(
    r"\((?:%s)#\d+L? (?:(?:=|<|<=) \d+|= [^)\s]+)\)" % "|".join(_ID_COLS)
)

#: fact PK/FK columns: an Aggregate GROUPED on one of these has
#: fact-proportional key cardinality (per-order, per-customer,
#: per-part, per-supplier, per-doc, per-vector, per-user groups), so
#: it does NOT bound a broadcast — the round-9 pagerank/cooccurrence
#: loophole. Grouping keys that are derived expressions over these
#: (concat/hash aliases) are not traced; keep derived fact-key groups
#: un-hinted by construction.
FACT_KEYS = (
    "o_orderkey",
    "o_custkey",
    "c_custkey",
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "ps_partkey",
    "ps_suppkey",
    "p_partkey",
    "s_suppkey",
    "doc_id",
    "event_id",
    "user_id",
    "vec_id",
)
_FACT_KEY_RE = re.compile(r"\b(?:%s)#\d+" % "|".join(FACT_KEYS))


def _agg_grouping_text(text: str) -> str | None:
    """The grouping-expression list of a GROUPED ``Aggregate [g...],
    [a...]`` node (first balanced bracket group), or None for a GLOBAL
    aggregate — Spark 4 prints those with a single bracket list
    (``Aggregate [min(x) AS lo, ...]``), and a global aggregate is
    always 1 row, i.e. bounding."""
    start = text.find("[")
    if start < 0:
        return None
    depth, end = 0, -1
    for i in range(start, len(text)):
        if text[i] == "[":
            depth += 1
        elif text[i] == "]":
            depth -= 1
            if depth == 0:
                end = i
                break
    if end < 0:
        # truncated plan line: be conservative, treat as grouped on
        # whatever keys appear in the visible prefix
        return text[start + 1 :]
    if not text[end + 1 :].lstrip().startswith(", ["):
        return None  # single list → global aggregate
    return text[start + 1 : end]


def _is_bounding(text: str) -> bool:
    if text.startswith(_BOUNDING):
        return True
    if text.startswith("Aggregate"):
        # |groups| is only a bound when the grouping key space is
        # itself bounded — grouping on a fact PK/FK yields
        # fact-cardinality output and must NOT whitelist a broadcast.
        grouping = _agg_grouping_text(text)
        if grouping is None:  # global aggregate: 1 row
            return True
        return not _FACT_KEY_RE.search(grouping)
    return text.startswith("Filter") and bool(_ID_BOUND_RE.search(text))

#: tables whose cardinality scales with corpus/fact volume. Only
#: nation (25 rows) and region (5 rows) are constant in SF — part
#: (200k·SF) and supplier (10k·SF) grow LINEARLY with SF exactly like
#: lineitem (smaller constants, same exponent), so they are fact
#: tables for broadcast purposes: at SF≈100k (the 100 TB north star)
#: part is ~20B rows and a forced broadcast OOMs every executor.
FACT_TABLES = (
    "orders",
    "customer",
    "lineitem",
    "documents",
    "events",
    "embeddings",
    "part",
    "supplier",
)

_PREFIXES = (":  ", "   ", ":- ", "+- ")


def parse_plan_tree(section: str) -> list[tuple[int, str, int | None]]:
    """Parse Spark's indented plan text into (depth, text, parent_idx)
    preorder nodes. Handles the ':- /+- /:  /   ' 3-char prefix groups;
    stops at the first '== ' header after content begins."""
    nodes: list[tuple[int, str, int | None]] = []
    last_at_depth: dict[int, int] = {}
    for line in section.splitlines():
        if not line.strip():
            continue
        if line.startswith("== "):
            if nodes:
                break
            continue
        depth, i = 0, 0
        while i + 3 <= len(line) and line[i : i + 3] in _PREFIXES:
            depth += 1
            i += 3
        text = line[i:]
        parent = last_at_depth.get(depth - 1) if depth > 0 else None
        idx = len(nodes)
        nodes.append((depth, text, parent))
        last_at_depth[depth] = idx
        for d in [d for d in last_at_depth if d > depth]:
            del last_at_depth[d]
    return nodes


def _table_of_relation(text: str, schemas: dict[str, set[str]]) -> str | None:
    m = re.match(r"Relation \[([^\]]*)\]", text)
    if not m:
        return None
    cols = {c.split("#")[0] for c in m.group(1).split(",") if c}
    if not cols:
        return None
    candidates = [t for t, tc in schemas.items() if cols <= tc]
    return candidates[0] if len(candidates) == 1 else None


def audit_query(plan_text: str, schemas: dict[str, set[str]]) -> list[str]:
    """Return fact-table names reached by a broadcast-hinted join side
    without a bounding Aggregate/Limit on the path."""
    nodes = parse_plan_tree(plan_text)
    children: dict[int, list[int]] = {}
    for idx, (_, _, parent) in enumerate(nodes):
        if parent is not None:
            children.setdefault(parent, []).append(idx)

    flagged: list[str] = []
    for idx, (_, text, _) in enumerate(nodes):
        if not text.startswith("Join"):
            continue
        kids = children.get(idx, [])
        if len(kids) != 2:
            continue
        sides = []
        if re.search(r"leftHint=\([^)]*strategy=broadcast", text):
            sides.append(kids[0])
        if re.search(r"rightHint=\([^)]*strategy=broadcast", text):
            sides.append(kids[1])
        for root in sides:
            # preorder descendants of `root`
            stack = [root]
            while stack:
                cur = stack.pop()
                stack.extend(children.get(cur, []))
                table = _table_of_relation(nodes[cur][1], schemas)
                if table not in FACT_TABLES:
                    continue
                # walk cur -> root: bounded iff Aggregate/Limit on path
                bounded = False
                walk: int | None = cur
                while walk is not None and walk != root:
                    walk = nodes[walk][2]
                    if walk is not None and _is_bounding(nodes[walk][1]):
                        bounded = True
                        break
                if _is_bounding(nodes[root][1]):
                    bounded = True
                if not bounded:
                    flagged.append(table)
    return flagged


def optimized_section(df) -> str:
    qe = df._jdf.queryExecution()
    full = qe.toString()
    m = re.search(r"== Optimized Logical Plan ==\n(.*?)(?:\n== |\Z)", full, re.S)
    return m.group(1) if m else ""


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import osmart_etl_spark.queries  # noqa: F401
    from osmart_etl_spark.io.sources import read_table
    from osmart_etl_spark.queries.base import REGISTRY
    from osmart_etl_spark.session import get_spark

    spark = get_spark("broadcast-hint-audit")
    spark.sparkContext.setLogLevel("ERROR")
    tables = "region nation customer supplier part orders lineitem events documents embeddings".split()
    schemas = {t: set(read_table(spark, sf_dir, t).columns) for t in tables}

    n = 0
    for name, qd in REGISTRY.items():
        n += 1
        try:
            plan = optimized_section(qd.fn(spark, sf_dir))
        except Exception as exc:  # plan construction failure is its own finding
            print(f"ERR  {name}: {exc}")
            continue
        for table in audit_query(plan, schemas):
            print(f"FLAG {name} {table}")
    print(f"# audited {n} queries", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
