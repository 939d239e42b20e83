"""PassJoin (dedup_edit_passjoin) differential tests: the segment
blocking must be COMPLETE — every pair within τ must survive blocking —
including pairs whose edits are insertions/deletions that SHIFT all
downstream segment positions (the case heuristic blocking drops)."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from osmart_etl_spark.queries.base import REGISTRY


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


@pytest.fixture(scope="module")
def passjoin_corpus(spark, tmp_path_factory):
    """Synthetic corpus of mutated copies: substitutions, single indels
    (segment-shifting), double indels, and far strings. Written as a
    documents.parquet so the registered query runs on it verbatim."""
    base = "the quick brown fox jumps over the lazy dog now"
    rows = [
        (0, base),
        (1, base.replace("quick", "quack")),           # 1 substitution
        (2, base[:7] + base[8:]),                      # 1 deletion (shifts)
        # One insertion: with the 40-char truncation this costs 2 (the
        # insert + the char pushed past the cut), still within τ and
        # still shifting every downstream segment position.
        (3, base[:5] + "x" + base[5:]),
        (4, base[:3] + base[4:30] + "z" + base[30:]),  # del + ins, far apart
        (5, "completely different text that matches nobody else here"),
        (6, base.upper()),                             # normalizes to base
        (7, "the  quick   brown fox jumps over the lazy dog now"),  # ws
    ]
    d = tmp_path_factory.mktemp("pj")
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d / "documents.parquet"))
    return str(d)


def test_passjoin_matches_bruteforce(spark, passjoin_corpus):
    got = {
        (r.doc_a, r.doc_b): r.edit_dist
        for r in REGISTRY["dedup_edit_passjoin"].fn(spark, passjoin_corpus).collect()
    }
    docs = spark.read.parquet(passjoin_corpus + "/documents.parquet").collect()
    keys = {}
    for r in docs:
        norm = " ".join(r.text.lower().strip().split(" "))
        while "  " in norm:
            norm = norm.replace("  ", " ")
        keys[r.doc_id] = norm[:40]
    want = {}
    for a, b in itertools.combinations(sorted(keys), 2):
        d = _lev(keys[a], keys[b])
        if d <= 2:
            want[(a, b)] = d
    assert got == want
    # The corpus is built so the interesting shapes actually occur:
    assert (0, 2) in want and (0, 3) in want  # indel-shifted pairs found


def test_passjoin_on_testdata_matches_bruteforce(spark):
    """Full-corpus differential at sf0.001: blocking recall == 1."""
    from tests.conftest import SF_SMALL as sf_dir

    q = REGISTRY["dedup_edit_passjoin"].fn(spark, sf_dir)
    got = {(r.doc_a, r.doc_b, r.edit_dist) for r in q.collect()}

    from osmart_etl_spark.ops.text import normalized_text

    keys = (
        spark.read.parquet(sf_dir + "/documents.parquet")
        .select(
            "doc_id",
            F.substring(normalized_text(F.col("text")), 1, 40).alias("key"),
        )
        .filter((F.octet_length("key") == F.length("key")) & (F.length("key") >= 3))
    )
    a = keys.select(F.col("doc_id").alias("doc_a"), F.col("key").alias("ka"))
    b = keys.select(F.col("doc_id").alias("doc_b"), F.col("key").alias("kb"))
    brute = (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b", F.levenshtein("ka", "kb").cast("bigint").alias("d")
        )
        .filter(F.col("d") <= 2)
    )
    want = {(r.doc_a, r.doc_b, r.d) for r in brute.collect()}
    assert got == want


# ---------------------------------------------------------------------------
# Property: the segment/window enumeration is COMPLETE for any pair within
# tau — pure-Python mirror of the Spark key expressions, so hypothesis can
# hammer the off-by-one-prone windowing math with thousands of cases.
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_M, _TAU = 3, 2


def _seg(l: int, i: int) -> tuple[int, int]:  # (start0, length), 0-based
    base, rem = divmod(l, _M)
    length = base + (1 if i >= _M - rem else 0)
    start = i * base + max(i - (_M - rem), 0)
    return start, length


def _index_keys(s: str):
    l = len(s)
    return {(l, i, s[_seg(l, i)[0] : _seg(l, i)[0] + _seg(l, i)[1]]) for i in range(_M)}


def _probe_keys(r: str):
    lr = len(r)
    keys = set()
    for l in range(max(lr - _TAU, _M), lr + 1):
        for i in range(_M):
            start, ln = _seg(l, i)
            for p in range(max(0, start - _TAU), min(lr - ln, start + _TAU) + 1):
                keys.add((l, i, r[p : p + ln]))
    return keys


@settings(max_examples=2000, deadline=None)
@given(
    s=st.text(alphabet="ab ", min_size=3, max_size=24),
    edits=st.lists(
        st.tuples(st.integers(0, 23), st.sampled_from("ins del sub".split()),
                  st.sampled_from("ab ")),
        min_size=0, max_size=2,
    ),
)
def test_passjoin_blocking_is_complete(s, edits):
    """Apply <= tau random edits to s; if both strings are long enough to
    segment, the probe keys of the LONGER string must intersect the
    index keys of the SHORTER (the candidate-generation guarantee)."""
    r = s
    for pos, kind, ch in edits:
        p = pos % max(len(r), 1)
        if kind == "ins":
            r = r[:p] + ch + r[p:]
        elif kind == "del" and r:
            r = r[:p] + r[p + 1 :]
        elif kind == "sub" and r:
            r = r[:p] + ch + r[p + 1 :]
    if len(s) < _M or len(r) < _M:
        return
    d = _lev(s, r)
    if d > _TAU:
        return
    short, long_ = (s, r) if len(s) <= len(r) else (r, s)
    assert _index_keys(short) & _probe_keys(long_), (s, r, d)
