"""ExactSubstr min-length-L equivalence proof (round-8 judge task 4).

Claim (see ``queries/text.dedup_span_excision_minlen``): for any
L >= window size, ``ops.dedup.span_excision(k=L)``'s merged islands
cover EXACTLY the positions lying inside some cross-document duplicated
token substring of length >= L — i.e. the k-gram-inventory relational
decomposition equals Lee et al. 2022's suffix-array ExactSubstr-L
semantics, not an approximation of it.

The independent oracle here is the quadratic algorithm the claim is
measured against: for every PAIR of documents, a diagonal
common-substring DP finds every maximal shared token run; runs of
length >= L mark their positions on both sides. Nothing is shared with
the engine's implementation (no k-gram inventory, no digests, no
islands) — only the final position sets are compared.

Corpora are adversarial by construction: a tiny vocabulary (many
accidental short matches hovering around the L boundary) plus planted
shared spans spliced between random document pairs.
"""

from __future__ import annotations

import numpy as np
import pytest


def _brute_cover(docs: dict[int, list[str]], L: int) -> dict[int, set[int]]:
    """Positions (1-based) inside any >=L-token substring shared with
    ANOTHER document, via pairwise maximal-common-run DP."""
    covered: dict[int, set[int]] = {d: set() for d in docs}
    ids = sorted(docs)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = docs[ids[ai]], docs[ids[bi]]
            prev = [0] * (len(b) + 1)
            for i in range(1, len(a) + 1):
                cur = [0] * (len(b) + 1)
                for j in range(1, len(b) + 1):
                    if a[i - 1] == b[j - 1]:
                        cur[j] = prev[j - 1] + 1
                        run = cur[j]
                        # maximal run ends here if the diagonal stops
                        if (
                            i == len(a)
                            or j == len(b)
                            or a[i] != b[j]
                        ) and run >= L:
                            covered[ids[ai]].update(range(i - run + 1, i + 1))
                            covered[ids[bi]].update(range(j - run + 1, j + 1))
                prev = cur
    return covered


def _gen_corpus(seed: int, n_docs: int = 24) -> dict[int, list[str]]:
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(6)]  # tiny vocab: accidental matches
    docs = {
        d: [vocab[int(x)] for x in rng.integers(0, len(vocab), int(rng.integers(12, 60)))]
        for d in range(n_docs)
    }
    # plant shared spans of assorted lengths between random pairs
    for _ in range(8):
        src, dst = rng.choice(n_docs, 2, replace=False)
        s, t = docs[int(src)], docs[int(dst)]
        ln = int(rng.integers(4, 20))
        if len(s) <= ln:
            continue
        start = int(rng.integers(0, len(s) - ln))
        at = int(rng.integers(0, len(t)))
        docs[int(dst)] = t[:at] + s[start : start + ln] + t[at:]
    return docs


@pytest.mark.parametrize("seed,L", [(0, 3), (1, 5), (2, 8), (3, 5), (4, 12)])
def test_span_islands_equal_quadratic_exactsubstr(spark, seed, L):
    from osmart_etl_spark.ops.dedup import span_excision

    docs = _gen_corpus(seed)
    df = spark.createDataFrame(
        [(d, " ".join(toks)) for d, toks in docs.items()], ["doc_id", "text"]
    )
    spans = span_excision(df, "doc_id", "text", k=L).collect()
    got: dict[int, set[int]] = {d: set() for d in docs}
    for r in spans:
        got[r["doc_id"]].update(range(r["span_start"], r["span_end"]))
    want = _brute_cover(docs, L)
    assert got == want, (
        f"L={L} seed={seed}: island cover != quadratic ExactSubstr cover"
    )


def test_span_islands_never_adjacent(spark):
    """Sanity: emitted intervals are maximal (no two islands of a doc
    touch or overlap), so the cover comparison above is also an
    interval-level comparison."""
    from osmart_etl_spark.ops.dedup import span_excision

    docs = _gen_corpus(7)
    df = spark.createDataFrame(
        [(d, " ".join(toks)) for d, toks in docs.items()], ["doc_id", "text"]
    )
    rows = span_excision(df, "doc_id", "text", k=4).collect()
    per_doc: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))
    for d, iv in per_doc.items():
        iv.sort()
        for (s1, e1), (s2, e2) in zip(iv, iv[1:]):
            assert s2 > e1, f"doc {d}: islands [{s1},{e1}) and [{s2},{e2}) touch"
