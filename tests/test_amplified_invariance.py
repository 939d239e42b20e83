"""Correctness AT amplified scale (round 8): for deterministic dedup
queries, a k×-amplified corpus (per-copy affine character substitution,
as in tools/amplify_smoke.py) must produce EXACTLY k offset-copies of
the 1× output — the alphabet bijection preserves each copy's internal
structure and the copies share no k-gram/digest, so any deviation means
the operator's result depends on corpus size or placement (a scale bug
no small-SF oracle can see).

Queries with sampling randomness (minhash re-rolls) or corpus-global
statistics (add-one-smoothed perplexity's vocabulary size) are NOT
invariant by design and are excluded; the invariant set is the
deterministic-digest family: cross-doc span excision, intra-doc spans,
exact dedup, and exact containment (whose pigeonhole PREFIX choice may
differ per copy, but whose verified output is exact regardless —
unconditional recall means the final pairs are invariant).
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # amplification probes: slow tier (round 14)
from pyspark.sql import functions as F

_ALPHA = "abcdefghijklmnopqrstuvwxyz"
_OFFSET = 1_000_000_000
_SF = "/root/testdata/sf0.01"


def _permuted_alphabet(k: int) -> str:
    # mirrors tools/amplify_smoke.py (shift maps: zero fixed chars)
    a = (1, 3, 7, 9)[k // 26]
    b = k % 26
    return "".join(_ALPHA[(a * i + b) % 26] for i in range(26))


def _amplified_docs(spark, factor: int):
    from osmart_etl_spark.io.sources import read_table

    docs = read_table(spark, _SF, "documents")
    parts = [docs]
    for k in range(1, factor):
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(k * _OFFSET)).alias("doc_id"),
                F.translate("text", _ALPHA, _permuted_alphabet(k)).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return docs, out


def _normalize_ids(rows, id_cols):
    """Map each row to (copy, row-with-ids-mod-offset) for comparison."""
    out = []
    for r in rows:
        d = r.asDict()
        copies = {d[c] // _OFFSET for c in id_cols}
        assert len(copies) == 1, f"cross-copy row leaked: {d}"
        for c in id_cols:
            d[c] = d[c] % _OFFSET
        out.append((copies.pop(), tuple(sorted(d.items()))))
    return out


def _assert_k_copies(base_rows, amp_rows, id_cols, factor):
    base = sorted(tuple(sorted(r.asDict().items())) for r in base_rows)
    got = _normalize_ids(amp_rows, id_cols)
    for k in range(factor):
        per_copy = sorted(row for c, row in got if c == k)
        assert per_copy == base, f"copy {k} output differs from 1x output"
    assert len(got) == factor * len(base)


@pytest.mark.parametrize("factor", [3])
@pytest.mark.slow
def test_span_excision_invariant_under_amplification(spark, factor):
    from osmart_etl_spark.ops.dedup import span_excision

    docs, amp = _amplified_docs(spark, factor)
    base = span_excision(docs, "doc_id", "text", k=8).collect()
    got = span_excision(amp, "doc_id", "text", k=8).collect()
    assert len(base) > 0  # the corpus must actually exercise the op
    _assert_k_copies(base, got, ["doc_id"], factor)


@pytest.mark.parametrize("factor", [3])
def test_intra_doc_spans_invariant_under_amplification(spark, factor):
    from osmart_etl_spark.ops.dedup import span_excision_intra

    docs, amp = _amplified_docs(spark, factor)
    base = span_excision_intra(docs, "doc_id", "text", k=8).collect()
    got = span_excision_intra(amp, "doc_id", "text", k=8).collect()
    _assert_k_copies(base, got, ["doc_id"], factor)


def _amplified_dir(spark, factor: int, tmp_path) -> str:
    """Materialize the amplified documents as an sf_dir for registry
    queries that only read the documents table."""
    _, amp = _amplified_docs(spark, factor)
    out = str(tmp_path / f"amp_x{factor}")
    amp.write.parquet(f"{out}/documents.parquet")
    return out


@pytest.mark.parametrize("factor", [3])
def test_exact_dedup_invariant_under_amplification(spark, tmp_path, factor):
    """keeper/n_copies per copy must match the 1x decisions (keeper =
    min doc_id works because the offset preserves within-copy order)."""
    import osmart_etl_spark.queries  # noqa: F401
    from osmart_etl_spark.queries.base import REGISTRY

    fn = REGISTRY["dedup_exact"].fn
    base = fn(spark, _SF).collect()
    got = fn(spark, _amplified_dir(spark, factor, tmp_path)).collect()
    _assert_k_copies(base, got, ["doc_id", "keeper_doc_id"], factor)


@pytest.mark.parametrize("factor", [3])
@pytest.mark.slow
def test_containment_pairs_invariant_under_amplification(spark, tmp_path, factor):
    """The pigeonhole PREFIX selection may tie-break differently per
    copy (different gram strings sort differently), but the count-
    threshold verify is exact with unconditional recall, so the final
    (id_small, id_big, containment, jaccard) rows are invariant —
    including the doubles, which divide identical integers."""
    import osmart_etl_spark.queries  # noqa: F401
    from osmart_etl_spark.queries.base import REGISTRY

    fn = REGISTRY["containment_pairs"].fn
    base = fn(spark, _SF).collect()
    got = fn(spark, _amplified_dir(spark, factor, tmp_path)).collect()
    assert len(base) > 0
    _assert_k_copies(base, got, ["id_small", "id_big"], factor)


@pytest.mark.parametrize("factor", [3])
def test_filter_funnel_counts_scale_exactly(spark, tmp_path, factor):
    """The affine substitution fixes spaces and digits and is a
    length-preserving bijection on a-z, so every funnel signal (length,
    word count, mean word length, digit ratio) is per-doc invariant —
    the k× funnel must be the 1× funnel with every count multiplied
    by exactly k (and identical survival_pct, which divides the same
    scaled integers)."""
    import osmart_etl_spark.queries  # noqa: F401
    from osmart_etl_spark.queries.base import REGISTRY

    fn = REGISTRY["filter_funnel_report"].fn
    base = {r["stage"]: r for r in fn(spark, _SF).collect()}
    got = {r["stage"]: r for r in fn(spark, _amplified_dir(spark, factor, tmp_path)).collect()}
    assert sorted(base) == sorted(got)
    for s in base:
        assert got[s]["survivors"] == factor * base[s]["survivors"]
        assert got[s]["dropped"] == factor * base[s]["dropped"]
        assert got[s]["survival_pct"] == base[s]["survival_pct"]


@pytest.mark.parametrize("factor", [3])
def test_length_deciles_invariant_under_amplification(spark, tmp_path, factor):
    """n_chars is preserved per copy, so the distinct-value support is
    IDENTICAL at k× while every cumulative count scales by k — the
    decile label of every (copy of a) document must equal its 1×
    label ((k·r·10 + k·n − 1) div (k·n) == (r·10 + n − 1) div n for
    the value-keyed cut arithmetic)."""
    import osmart_etl_spark.queries  # noqa: F401
    from osmart_etl_spark.queries.base import REGISTRY

    fn = REGISTRY["length_decile_buckets"].fn
    base = fn(spark, _SF).collect()
    got = fn(spark, _amplified_dir(spark, factor, tmp_path)).collect()
    _assert_k_copies(base, got, ["doc_id"], factor)
