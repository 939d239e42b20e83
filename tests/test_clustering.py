"""Differential tests for the round-9 additions: kmeans_lloyd vs a
numpy Lloyd twin, matryoshka prefix rerank vs an exact numpy two-stage
twin, and direct construction checks for the encoding-noise and
URL-canonicalization queries (their DuckDB oracles run in the parity
gate; these tests pin the SEMANTICS against independent
implementations)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMALL

K, T = 8, 3


@pytest.fixture(scope="module")
def emb_np(spark):
    from osmart_etl_spark.io.sources import read_table

    pdf = (
        read_table(spark, SF_SMALL, "embeddings")
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
    )
    ids = pdf["vec_id"].to_numpy()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    return ids, mat


def _lloyd_numpy(ids, mat, k, t_rounds):
    """Independent Lloyd twin: same init (k lowest vec_ids), same
    argmin tie-break (lowest centroid id), plain float64 means (the
    engine quantizes to DECIMAL(27,10) — agreement bound ~1e-9)."""
    order = np.argsort(ids)
    cent = mat[order[ids[order] < k]]
    cids = np.arange(k)
    for r in range(1, t_rounds + 1):
        d = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        # lexicographic (d, cid) argmin == first index of min distance
        assign = np.argmin(d, axis=1)
        dist = d[np.arange(len(mat)), assign]
        if r < t_rounds:
            live = np.unique(assign)
            cent = np.stack([mat[assign == c].mean(axis=0) for c in live])
            cids = live
        assign = cids[assign] if r == t_rounds else assign
    return assign, dist


def test_kmeans_lloyd_counts_and_inertia(spark, emb_np):
    from osmart_etl_spark.queries.clustering import kmeans_lloyd

    ids, mat = emb_np
    assign, dist = _lloyd_numpy(ids, mat, K, T)
    expect = (
        pd.DataFrame({"cluster_id": assign, "d": dist})
        .groupby("cluster_id")
        .agg(n_members=("d", "size"), inertia=("d", "sum"))
        .reset_index()
    )
    got = kmeans_lloyd(spark, SF_SMALL).toPandas().sort_values("cluster_id")
    assert list(got["cluster_id"]) == list(expect["cluster_id"])
    assert list(got["n_members"]) == list(expect["n_members"])
    # engine pre-quantizes element means/distances to DECIMAL(27,10);
    # the float64 twin agrees to ~1e-6 absolute on summed inertia
    np.testing.assert_allclose(
        got["inertia"].to_numpy(), expect["inertia"].to_numpy(), rtol=0, atol=1e-5
    )
    assert got["n_members"].sum() == len(mat)


def test_matryoshka_rerank_matches_numpy_twin(spark):
    from osmart_etl_spark.io.sources import read_table
    from osmart_etl_spark.queries.similarity import (
        _MAT_PDIM,
        _MAT_PREK,
        matryoshka_prefix_rerank,
    )

    pdf = (
        read_table(spark, SF_SMALL, "embeddings")
        .select("vec_id", "embedding")
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    q = mat[ids == 0][0]
    corpus, cids = mat[ids != 0], ids[ids != 0]

    def cos(a, b):
        return (a @ b) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b))

    pre = cos(corpus[:, :_MAT_PDIM], q[:_MAT_PDIM])
    # top-PREK by (pre desc, id asc)
    o1 = np.lexsort((cids, -pre))[:_MAT_PREK]
    full = cos(corpus[o1], q)
    o2 = np.lexsort((cids[o1], -full))[:10]
    expect_ids = list(cids[o1][o2])

    got = matryoshka_prefix_rerank(spark, SF_SMALL).toPandas()
    assert list(got["vec_id"]) == expect_ids
    np.testing.assert_allclose(
        got["cos_sim"].to_numpy(), full[o2], rtol=0, atol=1e-12
    )
    # the final 10 are exactly the 10 best full-dim scores among the
    # 50 prefix candidates
    assert got["cos_sim"].min() >= np.sort(full)[-10]


def test_encoding_noise_flags_only_injected_docs(spark):
    from osmart_etl_spark.queries.cleaning import text_encoding_noise

    got = text_encoding_noise(spark, SF_SMALL).toPandas()
    for _, row in got.iterrows():
        did = row["doc_id"]
        exp_repl = (1 + did % 4) if did % 3 == 0 else 0
        assert row["n_repl"] == exp_repl, did
        # ' cafÃ© dÃ©jÃ ' carries two 'Ã©'? — exactly one 'Ã©' plus
        # 'Ã©' inside 'dÃ©jÃ ' = 2; apostrophe marker adds 1
        exp_moji = (2 if did % 7 == 2 else 0) + (1 if did % 11 == 5 else 0)
        assert row["n_moji"] == exp_moji, did
        assert bool(row["is_noisy"]) == (exp_repl > 0 or exp_moji >= 2)


def test_url_canonical_dedup_collapses_variants(spark):
    from osmart_etl_spark.queries.cleaning import url_canonical_dedup

    got = url_canonical_dedup(spark, SF_SMALL).toPandas()
    # canonical key is exactly (doc_id%7, doc_id%13) over doc_id%3==0
    # docs — scheme/case/www/slash/query variants must all collapse
    import collections

    exp = collections.defaultdict(list)
    from osmart_etl_spark.io.sources import read_table

    all_ids = (
        read_table(spark, SF_SMALL, "documents")
        .select("doc_id")
        .toPandas()["doc_id"]
        .tolist()
    )
    for did in all_ids:
        if did % 3 == 0:
            exp[f"site{did % 7}.example/path{did % 13}"].append(did)
    assert len(got) == len(exp)
    by_url = {r["canonical_url"]: r for _, r in got.iterrows()}
    for url, members in exp.items():
        assert url in by_url, url
        assert by_url[url]["n_docs"] == len(members)
        assert by_url[url]["keeper_doc_id"] == min(members)
