"""Invariants for the round-9 curation operators beyond the oracle
hash-parity the driver already checks: funnel monotonicity, quota
bounds and determinism, decile completeness/tie-sharing, keep-best
argmax correctness, and the bloom batch-dedup's exactness against a
plain anti-join (the FP path must never change results)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_filter_funnel_monotonic(spark):
    from osmart_etl_spark.queries.curation import filter_funnel_report

    rows = {r["stage"]: r for r in filter_funnel_report(spark, SF_SMALL).collect()}
    assert sorted(rows) == [0, 1, 2, 3, 4]
    total = rows[0]["survivors"]
    assert rows[0]["dropped"] == 0 and rows[0]["survival_pct"] == 1.0
    prev = total
    for s in (1, 2, 3, 4):
        assert rows[s]["survivors"] <= prev, "funnel must be non-increasing"
        assert rows[s]["dropped"] == prev - rows[s]["survivors"]
        prev = rows[s]["survivors"]


def test_source_quota_bounds_and_determinism(spark):
    from osmart_etl_spark.io.sources import read_table
    from osmart_etl_spark.queries.curation import _QUOTA_N, source_quota_sample

    out1 = source_quota_sample(spark, SF_SMALL).collect()
    per_source: dict[str, int] = {}
    for r in out1:
        assert 1 <= r["rk"] <= _QUOTA_N
        per_source[r["source"]] = per_source.get(r["source"], 0) + 1
    truth = {
        r["source"]: r["n"]
        for r in read_table(spark, SF_SMALL, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for src, n in truth.items():
        assert per_source.get(src, 0) == min(n, _QUOTA_N)
    # deterministic: a second evaluation returns the identical sample
    out2 = source_quota_sample(spark, SF_SMALL).collect()
    key = lambda r: (r["source"], r["rk"], r["doc_id"])  # noqa: E731
    assert sorted(map(key, out1)) == sorted(map(key, out2))


def test_length_deciles_complete_and_tie_consistent(spark):
    from osmart_etl_spark.io.sources import read_table
    from osmart_etl_spark.queries.curation import length_decile_buckets

    out = length_decile_buckets(spark, SF_SMALL).collect()
    n_docs = read_table(spark, SF_SMALL, "documents").count()
    assert len(out) == n_docs, "every document must be labeled"
    by_val: dict[int, set[int]] = {}
    for r in out:
        assert 1 <= r["decile"] <= 10
        by_val.setdefault(r["n_chars"], set()).add(r["decile"])
    assert all(len(ds) == 1 for ds in by_val.values()), "value ties share a bucket"
    # deciles are monotone in the value
    pairs = sorted((v, ds.pop()) for v, ds in by_val.items())
    assert all(a[1] <= b[1] for a, b in zip(pairs, pairs[1:]))


def test_keep_best_is_cluster_argmax(spark):
    from osmart_etl_spark.io.sources import read_table
    from osmart_etl_spark.queries.curation import dedup_cluster_keep_best

    out = dedup_cluster_keep_best(spark, SF_SMALL).collect()
    n_docs = read_table(spark, SF_SMALL, "documents").count()
    assert sum(r["cluster_size"] for r in out) == n_docs, "partition of the corpus"
    assert len({r["cluster_id"] for r in out}) == len(out), "one keeper per cluster"
    # every keeper carries its own n_chars and a size >= 1
    for r in out:
        assert r["cluster_size"] >= 1 and r["keep_n_chars"] >= 0


def test_batch_bloom_equals_plain_anti_join(spark):
    """The bloom split (definitely-new ∪ verified-new) must be
    EXACTLY the plain digest anti-join — false positives only route
    rows through the verify join, never change the result."""
    from osmart_etl_spark.io.sources import read_table
    from osmart_etl_spark.queries.curation import dedup_new_batch_bloom

    got = sorted(
        (r["doc_id"], r["digest"])
        for r in dedup_new_batch_bloom(spark, SF_SMALL).collect()
    )
    d = read_table(spark, SF_SMALL, "documents")
    batch = d.filter(F.col("doc_id") <= 100).select(
        "doc_id", F.md5("text").alias("digest")
    )
    corpus = d.filter(F.col("doc_id") > 50).select(F.md5("text").alias("c_digest"))
    want = sorted(
        (r["doc_id"], r["digest"])
        for r in batch.join(
            corpus, batch["digest"] == corpus["c_digest"], "left_anti"
        ).collect()
    )
    assert got == want and len(got) > 0


def test_lang_confusion_fractions_sum_to_one(spark):
    from osmart_etl_spark.io.sources import read_table
    from osmart_etl_spark.queries.curation import lang_confusion_matrix

    out = lang_confusion_matrix(spark, SF_SMALL).collect()
    n_docs = read_table(spark, SF_SMALL, "documents").count()
    assert sum(r["n"] for r in out) == n_docs, "every document lands in one cell"
    by_decl: dict[str, float] = {}
    for r in out:
        assert 0.0 < r["frac_of_declared"] <= 1.0
        by_decl[r["declared_lang"]] = by_decl.get(r["declared_lang"], 0.0) + r[
            "frac_of_declared"
        ]
    for lang, s in by_decl.items():
        assert abs(s - 1.0) < 1e-9, f"{lang} row fractions must sum to 1"


def test_near_dup_rate_totals_and_bounds(spark):
    from osmart_etl_spark.io.sources import read_table
    from osmart_etl_spark.queries.curation import near_dup_rate_by_source

    out = near_dup_rate_by_source(spark, SF_SMALL).collect()
    n_docs = read_table(spark, SF_SMALL, "documents").count()
    assert sum(r["n_docs"] for r in out) == n_docs
    for r in out:
        assert 0 <= r["n_near_dup"] <= r["n_docs"]
        assert r["dup_rate"] == r["n_near_dup"] / r["n_docs"]


def test_badwords_keep_rule_and_ratio(spark):
    from osmart_etl_spark.io.sources import read_table
    from osmart_etl_spark.queries.curation import (
        _BLOCK_PCT,
        badwords_doc_filter,
    )

    out = badwords_doc_filter(spark, SF_SMALL).collect()
    n_docs = read_table(spark, SF_SMALL, "documents").count()
    assert len(out) == n_docs, "filter labels, never drops"
    assert any(not r["keep"] for r in out), "threshold must bind on the testdata"
    assert any(r["keep"] for r in out)
    for r in out:
        assert 0 <= r["n_flagged"] <= r["n_tokens"]
        # the keep flag is the integer-arithmetic threshold, exactly
        assert r["keep"] == (r["n_flagged"] * 100 <= r["n_tokens"] * _BLOCK_PCT)


def test_cluster_histogram_partitions_corpus(spark):
    from osmart_etl_spark.io.sources import read_table
    from osmart_etl_spark.queries.curation import dedup_cluster_size_histogram

    out = dedup_cluster_size_histogram(spark, SF_SMALL).collect()
    n_docs = read_table(spark, SF_SMALL, "documents").count()
    assert sum(r["n_docs"] for r in out) == n_docs, "clusters partition the corpus"
    for r in out:
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]
        assert r["cluster_size"] >= 1 and r["n_clusters"] >= 1
    assert len({r["cluster_size"] for r in out}) == len(out)


def test_bpe_encode_consistent_with_merges(spark):
    """Encode stats must be self-consistent and reflect the learned
    merges: total chars conserved (sum over symbols of their lengths =
    original text length), merged symbols are exactly the >1-char
    ones, and at least one document contains a merged symbol after 3
    training rounds on this corpus."""
    from osmart_etl_spark.io.sources import read_table
    from osmart_etl_spark.queries.bpe_train import bpe_encode_corpus

    out = bpe_encode_corpus(spark, SF_SMALL).collect()
    n_docs = read_table(spark, SF_SMALL, "documents").count()
    assert len(out) == n_docs
    assert any(r["n_merged_symbols"] > 0 for r in out), "merges must bind"
    for r in out:
        assert 0 <= r["n_merged_symbols"] <= r["n_symbols"]
        if r["n_symbols"]:
            assert r["chars_per_symbol"] >= 1.0, "merges only shrink symbol count"


def test_source_overlap_matrix_bounds(spark):
    from osmart_etl_spark.io.sources import read_table
    from osmart_etl_spark.queries.curation import source_overlap_matrix

    out = source_overlap_matrix(spark, SF_SMALL).collect()
    srcs = {
        r["source"]
        for r in read_table(spark, SF_SMALL, "documents").select("source").distinct().collect()
    }
    n = len(srcs)
    assert 0 < len(out) <= n * (n - 1) // 2
    seen = set()
    for r in out:
        assert r["source_a"] < r["source_b"], "canonical pair order"
        assert r["source_a"] in srcs and r["source_b"] in srcs
        assert r["n_shared"] >= 1
        assert 0.0 < r["jaccard"] <= 1.0
        seen.add((r["source_a"], r["source_b"]))
    assert len(seen) == len(out), "one row per pair"


def test_source_minhash_tracks_exact_jaccard(spark):
    """The K=64 sketch estimate is deterministic (seeded family) and
    unbiased with stderr = sqrt(J(1-J)/K) <= 1/16; assert every pair's
    estimate is within 4 sigma-max (0.25) of the exact Jaccard, and
    that ALL source pairs are present (zero-agreement pairs kept)."""
    from osmart_etl_spark.io.sources import read_table
    from osmart_etl_spark.queries.curation import (
        source_minhash_overlap,
        source_overlap_matrix,
    )

    exact = {
        (r["source_a"], r["source_b"]): r["jaccard"]
        for r in source_overlap_matrix(spark, SF_SMALL).collect()
    }
    est = {
        (r["source_a"], r["source_b"]): r["est_jaccard"]
        for r in source_minhash_overlap(spark, SF_SMALL).collect()
    }
    n = read_table(spark, SF_SMALL, "documents").select("source").distinct().count()
    assert len(est) == n * (n - 1) // 2, "every pair present in the sketch matrix"
    for pair, e in est.items():
        assert 0.0 <= e <= 1.0
        truth = exact.get(pair, 0.0)
        assert abs(e - truth) <= 0.25, f"{pair}: est {e} vs exact {truth}"
