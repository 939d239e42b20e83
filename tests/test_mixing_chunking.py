"""Properties of the data-mixing and chunking queries that the hash
compare can't express: rerun stability, rate calibration, lossless
chunk reassembly."""

from __future__ import annotations

from pyspark.sql import functions as F

from osmart_etl_spark.io.sources import read_table
from osmart_etl_spark.queries.text import _MIX_RATES, deterministic_sample, doc_chunking
from tests.conftest import SF_MEDIUM


def test_sample_is_rerun_stable(spark):
    a = {r["doc_id"] for r in deterministic_sample(spark, SF_MEDIUM).collect()}
    b = {r["doc_id"] for r in deterministic_sample(spark, SF_MEDIUM).collect()}
    assert a == b and a


def test_sample_rates_calibrated(spark):
    """Observed per-language keep-rate within a loose binomial band of
    the configured rate (500 docs at sf0.01 — wide tolerance)."""
    full = read_table(spark, SF_MEDIUM, "documents").groupBy("lang").count()
    kept = deterministic_sample(spark, SF_MEDIUM).groupBy("lang").count()
    totals = {r["lang"]: r["count"] for r in full.collect()}
    kept_n = {r["lang"]: r["count"] for r in kept.collect()}
    for lang, rate in _MIX_RATES.items():
        n = totals[lang]
        got = kept_n.get(lang, 0) / n
        assert abs(got - rate) < 0.2, f"{lang}: {got} vs {rate}"


def test_sample_subset_of_corpus(spark):
    ids = {r["doc_id"] for r in read_table(spark, SF_MEDIUM, "documents").select("doc_id").collect()}
    samp = {r["doc_id"] for r in deterministic_sample(spark, SF_MEDIUM).collect()}
    assert samp <= ids


def test_chunks_reassemble_to_token_stream(spark):
    """Concatenating a doc's chunks in chunk_idx order must reproduce
    the doc's full token stream — chunking is lossless and ordered."""
    from osmart_etl_spark.ops.text import tokens

    chunks = doc_chunking(spark, SF_MEDIUM)
    rebuilt = (
        chunks.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk_text"))),
                    lambda s: s["chunk_text"],
                ),
                " ",
            ).alias("rebuilt")
        )
    )
    orig = read_table(spark, SF_MEDIUM, "documents").select(
        "doc_id", F.array_join(tokens(F.col("text")), " ").alias("orig")
    )
    bad = rebuilt.join(orig, "doc_id").filter(F.col("rebuilt") != F.col("orig")).count()
    assert bad == 0


def test_chunk_sizes(spark):
    """Every chunk ≤ 50 tokens; every non-final chunk exactly 50."""
    chunks = doc_chunking(spark, SF_MEDIUM)
    assert chunks.filter(F.col("n_chunk_tokens") > 50).count() == 0
    w_max = chunks.groupBy("doc_id").agg(F.max("chunk_idx").alias("last"))
    nonfinal = chunks.join(w_max, "doc_id").filter(F.col("chunk_idx") < F.col("last"))
    assert nonfinal.filter(F.col("n_chunk_tokens") != 50).count() == 0


def test_sequence_packing_invariants(spark):
    """Packing contract: (a) no bin exceeds capacity; (b) within a bin,
    docs occupy contiguous [offset, offset+n) intervals starting at 0 in
    doc_id order (lossless packing, no holes, no overlap); (c) every doc
    appears exactly once; (d) bins are dense per shard (0..max)."""
    from osmart_etl_spark.ops.packing import pack_sequences
    from osmart_etl_spark.ops.text import tokens

    cap = 100
    d = read_table(spark, SF_MEDIUM, "documents")
    out = pack_sequences(
        d, "doc_id", F.size(tokens(F.col("text"))), capacity=cap, n_shards=8
    ).collect()

    assert len(out) == d.count()
    by_bin: dict = {}
    for r in out:
        assert 0 <= r["n_tokens"] <= cap
        by_bin.setdefault((r["shard"], r["bin_id"]), []).append(r)
    for (shard, bin_id), rows in by_bin.items():
        rows.sort(key=lambda r: r["doc_id"])
        pos = 0
        for r in rows:
            assert r["bin_offset"] == pos, (shard, bin_id, r)
            pos += r["n_tokens"]
        assert pos <= cap
    for shard in {r["shard"] for r in out}:
        bins = sorted({b for (s, b) in by_bin if s == shard})
        assert bins == list(range(len(bins)))
