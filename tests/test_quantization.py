"""PQ encode semantics (parity vs DuckDB covered by check_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_pq_codes_and_seed_vectors(spark):
    from osmart_etl_spark.queries.quantization import _K, _M, pq_encode

    res = pq_encode(spark, SF_SMALL).collect()
    assert res
    for r in res:
        for m in range(_M):
            assert 0 <= r[f"code_{m}"] < _K
        assert r["recon_err"] >= 0.0
        if r["vec_id"] < _K:
            # a seed vector's own slices are in every codebook: exact
            # reconstruction, and each code points at itself
            assert r["recon_err"] == 0.0
            assert all(r[f"code_{m}"] == r["vec_id"] for m in range(_M))


def test_pq_assignment_is_argmin(spark):
    """Forcing every subspace to codeword 0 can never beat the chosen
    assignment — pins the struct-argmax min-distance logic."""
    from osmart_etl_spark.io.sources import read_table
    from osmart_etl_spark.queries.quantization import _M, _SUB, _l2sq, pq_encode

    emb = read_table(spark, SF_SMALL, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    row0 = (
        emb.filter(F.col("vec_id") == 0)
        .select(*[F.slice(vec, m * _SUB + 1, _SUB).alias(f"s{m}") for m in range(_M)])
        .collect()[0]
    )
    seed0 = {m: list(row0[f"s{m}"]) for m in range(_M)}
    forced = emb.select(
        "vec_id",
        sum(
            (
                _l2sq(
                    F.slice(vec, m * _SUB + 1, _SUB),
                    F.lit(seed0[m]).cast("array<double>"),
                )
                for m in range(_M)
            ),
            F.lit(0.0),
        ).alias("forced_err"),
    )
    got = (
        pq_encode(spark, SF_SMALL)
        .join(forced, "vec_id")
        .filter(F.col("recon_err") > F.col("forced_err") + 1e-9)
        .count()
    )
    assert got == 0


def test_adc_equals_distance_to_reconstruction(spark):
    """Squared L2 decomposes over disjoint coordinate blocks, so the ADC
    lookup-sum MUST equal the exact distance between the query and the
    vector's reconstruction (codebook entries concatenated) — the
    defining identity of asymmetric-distance computation. Only the fold
    order differs, hence the 1e-9 tolerance instead of bit equality."""
    from osmart_etl_spark.io.sources import read_table
    from osmart_etl_spark.queries.quantization import (
        _K,
        _M,
        _SUB,
        _l2sq,
        pq_adc_topk,
        pq_encode,
    )

    emb = read_table(spark, SF_SMALL, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    rows = emb.filter(F.col("vec_id") < _K).select("vec_id", vec.alias("v")).collect()
    book = {r["vec_id"]: list(r["v"]) for r in rows}
    q = book[0]

    codes = {r["vec_id"]: r for r in pq_encode(spark, SF_SMALL).collect()}
    adc = pq_adc_topk(spark, SF_SMALL).collect()
    assert len(adc) == 10
    for r in adc:
        c = codes[r["vec_id"]]
        recon = []
        for m in range(_M):
            seed = book[c[f"code_{m}"]]
            recon.extend(seed[m * _SUB : (m + 1) * _SUB])
        exact = sum((a - b) * (a - b) for a, b in zip(q, recon))
        assert abs(r["adc_dist"] - exact) < 1e-9


def test_adc_recall_beats_random(spark):
    """Recall sanity: with untrained seed codebooks (K=8, M=4) measured
    recall@10 is ~0.1-0.3 — far above the random-draw baseline
    (10/N ≈ 2-10%) though far below a trained PQ; the operator contract
    here is the index plumbing, codebook quality scales with K and
    Lloyd rounds exactly as in ops/similarity.lloyd_refine."""
    from osmart_etl_spark.io.sources import read_table
    from osmart_etl_spark.queries.quantization import _l2sq, pq_adc_topk

    emb = read_table(spark, SF_SMALL, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    q = emb.filter(F.col("vec_id") == 0).select(vec.alias("qv")).collect()[0]["qv"]
    exact_ids = {
        r["vec_id"]
        for r in emb.select(
            "vec_id", _l2sq(vec, F.lit(list(q)).cast("array<double>")).alias("d")
        )
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    }
    adc_ids = {r["vec_id"] for r in pq_adc_topk(spark, SF_SMALL).collect()}
    assert len(exact_ids & adc_ids) >= 1  # query vector itself at minimum


def test_int8_quantize_bounds_and_error(spark):
    """codes bounded by |127|, reconstruction error per dim bounded by
    one quantization step squared: (s_d/127)^2."""
    from osmart_etl_spark.queries.base import REGISTRY
    import pyspark.sql.functions as F

    out = REGISTRY["embedding_int8_quantize"].fn(
        spark, "/root/testdata/sf0.001"
    )
    bad = out.filter(
        F.exists("codes", lambda c: (c > 127) | (c < -127))
        | (F.col("recon_err_sq") < 0)
    ).count()
    assert bad == 0
    # max per-vector error <= 64 dims * (max_scale/127)^2
    row = out.agg(F.max("recon_err_sq").alias("m")).collect()[0]
    assert row["m"] < 64 * (2.0 / 127.0) ** 2 * 10  # loose sanity bound


def test_jl_projection_distortion_bounds(spark):
    """Deterministic seed + data => exact distortion stats; the audit
    must report >=85% of pairs within [0.5, 2] per probe at k=16 (the
    measured floor is 91), and ratios must be strictly positive."""
    from osmart_etl_spark.queries.base import REGISTRY
    from tests.conftest import SF_SMALL

    rows = REGISTRY["jl_projection_audit"].fn(spark, SF_SMALL).collect()
    assert len(rows) == 8
    for r in rows:
        assert r.n_pairs == 100
        assert 0 < r.min_ratio < 1 < r.max_ratio
        assert r.n_within_2x >= 85
