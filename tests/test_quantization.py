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
