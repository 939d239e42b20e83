"""Sketch-accuracy auditing: is the MinHash estimate actually within
its statistical error bound of the exact Jaccard it approximates?

Same verifiable-contract pattern as ``approx_sketches``: the sketch
estimate and the exact value are both emitted (bit-deterministic on
both engines — the universal-hash family is md5-seeded integer
arithmetic, the exact side is set intersection), plus a per-pair
boolean asserting |est − exact| ≤ max(3σ, one signature step), where
σ = sqrt(J(1−J)/K) for K=16 components. A drifting estimator becomes a
value-hash mismatch, not silence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osmart_etl_spark.io.sources import read_table
from osmart_etl_spark.queries.base import query
from osmart_etl_spark.queries.text import _SHINGLES_SQL

_K = 16  # minhash components


@query(
    "minhash_estimate_quality",
    oracle=f"""
    WITH shingles AS ({_SHINGLES_SQL}),
    hashed AS (
      SELECT doc_id, ('0x' || substr(md5(shingle), 1, 7))::BIGINT AS h FROM shingles
    ),
    sigs AS (
      SELECT doc_id, k,
        MIN((h * (2*k + 1 + 104729*k) + (12289*k + 31)) % 1000000007) AS minhash
      FROM hashed
      CROSS JOIN (SELECT UNNEST(generate_series(0, {_K - 1})) AS k) seeds
      GROUP BY doc_id, k
    ),
    bands AS (
      SELECT doc_id, CAST(k // 4 AS INT) AS band,
             string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY k) AS band_key
      FROM sigs GROUP BY doc_id, CAST(k // 4 AS INT)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    est AS (
      SELECT c.id_a, c.id_b,
             SUM(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END) AS n_match
      FROM cand c
      JOIN sigs sa ON sa.doc_id = c.id_a
      JOIN sigs sb ON sb.doc_id = c.id_b AND sb.k = sa.k
      GROUP BY c.id_a, c.id_b
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
      FROM cand c
      JOIN shingles sa ON sa.doc_id = c.id_a
      JOIN shingles sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
      GROUP BY c.id_a, c.id_b
    ),
    joined AS (
      SELECT e.id_a, e.id_b,
             CAST(e.n_match AS DOUBLE) / {_K} AS est_jaccard,
             CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
               / CAST(na.n + nb.n - COALESCE(i.n_inter, 0) AS DOUBLE) AS exact_jaccard
      FROM est e
      -- LEFT: an LSH band collision without a single shared shingle is
      -- improbable (28-bit collisions) but possible; Spark computes
      -- size(array_intersect)=0 for such a pair, so the oracle must
      -- keep it too instead of dropping it through an inner join
      LEFT JOIN inter i ON i.id_a = e.id_a AND i.id_b = e.id_b
      JOIN sizes na ON na.doc_id = e.id_a
      JOIN sizes nb ON nb.doc_id = e.id_b
    )
    SELECT id_a, id_b, est_jaccard, exact_jaccard,
      (abs(est_jaccard - exact_jaccard)
       <= greatest(3 * sqrt(exact_jaccard * (1 - exact_jaccard) / {_K}),
                   1.0 / {_K})) AS within_3sigma
    FROM joined
    """,
    tags=("ext-dedup", "sketch-quality"),
)
def minhash_estimate_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every LSH candidate pair: the MinHash similarity estimate
    (matching components / K), the exact shingle-set Jaccard, and a
    calibration verdict |est − exact| ≤ max(3σ, 1/K). This is the audit
    a production dedup pipeline runs on a sample before trusting the
    sketch threshold corpus-wide — here the candidate set IS the
    sample, so the audit rides the index it audits.

    Measured finding (sf0.01): only 490/570 candidate pairs sit within
    the unconditional 3σ band — NOT an estimator bug but LSH selection
    bias made visible: a pair becomes a candidate precisely when some
    band of its sketch collided, so conditioned on candidacy the
    estimate is biased upward, most strongly for low-similarity pairs.
    Quantifying that bias (and thus how much exact-verify headroom the
    threshold needs) is exactly what this audit is for; the verdicts
    are deterministic data on both engines either way.

    Scale shape: signatures are the zero-extra-shuffle wide K-vector
    (one partial-aggregated groupBy), pairs broadcast into both the
    component-match join and the array-intersect exact side — cost is
    |candidates|-proportional, never corpus².
    """
    from osmart_etl_spark.ops.dedup import (
        candidate_pairs,
        lsh_band_keys,
        minhash_signatures,
        shingle_sets,
    )

    d = read_table(spark, sf_dir, "documents")
    sets = shingle_sets(d, "doc_id", "text", k=5).persist()
    # Fill the cache ONCE in parallel before the plan fans out (the
    # setsim_exact_join pattern, SCALE.md round 5): the est/exact/cand
    # subtrees otherwise serialize behind cold-cache write locks.
    sets.count()
    shingle_rows = sets.select("doc_id", F.explode("__sh").alias("shingle"))
    # ONE K-minhash build feeds BOTH the LSH band keys (-> candidates)
    # and the component-match estimate; before round 6 the band-key path
    # re-derived the same md5 + universal-hash aggregate from scratch,
    # and the unpersisted sigs frame was recomputed for each side of
    # the est self-join (measured: the two duplicated hash passes were
    # the query's dominant cost, 5.8 s -> ~2 s at sf0.1).
    sigs = minhash_signatures(shingle_rows, "doc_id", num_hashes=_K).persist()
    sigs.count()
    bands = lsh_band_keys(sigs, "doc_id", rows_per_band=4)
    cand = candidate_pairs(bands, "doc_id").persist()
    est = (
        sigs.select(F.col("doc_id").alias("id_a"), "k", F.col("minhash").alias("ma"))
        .join(F.broadcast(cand), "id_a")
        .join(
            sigs.select(
                F.col("doc_id").alias("id_b"), "k", F.col("minhash").alias("mb")
            ),
            ["id_b", "k"],
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(F.when(F.col("ma") == F.col("mb"), 1).otherwise(0)).alias(
                "n_match"
            )
        )
    )
    a = sets.select(F.col("doc_id").alias("id_a"), F.col("__sh").alias("sh_a"))
    b = sets.select(F.col("doc_id").alias("id_b"), F.col("__sh").alias("sh_b"))
    # NOT semi-filtering b to candidate ids first: measured 3.2 -> 3.8 s
    # at sf0.1 — the extra broadcast barrier costs more than shuffling
    # the non-candidate arrays at this corpus size (same finding as
    # jaccard_verify_hybrid's pre-prune crossover in ops/dedup.py).
    exact = (
        a.join(F.broadcast(cand), "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("bigint").alias("n_inter"),
            F.size("sh_a").cast("bigint").alias("n_a"),
            F.size("sh_b").cast("bigint").alias("n_b"),
        )
    )
    est_j = F.col("n_match").cast("double") / _K
    exact_j = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    ).cast("double")
    return (
        est.join(exact, ["id_a", "id_b"])
        .select(
            "id_a",
            "id_b",
            est_j.alias("est_jaccard"),
            exact_j.alias("exact_jaccard"),
            (
                F.abs(est_j - exact_j)
                <= F.greatest(
                    F.lit(3) * F.sqrt(exact_j * (F.lit(1) - exact_j) / _K),
                    F.lit(1.0 / _K),
                )
            ).alias("within_3sigma"),
        )
    )
