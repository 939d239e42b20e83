"""Iterative clustering over the ``embeddings`` table: Lloyd's k-means
with a fixed, deterministic iteration count — the canonical iterative
algorithm a training-data pipeline runs to build coarse quantizers
(IVF cell assignment, SemDedup cluster blocking) over corpus
embeddings. Reference parity note: the reference has no clustering —
this is BASELINE.json extension surface (like queries/similarity.py),
kept oracle-exact anyway.

Bit-exactness across engines (the driver hash-compares values):

- Squared-L2 distances are strict left folds over double-cast arrays
  (Spark ``F.aggregate``/``F.zip_with`` <-> DuckDB ``list_reduce``/
  ``list_zip``), same evaluation order, so distances match bit-exactly.
- The argmin is a lexicographic struct-min ``(d, cid)`` — ties (exact
  double ties, identical in both engines) break to the lowest cluster
  id on both sides.
- Centroid means are the ONE order-sensitive reduction, so each
  element is quantized to DECIMAL(27,10) before SUM (exact,
  associative, shuffle-order-independent — the lm_filter precedent),
  and the mean is CAST(sum AS DOUBLE)/COUNT: a single division of
  identical operands. Inertia is the same decimal-pre-sum trick over
  per-point distances.

Scale design (100 TB corpus, K in the thousands):

- Assignment is ZERO-shuffle: the K centroids collapse into one
  array-of-structs row, broadcast, and each vector takes an
  ``array_min`` over the K ``(d, cid)`` structs row-side — whole-stage
  codegen, no per-row Python UDF, no join. O(n*K*dim) map work spread
  over every core; nothing materializes pairs.
- The update step is ONE map-side-combinable agg per iteration:
  posexplode to (cid, pos, elem-decimal) then partial-SUM before the
  shuffle, so shuffle volume is K*dim rows regardless of n.
- Empty clusters simply drop out of the next centroid table (a
  relational no-row, identical in both engines) — the standard
  "drop dead centroids" policy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from osmart_etl_spark.io.sources import read_table
from osmart_etl_spark.ops.similarity import as_double_array
from osmart_etl_spark.queries.base import query

_K = 8
_T = 3  # assignment rounds; centroids update between consecutive rounds


def _sqdist(a: Column, b: Column) -> Column:
    """Strict left-fold squared L2 — bit-identical to the oracle's
    ``list_reduce(list_prepend(0.0, ...))``."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _kmeans_oracle(k: int, t_rounds: int) -> str:
    """Unrolled Lloyd iteration as a DuckDB WITH-chain (exact twin of
    the Spark loop below: same init, same fold, same tie-break, same
    decimal-quantized means)."""

    def dist(a: str, b: str) -> str:
        return (
            f"list_reduce(list_prepend(0.0, list_transform(list_zip({a}, {b}),"
            f" p -> (p[1]-p[2])*(p[1]-p[2]))), (acc, x) -> acc + x)"
        )

    parts = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        f"cent0 AS (SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < {k})",
    ]
    for t in range(1, t_rounds + 1):
        parts.append(
            f"""asg{t} AS (
      SELECT vec_id, v, cid, d FROM (
        SELECT e.vec_id, e.v, c.cid, {dist('e.v', 'c.c')} AS d,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {dist('e.v', 'c.c')} ASC, c.cid ASC) AS rn
        FROM e CROSS JOIN cent{t - 1} c) WHERE rn = 1)"""
        )
        if t < t_rounds:
            parts.append(
                f"""cent{t} AS (
      SELECT cid, list(elem ORDER BY pos) AS c FROM (
        SELECT cid, pos, CAST(SUM(q) AS DOUBLE) / COUNT(*) AS elem FROM (
          SELECT cid, generate_subscripts(v, 1) AS pos,
                 CAST(unnest(v) AS DECIMAL(27,10)) AS q
          FROM asg{t})
        GROUP BY cid, pos)
      GROUP BY cid)"""
            )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
    SELECT cid AS cluster_id, COUNT(*) AS n_members,
           CAST(SUM(CAST(d AS DECIMAL(27,10))) AS DOUBLE) AS inertia
    FROM asg{t_rounds} GROUP BY cid ORDER BY cid"""
    )


def _assign(emb: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment with zero shuffle: centroids fold to
    one broadcast array-of-structs row; argmin is a row-side
    ``array_min`` over (d, cid) structs (lexicographic — d first, cid
    tie-break, matching the oracle's ORDER BY d, cid)."""
    cent_row = cent.agg(F.collect_list(F.struct("cid", "c")).alias("cents"))
    scored = emb.crossJoin(F.broadcast(cent_row))
    best = F.array_min(
        F.transform(
            F.col("cents"),
            lambda s: F.struct(
                _sqdist(F.col("v"), s.getField("c")).alias("d"),
                s.getField("cid").alias("cid"),
            ),
        )
    )
    return scored.select(
        "vec_id",
        "v",
        best.getField("cid").alias("cid"),
        best.getField("d").alias("d"),
    )


def _update(asg: DataFrame) -> DataFrame:
    """New centroids: decimal-pre-summed elementwise mean. One
    map-side-combinable agg; shuffle rows = K*dim regardless of n."""
    ex = asg.select("cid", F.posexplode("v").alias("pos", "val"))
    elems = ex.groupBy("cid", "pos").agg(
        (
            F.sum(F.col("val").cast("decimal(27,10)")).cast("double")
            / F.count(F.lit(1))
        ).alias("elem")
    )
    return elems.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "elem"))),
            lambda s: s.getField("elem"),
        ).alias("c")
    )


@query(
    "kmeans_lloyd",
    oracle=_kmeans_oracle(_K, _T),
    tags=("ext-clustering", "iterative", "kmeans"),
)
def kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means (K=8), three Lloyd assignment rounds with two centroid
    updates between them, seeded deterministically from the K lowest
    vec_ids. Output: per-cluster member count and decimal-exact
    inertia after the final assignment. See module docstring for the
    bit-exactness and 100 TB design arguments."""
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double_array(F.col("embedding")).alias("v")
    )
    cent = emb.filter(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("c")
    )
    asg = _assign(emb, cent)
    for _ in range(_T - 1):
        cent = _update(asg)
        asg = _assign(emb, cent)
    return (
        asg.groupBy(F.col("cid").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(F.col("d").cast("decimal(27,10)")).cast("double").alias("inertia"),
        )
        .orderBy("cluster_id")
    )
