"""ML feature-preparation operators: grouped (filtered) ANN search,
out-of-fold target encoding, and exact-moment feature standardization.

Extension surface: the feature-engineering shapes a training pipeline
runs between the corpus ops (cleaning.py) and the similarity stack
(similarity.py). All follow the float-safety discipline of
queries/base.py — exact decimal/bigint reductions, one fixed-order
double formula at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from osmart_etl_spark.io.sources import read_table
from osmart_etl_spark.queries.base import dbl, dec, query
from osmart_etl_spark.queries.similarity import _cos_sql

# --------------------------------------------------------------------------
# Filtered / grouped ANN: top-k per label in ONE scan
# --------------------------------------------------------------------------

_ANN_K = 3


@query(
    "ann_topk_per_label",
    oracle=f"""
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS q_vec FROM embeddings WHERE vec_id = 0
    ),
    scored AS (
      SELECT label, vec_id,
        {_cos_sql("CAST(embedding AS DOUBLE[])", "q_vec")} AS cos_sim
      FROM embeddings, q WHERE vec_id != 0
    )
    SELECT label, vec_id, cos_sim, rank FROM (
      SELECT label, vec_id, cos_sim,
        CAST(ROW_NUMBER() OVER (
          PARTITION BY label ORDER BY cos_sim DESC, vec_id ASC) AS BIGINT) AS rank
      FROM scored
    ) WHERE rank <= {_ANN_K}
    """,
    tags=("ext-sim", "filtered-ann"),
)
def ann_topk_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search, batched over every filter value: top-3
    nearest neighbors of the query vector WITHIN each label, in one
    corpus scan. The production subtlety this encodes: filtered ANN
    must filter BEFORE ranking — taking the global top-k and then
    filtering returns fewer (or zero) rows for minority labels, a
    well-known vector-store bug class. Grouping by label and ranking
    per group is the pre-filter semantics, vectorized across ALL
    labels at once (a per-label loop would re-scan the corpus
    |labels| times).

    Scale shape: query vector broadcast; one scan; scores in codegen
    (strict left-fold dot product, bit-identical cross-engine); the
    per-label window is a parallel per-key top-k — at 100 TB add the
    two-phase partial top-k of knn_cosine_topk per label (same
    rewrite, keyed)."""
    from osmart_etl_spark.ops.similarity import as_double_array, cosine

    emb = read_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        as_double_array(F.col("embedding")).alias("q_vec")
    )
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "label",
            "vec_id",
            cosine(as_double_array(F.col("embedding")), F.col("q_vec")).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("label").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= _ANN_K)
        .select("label", "vec_id", "cos_sim", "rank")
    )


# --------------------------------------------------------------------------
# Out-of-fold target encoding
# --------------------------------------------------------------------------

_TE_FOLDS = 5


@query(
    "target_encode_oof",
    oracle=f"""
    WITH folds AS (
      SELECT event_type, user_id % {_TE_FOLDS} AS fold,
        CAST(value AS DECIMAL(18,2)) AS v
      FROM events
    ),
    per_fold AS (
      SELECT event_type, fold,
        CAST(COUNT(*) AS BIGINT) AS n_f, SUM(v) AS s_f
      FROM folds GROUP BY event_type, fold
    ),
    per_type AS (
      SELECT event_type, SUM(n_f) AS n_t, SUM(s_f) AS s_t
      FROM per_fold GROUP BY event_type
    )
    SELECT f.event_type, f.fold, f.n_f,
      CAST(t.s_t - f.s_f AS DOUBLE) / CAST(t.n_t - f.n_f AS DOUBLE) AS oof_mean
    FROM per_fold f JOIN per_type t ON t.event_type = f.event_type
    """,
    tags=("ext-mlprep", "target-encoding"),
)
def target_encode_oof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-fold target encoding of the event_type categorical: for
    each (category, fold), the mean target computed from every OTHER
    fold — the leakage-free encoding supervised pipelines need (an
    in-fold mean lets a row see its own label). Folds are the
    deterministic user hash, so encode and re-encode agree across runs
    and engines (cf. stratified_split_assign).

    The subtraction trick makes it ONE aggregate: per-(category, fold)
    exact sums roll up to per-category totals, and each fold's OOF mean
    is (S_total − S_fold)/(N_total − N_fold) — no per-fold re-scan, no
    K passes. At 100 TB: one map-side-combined groupBy over
    (category, fold) — K× smaller than the raw table — then a
    broadcast-sized join. Exact decimal sums; one double division."""
    ev = read_table(spark, sf_dir, "events")
    folds = ev.select(
        "event_type",
        (F.col("user_id") % _TE_FOLDS).alias("fold"),
        dec(F.col("value")).alias("v"),
    )
    per_fold = folds.groupBy("event_type", "fold").agg(
        F.count(F.lit(1)).alias("n_f"), F.sum("v").alias("s_f")
    )
    per_type = per_fold.groupBy("event_type").agg(
        F.sum("n_f").alias("n_t"), F.sum("s_f").alias("s_t")
    )
    return per_fold.join(F.broadcast(per_type), "event_type").select(
        "event_type",
        "fold",
        "n_f",
        (
            dbl(F.col("s_t") - F.col("s_f"))
            / dbl(F.col("n_t") - F.col("n_f"))
        ).alias("oof_mean"),
    )


# --------------------------------------------------------------------------
# Exact-moment standardization with clipping
# --------------------------------------------------------------------------


@query(
    "feature_standardize",
    oracle="""
    WITH m AS (
      SELECT event_type,
        CAST(COUNT(*) AS DOUBLE) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s,
        CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
             AS DOUBLE) AS q
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
      CAST(e.value AS DOUBLE) AS value,
      greatest(CAST(-3 AS DOUBLE), least(CAST(3 AS DOUBLE),
        (CAST(e.value AS DOUBLE) - (m.s / m.n))
          / sqrt((m.q - ((m.s * m.s) / m.n)) / (m.n - 1))
      )) AS z_clipped
    FROM events e JOIN m ON m.event_type = e.event_type
    """,
    tags=("ext-mlprep", "standardize"),
)
def feature_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-category z-score standardization with ±3 clipping — the
    bread-and-butter feature transform, in the two-pass shape that
    scales: pass 1 reduces to exact per-category moments (decimal sums,
    so partition order cannot perturb them), pass 2 is a BROADCAST join
    + pure projection (no shuffle of the fact table; at 100 TB the big
    side streams through map-side). μ and σ come out of the exact sums
    via one fixed-order double formula — sqrt/div are IEEE
    correctly-rounded, so z is bit-identical on every engine. Built-in
    stddev_samp cannot promise that (running double sums). Clip uses
    greatest/least (NaN-free here: σ > 0 for every category by data
    construction)."""
    ev = read_table(spark, sf_dir, "events")
    x = dec(F.col("value"))
    m = ev.groupBy("event_type").agg(
        dbl(F.count(F.lit(1))).alias("__n"),
        dbl(F.sum(x)).alias("__s"),
        dbl(F.sum(x * x)).alias("__q"),
    )
    mu = F.col("__s") / F.col("__n")
    sigma = F.sqrt(
        (F.col("__q") - ((F.col("__s") * F.col("__s")) / F.col("__n")))
        / (F.col("__n") - F.lit(1.0))
    )
    z = (F.col("value").cast("double") - mu) / sigma
    return ev.join(F.broadcast(m), "event_type").select(
        "event_id",
        "event_type",
        F.col("value").cast("double").alias("value"),
        F.greatest(F.lit(-3.0), F.least(F.lit(3.0), z)).alias("z_clipped"),
    )
