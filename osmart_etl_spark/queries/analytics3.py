"""Third analytics tranche: pairwise correlation matrix in one pass,
exact weighted percentiles, and event-path n-gram mining.

All engine-portable by the queries/base.py float discipline: exact
integer/decimal reductions, fixed-order double formulas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from osmart_etl_spark.io.sources import read_table
from osmart_etl_spark.queries.base import dbl, dec, query

# --------------------------------------------------------------------------
# One-pass pairwise correlation matrix
# --------------------------------------------------------------------------

_CM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _cm_oracle() -> str:
    sums = []
    for c in _CM_COLS:
        sums.append(f"SUM(CAST({c} AS DECIMAL(18,2))) AS s_{c}")
        for d in _CM_COLS:
            if d >= c:
                sums.append(
                    f"SUM(CAST({c} AS DECIMAL(18,2)) * CAST({d} AS DECIMAL(18,2)))"
                    f" AS q_{c}_{d}"
                )
    parts = []
    for c in _CM_COLS:
        for d in _CM_COLS:
            if d > c:
                parts.append(f"""
    SELECT '{c}' AS col_a, '{d}' AS col_b,
      ((n * CAST(q_{c}_{d} AS DOUBLE)) - (CAST(s_{c} AS DOUBLE) * CAST(s_{d} AS DOUBLE)))
        / (sqrt((n * CAST(q_{c}_{c} AS DOUBLE)) - (CAST(s_{c} AS DOUBLE) * CAST(s_{c} AS DOUBLE)))
           * sqrt((n * CAST(q_{d}_{d} AS DOUBLE)) - (CAST(s_{d} AS DOUBLE) * CAST(s_{d} AS DOUBLE))))
        AS corr
    FROM m""")
    union = "\n    UNION ALL\n".join(parts)
    return f"""
    WITH m AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n, {", ".join(sums)}
      FROM lineitem
    )
    {union}
    """


@query("correlation_matrix", oracle=_cm_oracle(), tags=("ext-stats", "corr-matrix"))
def correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pairwise Pearson matrix over the four lineitem measures in
    ONE aggregate pass: all 4 sums + 10 distinct cross-products reduce
    exactly (decimal — associative, partition-order-free), then each of
    the 6 upper-triangle correlations is one fixed-order double formula
    over the same scalar row. The profiling primitive data catalogs
    run on every numeric table — and the shape matters at 100 TB
    because k columns need ONE scan and k(k+1)/2 exact products, not
    k(k-1)/2 separate corr() jobs with order-dependent double sums
    (cf. correlation_exact for the single-pair discipline)."""
    li = read_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for c in _CM_COLS:
        aggs.append(F.sum(dec(F.col(c))).alias(f"s_{c}"))
        for d in _CM_COLS:
            if d >= c:
                aggs.append(F.sum(dec(F.col(c)) * dec(F.col(d))).alias(f"q_{c}_{d}"))
    m = li.groupBy().agg(*aggs)

    outs = []
    for c in _CM_COLS:
        for d in _CM_COLS:
            if d > c:
                n = F.col("n")
                sc, sd = dbl(F.col(f"s_{c}")), dbl(F.col(f"s_{d}"))
                qcd = dbl(F.col(f"q_{c}_{d}"))
                qcc, qdd = dbl(F.col(f"q_{c}_{c}")), dbl(F.col(f"q_{d}_{d}"))
                corr = ((n * qcd) - (sc * sd)) / (
                    F.sqrt((n * qcc) - (sc * sc)) * F.sqrt((n * qdd) - (sd * sd))
                )
                outs.append(
                    m.select(
                        F.lit(c).alias("col_a"),
                        F.lit(d).alias("col_b"),
                        corr.alias("corr"),
                    )
                )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


# --------------------------------------------------------------------------
# Exact weighted percentile (cumulative-weight rank)
# --------------------------------------------------------------------------


@query(
    "weighted_median_price",
    oracle="""
    WITH w AS (
      SELECT l_returnflag, CAST(l_extendedprice AS DECIMAL(18,2)) AS v,
        CAST(l_quantity AS BIGINT) AS wt
      FROM lineitem
    ),
    cum AS (
      SELECT l_returnflag, v, wt,
        SUM(wt) OVER (PARTITION BY l_returnflag
                      ORDER BY v ROWS UNBOUNDED PRECEDING) AS cw,
        SUM(wt) OVER (PARTITION BY l_returnflag) AS tw
      FROM w
    )
    SELECT l_returnflag,
      CAST(MIN(v) AS DOUBLE) AS weighted_median,
      CAST(MAX(tw) AS BIGINT) AS total_weight
    FROM cum
    WHERE cw * 2 >= tw
    GROUP BY l_returnflag
    """,
    tags=("ext-stats", "weighted-percentile"),
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per return flag: the smallest
    value whose cumulative weight reaches half the total — the
    inventory-weighted center a plain median misses entirely.

    Exactness without interpolation: weights are bigint, values
    decimal; the window is a per-group cumulative SUM ordered by value
    (ROWS frame — ties accumulate row-by-row, and since we take MIN(v)
    over the `cw·2 ≥ tw` region, tie order inside equal values cannot
    change the answer); the selection predicate is pure integer
    arithmetic. percentile_cont's weighted form does not exist in
    either engine, and float interpolation would not hash-match anyway.

    Scale: one shuffle (by group), per-group windows parallel; at
    100 TB pre-aggregate equal (group, value) rows first — weight sums
    per distinct value — then the window runs over distinct support
    like ks_two_sample."""
    li = read_table(spark, sf_dir, "lineitem")
    w = li.select(
        "l_returnflag",
        dec(F.col("l_extendedprice")).alias("v"),
        F.col("l_quantity").cast("bigint").alias("wt"),
    )
    wc = (
        Window.partitionBy("l_returnflag")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("l_returnflag")
    cum = w.select(
        "l_returnflag",
        "v",
        F.sum("wt").over(wc).alias("cw"),
        F.sum("wt").over(wall).alias("tw"),
    )
    return (
        cum.filter(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            dbl(F.min("v")).alias("weighted_median"),
            F.max("tw").cast("bigint").alias("total_weight"),
        )
    )


# --------------------------------------------------------------------------
# Event-path n-gram mining
# --------------------------------------------------------------------------

_PATH_TOPK = 10


@query(
    "event_path_trigrams",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
        LEAD(event_type, 1) OVER w AS nxt1,
        LEAD(event_type, 2) OVER w AS nxt2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    tri AS (
      SELECT event_type || '>' || nxt1 || '>' || nxt2 AS path,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM seq WHERE nxt2 IS NOT NULL
      GROUP BY event_type || '>' || nxt1 || '>' || nxt2
    )
    SELECT path, n, n_users, rank FROM (
      SELECT path, n, n_users,
        CAST(ROW_NUMBER() OVER (ORDER BY n DESC, path ASC) AS BIGINT) AS rank
      FROM tri
    ) WHERE rank <= {_PATH_TOPK}
    """,
    tags=("ext-behavior", "path-mining"),
)
def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common 3-step behavior paths (event-type trigrams along
    each user's timeline) with user reach — the product-analytics
    primitive behind 'what do people do next'. LEAD over the per-user
    window emits each trigram at its start row (one window, no
    per-user collect_list materialization — a user with 10⁶ events
    contributes rows, never an array); counts are one map-side-combined
    aggregate; the final top-10 ranks a COUNT-sized table (|distinct
    paths| ≤ |event types|³ = 125 here), so the global window is
    metadata-sized, not data-sized."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("nxt1"),
        F.lead("event_type", 2).over(w).alias("nxt2"),
    ).filter(F.col("nxt2").isNotNull())
    tri = seq.groupBy(
        F.concat_ws(">", "event_type", "nxt1", "nxt2").alias("path")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
    )
    wr = Window.orderBy(F.col("n").desc(), F.col("path").asc())
    return (
        tri.withColumn("rank", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rank") <= _PATH_TOPK)
        .select("path", "n", "n_users", "rank")
    )
