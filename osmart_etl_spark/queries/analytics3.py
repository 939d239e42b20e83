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

    # All 6 upper-triangle cells from the ONE aggregate row via a single
    # explode (round 13): the former 6-branch unionAll embedded six
    # copies of the global-aggregate subtree — six full lineitem
    # scan+15-sum passes unless runtime exchange reuse rescued them.
    cells = []
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
                cells.append(
                    F.struct(
                        F.lit(c).alias("col_a"),
                        F.lit(d).alias("col_b"),
                        corr.alias("corr"),
                    )
                )
    return m.select(F.explode(F.array(*cells)).alias("__c")).select(
        "__c.col_a", "__c.col_b", "__c.corr"
    )


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


# --------------------------------------------------------------------------
# OLS trend per group (closed-form normal equations)
# --------------------------------------------------------------------------


@query(
    "ols_trend_by_type",
    oracle="""
    WITH pts AS (
      SELECT event_type,
        CAST(EXTRACT(EPOCH FROM ts) AS BIGINT) // 86400 AS x,
        CAST(value AS DECIMAL(18,2)) AS y
      FROM events
    ),
    m AS (
      SELECT event_type,
        CAST(COUNT(*) AS DOUBLE) AS n,
        CAST(SUM(x) AS DOUBLE) AS sx,
        CAST(SUM(y) AS DOUBLE) AS sy,
        CAST(SUM(x * y) AS DOUBLE) AS sxy,
        CAST(SUM(x * x) AS DOUBLE) AS sx2,
        CAST(SUM(y * y) AS DOUBLE) AS sy2
      FROM pts GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
      ((n * sxy) - (sx * sy)) / ((n * sx2) - (sx * sx)) AS slope,
      (sy - (((n * sxy) - (sx * sy)) / ((n * sx2) - (sx * sx))) * sx) / n
        AS intercept,
      (((n * sxy) - (sx * sy)) * ((n * sxy) - (sx * sy)))
        / (((n * sx2) - (sx * sx)) * ((n * sy2) - (sy * sy))) AS r2
    FROM m
    """,
    tags=("ext-stats", "ols"),
)
def ols_trend_by_type(spark, sf_dir):
    """Per-group simple linear regression (value vs day index) in
    CLOSED FORM: slope/intercept/R² from the normal equations over six
    EXACT sums — one map-side-combined aggregate, one fixed-order
    double formula, same discipline as correlation_exact. The
    complement to theil_sen_trend (robust, pairwise): OLS is the
    O(n) single-pass answer when outliers are handled upstream
    (mad_outlier_summary). x = epoch-days as BIGINT (exact), y exact
    decimal; every product stays within exact integer/decimal range, so
    partition order cannot perturb a bit. 10¹² rows cost the same plan."""
    ev = read_table(spark, sf_dir, "events")
    x = (F.unix_timestamp("ts").cast("bigint") / F.lit(86400)).cast("bigint")
    pts = ev.select("event_type", x.alias("x"), dec(F.col("value")).alias("y"))
    m = pts.groupBy("event_type").agg(
        dbl(F.count(F.lit(1))).alias("n"),
        dbl(F.sum("x")).alias("sx"),
        dbl(F.sum("y")).alias("sy"),
        dbl(F.sum(F.col("x") * F.col("y"))).alias("sxy"),
        dbl(F.sum(F.col("x") * F.col("x"))).alias("sx2"),
        dbl(F.sum(F.col("y") * F.col("y"))).alias("sy2"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sx2, sy2 = F.col("sxy"), F.col("sx2"), F.col("sy2")
    num = (n * sxy) - (sx * sy)
    den = (n * sx2) - (sx * sx)
    slope = num / den
    return m.select(
        "event_type",
        n.cast("bigint").alias("n"),
        slope.alias("slope"),
        ((sy - (slope * sx)) / n).alias("intercept"),
        ((num * num) / (den * ((n * sy2) - (sy * sy)))).alias("r2"),
    )


# --------------------------------------------------------------------------
# Business-day latency (closed-form weekend arithmetic, no loops)
# --------------------------------------------------------------------------


@query(
    "business_day_latency",
    oracle="""
    WITH base AS (
      SELECT o.o_orderpriority,
        CAST(o.o_orderdate AS DATE) AS d0, CAST(l.l_shipdate AS DATE) AS d1,
        CAST(EXTRACT(ISODOW FROM CAST(o.o_orderdate AS DATE)) AS BIGINT) AS w0
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate >= o.o_orderdate
    ),
    biz AS (
      SELECT o_orderpriority,
        CAST(d1 - d0 AS BIGINT) AS cal_days,
        -- full weeks contribute 5 business days each; the remainder
        -- adds weekdays it spans from the (Mon=1..Sun=7) start anchor
        ((CAST(d1 - d0 AS BIGINT) // 7) * 5)
          + CAST(d1 - d0 AS BIGINT) % 7
          - CASE WHEN w0 + (CAST(d1 - d0 AS BIGINT) % 7) - 1 >= 6
                  AND w0 <= 5 THEN
                 LEAST(CAST(2 AS BIGINT), w0 + (CAST(d1 - d0 AS BIGINT) % 7) - 1 - 4)
                 WHEN w0 = 6 THEN LEAST(CAST(2 AS BIGINT),
                      CAST(d1 - d0 AS BIGINT) % 7)
                 WHEN w0 = 7 THEN LEAST(CAST(1 AS BIGINT),
                      CAST(d1 - d0 AS BIGINT) % 7)
                 ELSE CAST(0 AS BIGINT) END AS biz_days
      FROM base
    )
    SELECT o_orderpriority,
      CAST(COUNT(*) AS BIGINT) AS n,
      CAST(SUM(cal_days) AS BIGINT) AS total_cal_days,
      CAST(SUM(biz_days) AS BIGINT) AS total_biz_days
    FROM biz GROUP BY o_orderpriority
    """,
    tags=("ext-temporal", "business-days"),
)
def business_day_latency(spark, sf_dir):
    """Order→ship latency in BUSINESS days per priority class, via
    closed-form weekend arithmetic (full weeks × 5 + weekday remainder
    − weekend overlap of the partial week, branching on the ISO start
    weekday) — no calendar scaffold join, no per-day explode: a 10¹²-row
    fact table pays one projection + one aggregate. The same three-case
    CASE is evaluated identically in both engines over exact bigints,
    so the parity hash pins the calendar arithmetic itself (off-by-one
    weekend bugs are the classic failure here). Calendar-day totals
    ride along for the ratio downstream."""
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    j = o.join(li, o["o_orderkey"] == li["l_orderkey"]).filter(
        F.col("l_shipdate") >= F.col("o_orderdate")
    )
    d0 = F.col("o_orderdate").cast("date")
    d1 = F.col("l_shipdate").cast("date")
    cal = F.datediff(d1, d0).cast("bigint")
    # ISO weekday Mon=1..Sun=7 (Spark dayofweek is Sun=1..Sat=7)
    w0 = (((F.dayofweek(d0) + 5) % 7) + 1).cast("bigint")
    rem = cal % 7
    two = F.lit(2).cast("bigint")
    one = F.lit(1).cast("bigint")
    zero = F.lit(0).cast("bigint")
    overlap = (
        F.when((w0 <= 5) & (w0 + rem - 1 >= 6), F.least(two, w0 + rem - 1 - 4))
        .when(w0 == 6, F.least(two, rem))
        .when(w0 == 7, F.least(one, rem))
        .otherwise(zero)
    )
    biz = ((cal / 7).cast("bigint") * 5) + rem - overlap
    return (
        j.select("o_orderpriority", cal.alias("cal_days"), biz.alias("biz_days"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cal_days").cast("bigint").alias("total_cal_days"),
            F.sum("biz_days").cast("bigint").alias("total_biz_days"),
        )
    )


# --------------------------------------------------------------------------
# Bucketed KS — the bounded-support scale variant promised by ks_two_sample
# --------------------------------------------------------------------------

_KSB_WIDTH = 20.0


@query(
    "ks_two_sample_bucketed",
    oracle=f"""
    WITH tagged AS (
      SELECT event_type,
        CAST(floor(CAST(value AS DOUBLE) / {_KSB_WIDTH}) AS BIGINT) AS b,
        CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END AS arm
      FROM events
    ),
    counts AS (
      SELECT event_type, b,
        CAST(COUNT(*) FILTER (WHERE arm = 0) AS BIGINT) AS c0,
        CAST(COUNT(*) FILTER (WHERE arm = 1) AS BIGINT) AS c1
      FROM tagged GROUP BY event_type, b
    ),
    cum AS (
      SELECT event_type, b,
        SUM(c0) OVER (PARTITION BY event_type ORDER BY b) AS k0,
        SUM(c1) OVER (PARTITION BY event_type ORDER BY b) AS k1,
        SUM(c0) OVER (PARTITION BY event_type) AS n0,
        SUM(c1) OVER (PARTITION BY event_type) AS n1
      FROM counts
    )
    SELECT event_type,
      CAST(COUNT(*) AS BIGINT) AS n_buckets,
      MAX(abs((CAST(k0 AS DOUBLE) / CAST(n0 AS DOUBLE))
            - (CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)))) AS ks_lower_bound
    FROM cum GROUP BY event_type
    """,
    tags=("scale-tech", "statistics"),
)
def ks_two_sample_bucketed(spark, sf_dir):
    """The 100 TB form of ks_two_sample: values pre-bucketed to fixed
    ``width=20`` bins, so the per-group CDF window runs over ≤ ~25
    bucket rows REGARDLESS of data volume or support cardinality —
    everything upstream is one map-side-combined count. The statistic
    is the sup-distance evaluated at bucket edges: a guaranteed LOWER
    BOUND of the exact KS (the CDFs are only compared where both are
    fully accumulated), named accordingly. Fixed-width buckets via
    double floor-division keep the bucketing bit-identical
    cross-engine; quantile-derived edges (percentile_approx) would be
    Spark-private state the oracle cannot reproduce — the width is the
    documented resolution/portability trade."""
    ev = read_table(spark, sf_dir, "events")
    tagged = ev.select(
        "event_type",
        F.floor(F.col("value").cast("double") / F.lit(_KSB_WIDTH))
        .cast("bigint")
        .alias("b"),
        (F.col("user_id") % 2).alias("arm"),
    )
    counts = tagged.groupBy("event_type", "b").agg(
        F.count(F.when(F.col("arm") == 0, 1)).alias("c0"),
        F.count(F.when(F.col("arm") == 1, 1)).alias("c1"),
    )
    wcum = Window.partitionBy("event_type").orderBy("b")
    wall = Window.partitionBy("event_type")
    cum = counts.select(
        "event_type",
        F.sum("c0").over(wcum).alias("k0"),
        F.sum("c1").over(wcum).alias("k1"),
        F.sum("c0").over(wall).alias("n0"),
        F.sum("c1").over(wall).alias("n1"),
    )
    dist = F.abs(
        (F.col("k0").cast("double") / F.col("n0").cast("double"))
        - (F.col("k1").cast("double") / F.col("n1").cast("double"))
    )
    return cum.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max(dist).alias("ks_lower_bound"),
    )
