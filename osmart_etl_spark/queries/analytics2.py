"""Second analytics tranche: incremental join-view maintenance (the
delta-rule the streaming/IVM literature is built on), a two-sample
Kolmogorov-Smirnov drift test, a Benford first-digit audit, and a
seasonal-naive forecast backtest.

Extension surface beyond the reference; the join-IVM query extends the
reference's watermark-incremental philosophy (etl_sales incremental
extract, etl_inventory update cycle) from single-table appends to JOIN
views — the piece a full-refresh pandas pipeline can never do without
re-reading both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from osmart_etl_spark.io.sources import read_table
from osmart_etl_spark.queries.base import dbl, dec, query

# --------------------------------------------------------------------------
# Incremental JOIN view maintenance (delta rules)
# --------------------------------------------------------------------------


@query(
    "join_view_incremental",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, l.l_linenumber,
      CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS net_price,
      (o.o_orderkey % 10 >= 8 OR l.l_linenumber % 7 = 0) AS from_delta
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    """,
    tags=("scale-tech", "ivm"),
)
def join_view_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view under inserts on BOTH
    sides — the classic delta rule Δ(A⋈B) = ΔA⋈B ∪ A_old⋈ΔB (with
    ΔA⋈ΔB folded into the first term by joining ΔA against the FULL
    B): the orders/lineitem join view is maintained from a base
    snapshot (deterministic ~80/86% of each table) plus the two delta
    batches, and the result must equal the full recompute — which is
    exactly what the oracle computes, so parity IS the IVM correctness
    proof (the reference's pipelines full-refresh this join every run;
    cf. etl_sales/transform.py).

    Why it matters at 100 TB: the full join reshuffles both entire
    tables every refresh; the delta form shuffles |ΔA| + |ΔB| + the
    matching slices of the base (and with both bases BUCKETED on the
    join key, zero base shuffle at all — the deltas hash-route to
    co-located buckets). Refresh cost tracks batch size, not corpus
    size. The three terms here are one union DAG: Catalyst pushes the
    base/delta partition predicates into both scans (same physical
    pattern as P6's watermark filters).
    """
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    o_delta = F.col("o_orderkey") % 10 >= 8
    l_delta = F.col("l_linenumber") % 7 == 0

    o_base, o_new = orders.filter(~o_delta), orders.filter(o_delta)
    l_base, l_new = li.filter(~l_delta), li.filter(l_delta)

    net = dbl(
        dec(F.col("l_extendedprice")) * (F.lit(1) - dec(F.col("l_discount")))
    ).alias("net_price")

    def proj(j: DataFrame, tag) -> DataFrame:
        return j.select(
            "o_orderkey", "o_custkey", "l_linenumber", net, tag.alias("from_delta")
        )

    base = proj(
        o_base.join(l_base, o_base["o_orderkey"] == li["l_orderkey"]), F.lit(False)
    )
    # ΔO ⋈ L_full picks up ΔO⋈L_base, ΔO⋈ΔL in one term …
    d1 = proj(o_new.join(li, o_new["o_orderkey"] == li["l_orderkey"]), F.lit(True))
    # … so the ΔL term joins only against the OLD orders side.
    d2 = proj(
        o_base.join(l_new, o_base["o_orderkey"] == l_new["l_orderkey"]), F.lit(True)
    )
    return base.unionAll(d1).unionAll(d2)


# --------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov test (exact, engine-portable)
# --------------------------------------------------------------------------


@query(
    "ks_two_sample",
    oracle="""
    WITH tagged AS (
      SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v,
        CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END AS arm
      FROM events
    ),
    counts AS (
      SELECT event_type, v,
        CAST(COUNT(*) FILTER (WHERE arm = 0) AS BIGINT) AS c0,
        CAST(COUNT(*) FILTER (WHERE arm = 1) AS BIGINT) AS c1
      FROM tagged GROUP BY event_type, v
    ),
    cum AS (
      SELECT event_type, v,
        SUM(c0) OVER (PARTITION BY event_type ORDER BY v) AS k0,
        SUM(c1) OVER (PARTITION BY event_type ORDER BY v) AS k1,
        SUM(c0) OVER (PARTITION BY event_type) AS n0,
        SUM(c1) OVER (PARTITION BY event_type) AS n1
      FROM counts
    )
    SELECT event_type,
      CAST(MAX(n0) AS BIGINT) AS n_a,
      CAST(MAX(n1) AS BIGINT) AS n_b,
      MAX(abs((CAST(k0 AS DOUBLE) / CAST(n0 AS DOUBLE))
            - (CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE)))) AS ks_stat
    FROM cum GROUP BY event_type
    """,
    tags=("scale-tech", "statistics"),
)
def ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic per event type
    (arms by user-id parity, as ab_test_ztest) — the distribution-drift
    test that catches shape changes a mean/variance z-test misses.

    Portable-exact construction: group values FIRST (the support is
    decimal — no float keys), cumulative counts via one per-group
    window over the distinct support, and the sup-distance is a MAX of
    |k0/n0 − k1/n1| — each term one exact-integer division in double,
    so both engines agree to the bit. Spark's mllib KS test is
    one-sample-only and collects; this is pure DataFrame.

    Scale: the window runs over DISTINCT values per group (bounded
    support), not rows; everything before it is one map-side-combined
    count aggregate. For unbounded support at 100 TB the same plan
    works over quantile-bucketed values (percentile_approx edges) with
    the documented resolution loss.
    """
    ev = read_table(spark, sf_dir, "events")
    tagged = ev.select(
        "event_type",
        dec(F.col("value")).alias("v"),
        (F.col("user_id") % 2).alias("arm"),
    )
    counts = tagged.groupBy("event_type", "v").agg(
        F.count(F.when(F.col("arm") == 0, 1)).alias("c0"),
        F.count(F.when(F.col("arm") == 1, 1)).alias("c1"),
    )
    wcum = Window.partitionBy("event_type").orderBy("v")
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
        F.max("n0").cast("bigint").alias("n_a"),
        F.max("n1").cast("bigint").alias("n_b"),
        F.max(dist).alias("ks_stat"),
    )


# --------------------------------------------------------------------------
# Benford first-digit audit
# --------------------------------------------------------------------------


@query(
    "benford_digit_audit",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1)
                  AS BIGINT) AS d
      FROM orders WHERE o_totalprice >= 1
    ),
    obs AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY d
    ),
    tot AS (SELECT SUM(n) AS t FROM obs)
    SELECT d, n,
      CAST(n AS DOUBLE) / CAST(t AS DOUBLE) AS observed_p,
      log10(1.0 + (1.0 / CAST(d AS DOUBLE))) AS benford_p
    FROM obs, tot
    """,
    tags=("scale-tech", "dq-audit"),
)
def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the fraud /
    synthetic-data smell test auditors run on money columns. One
    map-side-combined 9-group aggregate at any scale; observed
    frequency is an exact-integer division, expected is
    log10(1 + 1/d) — both engines' log10 agree bitwise on these nine
    rational inputs (spot-pinned by the oracle hash itself: a drifting
    libm would fail parity). The first digit is taken from the DECIMAL
    string rendering, not float formatting, so '9999.99' digits don't
    wobble between engines; values < 1 are excluded (leading digit of
    the fraction is a different law).
    """
    orders = read_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digits = orders.select(
        F.substring(dec(F.col("o_totalprice")).cast("string"), 1, 1)
        .cast("bigint")
        .alias("d")
    )
    obs = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = obs.groupBy().agg(F.sum("n").alias("__t"))
    return obs.join(F.broadcast(tot)).select(
        "d",
        "n",
        (F.col("n").cast("double") / F.col("__t").cast("double")).alias("observed_p"),
        F.log10(F.lit(1.0) + (F.lit(1.0) / F.col("d").cast("double"))).alias(
            "benford_p"
        ),
    )


# --------------------------------------------------------------------------
# Seasonal-naive forecast backtest
# --------------------------------------------------------------------------


@query(
    "seasonal_naive_backtest",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
        SUM(CAST(value AS DECIMAL(18,2))) AS net
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    joined AS (
      SELECT a.day, CAST(a.net AS DOUBLE) AS actual,
        CAST(f.net AS DOUBLE) AS forecast
      FROM daily a JOIN daily f ON f.day = a.day - INTERVAL 7 DAY
    )
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_days,
      CAST(SUM(CAST(abs(actual - forecast) AS DECIMAL(18,2))) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE) AS mae,
      CAST(SUM(CAST(abs(actual - forecast) AS DECIMAL(18,2))) AS DOUBLE)
        / CAST(SUM(CAST(abs(actual) AS DECIMAL(18,2))) AS DOUBLE) AS wape
    FROM joined
    """,
    tags=("scale-tech", "timeseries"),
)
def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backtest of the seasonal-naive forecast (ŷ_t = y_{t−7d}) on the
    daily net series: MAE and WAPE over every day with a
    week-ago observation. The baseline every forecasting system must
    publish before anything fancier — and at scale the whole backtest
    is two tiny stages: one daily aggregate (map-side combined), one
    self-join on a date key shifted by 7 days (broadcastable — the
    daily table is |days| rows regardless of event volume).

    Float discipline: daily nets are exact decimal sums; |a−f| is a
    deterministic double op re-cast to decimal before the error SUM
    (both engines add the same 2-decimal values in any order —
    associativity restored by exactness); each final ratio is one
    double division. LAG-based alternatives need a gap-free calendar;
    the date-shift join is gap-correct by construction.
    """
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(dec(F.col("value"))).alias("net")
    )
    a = daily.alias("a")
    f = daily.alias("f")
    joined = a.join(
        f, F.col("f.day") == F.date_sub(F.col("a.day"), 7)
    ).select(
        dbl(F.col("a.net")).alias("actual"), dbl(F.col("f.net")).alias("forecast")
    )
    abs_err = dec(F.abs(F.col("actual") - F.col("forecast")))
    return joined.groupBy().agg(
        F.count(F.lit(1)).alias("n_days"),
        (dbl(F.sum(abs_err)) / F.count(F.lit(1)).cast("double")).alias("mae"),
        (dbl(F.sum(abs_err)) / dbl(F.sum(dec(F.abs(F.col("actual")))))).alias(
            "wape"
        ),
    )
