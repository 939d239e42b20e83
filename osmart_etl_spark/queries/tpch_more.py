"""Additional TPC-H-shaped relational queries (registered after the
driver's correctness window; the SQL-surface siblings live in
``queries/sql_api.py``).

Q5 exercises the one join shape the existing pair doesn't: a SIX-table
snowflake with a cycle — lineitem must match supplier AND the
supplier's nation must equal the customer's nation — which Catalyst
plans as AQE-sized dimension joins over one fact-fact shuffle pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osmart_etl_spark.io.sources import read_table
from osmart_etl_spark.queries.base import query


#: events-scan size beyond which rfm_segmentation switches from plain
#: NTILE windows to the distributed two-phase ranking (~128 MB: the
#: point where a single-partition |users| sort stops being free)
_RFM_DIST_BYTES = 128 << 20


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        read_table(spark, sf_dir, n).createOrReplaceTempView(n)


@query(
    "tpch_q5_local_supplier",
    oracle="""
    SELECT n.n_name,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
    tags=("SQL", "TPCH-Q5"),
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local-supplier volume: region-filtered snowflake with
    the customer-nation = supplier-nation cycle, revenue per nation.

    Scale shape: region/nation broadcast (constant-size);
    supplier/customer are SF-linear so AQE decides for them
    (broadcast at bench scale, shuffle at 100 TB); only
    orders⋈lineitem shuffles, and the date filter lands in the orders
    scan (PushedFilters) before that shuffle. The decimal-cast SUM
    keeps the revenue bit-identical across engines.
    """
    _views(spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region")
    return spark.sql("""
        SELECT n.n_name,
          CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n.n_name
        ORDER BY revenue DESC, n.n_name
    """)


@query(
    "topk_per_group",
    oracle="""
    SELECT event_type, user_id, total, rnk FROM (
      SELECT event_type, user_id,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
        ROW_NUMBER() OVER (
          PARTITION BY event_type
          ORDER BY SUM(CAST(value AS DECIMAL(18,2))) DESC, user_id ASC
        ) AS rnk
      FROM events
      GROUP BY event_type, user_id
    ) WHERE rnk <= 3
    """,
    tags=("extras-topk",),
)
def topk_per_group(spark, sf_dir):
    """Top-3 users by total value within each event type — the grouped
    counterpart of ``topk_orders``' global TakeOrderedAndProject.

    Scale shape: the aggregate shuffles once on (event_type, user_id)
    with map-side combine; the rank window re-shuffles only the
    aggregated table (|groups| rows, not |events|) on event_type. With
    K event types that second exchange has K hot keys by construction —
    harmless here because its input is already collapsed to one row per
    (type, user); ranking over the RAW events this way would be the
    skew trap. Decimal-cast totals keep rank order (and hence the
    row_number itself) identical across engines; user_id breaks ties.
    """
    from pyspark.sql import Window

    from osmart_etl_spark.queries.base import dbl, dec

    ev = read_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type", "user_id").agg(
        dbl(F.sum(dec(F.col("value")))).alias("total")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("total").desc(), F.col("user_id").asc()
    )
    return (
        agg.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("event_type", "user_id", "total", F.col("rnk").cast("bigint").alias("rnk"))
    )


@query(
    "funnel_conversion",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
        MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
        MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
        MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events
      GROUP BY user_id
    )
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_users,
      CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
      CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
               THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
      CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                     AND t_purchase > t_click
               THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click_purchase
    FROM firsts
    """,
    tags=("extras-funnel",),
)
def funnel_conversion(spark, sf_dir):
    """Ordered funnel (view → click → purchase): a user advances a
    stage only if the NEXT stage's first occurrence is strictly after
    the previous stage's first occurrence — the standard product-
    analytics conversion metric.

    Scale shape: ONE conditional-MIN aggregate per user (map-side
    combined, the events table shuffles once on user_id carrying 3
    timestamps per user), then a single global roll-up row. No window,
    no self-join — the naive N-way self-join formulation of funnels is
    the thing this shape exists to avoid. NULL semantics carry the
    stage logic: `t_click > t_view` is NULL-safe false when either
    stage never happened, identically in both engines."""
    ev = read_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    stage1 = F.col("t_view").isNotNull()
    stage2 = stage1 & (F.col("t_click") > F.col("t_view"))
    stage3 = stage2 & (F.col("t_purchase") > F.col("t_click"))
    as_int = lambda c: F.when(c, 1).otherwise(0)  # noqa: E731
    return firsts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(as_int(stage1)).cast("bigint").alias("n_view"),
        F.sum(as_int(stage2)).cast("bigint").alias("n_view_click"),
        F.sum(as_int(stage3)).cast("bigint").alias("n_view_click_purchase"),
    )


@query(
    "locf_forward_fill",
    oracle="""
    SELECT event_id, user_id,
      last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value
    FROM events
    """,
    tags=("extras-locf",),
)
def locf_forward_fill(spark, sf_dir):
    """Last-observation-carried-forward: every event carries the most
    recent purchase value seen for its user (NULL until the first one)
    — the standard sparse-series densification (sensor readings, price
    marks) done with `last(..., ignorenulls)` over an ordered per-key
    frame; DuckDB's `IGNORE NULLS` window modifier is the exact twin.

    Scale shape: one exchange on user_id + one ordered pass — the same
    single-shuffle profile as the W2 replay; the growing frame is O(1)
    per row because `last` only tracks one value. Tiebreak on event_id
    keeps frame contents (hence results) deterministic."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sparse = F.when(F.col("event_type") == "purchase", F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        F.last(sparse, ignorenulls=True).over(w).alias("last_purchase_value"),
    )


@query(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
      FROM events
    )
    SELECT f.cohort_week,
      (CAST(epoch_us(a.active_week) AS BIGINT)
       - CAST(epoch_us(f.cohort_week) AS BIGINT)) // 604800000000 AS week_offset,
      CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM firsts f JOIN activity a ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
    tags=("extras-cohort",),
)
def cohort_retention(spark, sf_dir):
    """Weekly cohort retention: users bucketed by first-seen week, then
    distinct-active counts per (cohort, week offset) — the classic
    retention triangle.

    Scale shape: two aggregates over the same user_id exchange (first-
    seen MIN, then the distinct activity pairs) and one join that reuses
    that partitioning; the final count-distinct re-aggregates the small
    (cohort, offset, user) table. Week offsets computed in exact
    integer microseconds (unix_micros ↔ epoch_us, the engine-type
    lesson from the session_windows fix) — under the UTC session every
    truncated week is an exact multiple of 604,800,000,000 µs apart,
    so the integer division is drift-free on both engines."""
    ev = read_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    joined = firsts.join(activity, "user_id").select(
        "user_id",
        "cohort_week",
        F.expr(
            "(unix_micros(active_week) - unix_micros(cohort_week))"
            " div 604800000000"
        ).alias("week_offset"),
    )
    return joined.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_active")
    )


@query(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT event_type,
        LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS next_type
      FROM events
    )
    SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
    tags=("extras-markov",),
)
def event_transition_matrix(spark, sf_dir):
    """First-order behavior transitions: for each user's time-ordered
    stream, count (event_type → next event_type) pairs — the input to
    Markov funnel models and next-action predictors.

    Scale shape: one user_id exchange for the LEAD window (tiebroken on
    event_id for determinism), then the count re-aggregates the |types|²
    pair space — at most 25 rows here, bounded by the type vocabulary
    regardless of corpus size, so the second shuffle is trivially small
    and the first is the same single exchange every per-user ordered
    pass in this engine shares."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    return (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


@query(
    "rfm_segmentation",
    oracle="""
    WITH base AS (
      SELECT user_id,
        MAX(ts) AS last_ts,
        CAST(COUNT(*) AS BIGINT) AS freq,
        CAST(SUM(CASE WHEN event_type = 'purchase'
                 THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END)
             AS DOUBLE) AS monetary
      FROM events GROUP BY user_id
    )
    SELECT user_id,
      CAST(NTILE(4) OVER (ORDER BY last_ts DESC, user_id ASC) AS BIGINT) AS r_q,
      CAST(NTILE(4) OVER (ORDER BY freq DESC, user_id ASC) AS BIGINT) AS f_q,
      CAST(NTILE(4) OVER (ORDER BY monetary DESC, user_id ASC) AS BIGINT) AS m_q
    FROM base
    """,
    tags=("extras-rfm",),
)
def rfm_segmentation(spark, sf_dir):
    """RFM customer segmentation: per-user recency/frequency/monetary
    quartiles (1 = best), the staple marketing-analytics derivation.

    Scale shape (round 10): SIZE-DISPATCHED exact NTILE — the
    ``choose_jaccard_verify`` doctrine applied to the global-sort
    shape. Below ``_RFM_DIST_BYTES`` of events scan the three NTILE
    windows run as plain single-partition sorts (the |users| table is
    tiny relative to events; measured 0.9 s at sf0.1 vs 2.6 s of fixed
    multi-job overhead for the distributed form). Beyond it they
    switch to ``ops/windows.distributed_ntile`` — two-phase
    range-partition + prefix-count ranking with NO single-partition
    sort — which ``tests/test_windows_ops.py`` proves bit-equal to
    ``F.ntile`` on every (n, k) shape. Both engines split n rows into
    k buckets identically (first n mod k buckets one larger) given the
    same total order, which the user_id tiebreak pins.
    (``rfm_segmentation_scalable`` remains the threshold-based
    one-pass variant that additionally drops the ranking entirely.)"""
    from pyspark.sql import Window

    from osmart_etl_spark.ops.partitioning import scaled_partitions, scan_bytes
    from osmart_etl_spark.ops.windows import distributed_ntile
    from osmart_etl_spark.queries.base import dbl, dec

    ev = read_table(spark, sf_dir, "events")
    base = ev.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        dbl(
            F.sum(
                F.when(F.col("event_type") == "purchase", dec(F.col("value"))).otherwise(
                    F.lit(0).cast("decimal(18,2)")
                )
            )
        ).alias("monetary"),
    )
    if scan_bytes(ev) <= _RFM_DIST_BYTES:
        wr = Window.orderBy(F.col("last_ts").desc(), F.col("user_id").asc())
        wf = Window.orderBy(F.col("freq").desc(), F.col("user_id").asc())
        wm = Window.orderBy(F.col("monetary").desc(), F.col("user_id").asc())
        return base.select(
            "user_id",
            F.ntile(4).over(wr).cast("bigint").alias("r_q"),
            F.ntile(4).over(wf).cast("bigint").alias("f_q"),
            F.ntile(4).over(wm).cast("bigint").alias("m_q"),
        )
    n_parts = scaled_partitions(ev, floor_mult=0)
    # each ntile branch reads base for its ranks, its partition counts
    # AND its total — materialize so the events aggregate runs once, not
    # 9x. localCheckpoint (not persist): base is bounded by |users| and
    # a persist with no unpersist point would pin executor storage until
    # the session drops the result (round-11 ADVICE leak class).
    base = base.localCheckpoint(eager=True)
    r_q = distributed_ntile(
        base, [F.col("last_ts").desc(), F.col("user_id").asc()], 4, "r_q",
        n_parts=n_parts,
    ).select("user_id", "r_q")
    f_q = distributed_ntile(
        base, [F.col("freq").desc(), F.col("user_id").asc()], 4, "f_q",
        n_parts=n_parts,
    ).select("user_id", "f_q")
    m_q = distributed_ntile(
        base, [F.col("monetary").desc(), F.col("user_id").asc()], 4, "m_q",
        n_parts=n_parts,
    ).select("user_id", "m_q")
    return r_q.join(f_q, "user_id").join(m_q, "user_id")


def _q_thresholds_sql(src: str, col: str) -> str:
    """Order-statistic quartile thresholds at rank ceil(p*n) — the rule
    Spark's percentile_approx follows in its exact regime (verified
    empirically for n in {7,8,100,101}); expressed portably as a
    ROW_NUMBER scan so the oracle never depends on DuckDB's own
    quantile_disc rank convention (which differs: floor(p*(n-1)))."""
    return f"""
    (SELECT
       MAX(CASE WHEN r = CAST(CEIL(0.25 * n) AS BIGINT) THEN v END) AS t25,
       MAX(CASE WHEN r = CAST(CEIL(0.50 * n) AS BIGINT) THEN v END) AS t50,
       MAX(CASE WHEN r = CAST(CEIL(0.75 * n) AS BIGINT) THEN v END) AS t75
     FROM (SELECT {col} AS v, ROW_NUMBER() OVER (ORDER BY {col}) AS r FROM {src}),
          (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM {src}))
    """


@query(
    "rfm_segmentation_scalable",
    oracle=f"""
    WITH base AS (
      SELECT user_id,
        epoch_us(MAX(ts)) AS rec,
        CAST(COUNT(*) AS BIGINT) AS freq,
        CAST(SUM(CASE WHEN event_type = 'purchase'
                 THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END)
             AS DOUBLE) AS monetary
      FROM events GROUP BY user_id
    ),
    rthr AS {_q_thresholds_sql('base', 'rec')},
    fthr AS {_q_thresholds_sql('base', 'freq')},
    mthr AS {_q_thresholds_sql('base', 'monetary')}
    SELECT b.user_id,
      CAST(CASE WHEN b.rec >= rthr.t75 THEN 1 WHEN b.rec >= rthr.t50 THEN 2
                WHEN b.rec >= rthr.t25 THEN 3 ELSE 4 END AS BIGINT) AS r_q,
      CAST(CASE WHEN b.freq >= fthr.t75 THEN 1 WHEN b.freq >= fthr.t50 THEN 2
                WHEN b.freq >= fthr.t25 THEN 3 ELSE 4 END AS BIGINT) AS f_q,
      CAST(CASE WHEN b.monetary >= mthr.t75 THEN 1 WHEN b.monetary >= mthr.t50 THEN 2
                WHEN b.monetary >= mthr.t25 THEN 3 ELSE 4 END AS BIGINT) AS m_q
    FROM base b, rthr, fthr, mthr
    """,
    tags=("extras-rfm", "scale-shape"),
)
def rfm_segmentation_scalable(spark, sf_dir):
    """RFM segmentation, quantile-THRESHOLD form — the 10⁹-user shape
    promised in ``rfm_segmentation``'s docstring (VERDICT r3 #5): no
    global NTILE sort anywhere. One user_id aggregate (the only
    shuffle), one 1-row percentile_approx pass for the nine quartile
    thresholds, broadcast back over the user table as a projection.

    Tradeoff vs NTILE: equal-valued users land in the same bucket, so
    buckets are only approximately equal-sized — the standard price of
    threshold segmentation. Parity: percentile_approx with accuracy
    10⁷ ≫ |users| is in its exact regime and returns the order
    statistic at rank ceil(p·n); the oracle reproduces that rank rule
    explicitly. Beyond the exact regime (|users| > accuracy) thresholds
    drift within the documented ε = 1/accuracy rank error — exactly the
    approximation this variant exists to buy.
    """
    from osmart_etl_spark.queries.base import dbl, dec

    ev = read_table(spark, sf_dir, "events")
    base = ev.groupBy("user_id").agg(
        F.unix_micros(F.max("ts")).alias("rec"),
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        dbl(
            F.sum(
                F.when(F.col("event_type") == "purchase", dec(F.col("value"))).otherwise(
                    F.lit(0).cast("decimal(18,2)")
                )
            )
        ).alias("monetary"),
    )
    ps = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    acc = F.lit(10_000_000)
    thr = base.agg(
        F.percentile_approx("rec", ps, acc).alias("rq"),
        F.percentile_approx("freq", ps, acc).alias("fq"),
        F.percentile_approx("monetary", ps, acc).alias("mq"),
    )

    def bucket(v, q):
        return (
            F.when(v >= q[2], 1).when(v >= q[1], 2).when(v >= q[0], 3).otherwise(4)
        ).cast("bigint")

    return (
        base.crossJoin(F.broadcast(thr))
        .select(
            "user_id",
            bucket(F.col("rec"), F.col("rq")).alias("r_q"),
            bucket(F.col("freq"), F.col("fq")).alias("f_q"),
            bucket(F.col("monetary"), F.col("mq")).alias("m_q"),
        )
    )


@query(
    "tpch_q18_large_volume",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
      CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderdate ASC, o.o_orderkey ASC
    LIMIT 100
    """,
    tags=("tpch", "q18"),
)
def tpch_q18_large_volume(spark, sf_dir):
    """TPC-H Q18 (large-volume customers): orders whose summed line
    quantity exceeds a threshold, joined back to customer detail —
    the aggregate-filtered-IN-subquery shape (threshold 250 ≈ the
    99th percentile of this generator, vs the spec's 300 at SF1).

    Scale shape: the HAVING subquery is one map-side-combined aggregate
    over lineitem; its surviving keys (~1% of orders) re-enter as a
    broadcastable semi-join filter BEFORE the three-way join, so the
    expensive customer⋈orders⋈lineitem join runs on the filtered slice
    only. Catalyst plans the IN as a left-semi; quantities aggregate as
    DECIMAL for cross-engine exactness and surface as DOUBLE.
    Ref parity: the reference's extract SQL uses the same
    filter-before-join discipline (extract_stock_movements.sql:36-37).
    """
    from osmart_etl_spark.queries.base import dbl, dec

    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec(F.col("l_quantity"))).alias("__q"))
        .filter(F.col("__q") > 250)
        .select("l_orderkey")
    )
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"])
        .join(li, orders["o_orderkey"] == li["l_orderkey"])
        .join(
            big.withColumnRenamed("l_orderkey", "__bk"),
            orders["o_orderkey"] == F.col("__bk"),
            "left_semi",
        )
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dbl(F.sum(dec(F.col("l_quantity")))).alias("total_qty"))
        .orderBy(
            F.col("o_totalprice").desc(), F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
        )
        .limit(100)
    )


@query(
    "tpch_q7_nation_volume",
    oracle="""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
      CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
    WHERE ns.n_nationkey != nc.n_nationkey
    GROUP BY ns.n_name, nc.n_name, CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT)
    """,
    tags=("tpch", "q7"),
)
def tpch_q7_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape (volume shipping between nation pairs by year):
    the double-role dimension join — nation joins TWICE under different
    roles (supplier's vs customer's), with a cross-nation inequality.

    Scale shape: both nation sides (25 rows each) carry broadcast
    hints; supplier (10k·SF) and customer (150k·SF) are SF-linear —
    fact-proportional — so they carry NO hint and AQE decides
    (broadcast at bench scale, shuffle at 100 TB). The heavy shuffle pair is orders⋈lineitem (plus
    customer when AQE demotes it); the year extraction and the
    decimal revenue product fold into the scan-side projection. (The
    spec's two-nation literal filter is widened to all unequal pairs so
    the result exercises the full pair matrix on this generator.)
    """
    from osmart_etl_spark.queries.base import dbl, dec

    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    ns = n.select(F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation"))
    nc = n.select(F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation"))
    rev = dec(F.col("l_extendedprice")) * (1 - dec(F.col("l_discount")))
    return (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(F.col("ns_key") != F.col("nc_key"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year")
        )
        .agg(dbl(F.sum(rev)).alias("revenue"))
    )


@query(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      CAST(COUNT(*) AS BIGINT) AS n_items
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT 20
    """,
    tags=("tpch", "q10"),
)
def tpch_q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape (top returned-revenue customers): selective fact
    filter (returnflag pushed to the lineitem scan) → join → grouped
    revenue → top-20 via TakeOrderedAndProject, revenue-desc with
    custkey tiebreak. The returns-analysis staple."""
    from osmart_etl_spark.queries.base import dbl, dec

    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = read_table(spark, sf_dir, "nation")
    rev = dec(F.col("l_extendedprice")) * (1 - dec(F.col("l_discount")))
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dbl(F.sum(rev)).alias("revenue"), F.count(F.lit(1)).cast("bigint").alias("n_items"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "min_cost_supplier",
    oracle="""
    WITH costs AS (
      SELECT l_partkey, l_suppkey,
        MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS best_price
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    part_min AS (
      SELECT l_partkey, MIN(best_price) AS min_price
      FROM costs GROUP BY l_partkey
    )
    SELECT c.l_partkey AS partkey, c.l_suppkey AS suppkey,
      CAST(c.best_price AS DOUBLE) AS best_price
    FROM costs c
    JOIN part_min m
      ON m.l_partkey = c.l_partkey AND c.best_price = m.min_price
    """,
    tags=("tpch", "q2-shape"),
)
def min_cost_supplier(spark, sf_dir):
    """TPC-H Q2's core shape on this schema (no partsupp table in the
    generator, so lineitem plays its role): for every part, the
    supplier(s) achieving the minimum price — the correlated-MIN
    subquery, rewritten as aggregate + self-equijoin on (key, min),
    which is how Catalyst decorrelates it anyway.

    Scale shape: both aggregates are map-side combinable and hash on
    l_partkey, so AQE reuses one exchange across the agg pair and the
    join — no broadcast needed, no window, ties kept (all min-price
    suppliers survive, the Q2 semantics)."""
    from osmart_etl_spark.queries.base import dbl, dec

    li = read_table(spark, sf_dir, "lineitem")
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(dec(F.col("l_extendedprice"))).alias("best_price")
    )
    part_min = costs.groupBy("l_partkey").agg(F.min("best_price").alias("min_price")).select(
        F.col("l_partkey").alias("pm_partkey"), "min_price"
    )
    return (
        costs.join(
            part_min,
            (F.col("l_partkey") == F.col("pm_partkey"))
            & (F.col("best_price") == F.col("min_price")),
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
            dbl(F.col("best_price")).alias("best_price"),
        )
    )


@query(
    "user_behavior_similarity",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
        LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    grams AS (
      SELECT user_id, event_type || '>' || nxt AS bigram,
        CAST(COUNT(*) AS BIGINT) AS c
      FROM seq WHERE nxt IS NOT NULL
      GROUP BY user_id, event_type || '>' || nxt
    ),
    norms AS (
      SELECT user_id, sqrt(CAST(SUM(c * c) AS DOUBLE)) AS nrm FROM grams GROUP BY user_id
    ),
    probe AS (SELECT bigram, c AS pc FROM grams WHERE user_id = 1),
    dots AS (
      SELECT g.user_id, CAST(SUM(g.c * p.pc) AS DOUBLE) AS dot
      FROM grams g JOIN probe p ON p.bigram = g.bigram
      WHERE g.user_id != 1
      GROUP BY g.user_id
    )
    SELECT d.user_id,
      d.dot / (n.nrm * (SELECT nrm FROM norms WHERE user_id = 1)) AS cos_sim
    FROM dots d JOIN norms n ON n.user_id = d.user_id
    ORDER BY cos_sim DESC, d.user_id ASC
    LIMIT 10
    """,
    tags=("extras-sequence-similarity", "scale-shape"),
)
def user_behavior_similarity(spark, sf_dir):
    """Behavioral-sequence similarity search (the relational core of
    trajectory-similarity systems, cf. PAPERS.md): each user's event
    stream becomes a transition-bigram count vector, and the query
    returns the 10 users most cosine-similar to a probe user (id 1).
    Counts are exact bigints, norms are IEEE-exact sqrt of integer
    sums, so cosines are bit-deterministic without any float folds.

    Scale shape: ONE user_id exchange builds bigrams (window lead +
    map-side-combined count share the partitioning); the probe's sparse
    vector (≤ |event_types|² rows) broadcasts into the dot-product
    join, so corpus vectors never shuffle by bigram; top-10 is
    TakeOrderedAndProject. This is exactly an inverted-index similarity
    scan: at 10⁹ users the same plan stands, with the probe side staying
    a broadcast.
    """
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    grams = seq.groupBy(
        "user_id", F.concat_ws(">", "event_type", "nxt").alias("bigram")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    norms = grams.groupBy("user_id").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c")).cast("double")).alias("nrm")
    )
    probe = grams.filter(F.col("user_id") == 1).select(
        "bigram", F.col("c").alias("pc")
    )
    probe_norm = norms.filter(F.col("user_id") == 1).select(
        F.col("nrm").alias("pnrm")
    )
    dots = (
        grams.filter(F.col("user_id") != 1)
        .join(F.broadcast(probe), "bigram")
        .groupBy("user_id")
        .agg(F.sum(F.col("c") * F.col("pc")).cast("double").alias("dot"))
    )
    return (
        dots.join(norms, "user_id")
        .crossJoin(F.broadcast(probe_norm))
        .select(
            "user_id",
            (F.col("dot") / (F.col("nrm") * F.col("pnrm"))).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("user_id").asc())
        .limit(10)
    )
