"""Scale-technique operators: shapes whose POINT is the 100 TB plan.

Each query here demonstrates a technique a 1000-executor deployment
leans on — bloom-filter join pre-filtering, bucketed two-pass skyline,
distinct-first co-occurrence, lag-chain EWMA, exact-moment A/B testing,
and order-statistic robust outliers — while remaining exactly
oracle-checkable at small SF (the float-safety discipline of
queries/base.py applies throughout: exact decimal/bigint reductions,
one fixed-order double formula at the end).

Extension surface beyond the reference (its pandas scripts stop at
conditional aggregation); the join pre-filter generalizes the
reference's exclusion anti-join (etl_sales/transform.py) to the
shuffle-avoiding regime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from osmart_etl_spark.io.sources import read_table
from osmart_etl_spark.queries.base import dbl, dec, query

# --------------------------------------------------------------------------
# Bloom-filter join pre-filter
# --------------------------------------------------------------------------

_BF_BITS = 1 << 15  # 32768 bits = 512 longs ≈ 4 KiB serialized
_BF_K = 4  # hash functions; fpr ≈ (1-e^{-kn/m})^k ≈ 0.3% at n=300


@query(
    "bloom_prefilter_join",
    oracle="""
    SELECT c.c_custkey, c.c_name,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY c.c_custkey, c.c_name
    """,
    tags=("scale-tech", "bloom-join"),
)
def bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join with a DataFrame-native Bloom-filter pre-filter on the probe
    side. The build side (BUILDING-segment customers) is folded into a
    ~4 KiB bitmap — positions via xxhash64, words via bit_or partial
    aggregation — broadcast as ONE map<word,bits> row; the probe side
    (orders) checks k=4 bits in pure codegen and drops non-members
    BEFORE the join. False positives are removed by the join itself, so
    the result is exact and the oracle is the plain join.

    Why this matters at 100 TB: when the build side is too big to
    broadcast as a hash table (say 10⁸ keys → GBs) a SortMergeJoin
    shuffles the ENTIRE probe side; the Bloom bitmap stays a few MB at
    any build cardinality (m scales with n, not row width) and removes
    ~(1-selectivity) of probe rows map-side, shrinking the shuffle by
    the same factor. This is Spark's own runtime-filter strategy
    (spark.sql.optimizer.runtime.bloomFilter.enabled) made explicit and
    schedulable — e.g. persisted once and reused across queries, which
    the runtime filter cannot do. Cross-engine hash portability is NOT
    required: the bitmap is internal, only the exact post-join result
    is compared. Cites reference semantics: etl_sales/transform.py's
    segment-restricted revenue rollup.
    """
    from osmart_etl_spark.ops.bloom import build_bloom, probe_bloom

    cust = (
        read_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name")
    )
    bloom = build_bloom(cust, "c_custkey", bits=_BF_BITS, k=_BF_K)
    orders = read_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    pref = probe_bloom(orders, "o_custkey", bloom, bits=_BF_BITS, k=_BF_K)

    return (
        pref.join(cust, pref["o_custkey"] == cust["c_custkey"])
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dbl(F.sum(dec(F.col("o_totalprice")))).alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# Distributed skyline (Pareto frontier)
# --------------------------------------------------------------------------

_SKY_BUCKET = 50000.0  # spend bin width; adaptive (quantile) at scale


@query(
    "skyline_pareto_frontier",
    oracle="""
    WITH agg AS (
      SELECT o_custkey AS c_custkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend,
        MAX(o_orderdate) AS last_order
      FROM orders GROUP BY o_custkey
    )
    SELECT a.c_custkey, a.spend, a.last_order
    FROM agg a
    WHERE NOT EXISTS (
      SELECT 1 FROM agg b
      WHERE b.spend >= a.spend AND b.last_order >= a.last_order
        AND (b.spend > a.spend OR b.last_order > a.last_order)
    )
    """,
    tags=("scale-tech", "skyline"),
)
def skyline_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier (customers not dominated on total spend AND
    order recency) WITHOUT the naive O(n²) self-join and WITHOUT a
    single-partition global window.

    Two-pass bucketed shape: (1) bucket customers by spend bin; a tiny
    per-bucket MAX(last_order) table plus a running max over STRICTLY
    higher bins (window over ≤ thousands of bucket rows, not data rows)
    kills any point whose recency is beaten by a strictly-richer bin —
    this eliminates the bulk map-side after one broadcast join. (2) The
    survivors resolve in-bin domination with a PER-BUCKET window over
    DISTINCT (spend, recency) pairs ordered (spend desc, recency desc):
    a pair is dominated iff the running max of recency over earlier
    rows ≥ its own (strictness is guaranteed: earlier rows have
    strictly greater spend, or equal spend and strictly greater
    recency). Buckets process in parallel; no partition ever sees more
    than one bin. The oracle is the declarative NOT EXISTS definition —
    parity proves the two-pass rewrite exact, including tie semantics
    (equal (spend, recency) pairs do not dominate each other).

    At 100 TB: pass 1 is one map-side bucket assignment + a metadata-
    sized aggregate; pass 2 touches only pass-1 survivors (for any
    real distribution, a vanishing fraction). Bin width becomes
    quantile-derived (percentile_approx on spend) so bins stay balanced
    under skew.
    """
    orders = read_table(spark, sf_dir, "orders")
    agg = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        dbl(F.sum(dec(F.col("o_totalprice")))).alias("spend"),
        F.max("o_orderdate").alias("last_order"),
    )
    agg = agg.withColumn("__bucket", F.floor(F.col("spend") / F.lit(_SKY_BUCKET)))

    # Pass 1: per-bucket max recency; D(b) = max over strictly higher buckets.
    bmax = agg.groupBy("__bucket").agg(F.max("last_order").alias("__bmax"))
    wb = (
        Window.orderBy(F.col("__bucket").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bdom = bmax.withColumn("__dom_above", F.max("__bmax").over(wb)).select(
        "__bucket", "__dom_above"
    )
    survivors = agg.join(F.broadcast(bdom), "__bucket").filter(
        F.col("__dom_above").isNull() | (F.col("__dom_above") < F.col("last_order"))
    )

    # Pass 2: in-bucket domination over distinct pairs.
    pairs = survivors.select("__bucket", "spend", "last_order").distinct()
    wp = (
        Window.partitionBy("__bucket")
        .orderBy(F.col("spend").desc(), F.col("last_order").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier_pairs = (
        pairs.withColumn("__runmax", F.max("last_order").over(wp))
        .filter(F.col("__runmax").isNull() | (F.col("__runmax") < F.col("last_order")))
        .select("__bucket", "spend", "last_order")
    )
    return survivors.join(
        F.broadcast(frontier_pairs), ["__bucket", "spend", "last_order"]
    ).select("c_custkey", "spend", "last_order")


# --------------------------------------------------------------------------
# Item co-occurrence (market-basket) top-k
# --------------------------------------------------------------------------

_CO_TOPK = 3


@query(
    "item_cooccurrence_topk",
    oracle=f"""
    WITH basket AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    deg AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n FROM basket GROUP BY l_partkey
    ),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM basket a JOIN basket b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    ),
    sym AS (
      SELECT pa AS part, pb AS partner, n_ab FROM pairs
      UNION ALL
      SELECT pb AS part, pa AS partner, n_ab FROM pairs
    ),
    scored AS (
      SELECT s.part, s.partner, s.n_ab,
        CAST(s.n_ab AS DOUBLE) / CAST(da.n + db.n - s.n_ab AS DOUBLE) AS score
      FROM sym s
      JOIN deg da ON da.l_partkey = s.part
      JOIN deg db ON db.l_partkey = s.partner
    )
    SELECT part, partner, n_ab, score, rank FROM (
      SELECT part, partner, n_ab, score,
        CAST(ROW_NUMBER() OVER (
          PARTITION BY part ORDER BY score DESC, partner ASC) AS BIGINT) AS rank
      FROM scored
    ) WHERE rank <= {_CO_TOPK}
    """,
    tags=("scale-tech", "cooccurrence"),
)
def item_cooccurrence_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item co-occurrence with Jaccard affinity and top-k partners
    per part — the recommender / related-items primitive.

    Distinct-first discipline: baskets collapse to DISTINCT (order,
    part) BEFORE pairing, so per-order fan-out is bounded by basket
    size (≤13 here, ≤ tens anywhere), making the pair join O(Σ b²)
    with tiny b — never O(n²). Affinity = |a∩b| / |a∪b| over ORDER
    sets, from three exact bigint counts, one double division (bit-
    identical cross-engine). Top-k per part is a per-key window —
    embarrassingly parallel, no global sort.

    At 100 TB: the basket distinct and the pair aggregation are two
    digest-keyed shuffles, both map-side combinable; a production
    deployment additionally caps pathological baskets (mega-orders)
    with a per-order LIMIT — omitted here because the oracle would then
    need the same cap, and the testdata's baskets are bounded anyway.
    """
    # Numbered repartitions must SCALE WITH VOLUME: a fixed 2x-cores
    # count starved x100 amplification (7.5M-row per-task sorts, OOM at
    # ~100 MB/thread execution memory), while a blanket 4x count
    # sextupled bench-scale wall time in scheduler overhead (measured
    # round 10). Derive the count from the scan's plan-statistics byte
    # size (file footer metadata — no job): one ~32 MB-input partition
    # per task, floored at 2x cores, capped at 16x cores.
    from osmart_etl_spark.ops.partitioning import scaled_partitions

    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    n_par = scaled_partitions(li)
    # ONE numbered exchange on l_orderkey serves the whole left spine:
    # hashpartitioning(l_orderkey) satisfies the clustering requirement
    # of BOTH the (l_orderkey, l_partkey) dedup (subset key) and the
    # downstream basket-collapse groupBy(l_orderkey), so neither adds
    # an exchange — one fewer basket-volume shuffle than distinct() +
    # re-repartition, and the fixed count is exempt from the byte-based
    # AQE coalescing that serialized the dedup reduce at x10/x100.
    basket = li.repartition(n_par, "l_orderkey").dropDuplicates(
        ["l_orderkey", "l_partkey"]
    )
    deg = basket.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    # Pair generation MAP-SIDE: collapse each basket to a sorted array
    # (the groupBy reuses the distinct's partitioning on l_orderkey —
    # no extra exchange) and emit the b²/2 ordered pairs with an
    # indexed-transform comprehension in codegen. Replaces the
    # orderkey self-join, which read the basket twice and shuffled
    # both sides.
    # numbered repartitions under the two aggregations: AQE sizes both
    # reduce stages by shuffle bytes and coalesced them to 1-2 tasks
    # (basket collapse 1.7 s serial, raw-pair count 1.6 s over 2.4M
    # records, measured at sf0.1) even though their cost is per-record
    # CPU; the fixed-count exchanges satisfy the agg requirements and
    # are exempt from coalescing.
    arrs = (
        # basket is already hashpartitioned on l_orderkey (the spine
        # exchange above): no new shuffle here
        basket.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
    )
    pair_col = F.flatten(
        F.transform(
            F.col("ps"),
            lambda x, i: F.transform(
                F.slice(F.col("ps"), i + 2, F.size("ps")),
                lambda y: F.struct(x.alias("pa"), y.alias("pb")),
            ),
        )
    )
    pairs = (
        arrs.select(F.explode(pair_col).alias("__p"))
        .select(F.col("__p.pa").alias("pa"), F.col("__p.pb").alias("pb"))
        .repartition(n_par, "pa", "pb")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    # Both directions from ONE pass over the pair pipeline (round 13,
    # the connected_components explode discipline): the former
    # two-branch unionAll evaluated the whole basket→explode→agg chain
    # once per branch (pairs is not persisted; the union sides are not
    # byte-identical subtrees, so exchange reuse cannot fire).
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("pa").alias("part"),
                    F.col("pb").alias("partner"),
                    F.col("n_ab"),
                ),
                F.struct(
                    F.col("pb").alias("part"),
                    F.col("pa").alias("partner"),
                    F.col("n_ab"),
                ),
            )
        ).alias("__e")
    ).select("__e.part", "__e.partner", "__e.n_ab")
    # deg has PART cardinality (distinct parts = 200k·SF, fact-
    # proportional) — NO forced broadcast: AQE builds a broadcast hash
    # table at bench scale and graduates to a shuffle join when the
    # part dimension outgrows the threshold; the sym side is already
    # hashed on (pa, pb) so the part-keyed probe is one extra exchange
    # there, never an OOM.
    scored = (
        sym.join(deg.withColumnRenamed("l_partkey", "part"), "part")
        .withColumnRenamed("n", "__na")
        .join(deg.withColumnRenamed("l_partkey", "partner"), "partner")
        .withColumnRenamed("n", "__nb")
        .withColumn(
            "score",
            F.col("n_ab").cast("double")
            / (F.col("__na") + F.col("__nb") - F.col("n_ab")).cast("double"),
        )
    )
    wk = Window.partitionBy("part").orderBy(F.col("score").desc(), F.col("partner").asc())
    return (
        # numbered repartition on the window key — same AQE coalescing
        # guard as the aggs above (the top-k sort stage read 2.3M rows
        # in one task otherwise)
        scored.repartition(n_par, "part")
        .withColumn("rank", F.row_number().over(wk).cast("bigint"))
        .filter(F.col("rank") <= _CO_TOPK)
        .select("part", "partner", "n_ab", "score", "rank")
    )


# --------------------------------------------------------------------------
# EWMA via lag chain (exact, windowed)
# --------------------------------------------------------------------------

_EWMA_DEPTH = 8  # truncation: 0.5^8 tail < 0.4% of mass


def _ewma_terms_sql() -> str:
    terms = ["CAST(value AS DOUBLE)"]
    for d in range(1, _EWMA_DEPTH):
        terms.append(
            f"COALESCE(LAG(CAST(value AS DOUBLE), {d}) OVER w, CAST(0 AS DOUBLE))"
            f" / {1 << d}"
        )
    return " + ".join(terms)


@query(
    "ewma_lag_chain",
    oracle=f"""
    SELECT event_id, user_id, CAST(value AS DOUBLE) AS value,
      {_ewma_terms_sql()} AS ewma8
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
    tags=("scale-tech", "timeseries"),
)
def ewma_lag_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user, truncated at
    depth 8 with half-life decay (α = 1/2) — the streaming-friendly
    smoother, expressed as ONE window with a LAG chain.

    EWMA's recurrence is non-associative, so it cannot be a plain
    window SUM; rather than fall to applyInPandas, the truncated form
    is a fixed left-to-right chain of 8 lag terms, each divided by a
    POWER OF TWO (exact binary scaling — no pow(), no libm, identical
    bits on every engine; this is why α=1/2 and not 0.9). Partition-
    start rows shrink the window naturally (missing lags coalesce to
    0), matching the untruncated EWMA's zero-init. One shuffle on
    user_id; whole-stage codegen throughout; the 8 lags share one
    window frame buffer.

    At 100 TB the same plan holds: state per row is O(depth), the
    window never materializes a group, and the streaming twin is a
    trivial applyInPandasWithState carry of 8 floats.
    """
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    expr = F.col("value").cast("double")
    for d in range(1, _EWMA_DEPTH):
        expr = expr + (
            F.coalesce(
                F.lag(F.col("value").cast("double"), d).over(w),
                F.lit(0).cast("double"),
            )
            / F.lit(float(1 << d))
        )
    return ev.select(
        "event_id",
        "user_id",
        F.col("value").cast("double").alias("value"),
        expr.alias("ewma8"),
    )


# --------------------------------------------------------------------------
# A/B test: Welch z-score from exact moments
# --------------------------------------------------------------------------


@query(
    "ab_test_ztest",
    oracle="""
    WITH m AS (
      SELECT event_type,
        CAST(COUNT(*) FILTER (WHERE user_id % 2 = 0) AS DOUBLE) AS n0,
        CAST(COUNT(*) FILTER (WHERE user_id % 2 = 1) AS DOUBLE) AS n1,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE user_id % 2 = 0)
             AS DOUBLE) AS s0,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) FILTER (WHERE user_id % 2 = 1)
             AS DOUBLE) AS s1,
        CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
             FILTER (WHERE user_id % 2 = 0) AS DOUBLE) AS q0,
        CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
             FILTER (WHERE user_id % 2 = 1) AS DOUBLE) AS q1
      FROM events GROUP BY event_type
    )
    SELECT event_type,
      CAST(n0 AS BIGINT) AS n_a, CAST(n1 AS BIGINT) AS n_b,
      (s0 / n0) - (s1 / n1) AS mean_diff,
      ((s0 / n0) - (s1 / n1)) / sqrt(
        (((q0 - ((s0 * s0) / n0)) / (n0 - 1)) / n0)
        + (((q1 - ((s1 * s1) / n1)) / (n1 - 1)) / n1)
      ) AS z_score
    FROM m
    """,
    tags=("scale-tech", "statistics"),
)
def ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Welch z-test per event type, arms assigned by the
    deterministic user hash (parity — in production a salted bucket
    hash, cf. stratified_split_assign). The experimentation-platform
    primitive at data scale: ONE pass, ONE map-side-combinable
    aggregate producing six EXACT moments (decimal sums, bigint
    counts), then the z formula evaluated once in double with pinned
    parenthesization — sqrt is IEEE correctly-rounded, so both engines
    agree to the bit. No per-arm shuffles, no sampling: 10¹² events
    cost the same plan as 10⁴.
    """
    ev = read_table(spark, sf_dir, "events")
    arm0 = F.col("user_id") % 2 == 0
    x = dec(F.col("value"))
    m = ev.groupBy("event_type").agg(
        dbl(F.count(F.when(arm0, 1))).alias("n0"),
        dbl(F.count(F.when(~arm0, 1))).alias("n1"),
        dbl(F.sum(F.when(arm0, x))).alias("s0"),
        dbl(F.sum(F.when(~arm0, x))).alias("s1"),
        dbl(F.sum(F.when(arm0, x * x))).alias("q0"),
        dbl(F.sum(F.when(~arm0, x * x))).alias("q1"),
    )
    n0, n1 = F.col("n0"), F.col("n1")
    s0, s1, q0, q1 = F.col("s0"), F.col("s1"), F.col("q0"), F.col("q1")
    mean_diff = (s0 / n0) - (s1 / n1)
    var0 = (q0 - ((s0 * s0) / n0)) / (n0 - F.lit(1.0))
    var1 = (q1 - ((s1 * s1) / n1)) / (n1 - F.lit(1.0))
    z = mean_diff / F.sqrt((var0 / n0) + (var1 / n1))
    return m.select(
        "event_type",
        n0.cast("bigint").alias("n_a"),
        n1.cast("bigint").alias("n_b"),
        mean_diff.alias("mean_diff"),
        z.alias("z_score"),
    )


# --------------------------------------------------------------------------
# Robust outliers: median / MAD via explicit order statistics
# --------------------------------------------------------------------------


@query(
    "mad_outlier_summary",
    oracle="""
    WITH ranked AS (
      SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v,
        ROW_NUMBER() OVER (
          PARTITION BY event_type ORDER BY CAST(value AS DECIMAL(18,2)), event_id
        ) AS rn,
        COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    med AS (
      SELECT event_type, MAX(n) AS n,
        CAST(SUM(v) FILTER (WHERE rn * 2 = n OR rn * 2 = n + 1 OR rn * 2 = n + 2)
             AS DOUBLE)
        / CAST(COUNT(*) FILTER (WHERE rn*2 = n OR rn*2 = n+1 OR rn*2 = n+2)
               AS DOUBLE) AS median_val
      FROM ranked GROUP BY event_type
    ),
    dev AS (
      SELECT r.event_type, r.v, m.n, m.median_val,
        abs(CAST(r.v AS DOUBLE) - m.median_val) AS ad,
        ROW_NUMBER() OVER (
          PARTITION BY r.event_type
          ORDER BY abs(CAST(r.v AS DOUBLE) - m.median_val), r.rn
        ) AS arn
      FROM ranked r JOIN med m ON m.event_type = r.event_type
    ),
    mad AS (
      SELECT event_type,
        SUM(ad) FILTER (WHERE arn*2 = n OR arn*2 = n+1 OR arn*2 = n+2)
        / CAST(COUNT(*) FILTER (WHERE arn*2 = n OR arn*2 = n+1 OR arn*2 = n+2)
               AS DOUBLE) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
      CAST(MAX(d.n) AS BIGINT) AS n,
      MAX(d.median_val) AS median_val,
      MAX(a.mad) AS mad,
      CAST(COUNT(*) FILTER (WHERE d.ad > 3 * a.mad) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad a ON a.event_type = d.event_type
    GROUP BY d.event_type
    """,
    tags=("scale-tech", "robust-stats"),
)
def mad_outlier_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier profile per event type: exact median, exact MAD
    (median absolute deviation), and the count of |x−med| > 3·MAD
    points — the monitoring primitive that survives heavy tails where
    mean/stddev alerting melts.

    Exact medians WITHOUT percentile interpolation: engines disagree on
    quantile interpolation formulas at the bit level, so both medians
    are defined as the mean of the middle one-or-two ORDER STATISTICS
    (row_number against count; rn*2 ∈ {n, n+1, n+2} selects exactly
    the middle one (odd n: rn*2 = n+1) or two (even n: rn*2 ∈ {n, n+2})),
    summed as exact decimals, divided once in double. Every window is
    per-event-type — parallel across groups, never global.

    At 100 TB exact per-group medians mean per-group sorts; the scale
    variant swaps in percentile_approx for the MEDIAN while keeping
    this query as the calibration audit on a hash-gated subset — the
    sketch-plus-exact-auditor pattern of approx_sketches
    (queries/aggregates.py).
    """
    ev = read_table(spark, sf_dir, "events").select(
        "event_type", "event_id", dec(F.col("value")).alias("v")
    )
    wr = Window.partitionBy("event_type").orderBy(F.asc("v"), F.asc("event_id"))
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "v",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    mid = (F.col("rn") * 2 == F.col("n")) | (F.col("rn") * 2 == F.col("n") + 1) | (
        F.col("rn") * 2 == F.col("n") + 2
    )
    med = ranked.groupBy("event_type").agg(
        F.max("n").alias("n"),
        (
            dbl(F.sum(F.when(mid, F.col("v"))))
            / dbl(F.count(F.when(mid, 1)))
        ).alias("median_val"),
    )
    dev = ranked.join(med.select("event_type", "median_val"), "event_type").select(
        "event_type",
        "v",
        "rn",
        "median_val",
        F.abs(dbl(F.col("v")) - F.col("median_val")).alias("ad"),
    )
    wa = Window.partitionBy("event_type").orderBy(F.asc("ad"), F.asc("rn"))
    dev2 = dev.join(med.select("event_type", "n"), "event_type").withColumn(
        "arn", F.row_number().over(wa)
    )
    amid = (F.col("arn") * 2 == F.col("n")) | (
        F.col("arn") * 2 == F.col("n") + 1
    ) | (F.col("arn") * 2 == F.col("n") + 2)
    mad = dev2.groupBy("event_type").agg(
        (F.sum(F.when(amid, F.col("ad"))) / dbl(F.count(F.when(amid, 1)))).alias("mad")
    )
    return (
        dev2.join(mad, "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n"),
            F.max("median_val").alias("median_val"),
            F.max("mad").alias("mad"),
            F.count(F.when(F.col("ad") > 3 * F.col("mad"), 1))
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


# --------------------------------------------------------------------------
# Rendezvous (highest-random-weight) shard routing
# --------------------------------------------------------------------------

_HRW_N = 8  # current shard count; the re-shard adds one


@query(
    "rendezvous_shard_routing",
    oracle=f"""
    WITH s8 AS (
      SELECT doc_id, shard FROM (
        SELECT d.doc_id, s.shard,
               ROW_NUMBER() OVER (
                 PARTITION BY d.doc_id
                 ORDER BY md5(CAST(d.doc_id AS VARCHAR) || ':' ||
                              CAST(s.shard AS VARCHAR)) DESC,
                          s.shard DESC) AS rn
        FROM documents d
        CROSS JOIN (SELECT UNNEST(generate_series(0, {_HRW_N - 1})) AS shard) s
      ) WHERE rn = 1
    ),
    s9 AS (
      SELECT doc_id, shard FROM (
        SELECT d.doc_id, s.shard,
               ROW_NUMBER() OVER (
                 PARTITION BY d.doc_id
                 ORDER BY md5(CAST(d.doc_id AS VARCHAR) || ':' ||
                              CAST(s.shard AS VARCHAR)) DESC,
                          s.shard DESC) AS rn
        FROM documents d
        CROSS JOIN (SELECT UNNEST(generate_series(0, {_HRW_N})) AS shard) s
      ) WHERE rn = 1
    )
    SELECT CAST(s8.shard AS INT) AS shard_before,
           CAST(s9.shard AS INT) AS shard_after,
           COUNT(*) AS n_docs
    FROM s8 JOIN s9 ON s8.doc_id = s9.doc_id
    GROUP BY 1, 2
    """,
    tags=("ext-scale", "rendezvous-hashing", "resharding"),
)
def rendezvous_shard_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous/HRW shard routing (Thaler & Ravishankar 1996) and its
    re-shard stability contract: each doc goes to the shard with the
    highest md5(doc:shard) weight. Adding shard N+1 can, BY
    CONSTRUCTION, only move a doc whose new-shard weight beats all old
    ones — so the (before, after) transition matrix this query emits is
    structurally diagonal except the single column after = N, and the
    moved mass is ~1/(N+1) in expectation. That is the property that
    lets a 100 TB corpus grow its shard fleet without a global
    reshuffle: ~89% of data stays put, verified here as data (any
    off-diagonal row with after != {_HRW_N} would hash-mismatch the
    oracle and fail the structural test).

    Shape: the weight argmax is a row-side ``array_max`` over N+1
    (hash, shard) structs — zero shuffle, whole-stage codegen, no
    per-doc explode (the oracle's UNNEST form is the relational
    equivalent, quadratic in nothing); the only exchange is the final
    ≤ N² -row count matrix.
    """
    docs = read_table(spark, sf_dir, "documents").select("doc_id")

    def best_shard(n: int):
        structs = F.transform(
            F.sequence(F.lit(0), F.lit(n - 1)),
            lambda s: F.struct(
                F.md5(
                    F.concat_ws(
                        ":", F.col("doc_id").cast("string"), s.cast("string")
                    )
                ).alias("h"),
                s.cast("int").alias("s"),
            ),
        )
        return F.array_max(structs)["s"]

    routed = docs.select(
        best_shard(_HRW_N).alias("shard_before"),
        best_shard(_HRW_N + 1).alias("shard_after"),
    )
    return (
        routed.groupBy("shard_before", "shard_after")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --------------------------------------------------------------------------
# Corpus shard packing via distributed prefix sum
# --------------------------------------------------------------------------

_SP_SHARDS = 16  # output shards (token-balanced)
_SP_BUCKETS = 32  # prefix-sum blocks (one per executor-ish at test scale)


@query(
    "corpus_shard_packing",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), x -> x != ''))
                  AS BIGINT) AS tokens
      FROM documents
    ),
    tot AS (
      SELECT MAX(doc_id) AS max_id, SUM(tokens) AS total FROM t
    ),
    c AS (
      SELECT doc_id, tokens,
             SUM(tokens) OVER (ORDER BY doc_id) - tokens AS cum_excl
      FROM t
    )
    SELECT CAST(c.cum_excl // ((tot.total + {_SP_SHARDS} - 1) // {_SP_SHARDS})
                AS BIGINT) AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(c.tokens) AS BIGINT) AS n_tokens,
           MIN(c.doc_id) AS first_doc,
           MAX(c.doc_id) AS last_doc
    FROM c, tot
    GROUP BY 1
    """,
    tags=("scale-tech", "prefix-sum", "sharded-write"),
)
def corpus_shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced output sharding — the training-data pipeline's
    final step (write the curated corpus as N shards of ~equal token
    count, in stable doc order) — computed with a DISTRIBUTED PREFIX
    SUM instead of the naive global cumsum window, which plans as a
    single-partition WindowExec and serializes the whole corpus
    through one task.

    Two-phase prefix sum (the textbook block-scan): docs are bucketed
    by contiguous doc_id range (bucket = doc_id·B/(max_id+1) — pure
    arithmetic, no sort), phase 1 aggregates per-bucket token totals
    (B rows), phase 2 turns those into exclusive bucket offsets with a
    B-row window (trivially small) and each bucket computes its
    interior cumsum under ``partitionBy(bucket)`` — parallel across
    buckets, exact, and bit-identical to the oracle's serial cumsum.
    shard_id = exclusive-prefix // ceil(total/N) in bigint arithmetic;
    a doc straddling a boundary lands in the shard its FIRST token
    falls in (the exclusive-prefix convention, same on both engines).
    At 100 TB: B scales with the cluster (one bucket per task), the
    only non-scan work is two bounded aggregations, and the emitted
    (shard → doc-range) map is exactly what a writer needs to produce
    contiguous, resumable shards.
    """
    from osmart_etl_spark.ops.packing import assign_token_shards
    from osmart_etl_spark.ops.text import token_count

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).cast("bigint").alias("tokens")
    )
    assigned = assign_token_shards(
        docs, "doc_id", "tokens", n_shards=_SP_SHARDS, n_buckets=_SP_BUCKETS
    )
    return (
        assigned.select("shard_id", "doc_id", "tokens")
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tokens").cast("bigint").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@query(
    "event_value_decile_distributed",
    oracle="""
    SELECT decile,
      CAST(COUNT(*) AS BIGINT) AS n,
      CAST(MIN(value) AS DOUBLE) AS lo,
      CAST(MAX(value) AS DOUBLE) AS hi
    FROM (
      SELECT value,
        CAST(NTILE(10) OVER (ORDER BY value ASC, event_id ASC) AS BIGINT) AS decile
      FROM events
    )
    GROUP BY decile
    """,
    tags=("scale-tech", "W7", "distributed-rank"),
)
def event_value_decile_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global deciles of the event-value distribution, computed
    by ``ops/windows.distributed_ntile`` — the two-phase
    range-partition + prefix-count ranking — so the driver's oracle
    gate verifies the DISTRIBUTED form of NTILE against the window
    function itself, over the full fact table (not just the unit test's
    synthetic shapes). Summarized per decile (count + value bounds) so
    the output is bounded while every row's bucket assignment still
    feeds the hash through the per-decile MIN/MAX/COUNT.

    Scale shape: one range exchange of events (parallel slices sorted
    independently), a <= n_parts-row prefix-count aggregate, and a
    map-side-combinable decile roll-up. NO single-partition sort at any
    volume — the shape ``rfm_segmentation`` dispatches to beyond its
    threshold, here unconditional and driver-verified. event_id breaks
    value ties so the total order (and hence every bucket) is unique
    on both engines.
    """
    from osmart_etl_spark.ops.partitioning import scaled_partitions
    from osmart_etl_spark.ops.windows import distributed_ntile

    ev = read_table(spark, sf_dir, "events").select("event_id", "value")
    ranked = distributed_ntile(
        ev,
        [F.col("value").asc(), F.col("event_id").asc()],
        10,
        "decile",
        n_parts=scaled_partitions(ev, floor_mult=0, min_parts=8),
    )
    return ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"),
        dbl(F.min("value")).alias("lo"),
        dbl(F.max("value")).alias("hi"),
    )
