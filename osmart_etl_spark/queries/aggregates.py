"""Aggregation, reshaping, set-op and top-k queries (SURVEY.md §2.4,
§2.6, §2.7) plus the free-from-Spark extras (distinct aggs, rollup/cube,
intersect/except — SURVEY §2.4 note)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osmart_etl_spark.io.sources import read_table
from osmart_etl_spark.queries.base import dbl, dec, query


@query(
    "daily_net_agg",
    oracle="""
    SELECT user_id, CAST(ts AS DATE) AS event_date,
      CAST(SUM(CASE WHEN event_type = 'error'
               THEN CAST(value AS DECIMAL(18,2)) * -1
               ELSE CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS net_value,
      COUNT(*) AS n_events
    FROM events
    GROUP BY user_id, CAST(ts AS DATE)
    """,
    tags=("A3", "T4"),
)
def daily_net_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily net per key (A3) — the reference collapses intraday events
    to one net delta per SKU-day (seed_stock_points.py:88-91). Classic
    partial+final hash aggregate; equivalently a 1-day tumbling window
    (T4). Shuffle carries only (key, day) partials.
    """
    ev = read_table(spark, sf_dir, "events")
    signed = F.when(
        F.col("event_type") == "error", dec(F.col("value")) * -1
    ).otherwise(dec(F.col("value")))
    return ev.groupBy("user_id", F.to_date("ts").alias("event_date")).agg(
        dbl(F.sum(signed)).alias("net_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "watermark_discovery",
    oracle="""
    SELECT MAX(ts) AS last_raw_ts, MAX(event_id) AS last_event_id, COUNT(*) AS n_rows
    FROM events
    """,
    tags=("A4", "S11"),
)
def watermark_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar MAX watermark discovery (A4) — ``SELECT MAX(fecha) FROM
    raw_stock_movements`` (sql/get_max_raw_ts.sql:1). Parquet column
    stats make this near-free: max() over footer min/max, no full scan
    at scale when stats are exact.
    """
    ev = read_table(spark, sf_dir, "events")
    return ev.agg(
        F.max("ts").alias("last_raw_ts"),
        F.max("event_id").alias("last_event_id"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "multi_stat_profile",
    oracle="""
    SELECT user_id,
      CAST(MIN(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_value,
      CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_value,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS DOUBLE) AS avg_value,
      COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
    tags=("A6", "A7"),
)
def multi_stat_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-stat per-group profile (A6) — the reference's offender
    report ``agg(['min','max','count'])`` (seed_stock_points.py:146-148).
    avg computed as exact-decimal sum / count so both engines emit the
    same double (plain AVG over doubles is order-dependent).
    """
    ev = read_table(spark, sf_dir, "events")
    v = dec(F.col("value"))
    return ev.groupBy("user_id").agg(
        dbl(F.min(v)).alias("min_value"),
        dbl(F.max(v)).alias("max_value"),
        dbl(F.sum(v)).alias("sum_value"),
        (dbl(F.sum(v)) / F.count(F.col("value"))).alias("avg_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "distinct_aggregates",
    oracle="""
    SELECT event_type,
      COUNT(DISTINCT user_id) AS n_users,
      COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
      COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
    tags=("extras-distinct",),
)
def distinct_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — absent from the reference, free from Spark
    (SURVEY §2.4 note). Spark plans distinct aggs with an expand +
    two-phase agg; still one logical shuffle per distinct key set.
    """
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(F.to_date("ts")).alias("n_days"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "rollup_revenue",
    oracle="""
    SELECT r.r_name AS region_name, o.o_orderstatus AS order_status,
      CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, o.o_orderstatus)
    """,
    tags=("extras-rollup",),
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals — free-from-Spark extra. NULL-filled
    grouping columns match ANSI ROLLUP semantics in both engines.
    """
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    joined = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select(F.col("r_name").alias("region_name"), F.col("o_orderstatus").alias("order_status"), "o_totalprice")
    )
    return joined.rollup("region_name", "order_status").agg(
        dbl(F.sum(dec(F.col("o_totalprice")))).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
    tags=("O1", "O3"),
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT top-k (O1/O3) — Spark plans TakeOrderedAndProject
    (per-partition heap + driver merge of k rows, no global sort).
    o_orderkey tiebreaker makes the k-th row deterministic (W6 rule).
    """
    o = read_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .limit(25)
    )


@query(
    "dedup_by_key",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    tags=("U5",),
)
def dedup_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key dedup (U5, dq_exclusions_csv.py:46-49). Projected to
    exactly the key so dropDuplicates is deterministic (on wider rows the
    survivor must be pinned with earliest_per_group instead).
    """
    ev = read_table(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").dropDuplicates(["user_id", "event_type"])


@query(
    "keyset_union_difference",
    oracle="""
    SELECT user_id, 'both' AS presence FROM (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
      INTERSECT
      SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
    )
    UNION ALL
    SELECT user_id, 'purchase_only' AS presence FROM (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
      EXCEPT
      SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
    )
    """,
    tags=("U4", "extras-setops"),
)
def keyset_union_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-set algebra (U4 — movement SKUs ∪ prior SKUs, index.difference
    in update_stock_points.py:166-168) via intersect/except.
    """
    ev = read_table(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    err = ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    both = purch.intersect(err).select("user_id", F.lit("both").alias("presence"))
    only = purch.exceptAll(err).select("user_id", F.lit("purchase_only").alias("presence"))
    return both.unionByName(only)


@query(
    "pivot_event_values",
    oracle="""
    SELECT user_id,
      CAST(SUM(CASE WHEN event_type = 'click'    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click,
      CAST(SUM(CASE WHEN event_type = 'error'    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS error,
      CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase,
      CAST(SUM(CASE WHEN event_type = 'signup'   THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS signup,
      CAST(SUM(CASE WHEN event_type = 'view'     THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view
    FROM events
    GROUP BY user_id
    """,
    tags=("U6",),
)
def pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot long→wide (U6, seed_stock_points.py:99-102). Explicit value
    list skips the distinct-discovery job and keeps the schema static —
    mandatory at scale and for streaming.
    """
    from osmart_etl_spark.ops.reshape import pivot_wide

    ev = read_table(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    wide = pivot_wide(
        ev.select("user_id", "event_type", dec(F.col("value")).alias("v")),
        index=["user_id"], pivot_col="event_type", value_col="v", values=kinds,
    )
    return wide.select("user_id", *[dbl(F.col(k)).alias(k) for k in kinds])


@query(
    "unpivot_stats",
    oracle="""
    WITH wide AS (
      SELECT user_id,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_total,
        CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS click_total
      FROM events GROUP BY user_id
    )
    SELECT user_id, 'purchase_total' AS metric, purchase_total AS metric_value FROM wide
    UNION ALL
    SELECT user_id, 'click_total' AS metric, click_total AS metric_value FROM wide
    """,
    tags=("U7",),
)
def unpivot_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot wide→long (U7, seed_stock_points.py:124-127 stack())."""
    from osmart_etl_spark.ops.reshape import unpivot_long

    ev = read_table(spark, sf_dir, "events")
    zero = F.lit(0).cast("decimal(18,2)")
    wide = ev.groupBy("user_id").agg(
        dbl(F.sum(F.when(F.col("event_type") == "purchase", dec(F.col("value"))).otherwise(zero))).alias("purchase_total"),
        dbl(F.sum(F.when(F.col("event_type") == "click", dec(F.col("value"))).otherwise(zero))).alias("click_total"),
    )
    return unpivot_long(
        wide, ids=["user_id"], value_cols=["purchase_total", "click_total"],
        var_name="metric", value_name="metric_value",
    )


@query(
    "json_props_extract",
    oracle="""
    SELECT event_id,
      CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
      CAST(json_extract_string(props, '$.missing') AS BIGINT) AS prop_missing
    FROM events
    """,
    tags=("extras-json",),
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction from the string ``props`` column
    (TESTDATA extension surface, SURVEY §1.2): get_json_object pushes the
    parse JVM-side; missing path → NULL in both engines.
    """
    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
        F.get_json_object("props", "$.missing").cast("bigint").alias("prop_missing"),
    )


@query(
    "upsert_keep_latest",
    oracle="""
    WITH staged AS (
      SELECT user_id, CAST(ts AS DATE) AS d, value, ts, 0 AS gen
      FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
      UNION ALL
      SELECT user_id, CAST(ts AS DATE) AS d, value, ts, 1 AS gen
      FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
    )
    SELECT user_id, d, value AS latest_value, ts AS latest_ts
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id, d ORDER BY ts DESC, gen DESC
      ) AS rn
      FROM staged
    ) t WHERE rn = 1
    """,
    tags=("S7", "S8"),
)
def upsert_keep_latest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest-per-key upsert semantics (S7/S8) as a pure transform —
    the engine's ON DUPLICATE KEY UPDATE analogue (db_helpers.py:25-40),
    here merging an 'old' and 'new' generation of per-(user, day) state
    through io/sinks.upsert_keep_latest. New generation out-ranks old on
    order ties, exactly like the reference's upsert overwrite.
    """
    from osmart_etl_spark.io.sinks import upsert_keep_latest

    ev = read_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp")
    cols = ["user_id", F.to_date("ts").alias("d"), "value", "ts"]
    old = ev.filter(F.col("ts") < cutoff).select(*cols)
    new = ev.filter(F.col("ts") >= cutoff).select(*cols)
    merged = upsert_keep_latest(old, new, keys=["user_id", "d"], order_col="ts")
    return merged.select(
        "user_id", "d",
        F.col("value").alias("latest_value"),
        F.col("ts").alias("latest_ts"),
    )


@query(
    "exact_percentiles",
    oracle="""
    SELECT event_type,
      quantile_cont(value, 0.5) AS p50,
      quantile_cont(value, 0.9) AS p90,
      quantile_cont(value, 0.99) AS p99,
      COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
    tags=("extras-percentile",),
)
def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group — Spark's ``percentile``
    and DuckDB's ``quantile_cont`` share the linear-interpolation-at-
    rank-p(n-1) definition, so results are bit-comparable. (The
    approximate path — percentile_approx / t-digest — is in
    ``approx_sketches`` with a rows-only check: sketches differ across
    engines by design.)
    """
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.expr("percentile(value, 0.99)").alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "approx_sketches",
    oracle="""
    SELECT event_type,
      COUNT(DISTINCT user_id) AS n_distinct_users,
      TRUE AS approx_users_ok,
      TRUE AS p50_ok,
      COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
    tags=("extras-approx",),
)
def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates — HyperLogLog distinct counts and KLL-style
    quantile sketches (free from Spark; absent from the reference).

    Sketch estimates legitimately differ across engines, so the raw
    estimates can't hash-match a DuckDB oracle. The verification contract
    instead: output the EXACT stats (which both engines agree on
    bit-for-bit) plus booleans asserting each sketch lies within its
    documented error bound — ``approx_count_distinct`` default rsd=0.05,
    checked at 3σ (±15%); ``percentile_approx(…, 1000)`` guarantees rank
    error ≤ n/1000, checked against exact quantiles at 0.5 ± 0.02. The
    oracle emits TRUE literals, so a sketch drifting out of bound becomes
    a value-hash mismatch, not silence. Both sketches are merge-
    commutative, hence deterministic under any partitioning.

    The exact-percentile audit runs only on a deterministic hash-gated
    subset of groups (crc32(key) % 4 == residue): the sketch is the
    product, the exact sort-based quantile is the *auditor*, and at
    100 TB you sample the audit — full exact quantiles would cost more
    than the sketches they certify. The residue is the rotation knob: a
    scheduler passes its run counter via
    ``spark.conf.set("spark.osmart.audit.residue", run_no % 4)`` so
    four consecutive runs cover every group; unsampled groups are
    vacuously ok. The registered parity run pins the default residue 0
    (the oracle hard-codes the same), auditing that fixed deterministic
    quarter of groups. The exact distinct count stays global because it
    is a deliverable column, not an audit.
    """
    ev = read_table(spark, sf_dir, "events")
    residue = int(spark.conf.get("spark.osmart.audit.residue", "0")) % 4
    sampled = f"crc32(cast(event_type as string)) % 4 = {residue}"
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_distinct_users"),
        F.approx_count_distinct("user_id").alias("__approx_users"),
        F.expr("percentile_approx(value, 0.5, 1000)").alias("__p50_approx"),
        F.expr(f"percentile(value, 0.48) FILTER (WHERE {sampled})").alias("__p50_lo"),
        F.expr(f"percentile(value, 0.52) FILTER (WHERE {sampled})").alias("__p50_hi"),
        F.count(F.lit(1)).alias("n"),
    )
    return agg.select(
        "event_type",
        "n_distinct_users",
        (
            F.abs(F.col("__approx_users") - F.col("n_distinct_users"))
            <= F.ceil(F.lit(0.15) * F.col("n_distinct_users"))
        ).alias("approx_users_ok"),
        # Rank-space guard: percentile_approx's accuracy=1000 bound is on
        # RANKS, so for tiny groups (n < ~28) or widely-gapped medians a
        # CORRECT sketch datum can fall outside the interpolated 0.48/0.52
        # value band — small groups are vacuously ok rather than a
        # deterministic false failure at other scale factors.
        (
            F.col("__p50_lo").isNull()  # group not in this run's audit sample
            | (F.col("n") < 28)
            | (
                (F.col("__p50_approx") >= F.col("__p50_lo"))
                & (F.col("__p50_approx") <= F.col("__p50_hi"))
            )
        ).alias("p50_ok"),
        "n",
    )


@query(
    "cube_engagement",
    oracle="""
    SELECT event_type, CAST(ts AS DATE) AS event_date,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    WHERE ts < TIMESTAMP '2024-01-08 00:00:00'
    GROUP BY CUBE (event_type, CAST(ts AS DATE))
    """,
    tags=("extras-cube",),
)
def cube_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (type, day) — all four grouping-set combinations in one
    pass (Expand + single shuffle), free from Spark (SURVEY §2.4 note).
    """
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-08 00:00:00").cast("timestamp")
    )
    return (
        ev.select("event_type", F.to_date("ts").alias("event_date"), "value")
        .cube("event_type", "event_date")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dbl(F.sum(dec(F.col("value")))).alias("total_value"),
        )
    )


@query(
    "salted_skew_agg",
    oracle="""
    SELECT user_id,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
      COUNT(*) AS n
    FROM events
    GROUP BY user_id
    """,
    tags=("scale-skew", "A3"),
)
def salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof salted two-phase aggregation (ops/skew.salted_sum_count)
    — identical results to a plain groupBy (the oracle IS the plain
    GROUP BY), but the hot key's rows spread over 16 salt buckets before
    the merge: no straggler partition at 100 TB. Decimal sums keep the
    two-phase merge exact.
    """
    from osmart_etl_spark.ops.skew import salted_sum_count

    ev = read_table(spark, sf_dir, "events")
    out = salted_sum_count(
        ev, ["user_id"], dec(F.col("value")), n_salts=16,
        value_alias="total_dec", count_alias="n", salt_from=["event_id"],
    )
    return out.select("user_id", dbl(F.col("total_dec")).alias("total"), "n")


@query(
    "rollup_with_grouping_id",
    oracle="""
    SELECT event_type, CAST(ts AS DATE) AS event_date,
      CAST(GROUPING(event_type) AS BIGINT) AS g_type,
      CAST(GROUPING(CAST(ts AS DATE)) AS BIGINT) AS g_date,
      COUNT(*) AS n
    FROM events
    WHERE ts < TIMESTAMP '2024-01-05 00:00:00'
    GROUP BY ROLLUP (event_type, CAST(ts AS DATE))
    """,
    tags=("extras-grouping-id",),
)
def rollup_with_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP + GROUPING() markers — disambiguates a NULL that IS a
    group value from the NULL a rollup superaggregate fills in; without
    the marker, rollup outputs over nullable group columns are
    ambiguous."""
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-05 00:00:00").cast("timestamp")
    )
    return (
        ev.select("event_type", F.to_date("ts").alias("event_date"))
        .rollup("event_type", "event_date")
        .agg(
            F.grouping("event_type").cast("bigint").alias("g_type"),
            F.grouping("event_date").cast("bigint").alias("g_date"),
            F.count(F.lit(1)).alias("n"),
        )
    )


_CMS_D, _CMS_W = 4, 64


@query(
    "cms_heavy_hitters",
    oracle=f"""
    WITH sketch AS (
      SELECT j, CAST(('0x' || substr(md5('cms' || CAST(j AS VARCHAR) || ':'
                     || CAST(user_id AS VARCHAR)), 1, 7))::BIGINT % {_CMS_W} AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events CROSS JOIN (SELECT UNNEST(generate_series(0, {_CMS_D - 1})) AS j) js
      GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events),
    exact AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_n
      FROM events GROUP BY user_id
      ORDER BY exact_n DESC, user_id ASC LIMIT 20
    ),
    est AS (
      SELECT e.user_id, e.exact_n, MIN(s.cnt) AS cms_est
      FROM exact e
      JOIN sketch s
        ON s.bucket = ('0x' || substr(md5('cms' || CAST(s.j AS VARCHAR) || ':'
                       || CAST(e.user_id AS VARCHAR)), 1, 7))::BIGINT % {_CMS_W}
      GROUP BY e.user_id, e.exact_n
    )
    SELECT user_id, exact_n, cms_est,
      cms_est >= exact_n AS no_undercount,
      cms_est <= exact_n + 4 * ((SELECT n FROM tot) // {_CMS_W}) AS bound_ok
    FROM est
    """,
    tags=("sketch", "cms", "scale-shape"),
)
def cms_heavy_hitters(spark, sf_dir):
    """Count-min sketch (Cormode-Muthukrishnan '05) built relationally,
    with its guarantee VERIFIED: a 4×64 counter grid over user event
    counts, point-queried for the 20 exact heaviest users.
    `no_undercount` (CMS never underestimates) must be TRUE by
    construction; `bound_ok` checks the ε-overcount bound with 4×N/w
    slack. Hashing is md5-derived on both engines, so sketch, probes,
    and booleans are bit-identical — the same verifiable-sketch
    contract as approx_sketches, but for a sketch Spark doesn't ship.

    Scale shape: the sketch build is ONE groupBy over a 4×-exploded
    scan that map-side-combines to ≤ d·w rows per partition — the
    whole sketch is 256 counters regardless of input size (this is the
    point of CMS: mergeable, bounded memory, one shuffle of ≤ d·w
    rows per partition). The probe side is a broadcast of 20 rows.
    """
    ev = read_table(spark, sf_dir, "events")

    def bucket(j, col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"cms{j}:"), col.cast("string"))), 1, 7
                ),
                16,
                10,
            ).cast("bigint")
            % _CMS_W
        )

    rows = ev.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        bucket(j, F.col("user_id")).alias("bucket"),
                    )
                    for j in range(_CMS_D)
                ]
            )
        ).alias("__s")
    ).select("__s.j", "__s.bucket")
    sketch = rows.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("cnt"))

    tot = ev.agg(F.count(F.lit(1)).alias("n"))
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("user_id").asc())
        .limit(20)
    )
    probes = exact.select(
        "user_id",
        "exact_n",
        *[bucket(j, F.col("user_id")).alias(f"b{j}") for j in range(_CMS_D)],
    )
    from functools import reduce

    probe_hit = reduce(
        lambda a, b: a | b,
        [
            (F.col("j") == j) & (F.col("bucket") == F.col(f"b{j}"))
            for j in range(_CMS_D)
        ],
    )
    joined = sketch.join(F.broadcast(probes), probe_hit)
    est = joined.groupBy("user_id", "exact_n").agg(F.min("cnt").alias("cms_est"))
    return est.crossJoin(F.broadcast(tot)).select(
        "user_id",
        "exact_n",
        "cms_est",
        (F.col("cms_est") >= F.col("exact_n")).alias("no_undercount"),
        (
            F.col("cms_est")
            <= F.col("exact_n") + 4 * (F.col("n") / F.lit(_CMS_W)).cast("bigint")
        ).alias("bound_ok"),
    )


@query(
    "equidepth_histogram",
    oracle="""
    WITH base AS (
      SELECT CAST(value AS DOUBLE) AS v FROM events WHERE value IS NOT NULL
    ),
    ranked AS (
      SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS r,
             COUNT(*) OVER () AS n
      FROM base
    ),
    cuts AS (
      SELECT
        MAX(CASE WHEN r = CAST(CEIL(0.1 * n) AS BIGINT) THEN v END) AS c1,
        MAX(CASE WHEN r = CAST(CEIL(0.2 * n) AS BIGINT) THEN v END) AS c2,
        MAX(CASE WHEN r = CAST(CEIL(0.3 * n) AS BIGINT) THEN v END) AS c3,
        MAX(CASE WHEN r = CAST(CEIL(0.4 * n) AS BIGINT) THEN v END) AS c4,
        MAX(CASE WHEN r = CAST(CEIL(0.5 * n) AS BIGINT) THEN v END) AS c5,
        MAX(CASE WHEN r = CAST(CEIL(0.6 * n) AS BIGINT) THEN v END) AS c6,
        MAX(CASE WHEN r = CAST(CEIL(0.7 * n) AS BIGINT) THEN v END) AS c7,
        MAX(CASE WHEN r = CAST(CEIL(0.8 * n) AS BIGINT) THEN v END) AS c8,
        MAX(CASE WHEN r = CAST(CEIL(0.9 * n) AS BIGINT) THEN v END) AS c9
      FROM ranked
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(v) AS lo, MAX(v) AS hi
    FROM (
      SELECT v,
        CAST(CASE
          WHEN v <= c1 THEN 0 WHEN v <= c2 THEN 1 WHEN v <= c3 THEN 2
          WHEN v <= c4 THEN 3 WHEN v <= c5 THEN 4 WHEN v <= c6 THEN 5
          WHEN v <= c7 THEN 6 WHEN v <= c8 THEN 7 WHEN v <= c9 THEN 8
          ELSE 9 END AS BIGINT) AS bucket
      FROM base, cuts
    )
    GROUP BY bucket
    """,
    tags=("extras-histogram", "scale-shape"),
)
def equidepth_histogram(spark, sf_dir):
    """Equi-depth (equal-count) histogram of event values, 10 buckets —
    the data profile a query optimizer or drift monitor wants (the
    equi-WIDTH sibling is ``value_histogram``). Cut points are decile
    order statistics; rows land in the first bucket whose cut they do
    not exceed, so ties share a bucket (counts are only approximately
    n/10 under heavy ties — the standard equi-depth caveat).

    Scale shape: one 1-row percentile_approx pass for all nine cuts
    (exact regime ⇒ the oracle's explicit ceil(p·n) rank rule), the cut
    row broadcast back, then one map-side-combined groupBy over 10
    bucket keys. No window over the data, no global sort. Same contract
    as rfm_segmentation_scalable / dq_outliers_iqr.
    """
    ev = read_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    base = ev.select(F.col("value").cast("double").alias("v"))
    ps = F.array(*[F.lit(i / 10.0) for i in range(1, 10)])
    cuts = base.agg(F.percentile_approx("v", ps, F.lit(10_000_000)).alias("c"))
    bucket = F.lit(9)
    for i in range(8, -1, -1):
        bucket = F.when(F.col("v") <= F.col("c")[i], F.lit(i)).otherwise(bucket)
    return (
        base.crossJoin(F.broadcast(cuts))
        .select("v", bucket.cast("bigint").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
    )


@query(
    "json_struct_roundtrip",
    oracle="""
    SELECT event_id,
      CAST(json_extract(props, '$.k') AS BIGINT) AS k_typed,
      '{"doubled":' || CAST(2 * CAST(json_extract(props, '$.k') AS BIGINT) AS VARCHAR)
        || ',"type":"' || event_type || '"}' AS rebuilt_json,
      json_extract(props, '$.k') IS NOT NULL AS is_valid,
      NOT json_valid('{broken') AS detects_broken
    FROM events
    """,
    tags=("extras-json", "struct-roundtrip"),
)
def json_struct_roundtrip(spark, sf_dir):
    """Typed JSON round-trip (§2.8 JSON family beyond path extraction):
    ``from_json`` parses ``props`` into a typed struct (schema-on-read,
    not string plucking), the struct computes, and ``to_json`` re-emits
    a canonical document; plus validity probes via try-parse. The
    oracle rebuilds the same document with string algebra from the
    typed value, so field order, quoting, and numeric formatting of
    to_json are all pinned cross-engine. One scan, zero shuffle; the
    parse runs once per row JVM-side and feeds every downstream column.
    """
    ev = read_table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k BIGINT")
    rebuilt = F.to_json(
        F.struct(
            (2 * parsed["k"]).alias("doubled"), F.col("event_type").alias("type")
        )
    )
    return ev.select(
        "event_id",
        parsed["k"].alias("k_typed"),
        rebuilt.alias("rebuilt_json"),
        # PERMISSIVE from_json yields a struct of NULL fields for broken
        # documents (never a NULL struct) — validity is read field-level
        parsed["k"].isNotNull().alias("is_valid"),
        F.from_json(F.lit("{broken"), "k BIGINT")["k"].isNull().alias("detects_broken"),
    )


@query(
    "setops_multiset",
    oracle="""
    SELECT user_id, 'surplus_purchase' AS side FROM (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      EXCEPT ALL
      SELECT user_id FROM events WHERE event_type = 'click'
    )
    UNION ALL
    SELECT user_id, 'matched_pair' AS side FROM (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      INTERSECT ALL
      SELECT user_id FROM events WHERE event_type = 'click'
    )
    """,
    tags=("extras-setops", "multiset"),
)
def setops_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL / INTERSECT ALL — the MULTISET set-ops the distinct
    variants (keyset_union_difference) don't cover: per user, surplus
    purchase events beyond click count, and min(purchases, clicks)
    matched pairs. Bag semantics matter for event-count reconciliation
    (a user with 3 purchases and 1 click contributes 2 surplus + 1
    matched). Both engines implement ANSI multiset semantics; Spark
    plans them as a single count-aggregate + generate, one shuffle
    each.
    """
    ev = read_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("user_id")
    c = ev.filter(F.col("event_type") == "click").select("user_id")
    surplus = p.exceptAll(c).withColumn("side", F.lit("surplus_purchase"))
    matched = p.intersectAll(c).withColumn("side", F.lit("matched_pair"))
    return surplus.unionByName(matched)


@query(
    "cube_revenue",
    oracle="""
    SELECT r.r_name AS region_name, o.o_orderstatus AS order_status,
      CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(GROUPING(r.r_name) * 2 + GROUPING(o.o_orderstatus) AS BIGINT) AS gid
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY CUBE (r.r_name, o.o_orderstatus)
    """,
    tags=("extras-cube",),
)
def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all 2^k grouping combinations in one pass (rollup's
    hierarchy-free sibling); GROUPING() bits disambiguate a NULL data
    value from a NULL subtotal placeholder, pinned as an explicit gid
    so cross-engine placeholder semantics are hash-checked. Spark plans
    one Expand (4× row multiplier for k=2) + one aggregate — the
    multiplier, not an extra shuffle, is the scale cost of cube."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    joined = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select(
            F.col("r_name").alias("region_name"),
            F.col("o_orderstatus").alias("order_status"),
            "o_totalprice",
        )
    )
    return joined.cube("region_name", "order_status").agg(
        dbl(F.sum(dec(F.col("o_totalprice")))).alias("revenue"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        (F.grouping("region_name") * 2 + F.grouping("order_status"))
        .cast("bigint")
        .alias("gid"),
    )


@query(
    "grouping_sets_engagement",
    oracle="""
    SELECT event_type, CAST(ts AS DATE) AS event_date,
      CAST(GROUPING(event_type) AS BIGINT) AS g_type,
      CAST(GROUPING(CAST(ts AS DATE)) AS BIGINT) AS g_date,
      CAST(COUNT(*) AS BIGINT) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS net_value
    FROM events
    WHERE ts < TIMESTAMP '2024-01-08 00:00:00'
    GROUP BY GROUPING SETS ((event_type, CAST(ts AS DATE)),
                            (event_type), (CAST(ts AS DATE)))
    """,
    tags=("extras-grouping-sets",),
)
def grouping_sets_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the arbitrary-set sibling of ROLLUP/CUBE
    (this set list has both one-dimension margins but NO grand total,
    which neither rollup nor cube can express). Spark expands the sets
    into one Expand node feeding a single hash aggregate — one shuffle
    for all three groupings, not three scans; GROUPING() bits
    disambiguate margin NULLs exactly as in rollup_with_grouping_id."""
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-08 00:00:00").cast("timestamp")
    )
    d = ev.select("event_type", F.to_date("ts").alias("event_date"), "value")
    return d.groupingSets(
        [["event_type", "event_date"], ["event_type"], ["event_date"]],
        "event_type",
        "event_date",
    ).agg(
        F.grouping("event_type").cast("bigint").alias("g_type"),
        F.grouping("event_date").cast("bigint").alias("g_date"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        dbl(F.sum(dec(F.col("value")))).alias("net_value"),
    )


@query(
    "latest_via_struct_max",
    oracle="""
    SELECT user_id, ts AS last_ts, event_id AS last_event_id,
           event_type AS last_type, value AS last_value
    FROM (
      SELECT user_id, ts, event_id, event_type, value,
        ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC
        ) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("extras-struct-max", "W1-alternative"),
)
def latest_via_struct_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-per-key WITHOUT a window: max(struct(ts, event_id,
    payload...)) — struct comparison is lexicographic, so the max
    carries the whole winning row out of an ordinary hash aggregate.
    Identical result to the ROW_NUMBER()=1 idiom (the oracle IS that
    idiom), but the plan is a partial+final aggregate: map-side combine
    shrinks every partition to one row per key BEFORE the exchange, no
    per-partition sort, no full-row shuffle — at 10^9 keys x 10^4
    events each, the window form shuffles every event while this moves
    one row per key per partition. The tiebreaker rides INSIDE the
    struct (event_id after ts), preserving W6 determinism. The same
    trick under MERGE keep-latest: io/sinks.upsert_keep_latest."""
    ev = read_table(spark, sf_dir, "events")
    s = F.max(F.struct("ts", "event_id", "event_type", "value")).alias("__top")
    return (
        ev.groupBy("user_id")
        .agg(s)
        .select(
            "user_id",
            F.col("__top.ts").alias("last_ts"),
            F.col("__top.event_id").alias("last_event_id"),
            F.col("__top.event_type").alias("last_type"),
            F.col("__top.value").alias("last_value"),
        )
    )


@query(
    "correlation_exact",
    oracle="""
    WITH m AS (
      SELECT event_type,
        CAST(COUNT(*) AS DOUBLE) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(EXTRACT(HOUR FROM ts) AS BIGINT)) AS DOUBLE) AS sy,
        CAST(SUM(CAST(value AS DECIMAL(18,2))
                 * CAST(EXTRACT(HOUR FROM ts) AS BIGINT)) AS DOUBLE) AS sxy,
        CAST(SUM(CAST(value AS DECIMAL(18,2))
                 * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx2,
        CAST(SUM(CAST(EXTRACT(HOUR FROM ts) AS BIGINT)
                 * CAST(EXTRACT(HOUR FROM ts) AS BIGINT)) AS DOUBLE) AS sy2
      FROM events GROUP BY event_type
    )
    SELECT event_type,
      CAST(n AS BIGINT) AS n,
      ((n * sxy) - (sx * sy))
        / (sqrt((n * sx2) - (sx * sx)) * sqrt((n * sy2) - (sy * sy)))
        AS corr_value_hour
    FROM m
    """,
    tags=("extras-statistics", "exact-moments"),
)
def correlation_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation (value vs hour-of-day, per event type) with
    the float-safety discipline applied to SECOND-order moments: the
    five sums are EXACT decimals/bigints (value has 2 decimal digits,
    so value² is exact at scale 4 — no rounding anywhere in the
    reduction, hence associativity-free and partition-order-free), and
    the textbook formula is evaluated ONCE in double over those exact
    scalars. sqrt is IEEE correctly-rounded, so both engines produce
    identical bits — the built-in corr() cannot promise that (its
    double running sums are partition-order-dependent). One map-side-
    combinable aggregate, one tiny exchange."""
    ev = read_table(spark, sf_dir, "events")
    x = dec(F.col("value"))
    y = F.hour("ts").cast("bigint")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * y).alias("__sxy"),
        F.sum(x * x).alias("__sx2"),
        F.sum(y * y).alias("__sy2"),
    )
    n, sx, sy = dbl(F.col("__n")), dbl(F.col("__sx")), dbl(F.col("__sy"))
    sxy, sx2, sy2 = dbl(F.col("__sxy")), dbl(F.col("__sx2")), dbl(F.col("__sy2"))
    corr = ((n * sxy) - (sx * sy)) / (
        F.sqrt((n * sx2) - (sx * sx)) * F.sqrt((n * sy2) - (sy * sy))
    )
    return m.select(
        "event_type",
        F.col("__n").cast("bigint").alias("n"),
        corr.alias("corr_value_hour"),
    )


_ALLOC_BUDGET = 10000


@query(
    "proportional_allocation",
    oracle=f"""
    WITH rev AS (
      SELECT n.n_name,
        SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS r
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name
    ),
    tot AS (SELECT SUM(r) AS t, COUNT(*) AS groups FROM rev),
    quota AS (
      SELECT n_name, r,
        CAST(FLOOR(r * {_ALLOC_BUDGET} / t) AS BIGINT) AS base,
        (r * {_ALLOC_BUDGET} / t) - FLOOR(r * {_ALLOC_BUDGET} / t) AS frac
      FROM rev, tot
    ),
    ranked AS (
      SELECT n_name, base, frac,
        ROW_NUMBER() OVER (ORDER BY frac DESC, n_name ASC) AS rk,
        {_ALLOC_BUDGET} - SUM(base) OVER () AS shortfall
      FROM quota
    )
    SELECT n_name,
      CAST(base + CASE WHEN rk <= shortfall THEN 1 ELSE 0 END AS BIGINT)
        AS allocated
    FROM ranked
    """,
    tags=("extras-allocation", "largest-remainder"),
)
def proportional_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) allocation: split an integer budget
    across groups proportionally to exact-decimal revenue so the parts
    SUM EXACTLY to the budget — the finance-ETL op naive rounding gets
    wrong (independent rounds can be off by several units). Quotas are
    decimal-exact (decimal*int/decimal division at fixed scale —
    identical in both engines); floor gives the base; the shortfall
    goes to the largest fractional remainders with a name tiebreaker
    (W6). The ranking window is over GROUPS (25 nations), not rows —
    the single-partition window is fine because its input is one row
    per group, the same post-aggregation smallness every 'rank the
    groups' query relies on."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(F.sum(dec(F.col("o_totalprice"))).alias("r"))
    )
    tot = rev.agg(F.sum("r").alias("t"))
    quota = rev.crossJoin(F.broadcast(tot)).select(
        "n_name",
        F.floor(F.col("r") * _ALLOC_BUDGET / F.col("t")).cast("bigint").alias("base"),
        (
            (F.col("r") * _ALLOC_BUDGET / F.col("t"))
            - F.floor(F.col("r") * _ALLOC_BUDGET / F.col("t"))
        ).alias("frac"),
    )
    from pyspark.sql import Window

    w_rank = Window.orderBy(F.col("frac").desc(), F.col("n_name").asc())
    w_all = Window.partitionBy()
    ranked = quota.select(
        "n_name",
        "base",
        F.row_number().over(w_rank).alias("rk"),
        (F.lit(_ALLOC_BUDGET) - F.sum("base").over(w_all)).alias("shortfall"),
    )
    return ranked.select(
        "n_name",
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("shortfall"), 1).otherwise(0)
        ).cast("bigint").alias("allocated"),
    )


@query(
    "cumulative_distinct_users",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY user_id
    ),
    per_day AS (
      SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS new_users
      FROM first_seen GROUP BY first_day
    )
    SELECT day, new_users,
      CAST(SUM(new_users) OVER (
        ORDER BY day ROWS UNBOUNDED PRECEDING
      ) AS BIGINT) AS total_unique_users
    FROM per_day
    """,
    tags=("extras-cumulative-distinct",),
)
def cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day — the rewrite that makes an
    inherently quadratic ask linear: COUNT(DISTINCT) OVER a growing
    frame re-deduplicates the entire prefix per day, but 'distinct
    users ever seen by day d' ≡ 'users whose FIRST event is ≤ d', so
    one MIN-per-user aggregate (map-side combinable) plus a running sum
    over the tiny per-day series gives the same numbers with one real
    shuffle. The final window runs over |days| rows — single-partition
    by construction, like every post-aggregation ranking."""
    ev = read_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    per_day = first_seen.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("new_users")
    )
    from pyspark.sql import Window

    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return per_day.select(
        "day",
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("total_unique_users"),
    )


@query(
    "yoy_revenue_delta",
    oracle="""
    WITH rev AS (
      SELECT n.n_name,
        CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS yr,
        SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS r
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name, CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT)
    )
    SELECT n_name, yr,
      CAST(r AS DOUBLE) AS revenue,
      CAST(r - LAG(r) OVER (PARTITION BY n_name ORDER BY yr) AS DOUBLE)
        AS yoy_delta,
      CAST(CAST(r - LAG(r) OVER (PARTITION BY n_name ORDER BY yr) AS DOUBLE)
           / CAST(LAG(r) OVER (PARTITION BY n_name ORDER BY yr) AS DOUBLE)
           AS DOUBLE) AS yoy_pct
    FROM rev
    """,
    tags=("extras-yoy",),
)
def yoy_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth per nation: aggregate once, then LAG over
    the per-(group, year) series — the standard periodic-comparison
    shape. The window input is |groups|x|years| rows (post-aggregation
    small), partitioned by group; gaps in the year series make LAG read
    the previous PRESENT year, which is the usual reporting intent.
    Delta arithmetic is exact decimal; only the final pct division
    happens in double (NULL for each group's first year — preserved,
    not zero-filled)."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name", F.year("o_orderdate").cast("bigint").alias("yr"))
        .agg(F.sum(dec(F.col("o_totalprice"))).alias("r"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("n_name").orderBy("yr")
    prev = F.lag("r").over(w)
    return rev.select(
        "n_name",
        "yr",
        dbl(F.col("r")).alias("revenue"),
        dbl(F.col("r") - prev).alias("yoy_delta"),
        (dbl(F.col("r") - prev) / dbl(prev)).alias("yoy_pct"),
    )


@query(
    "mode_per_group",
    oracle="""
    WITH counts AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY user_id, event_type
    ),
    ranked AS (
      SELECT user_id, event_type, n,
        ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY n DESC, event_type ASC
        ) AS rk
      FROM counts
    )
    SELECT user_id, event_type AS mode_type, n AS mode_count
    FROM ranked WHERE rk = 1
    """,
    tags=("extras-mode",),
)
def mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode (most frequent event type per user) with a
    deterministic tie rule (highest count, then lexicographically
    smallest type — built-in mode() has no tie contract, so it can't be
    oracle-checked). Implementation composes the struct-max trick on
    top of the count aggregate: max(struct(n, reversed-type-rank)) —
    here expressed as max_by with an explicit ordering struct via two
    map-side-combinable aggregates and NO window (the oracle uses the
    window idiom; same result, the aggregate form is the scale shape).
    The negative-count trick doesn't work for strings, so the ordering
    struct negates the COUNT and keeps the type ascending via min."""
    ev = read_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    # min(struct(-n, type)) == (highest n, then smallest type)
    top = counts.groupBy("user_id").agg(
        F.min(F.struct((-F.col("n")).alias("neg_n"), F.col("event_type"))).alias("__t")
    )
    return top.select(
        "user_id",
        F.col("__t.event_type").alias("mode_type"),
        (-F.col("__t.neg_n")).cast("bigint").alias("mode_count"),
    )


@query(
    "theil_sen_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type,
        CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
        SUM(CAST(value AS DECIMAL(18,2))) AS net
      FROM events GROUP BY event_type, CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
    ),
    slopes AS (
      SELECT a.event_type,
        (CAST(b.net AS DOUBLE) - CAST(a.net AS DOUBLE))
          / CAST(b.d - a.d AS DOUBLE) AS slope
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND b.d > a.d
    ),
    ranked AS (
      SELECT event_type, slope,
        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope) AS rk,
        COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM slopes
    )
    SELECT event_type,
      CAST(n AS BIGINT) AS n_slopes,
      slope AS trend_per_day
    FROM ranked WHERE rk = (n + 1) // 2
    """,
    tags=("extras-robust-stats", "theil-sen"),
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per event type: the MEDIAN of all
    pairwise slopes of the daily-net series — immune to ~29% outlier
    contamination where OLS is wrecked by one bad day. The pair space
    is per-GROUP over the daily aggregate (~30 points → ~435 slopes),
    so the quadratic step runs on post-aggregation data, never on raw
    events — the same aggregate-then-expensive-op layering as
    yoy_revenue_delta. Lower median by rank (no averaging of the two
    middle elements — keeps the value an actual observed slope and the
    selection purely ordinal); slope division is double over exact
    decimal nets with identical operand order both engines."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("d"),
    ).agg(F.sum(dec(F.col("value"))).alias("net"))
    a = daily.select(
        "event_type", F.col("d").alias("d1"), F.col("net").alias("n1")
    )
    b = daily.select(
        F.col("event_type").alias("et2"), F.col("d").alias("d2"), F.col("net").alias("n2")
    )
    slopes = (
        a.join(b, (F.col("event_type") == F.col("et2")) & (F.col("d2") > F.col("d1")))
        .select(
            "event_type",
            (
                (dbl(F.col("n2")) - dbl(F.col("n1")))
                / (F.col("d2") - F.col("d1")).cast("double")
            ).alias("slope"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("slope")
    wc = Window.partitionBy("event_type")
    ranked = slopes.select(
        "event_type",
        "slope",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    return ranked.filter(
        F.col("rk") == F.floor((F.col("n") + 1) / 2)
    ).select(
        "event_type",
        F.col("n").cast("bigint").alias("n_slopes"),
        F.col("slope").alias("trend_per_day"),
    )


@query(
    "revenue_share_two_level",
    oracle="""
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
        SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS r_nat
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY r.r_name, n.n_name
    )
    SELECT region, nation,
      CAST(r_nat AS DOUBLE) AS revenue,
      CAST(CAST(r_nat AS DOUBLE)
           / CAST(SUM(r_nat) OVER (PARTITION BY region) AS DOUBLE)
           AS DOUBLE) AS share_of_region,
      CAST(CAST(r_nat AS DOUBLE)
           / CAST(SUM(r_nat) OVER () AS DOUBLE) AS DOUBLE) AS share_of_total
    FROM rev
    """,
    tags=("extras-ratio-to-report",),
)
def revenue_share_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total at two hierarchy levels (ratio_to_report):
    each nation's share of its region and of the whole book, from ONE
    grouped aggregate — the window totals run over the ~25-row
    post-aggregation frame, so the 'global window' is a non-issue (the
    denominators are exact decimal sums of an already-tiny series,
    and both divisions happen once in double). The raw-fact version of
    this query is the classic accidental-global-window trap; aggregate
    FIRST, ratio SECOND is the rule."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(dec(F.col("o_totalprice"))).alias("r_nat"))
    )
    from pyspark.sql import Window

    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    return rev.select(
        "region",
        "nation",
        dbl(F.col("r_nat")).alias("revenue"),
        (dbl(F.col("r_nat")) / dbl(F.sum("r_nat").over(w_region))).alias(
            "share_of_region"
        ),
        (dbl(F.col("r_nat")) / dbl(F.sum("r_nat").over(w_all))).alias("share_of_total"),
    )


@query(
    "presence_bitmask_streaks",
    oracle="""
    WITH base AS (
      SELECT user_id,
        CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day_idx
      FROM events
      WHERE CAST(ts AS DATE) >= DATE '2024-01-01'
        AND CAST(ts AS DATE) < DATE '2024-01-31'
    ),
    mask AS (
      SELECT user_id,
        CAST(BIT_OR(1::BIGINT << day_idx) AS BIGINT) AS presence
      FROM base GROUP BY user_id
    )
    SELECT user_id, presence,
      CAST(BIT_COUNT(CAST(presence AS BIT)) AS BIGINT) AS n_active_days,
      ((presence & (presence << 1) & (presence << 2) & (presence << 3)
        & (presence << 4) & (presence << 5) & (presence << 6)) != 0)
        AS has_7day_streak
    FROM mask
    """,
    tags=("extras-bitmask", "streaks"),
)
def presence_bitmask_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar presence as a BITMASK: a user's 30-day activity
    pattern packed into one bigint (bit d = active on day d) by a
    BIT_OR aggregate — 8 bytes of state replacing up to 30 rows, the
    compact-engagement-state trick retention systems keep per user.
    Streak detection is then pure bit arithmetic, no window and no
    gaps-and-islands pass: AND-ing the mask with its first six shifts
    leaves a set bit exactly where seven consecutive days were active.
    Everything is exact integer ops (BIT_OR combines map-side;
    bit_count and shifts are codegen'd) — at 10^9 users this is one
    tiny-state aggregate, where the islands formulation shuffles and
    sorts every event. The islands pass (session_windows) is still the
    tool when streak LENGTHS are needed, not just threshold flags."""
    ev = read_table(spark, sf_dir, "events")
    d0 = F.lit("2024-01-01").cast("date")
    base = ev.filter(
        (F.to_date("ts") >= d0) & (F.to_date("ts") < F.lit("2024-01-31").cast("date"))
    ).select(
        "user_id", F.datediff(F.to_date("ts"), d0).cast("bigint").alias("day_idx")
    )
    # Python-API shiftleft takes only a literal bit count; the SQL
    # form accepts a column
    mask = base.groupBy("user_id").agg(
        F.bit_or(F.expr("shiftleft(cast(1 as bigint), cast(day_idx as int))"))
        .cast("bigint")
        .alias("presence")
    )
    p = F.col("presence")
    streak7 = p
    for k in range(1, 7):
        streak7 = streak7.bitwiseAND(F.shiftleft(p, k))
    return mask.select(
        "user_id",
        "presence",
        F.bit_count(p).cast("bigint").alias("n_active_days"),
        (streak7 != 0).alias("has_7day_streak"),
    )
