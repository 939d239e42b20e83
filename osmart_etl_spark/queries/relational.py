"""Relational operator queries (SURVEY.md §2.2 filters/projections,
§2.3 joins, §2.7 set ops, §2.8 scalar functions)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osmart_etl_spark.io.sources import read_table
from osmart_etl_spark.queries.base import dbl, dec, query


# ---------------------------------------------------------------------------
# Flagship — EP1 sales conditional aggregation (A1/A2, P4)
# ---------------------------------------------------------------------------

@query(
    "sales_payment_split",
    oracle="""
    SELECT
      user_id,
      CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2))
               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_total,
      CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2))
               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS click_total,
      CAST(SUM(CASE WHEN event_type NOT IN ('purchase', 'click')
               THEN CAST(value AS DECIMAL(18,2))
               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS other_total,
      MAX(ts) AS last_ts,
      COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
    tags=("A1", "A2", "P4"),
)
def sales_payment_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity conditional payment split — the reference's per-sale
    cash/card/other aggregation (extract_sicar_sales.sql:4-9) transposed
    to the events table. groupBy + SUM(CASE) compiles to a two-phase
    (partial/final) hash aggregate: map-side combine means the shuffle
    carries one row per (user, partition), not per event — the property
    that keeps this O(distinct keys) at 100 TB.
    """
    ev = read_table(spark, sf_dir, "events")
    zero = F.lit(0).cast("decimal(18,2)")
    v = dec(F.col("value"))
    return ev.groupBy("user_id").agg(
        dbl(F.sum(F.when(F.col("event_type") == "purchase", v).otherwise(zero))).alias("purchase_total"),
        dbl(F.sum(F.when(F.col("event_type") == "click", v).otherwise(zero))).alias("click_total"),
        dbl(F.sum(F.when(~F.col("event_type").isin("purchase", "click"), v).otherwise(zero))).alias("other_total"),
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Projections / filters / predicates (§2.2)
# ---------------------------------------------------------------------------

@query(
    "filter_range_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1996-01-01'
      AND l_quantity > 45
    """,
    tags=("P1", "P3"),
)
def filter_range_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range + comparison predicates with projection (P1/P3) — the
    watermark-style date window of every reference extract
    (extract_stock_movements.sql:33-37). Both the filter and the 5-column
    projection reach the parquet scan (PushedFilters/ReadSchema in
    explain) — at 100 TB this is the difference between scanning a year
    and scanning everything.
    """
    li = read_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_quantity") > 45)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")


@query(
    "case_sign_flip",
    oracle="""
    SELECT
      event_id,
      user_id,
      CASE WHEN event_type = 'error' THEN 'cancel' ELSE 'movement' END AS kind,
      CASE WHEN event_type = 'error' THEN value * -1 ELSE value END AS signed_value
    FROM events
    WHERE event_type IN ('purchase', 'error')
    """,
    tags=("P8", "P4"),
)
def case_sign_flip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE-based event labeling + sign flipping (P8) — cancellations
    negate quantity exactly as extract_stock_movements.sql:9-22 flips
    ``dt.cantidad * -1`` for movimiento='0'.
    """
    ev = read_table(spark, sf_dir, "events")
    is_cancel = F.col("event_type") == "error"
    return ev.filter(F.col("event_type").isin("purchase", "error")).select(
        "event_id",
        "user_id",
        F.when(is_cancel, F.lit("cancel")).otherwise(F.lit("movement")).alias("kind"),
        F.when(is_cancel, F.col("value") * -1).otherwise(F.col("value")).alias("signed_value"),
    )


@query(
    "payment_waterfall",
    oracle="""
    WITH base AS (
      SELECT event_id, value AS total,
             value * 0.6 AS cash_in,
             value * 0.3 AS card_in
      FROM events
    )
    SELECT event_id, total,
           LEAST(cash_in, total) AS efectivo,
           LEAST(card_in, total - LEAST(cash_in, total)) AS tarjeta,
           GREATEST(total - LEAST(cash_in, total)
                    - LEAST(card_in, total - LEAST(cash_in, total)), 0) AS otros
    FROM base
    """,
    tags=("P11", "P12", "A8"),
)
def payment_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Waterfall split of a total into cash→card→other by sequential
    capping (P11/P12, transform.py:22-25,33) via least/greatest (A8) —
    row-wise scalar math, no UDF, stays inside whole-stage codegen.
    """
    from osmart_etl_spark.ops.relational import waterfall_split

    ev = read_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        F.col("value").alias("total"),
        (F.col("value") * 0.6).alias("cash_in"),
        (F.col("value") * 0.3).alias("card_in"),
    )
    a, b, c = waterfall_split(F.col("total"), F.col("cash_in"), F.col("card_in"))
    return base.select(
        "event_id", "total", a.alias("efectivo"), b.alias("tarjeta"), c.alias("otros")
    )


@query(
    "rule_tagger",
    oracle="""
    WITH pay AS (
      SELECT event_id, value AS total,
             CASE WHEN event_type = 'purchase' THEN value ELSE value * 0.5 END AS efectivo,
             CASE WHEN event_type = 'click' THEN value * 0.5 ELSE 0.0 END AS tarjeta,
             0.0 AS otros
      FROM events
    )
    SELECT event_id, total,
      CASE
        WHEN ROUND(total, 2) = 0 AND ROUND(efectivo + tarjeta + otros, 2) = 0 THEN 'sin_monto'
        WHEN ROUND(efectivo + tarjeta + otros, 2) = ROUND(total, 2) THEN NULL
        WHEN ROUND(efectivo + tarjeta + otros, 2) = 0 AND ROUND(total, 2) > 0 THEN 'sin_pago'
        WHEN ROUND(efectivo + tarjeta + otros, 2) > ROUND(total, 2) THEN 'pago_excedente'
        WHEN ROUND(efectivo + tarjeta + otros, 2) < ROUND(total, 2) AND ROUND(total, 2) > 0 THEN 'pago_incompleto'
        ELSE 'devolucion_excedida'
      END AS issue
    FROM pay
    """,
    tags=("P10",),
)
def rule_tagger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-wise rule classifier (P10) — the reference's ``tag_issue(row)``
    pandas apply (transform.py:3-15) as a when/otherwise chain: no UDF,
    first-match-wins like the if/elif ladder.
    """
    from osmart_etl_spark.ops.relational import tag_payment_issue

    ev = read_table(spark, sf_dir, "events")
    pay = ev.select(
        "event_id",
        F.col("value").alias("total"),
        F.when(F.col("event_type") == "purchase", F.col("value"))
        .otherwise(F.col("value") * 0.5)
        .alias("efectivo"),
        F.when(F.col("event_type") == "click", F.col("value") * 0.5)
        .otherwise(F.lit(0.0))
        .alias("tarjeta"),
        F.lit(0.0).alias("otros"),
    )
    return pay.select(
        "event_id",
        "total",
        tag_payment_issue(
            F.col("total"), F.col("efectivo"), F.col("tarjeta"), F.col("otros")
        ).alias("issue"),
    )


# ---------------------------------------------------------------------------
# Joins (§2.3)
# ---------------------------------------------------------------------------

@query(
    "star_join_revenue",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    tags=("J1", "A3"),
)
def star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join (J1) — the reference's 4-5-table event↔dim
    joins (extract_stock_movements.sql:27-32). nation/region are true
    dimensions (25/5 rows) → explicit broadcast. customer is NOT: it is
    150k·SF rows and scales with the fact table, so it carries no hint —
    AQE broadcasts it at bench scale from measured size and falls back
    to a shuffle join at 100 TB instead of OOMing on a forced build.
    """
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    return joined.groupBy(
        F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name")
    ).agg(
        dbl(F.sum(dec(F.col("l_extendedprice")))).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "theta_join_pairs",
    oracle="""
    SELECT a.n_regionkey AS region_key, COUNT(*) AS n_pairs
    FROM nation a
    JOIN nation b
      ON a.n_regionkey = b.n_regionkey AND a.n_nationkey != b.n_nationkey
    GROUP BY a.n_regionkey
    """,
    tags=("J2",),
)
def theta_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (non-equi) join (J2) — the reference's transfer-in branch
    joins on ``t.sucOri != n.sucId`` (extract_stock_movements.sql:65).
    Planned as BroadcastNestedLoopJoin; sane only because the inner side
    is tiny, exactly like nubecfg.
    """
    from osmart_etl_spark.ops.joins import theta_join

    n = read_table(spark, sf_dir, "nation")
    a = n.alias("a")
    b = n.alias("b")
    pairs = theta_join(
        a, b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") != F.col("b.n_nationkey")),
    )
    return pairs.groupBy(F.col("a.n_regionkey").alias("region_key")).agg(
        F.count(F.lit(1)).alias("n_pairs")
    )


@query(
    "left_join_coalesce",
    oracle="""
    SELECT c.c_custkey, c.c_name,
      CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))),
                    CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
      COUNT(o.o_orderkey) AS n_orders
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
    tags=("J3", "A9"),
)
def left_join_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join + COALESCE default (J3/A9) — the reference's
    ``ventas LEFT JOIN flujo``, ``COALESCE(c.importe,0)``
    (extract_legacy_sales.sql:12,15-16).
    """
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            dbl(
                F.coalesce(
                    F.sum(dec(F.col("o_totalprice"))), F.lit(0).cast("decimal(18,2)")
                )
            ).alias("total_spent"),
            F.count(F.col("o_orderkey")).alias("n_orders"),
        )
    )


@query(
    "semi_range_join",
    oracle="""
    SELECT r.event_id, r.user_id, r.ts, r.value
    FROM events r
    WHERE r.event_type = 'error'
      AND EXISTS (
        SELECT 1 FROM events e
        WHERE e.event_type = 'purchase'
          AND e.user_id = r.user_id
          AND e.ts <= r.ts
      )
    """,
    tags=("J5",),
)
def semi_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS semi-join with a range condition (J5) — keep a cancellation
    only when a matching prior event exists
    (extract_filter_raw_stock_movements.sql:79-91). Written directly as
    left_semi, the same plan Catalyst's RewritePredicateSubquery derives.
    """
    from osmart_etl_spark.ops.joins import semi_range_join as _srj

    ev = read_table(spark, sf_dir, "events")
    cancels = ev.filter(F.col("event_type") == "error").alias("r")
    prior = ev.filter(F.col("event_type") == "purchase").alias("e")
    kept = _srj(
        cancels,
        prior.select("user_id", "ts"),
        eq_keys=["user_id"],
        range_cond=F.col("e.ts") <= F.col("r.ts"),
    )
    return kept.select("event_id", "user_id", "ts", "value")


@query(
    "earliest_per_group",
    oracle="""
    SELECT event_id, user_id, event_type, ts, value
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id, event_type ORDER BY ts, event_id
      ) AS rn
      FROM events
    ) t
    WHERE rn = 1
    """,
    tags=("J6", "W1", "A5"),
)
def earliest_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earliest-row-per-group (J6) — the reference dedups cancellations
    via a MIN(fecha) self-join (extract_filter_raw_stock_movements.sql:
    52-74); the Spark rewrite is row_number()==1: one shuffle, no join.
    event_id tiebreaker = W6 total-order rule.
    """
    from osmart_etl_spark.ops.joins import earliest_per_group as _epg

    ev = read_table(spark, sf_dir, "events")
    return _epg(ev, ["user_id", "event_type"], [F.col("ts"), F.col("event_id")]).select(
        "event_id", "user_id", "event_type", "ts", "value"
    )


@query(
    "anti_join_exclusions",
    oracle="""
    SELECT l.l_orderkey, l.l_partkey, l.l_quantity
    FROM lineitem l
    WHERE NOT EXISTS (
      SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey AND p.p_size > 40
    )
    """,
    tags=("P14",),
)
def anti_join_exclusions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join against an exclusion registry (P14,
    dq_exclusions_csv.py:68-72): registry is small → broadcast left_anti,
    the fact side never shuffles.
    """
    from osmart_etl_spark.ops.joins import anti_join_exclusions as _aje

    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    excl = p.filter(F.col("p_size") > 40).select(F.col("p_partkey").alias("l_partkey"))
    return _aje(li, excl, ["l_partkey"]).select("l_orderkey", "l_partkey", "l_quantity")


# ---------------------------------------------------------------------------
# Set ops (§2.7)
# ---------------------------------------------------------------------------

@query(
    "union_distinct_branches",
    oracle="""
    SELECT user_id, CAST(ts AS DATE) AS event_date, 'purchase' AS movement_kind
    FROM events WHERE event_type = 'purchase'
    UNION
    SELECT user_id, CAST(ts AS DATE) AS event_date, 'purchase' AS movement_kind
    FROM events WHERE event_type = 'purchase' AND value > 50
    UNION
    SELECT user_id, CAST(ts AS DATE) AS event_date, 'engagement' AS movement_kind
    FROM events WHERE event_type IN ('click', 'view')
    """,
    tags=("U1",),
)
def union_distinct_branches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION-with-dedup of overlapping branches (U1) — the reference's
    8-branch extract relies on UNION (not UNION ALL) to absorb
    re-extraction overlap (extract_stock_movements.sql:38). The first two
    branches overlap by construction to prove the distinct survives.
    """
    from osmart_etl_spark.ops.reshape import union_distinct

    ev = read_table(spark, sf_dir, "events")
    b1 = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.to_date("ts").alias("event_date"), F.lit("purchase").alias("movement_kind")
    )
    b2 = ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 50)).select(
        "user_id", F.to_date("ts").alias("event_date"), F.lit("purchase").alias("movement_kind")
    )
    b3 = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", F.to_date("ts").alias("event_date"), F.lit("engagement").alias("movement_kind")
    )
    return union_distinct(b1, b2, b3)


# ---------------------------------------------------------------------------
# Scalar function sampler (§2.8)
# ---------------------------------------------------------------------------

@query(
    "scalar_functions",
    oracle="""
    SELECT
      event_id,
      CAST(ts AS DATE) AS event_date,
      CAST(CAST(ts AS DATE) + INTERVAL 1 DAY AS DATE) AS next_date,
      SUBSTRING(event_type, 1, 3) AS type_prefix,
      CONCAT(CAST(user_id AS VARCHAR), '|', event_type) AS composite_key,
      ABS(value * -1) AS abs_value,
      ROUND(value, 1) AS value_r1,
      COALESCE(NULLIF(event_type, 'error'), 'CANCELLED') AS normalized_type,
      UPPER(event_type) AS type_upper,
      LENGTH(props) AS props_len
    FROM events
    """,
    tags=("F-date", "F-string", "F-math", "F-null"),
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function surface sampler (§2.8): date truncation/arithmetic
    (DATE_ADD ... INTERVAL 1 DAY — extract_stock_movements.sql:37),
    substring/concat composite keys (dq_exclusions_csv.py:46-49), abs/
    round/negation math, COALESCE/NULLIF null handling.
    """
    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.to_date("ts").alias("event_date"),
        F.date_add(F.to_date("ts"), 1).cast("date").alias("next_date"),
        F.substring("event_type", 1, 3).alias("type_prefix"),
        F.concat(F.col("user_id").cast("string"), F.lit("|"), F.col("event_type")).alias(
            "composite_key"
        ),
        F.abs(F.col("value") * -1).alias("abs_value"),
        F.round(F.col("value"), 1).alias("value_r1"),
        F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("CANCELLED")).alias(
            "normalized_type"
        ),
        F.upper("event_type").alias("type_upper"),
        F.length("props").cast("bigint").alias("props_len"),
    )


@query(
    "conditional_override",
    oracle="""
    SELECT event_id,
      value AS total,
      CASE WHEN event_type = 'signup' THEN value ELSE value * 0.5 END AS efectivo,
      CASE WHEN event_type = 'signup' THEN 0.0 ELSE value * 0.3 END AS tarjeta,
      CASE WHEN event_type = 'signup' THEN 0.0 ELSE value * 0.2 END AS otros
    FROM events
    """,
    tags=("P9",),
)
def conditional_override(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Masked update (P9) — the reference's no-payment-flow override
    ``df.loc[no_flujo, "efectivo"] = total; tarjeta = 0; otros = 0``
    (transform.py:28-30) as when/otherwise column rewrites
    (ops/relational.conditional_override).
    """
    from osmart_etl_spark.ops.relational import conditional_override as _co

    ev = read_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        F.col("value").alias("total"),
        (F.col("value") * 0.5).alias("efectivo"),
        (F.col("value") * 0.3).alias("tarjeta"),
        (F.col("value") * 0.2).alias("otros"),
        F.col("event_type"),
    )
    no_flujo = F.col("event_type") == "signup"
    out = _co(
        base, no_flujo,
        {"efectivo": F.col("total"), "tarjeta": F.lit(0.0), "otros": F.lit(0.0)},
    )
    return out.select("event_id", "total", "efectivo", "tarjeta", "otros")


@query(
    "multi_source_union",
    oracle="""
    SELECT * FROM (
      SELECT 'db_even' AS source_db, event_id, user_id, event_type, value
      FROM events WHERE user_id % 2 = 0
      UNION ALL
      SELECT 'db_odd' AS source_db, event_id, user_id, event_type, value
      FROM events WHERE user_id % 2 = 1
    )
    """,
    tags=("S3", "P2", "U3"),
)
def multi_source_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-database iteration (S3) — the reference loops ``USE {db}``
    over config["databases"] and concatenates (etl_sales/extract.py:
    21-26); here each per-source frame is stamped with its provenance
    (P2) and combined with unionByName (io/sources.union_databases).
    """
    from osmart_etl_spark.io.sources import union_databases

    ev = read_table(spark, sf_dir, "events")
    frames = [
        ev.filter(F.col("user_id") % 2 == i).select(
            F.lit(name).alias("source_db"), "event_id", "user_id", "event_type", "value"
        )
        for i, name in enumerate(["db_even", "db_odd"])
    ]
    return union_databases(frames)


@query(
    "sales_incremental_extract",
    oracle="""
    SELECT
      user_id,
      CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2))
               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS efectivo,
      CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2))
               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS tarjeta,
      CAST(SUM(CASE WHEN event_type NOT IN ('purchase','click')
               THEN CAST(value AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END)
           AS DOUBLE) AS otros,
      MAX(ts) AS fecha_hora,
      MAX(event_id) AS last_event_id,
      'tienda_01' AS tienda,
      'sicar' AS source_system
    FROM events
    WHERE event_id > 5000
    GROUP BY user_id
    """,
    tags=("EP1", "A1", "A2", "P2", "P6"),
)
def sales_incremental_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP1 end-to-end extract shape — watermark predicate (P6,
    ``ven_id > :last_id``, extract_latest_sicar_sales.sql:20) feeding the
    conditional payment split (A1/A2) with provenance enrichment (P2).
    The watermark filter pushes to the parquet scan; at 100 TB with
    time-partitioned layout this prunes to the incremental slice before
    any compute.
    """
    ev = read_table(spark, sf_dir, "events")
    zero = F.lit(0).cast("decimal(18,2)")
    v = dec(F.col("value"))
    return (
        ev.filter(F.col("event_id") > 5000)
        .groupBy("user_id")
        .agg(
            dbl(F.sum(F.when(F.col("event_type") == "purchase", v).otherwise(zero))).alias("efectivo"),
            dbl(F.sum(F.when(F.col("event_type") == "click", v).otherwise(zero))).alias("tarjeta"),
            dbl(F.sum(F.when(~F.col("event_type").isin("purchase", "click"), v).otherwise(zero))).alias("otros"),
            F.max("ts").alias("fecha_hora"),
            F.max("event_id").alias("last_event_id"),
        )
        .withColumn("tienda", F.lit("tienda_01"))
        .withColumn("source_system", F.lit("sicar"))
    )


_BRANCH_COLS = "source_table, id_origen, user_id, ts, tipo_movimiento, delta_cantidad, is_absolute, abs_stock_after"


@query(
    "event_normalizer_branches",
    oracle="""
    SELECT 'ventas' AS source_table, event_id AS id_origen, user_id, ts,
           'venta' AS tipo_movimiento, value * -1 AS delta_cantidad,
           FALSE AS is_absolute, CAST(NULL AS DOUBLE) AS abs_stock_after
    FROM events WHERE event_type = 'purchase'
    UNION
    SELECT 'compras', event_id, user_id, ts, 'compra', value,
           FALSE, CAST(NULL AS DOUBLE)
    FROM events WHERE event_type = 'view'
    UNION
    SELECT 'traspasos', event_id, user_id, ts, 'traspaso_entrada', value,
           FALSE, CAST(NULL AS DOUBLE)
    FROM events WHERE event_type = 'click' AND CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 = 0
    UNION
    SELECT 'traspasos', event_id, user_id, ts, 'traspaso_salida', value * -1,
           FALSE, CAST(NULL AS DOUBLE)
    FROM events WHERE event_type = 'click' AND CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 = 1
    UNION
    SELECT 'notas_credito', event_id, user_id, ts, 'nota_credito', value,
           FALSE, CAST(NULL AS DOUBLE)
    FROM events WHERE event_type = 'error' AND value >= 50
    UNION
    SELECT 'devoluciones', event_id, user_id, ts, 'devolucion_proveedor', value * -1,
           FALSE, CAST(NULL AS DOUBLE)
    FROM events WHERE event_type = 'error' AND value < 50
    UNION
    SELECT 'ajustes', event_id, user_id, ts, 'ajuste_absoluto', CAST(NULL AS DOUBLE),
           TRUE, value
    FROM events WHERE event_type = 'signup'
    UNION
    SELECT 'ventas', event_id, user_id, ts, 'venta', value * -1,
           FALSE, CAST(NULL AS DOUBLE)
    FROM events WHERE event_type = 'purchase' AND value > 100
    """,
    tags=("EP2", "U1", "P8"),
)
def event_normalizer_branches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP2 end-to-end extract shape — the reference's 8-branch UNION over
    the POS ledger (extract_stock_movements.sql:1-233): each branch maps
    a sub-ledger to the unified movement schema with CASE labeling and
    sign flipping (P8); UNION (distinct, U1) absorbs re-extraction
    overlap — the last branch intentionally duplicates a subset of the
    first, and the distinct collapses it. One scan feeds all branches;
    Catalyst collapses the 8 filters into a single pass union.
    """
    ev = read_table(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("bigint")
    )
    null_d = F.lit(None).cast("double")

    def branch(filt, table, tipo, delta, is_abs=False, abs_after=None):
        return ev.filter(filt).select(
            F.lit(table).alias("source_table"),
            F.col("event_id").alias("id_origen"),
            "user_id",
            "ts",
            F.lit(tipo).alias("tipo_movimiento"),
            delta.alias("delta_cantidad"),
            F.lit(is_abs).alias("is_absolute"),
            (abs_after if abs_after is not None else null_d).alias("abs_stock_after"),
        )

    t, v = F.col("event_type"), F.col("value")
    branches = [
        branch(t == "purchase", "ventas", "venta", v * -1),
        branch(t == "view", "compras", "compra", v),
        branch((t == "click") & (F.col("k") % 2 == 0), "traspasos", "traspaso_entrada", v),
        branch((t == "click") & (F.col("k") % 2 == 1), "traspasos", "traspaso_salida", v * -1),
        branch((t == "error") & (v >= 50), "notas_credito", "nota_credito", v),
        branch((t == "error") & (v < 50), "devoluciones", "devolucion_proveedor", v * -1),
        branch(t == "signup", "ajustes", "ajuste_absoluto", null_d, is_abs=True, abs_after=v),
        branch((t == "purchase") & (v > 100), "ventas", "venta", v * -1),
    ]
    from osmart_etl_spark.ops.reshape import union_distinct

    return union_distinct(*branches)


@query(
    "null_safe_join_agg",
    oracle="""
    WITH ev AS (
      SELECT CASE WHEN value < 0 THEN NULL
                  ELSE CAST(FLOOR(value) AS BIGINT) % 3 END AS bucket,
             value
      FROM events
    ),
    dim(bucket, label) AS (
      VALUES (CAST(0 AS BIGINT), 'low'), (CAST(1 AS BIGINT), 'mid'),
             (CAST(2 AS BIGINT), 'high'), (CAST(NULL AS BIGINT), 'refund')
    )
    SELECT d.label,
      CAST(COUNT(*) AS BIGINT) AS n_events,
      CAST(SUM(CAST(ev.value AS DECIMAL(18,2))) AS DOUBLE) AS net_value
    FROM ev JOIN dim d ON ev.bucket IS NOT DISTINCT FROM d.bucket
    GROUP BY d.label
    """,
    tags=("extras-null-safe-join",),
)
def null_safe_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality as a JOIN KEY (<=> / IS NOT DISTINCT FROM) —
    the semantic functions_surface only probes as a scalar: NULL bucket
    rows must MATCH the dimension's NULL row (here: refunds with no
    bucket), where a plain equi-join would silently drop them. Spark
    hash-joins on <=> directly (null-safe keys hash like values — still
    a BroadcastHashJoin, no fallback to nested-loop), so the plan cost
    is identical to the equi-join. The dim is an inline literal frame —
    broadcast, zero extra scans."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    ev = read_table(spark, sf_dir, "events").select(
        F.when(F.col("value") < 0, F.lit(None).cast("bigint"))
        .otherwise(F.floor(F.col("value")).cast("bigint") % 3)
        .alias("bucket"),
        "value",
    )
    dim = spark.createDataFrame(
        [(0, "low"), (1, "mid"), (2, "high"), (None, "refund")],
        StructType(
            [
                StructField("d_bucket", LongType(), True),
                StructField("label", StringType(), False),
            ]
        ),
    )
    return (
        ev.join(F.broadcast(dim), ev["bucket"].eqNullSafe(dim["d_bucket"]))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            dbl(F.sum(dec(F.col("value")))).alias("net_value"),
        )
    )
