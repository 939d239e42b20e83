"""Scalar/window function-family coverage (SURVEY.md §2.8 + free-from-
Spark window surface): ranking, RANGE frames (W7), ordered array
aggregation, string/null families, exact math.

Cross-engine guardrails: only bit-exact math functions appear in
oracle-compared outputs (sqrt/abs/sign/ceil/floor/mod are IEEE-exact;
exp/ln/pow go through libm and may differ by 1 ulp between the JVM and
C — they are exercised in tests, not in hash-compared queries). Array
outputs are compared as joined strings (pandas stringifies Spark lists
and DuckDB numpy arrays differently).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from osmart_etl_spark.io.sources import read_table
from osmart_etl_spark.queries.base import dbl, dec, query


@query(
    "ranking_functions",
    oracle="""
    SELECT o_orderkey, o_custkey,
      RANK()         OVER w AS rnk,
      DENSE_RANK()   OVER w AS drnk,
      ROW_NUMBER()   OVER w AS rn,
      NTILE(4)       OVER w AS quartile,
      CAST(PERCENT_RANK() OVER w AS DOUBLE) AS pct_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
    """,
    tags=("extras-ranking", "W1"),
)
def ranking_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full ranking surface over one window spec — rank/dense_rank/
    row_number/ntile/percent_rank. Total order (price, key) keeps every
    rank deterministic (W6)."""
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey", "o_custkey",
        # Spark ranking fns emit INT, DuckDB BIGINT — pin BIGINT.
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).cast("double").alias("pct_rank"),
    )


@query(
    "moving_range_sum",
    oracle="""
    SELECT event_id, user_id, ts,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        PARTITION BY user_id ORDER BY epoch_us(ts)
        RANGE BETWEEN 259200000000 PRECEDING AND CURRENT ROW
      ) AS DOUBLE) AS value_3d
    FROM events
    """,
    tags=("W7", "extras-range-frame"),
)
def moving_range_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (W7) — 3-day moving sum per key ordered by event
    TIME, not row position: rows within 259200s of the current row's
    timestamp. Unlike a ROWS frame this is robust to uneven event
    density — the frame follows the clock. (Spark's rangeBetween takes
    numeric offsets, so the order key is integer MICROSECONDS — a
    floor-to-second key silently moves rows in/out of the frame when a
    gap is within 1s of the bound; DuckDB's epoch_us matches exactly.)"""
    ev = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-259_200_000_000, 0)
    )
    return ev.select(
        "event_id", "user_id", "ts",
        dbl(F.sum(dec(F.col("value"))).over(w)).alias("value_3d"),
    )


@query(
    "grouped_array_agg",
    oracle="""
    SELECT user_id,
      string_agg(event_type, ',' ORDER BY event_type) AS types_sorted,
      string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_distinct
    FROM events
    GROUP BY user_id
    """,
    tags=("extras-array-agg",),
)
def grouped_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered array aggregation — collect_list is shuffle-order-
    nondeterministic, so deterministic use ALWAYS sorts before exposing
    (here joined to a string for cross-engine comparison)."""
    ev = read_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_list("event_type")), ",").alias("types_sorted"),
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("types_distinct"),
    )


@query(
    "string_functions",
    oracle="""
    SELECT event_id,
      upper(event_type) AS u, lower(event_type) AS l,
      lpad(event_type, 10, '_') AS padded,
      replace(event_type, 'c', 'k') AS replaced,
      regexp_replace(props, '[0-9]+', '#', 'g') AS props_masked,
      reverse(event_type) AS rev,
      CAST(strpos(event_type, 'r') AS BIGINT) AS r_pos,
      split_part(props, ':', 1) AS props_head,
      CAST(length(trim(event_type)) AS BIGINT) AS trimmed_len,
      repeat('ab', 3) AS repeated
    FROM events
    """,
    tags=("F-string",),
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family (§2.8): case, pad, replace, regexp mask,
    reverse, position, split_part, trim/length, repeat."""
    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.upper("event_type").alias("u"),
        F.lower("event_type").alias("l"),
        F.lpad("event_type", 10, "_").alias("padded"),
        F.replace(F.col("event_type"), F.lit("c"), F.lit("k")).alias("replaced"),
        F.regexp_replace("props", "[0-9]+", "#").alias("props_masked"),
        F.reverse("event_type").alias("rev"),
        F.instr(F.col("event_type"), "r").cast("bigint").alias("r_pos"),
        F.split_part(F.col("props"), F.lit(":"), F.lit(1)).alias("props_head"),
        F.length(F.trim(F.col("event_type"))).cast("bigint").alias("trimmed_len"),
        F.repeat(F.lit("ab"), 3).alias("repeated"),
    )


@query(
    "null_handling",
    oracle="""
    SELECT event_id,
      NULLIF(event_type, 'error') AS nullified,
      COALESCE(NULLIF(event_type, 'error'), 'was_error') AS coalesced,
      IFNULL(NULLIF(event_type, 'error'), 'fallback') AS ifnulled,
      (NULLIF(event_type, 'error') IS NULL) AS is_nulled,
      (NULLIF(event_type, 'error') IS NOT DISTINCT FROM NULL) AS null_safe_eq_null,
      CASE WHEN value > 100 THEN NULL ELSE value END AS capped_or_null
    FROM events
    """,
    tags=("F-null",),
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics family (§2.8): NULLIF/COALESCE/IFNULL, IS NULL,
    null-safe equality (<=> / IS NOT DISTINCT FROM), NULL-producing
    CASE."""
    ev = read_table(spark, sf_dir, "events")
    nullified = F.nullif(F.col("event_type"), F.lit("error"))
    return ev.select(
        "event_id",
        nullified.alias("nullified"),
        F.coalesce(nullified, F.lit("was_error")).alias("coalesced"),
        F.ifnull(nullified, F.lit("fallback")).alias("ifnulled"),
        nullified.isNull().alias("is_nulled"),
        nullified.eqNullSafe(F.lit(None).cast("string")).alias("null_safe_eq_null"),
        F.when(F.col("value") > 100, F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("capped_or_null"),
    )


@query(
    "math_exact",
    oracle="""
    SELECT event_id,
      sqrt(value) AS root,
      abs(value * -1) AS absolute,
      CAST(sign(value - 100) AS BIGINT) AS sgn,
      CAST(ceil(value) AS BIGINT) AS up,
      CAST(floor(value) AS BIGINT) AS down,
      CAST(CAST(event_id AS BIGINT) % 7 AS BIGINT) AS m7,
      greatest(value, 50.0) AS hi,
      least(value, 50.0) AS lo
    FROM events
    """,
    tags=("F-math",),
)
def math_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IEEE-exact math family (§2.8): sqrt (correctly rounded by IEEE-754
    in both engines), abs/sign/ceil/floor/mod/greatest/least.
    Transcendentals (exp/ln/pow) are deliberately absent: libm vs JVM
    can differ by 1 ulp, which the hash compare would flag."""
    ev = read_table(spark, sf_dir, "events")
    v = F.col("value")
    return ev.select(
        "event_id",
        F.sqrt(v).alias("root"),
        F.abs(v * -1).alias("absolute"),
        # Engine result types differ on these (DuckDB sign→TINYINT,
        # ceil/floor(double)→DOUBLE; Spark signum→DOUBLE, ceil/floor→LONG)
        # — both sides pin BIGINT so the driver's value-hash agrees.
        F.signum(v - 100).cast("bigint").alias("sgn"),
        F.ceil(v).alias("up"),
        F.floor(v).alias("down"),
        (F.col("event_id") % 7).cast("bigint").alias("m7"),
        F.greatest(v, F.lit(50.0)).alias("hi"),
        F.least(v, F.lit(50.0)).alias("lo"),
    )


@query(
    "sales_pipeline_full",
    oracle="""
    WITH agg AS (
      SELECT user_id,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS efectivo_in,
        CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS tarjeta_in,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_venta,
        MAX(ts) AS fecha_hora
      FROM events
      WHERE event_id > 2000
      GROUP BY user_id
    ),
    wf AS (
      -- DuckDB's LEAST/GREATEST over decimals returns DOUBLE; cast each
      -- step back to DECIMAL(18,2) to recover the exact value (noise is
      -- far below the 0.005 rounding boundary), matching Spark's
      -- exact-decimal waterfall.
      SELECT *,
        CAST(LEAST(efectivo_in, total_venta) AS DECIMAL(18,2)) AS ef0
      FROM agg
    ),
    wf2 AS (
      SELECT *,
        CAST(LEAST(tarjeta_in, total_venta - ef0) AS DECIMAL(18,2)) AS ta0
      FROM wf
    ),
    norm AS (
      SELECT user_id, total_venta, fecha_hora,
        CASE WHEN efectivo_in = 0 AND tarjeta_in = 0 THEN total_venta ELSE ef0 END AS efectivo,
        CASE WHEN efectivo_in = 0 AND tarjeta_in = 0 THEN CAST(0 AS DECIMAL(18,2)) ELSE ta0 END AS tarjeta,
        CASE WHEN efectivo_in = 0 AND tarjeta_in = 0 THEN CAST(0 AS DECIMAL(18,2))
             ELSE CAST(GREATEST(total_venta - ef0 - ta0, CAST(0 AS DECIMAL(18,2))) AS DECIMAL(18,2)) END AS otros
      FROM wf2
    )
    SELECT user_id,
      CAST(total_venta AS DOUBLE) AS total_venta,
      CAST(efectivo AS DOUBLE) AS efectivo,
      CAST(tarjeta AS DOUBLE) AS tarjeta,
      CAST(otros AS DOUBLE) AS otros,
      fecha_hora,
      CASE
        WHEN ROUND(total_venta, 2) = 0 AND ROUND(efectivo + tarjeta + otros, 2) = 0 THEN 'sin_monto'
        WHEN ROUND(efectivo + tarjeta + otros, 2) = ROUND(total_venta, 2) THEN NULL
        WHEN ROUND(efectivo + tarjeta + otros, 2) = 0 AND ROUND(total_venta, 2) > 0 THEN 'sin_pago'
        WHEN ROUND(efectivo + tarjeta + otros, 2) > ROUND(total_venta, 2) THEN 'pago_excedente'
        WHEN ROUND(efectivo + tarjeta + otros, 2) < ROUND(total_venta, 2) AND ROUND(total_venta, 2) > 0 THEN 'pago_incompleto'
        ELSE 'devolucion_excedida'
      END AS payment_issue,
      'tienda_01' AS tienda,
      'sicar' AS source_system
    FROM norm
    """,
    tags=("EP1", "pipeline"),
)
def sales_pipeline_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP1 end-to-end THROUGH the pipeline module: watermark-filtered
    conditional aggregation → waterfall split → no-flow override → QA
    tagging → provenance (pipelines/sales.extract_sales +
    normalize_payments + enrich_extract). Same composed code the
    incremental runner executes — proving the pipeline layer, not a
    re-implementation. extracted_at/last_event_id dropped from the
    compare (run-time dependent)."""
    from osmart_etl_spark.pipelines.sales import extract_sales, normalize_payments
    from osmart_etl_spark.ops.relational import enrich_extract

    ev = read_table(spark, sf_dir, "events")
    batch = extract_sales(ev, last_id=2000)
    out = enrich_extract(
        normalize_payments(batch), tienda="tienda_01", source_system="sicar"
    )
    return out.select(
        "user_id",
        dbl(F.col("total_venta")).alias("total_venta"),
        dbl(F.col("efectivo")).alias("efectivo"),
        dbl(F.col("tarjeta")).alias("tarjeta"),
        dbl(F.col("otros")).alias("otros"),
        "fecha_hora",
        "payment_issue",
        "tienda",
        "source_system",
    )


@query(
    "window_navigation",
    oracle="""
    SELECT event_id, user_id, ts,
      LAG(value)  OVER w AS prev_value,
      LEAD(value) OVER w AS next_value,
      FIRST_VALUE(value) OVER w AS first_seen,
      LAST_VALUE(value) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
      ) AS final_value,
      NTH_VALUE(value, 2) OVER w AS second_seen
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("extras-navigation", "W4"),
)
def window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation-function surface: lag/lead/first_value/last_value/
    nth_value over one window. last_value uses an explicit
    unbounded-following frame (the default frame ends at CURRENT ROW,
    which silently makes last_value == current value — the classic
    window-frame trap, identical in both engines)."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id", "user_id", "ts",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(w).alias("first_seen"),
        F.last("value").over(w_full).alias("final_value"),
        F.nth_value("value", 2).over(w).alias("second_seen"),
    )


@query(
    "value_histogram",
    oracle="""
    SELECT CAST(FLOOR(value / 25) AS BIGINT) AS bucket,
      COUNT(*) AS n,
      CAST(MIN(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS lo,
      CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS hi,
      CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM events) AS frac
    FROM events
    GROUP BY CAST(FLOOR(value / 25) AS BIGINT)
    """,
    tags=("extras-histogram",),
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (floor-bucket groupBy) with per-bucket
    bounds and fraction via a scalar subquery — the basic profiling
    query every data pipeline runs before setting DQ thresholds."""
    ev = read_table(spark, sf_dir, "events")
    # scalar subquery as a broadcast 1-row aggregate: one DAG, no
    # separate driver-side count job (round-2 ADVICE)
    total = ev.agg(F.count(F.lit(1)).alias("__total"))
    return (
        ev.groupBy(F.floor(F.col("value") / 25).cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dbl(F.min(dec(F.col("value")))).alias("lo"),
            dbl(F.max(dec(F.col("value")))).alias("hi"),
        )
        .crossJoin(F.broadcast(total))
        .withColumn("frac", F.col("n").cast("double") / F.col("__total"))
        .drop("__total")
    )


@query(
    "ansi_try_arithmetic",
    oracle="""
    SELECT event_id,
      CASE WHEN user_id % 7 = 0 THEN NULL
           ELSE CAST(value AS DOUBLE) / CAST(user_id % 7 AS DOUBLE) END AS safe_ratio,
      CASE WHEN user_id % 2 = 1 AND user_id > 100 THEN NULL
           ELSE (user_id % 2) * 9223372036854775707 + user_id END AS ovf_add,
      CASE WHEN user_id > 1 THEN NULL
           ELSE user_id * 4611686018427387904 END AS ovf_mul,
      TRY_CAST(CASE WHEN user_id % 3 = 0 THEN '2024-13-01'
                    ELSE '2024-03-0' || CAST(user_id % 9 + 1 AS VARCHAR) END
               AS TIMESTAMP) AS parsed_ts
    FROM events
    """,
    tags=("functions", "ansi-try"),
)
def ansi_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI-mode safety valves (§2.8 null/coercion family, Spark 4
    defaults ANSI on): try_divide / try_add / try_multiply /
    try_to_timestamp return NULL where strict evaluation would kill the
    job — division by zero, bigint overflow, unparseable datetimes. At
    100 TB these are the difference between quarantining a bad row and
    losing a 6-hour job at row 3 billion; the oracle proves the NULL
    boundary sits exactly where arithmetic overflows (not one row
    earlier or later) by reproducing each guard as an explicit CASE.

    Pure projection, zero shuffle; all four surfaces mix NULL and
    non-NULL rows on this generator so the boundary is actually tested.

    Measured cost model (sf0.1): try_divide is free (~0.1 s — the zero
    check is a branch), but each try_add/try_multiply OVERFLOW costs a
    caught JVM exception (~20 µs/row: 1.4 s / 1.7 s here where ~half
    the rows overflow by construction). try_* is the right tool when
    failures are rare data errors; a column where overflow is EXPECTED
    should pre-guard with an explicit CASE instead — this query is
    deliberately overflow-dense to pin the NULL boundary, and pays for
    it.
    """
    ev = read_table(spark, sf_dir, "events")
    uid = F.col("user_id")
    ts_str = F.when(uid % 3 == 0, F.lit("2024-13-01")).otherwise(
        F.concat(F.lit("2024-03-0"), (uid % 9 + 1).cast("string"))
    )
    return ev.select(
        "event_id",
        F.try_divide(F.col("value").cast("double"), (uid % 7).cast("double")).alias(
            "safe_ratio"
        ),
        F.try_add((uid % 2) * F.lit(9223372036854775707), uid).alias("ovf_add"),
        F.try_multiply(uid, F.lit(4611686018427387904)).alias("ovf_mul"),
        F.try_to_timestamp(ts_str).alias("parsed_ts"),
    )


@query(
    "array_hof_surface",
    oracle="""
    WITH t AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS toks
      FROM documents
    ),
    n AS (SELECT doc_id, toks, LEAST(len(toks), 5) AS n5 FROM t)
    SELECT doc_id,
      CAST(len(list_filter(toks, x -> len(x) > 5)) AS BIGINT) AS n_long,
      len(list_filter(toks, x -> x = 'the')) > 0 AS has_the,
      len(list_filter(toks, x -> len(x) > 10)) = 0 AS all_short,
      array_to_string(
        list_transform(list_sort(list_distinct(toks))[1:3], x -> upper(x)), ','
      ) AS first3_upper,
      CAST(list_reduce(
        list_prepend(0, list_transform(
          list_zip(range(1, n5 + 1), toks[1:n5]),
          p -> p[1] * len(p[2]))),
        (a, b) -> a + b) AS BIGINT) AS zip_weighted_len
    FROM n
    """,
    tags=("functions", "array-hof"),
)
def array_hof_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The higher-order array-function family (§2.8 extension): filter,
    exists, forall, transform, slice, sort, distinct, zip_with,
    aggregate — each pinned against a first-principles DuckDB list
    expression. All lambda bodies run inside codegen (no Python); one
    scan, zero shuffle — the family the dedup/similarity operators are
    built from, verified here in isolation.
    """
    from osmart_etl_spark.ops.text import tokens

    d = read_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n5 = F.least(F.size(toks), F.lit(5))
    seq = F.when(n5 >= 1, F.sequence(F.lit(1), n5)).otherwise(
        F.array().cast("array<int>")
    )
    zip_sum = F.aggregate(
        F.zip_with(seq, F.slice(toks, 1, 5), lambda i, x: i * F.length(x)),
        F.lit(0),
        lambda a, b: a + b,
    )
    return d.select(
        "doc_id",
        F.size(F.filter(toks, lambda x: F.length(x) > 5)).cast("bigint").alias("n_long"),
        F.exists(toks, lambda x: x == "the").alias("has_the"),
        F.forall(toks, lambda x: F.length(x) <= 10).alias("all_short"),
        F.array_join(
            F.transform(
                F.slice(F.array_sort(F.array_distinct(toks)), 1, 3), F.upper
            ),
            ",",
        ).alias("first3_upper"),
        zip_sum.cast("bigint").alias("zip_weighted_len"),
    )


@query(
    "map_functions_surface",
    oracle="""
    SELECT event_id,
      CAST(3 AS BIGINT) AS n_keys,
      'type,uid,val' AS keys_csv,
      event_type AS type_val,
      CAST(CASE WHEN value IS NULL THEN 2 ELSE 3 END AS BIGINT) AS n_nonnull,
      upper(CAST(user_id AS VARCHAR)) AS uid_upper,
      'x' AS extra_val
    FROM events
    """,
    tags=("functions", "maps"),
)
def map_functions_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The map-typed column family (§2.8 extension): create_map,
    map_keys, element_at, map_filter, transform_values, map_concat.
    The oracle states each output from first principles over the source
    columns — what a map round-trip must preserve — so any
    key-ordering, null-handling, or lookup bug in the map path breaks
    the hash. Maps stay JVM-side; one scan, zero shuffle.
    """
    ev = read_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
        F.lit("val"), F.col("value").cast("string"),
    )
    m2 = F.map_concat(m, F.create_map(F.lit("extra"), F.lit("x")))
    return ev.select(
        "event_id",
        F.size(m).cast("bigint").alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_csv"),
        F.element_at(m, "type").alias("type_val"),
        F.size(F.map_filter(m, lambda k, v: v.isNotNull())).cast("bigint").alias(
            "n_nonnull"
        ),
        F.element_at(
            F.transform_values(m, lambda k, v: F.upper(v)), "uid"
        ).alias("uid_upper"),
        F.element_at(m2, "extra").alias("extra_val"),
    )


@query(
    "variant_semi_structured",
    oracle="""
    WITH src AS (
      SELECT event_id,
        CASE WHEN event_id % 13 = 0 THEN '{bad json' ELSE props END AS raw
      FROM events
    ),
    parsed AS (
      SELECT event_id, TRY_CAST(raw AS JSON) AS j FROM src
    )
    SELECT event_id,
      (j IS NOT NULL) AS parse_ok,
      CAST(json_extract_string(j, '$.k') AS BIGINT) AS k_big,
      CAST(json_extract_string(j, '$.k') AS DOUBLE) AS k_dbl,
      CAST(json_extract_string(j, '$.missing') AS BIGINT) AS missing_big
    FROM parsed
    """,
    tags=("extras-variant",),
)
def variant_semi_structured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured data: ``try_parse_json``
    → binary variant → typed ``try_variant_get`` extraction — the
    schema-on-read sibling of ``json_props_extract``'s ``from_json``
    (which needs the schema up front). Variant is the 100 TB answer for
    heterogeneous JSON: parse once into a binary column, extract many
    times without re-tokenizing, no schema agreement needed across
    producers. Malformed payloads (every 13th row here, injected) turn
    into NULL variants (parse_ok=false), never job failures — same
    error-as-data philosophy as the multimodal decode_status. All
    codegen'd projections, zero shuffle."""
    ev = read_table(spark, sf_dir, "events")
    raw = F.when(F.col("event_id") % 13 == 0, F.lit("{bad json")).otherwise(
        F.col("props")
    )
    v = F.try_parse_json(raw)
    return ev.select(
        "event_id",
        v.isNotNull().alias("parse_ok"),
        F.try_variant_get(v, "$.k", "bigint").alias("k_big"),
        F.try_variant_get(v, "$.k", "double").alias("k_dbl"),
        F.try_variant_get(v, "$.missing", "bigint").alias("missing_big"),
    )
