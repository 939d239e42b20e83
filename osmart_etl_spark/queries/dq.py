"""Data-quality operator queries (SURVEY.md §2.2 P7/P13/P15, §2.9 T8,
§5). The reference enforces correctness operationally — threshold
quarantine with an audit reason, range assertions, reconciliation against
a source of truth — and those checks are first-class operators here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osmart_etl_spark.io.sources import read_table
from osmart_etl_spark.queries.base import dbl, dec, query


@query(
    "dq_quarantine",
    oracle="""
    SELECT event_id, user_id, value,
      CASE WHEN value > 190 THEN 'exceeds_abs_max'
           ELSE 'negative_or_zero_value' END AS reason,
      CONCAT(CAST(user_id AS VARCHAR), '|', CAST(event_id AS VARCHAR), '|',
             CASE WHEN value > 190 THEN 'exceeds_abs_max'
                  ELSE 'negative_or_zero_value' END) AS uniq
    FROM events
    WHERE value > 190 OR value <= 0
    """,
    tags=("P7", "P13", "S9"),
)
def dq_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold quarantine with audit reason + dedup key (P13 + S9) —
    the reference excludes |abs snapshot| > ABS_MAX and logs each
    exclusion with a composite ``uniq`` key
    (dq_exclusions_csv.py:78,46-49). The complement of this filter is
    the clean stream (P7 boolean-mask split); both sides come from one
    scan.
    """
    ev = read_table(spark, sf_dir, "events")
    reason = F.when(F.col("value") > 190, F.lit("exceeds_abs_max")).otherwise(
        F.lit("negative_or_zero_value")
    )
    return (
        ev.filter((F.col("value") > 190) | (F.col("value") <= 0))
        .select(
            "event_id", "user_id", "value",
            reason.alias("reason"),
            F.concat_ws(
                "|", F.col("user_id").cast("string"), F.col("event_id").cast("string"), reason
            ).alias("uniq"),
        )
    )


@query(
    "dq_bounds_offenders",
    oracle="""
    SELECT l_partkey,
      CAST(MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price,
      CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price,
      COUNT(*) AS n_offending
    FROM lineitem
    WHERE l_extendedprice > 90000
    GROUP BY l_partkey
    """,
    tags=("P15", "A6"),
)
def dq_bounds_offenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-assertion offender report (P15) — the reference verifies
    sod_stock stays within INT32 and reports offenders grouped by SKU
    with min/max/count (seed_stock_points.py:134-149).
    """
    li = read_table(spark, sf_dir, "lineitem")
    p = dec(F.col("l_extendedprice"))
    return (
        li.filter(F.col("l_extendedprice") > 90000)
        .groupBy("l_partkey")
        .agg(
            dbl(F.min(p)).alias("min_price"),
            dbl(F.max(p)).alias("max_price"),
            F.count(F.lit(1)).alias("n_offending"),
        )
    )


@query(
    "reconcile_summary",
    oracle="""
    WITH replayed AS (
      SELECT user_id,
        SUM(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(18,2)) * -1
                 WHEN event_type = 'signup' THEN CAST(0 AS DECIMAL(18,2))
                 ELSE CAST(value AS DECIMAL(18,2)) END) AS sim_balance
      FROM events GROUP BY user_id
    ),
    booked AS (
      SELECT user_id,
        SUM(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(18,2)) * -1
                 ELSE CAST(value AS DECIMAL(18,2)) END) AS prod_balance
      FROM events GROUP BY user_id
    ),
    comp AS (
      SELECT COALESCE(r.user_id, b.user_id) AS user_id,
        COALESCE(r.sim_balance, CAST(0 AS DECIMAL(18,2))) AS sim_balance,
        COALESCE(b.prod_balance, CAST(0 AS DECIMAL(18,2))) AS prod_balance
      FROM replayed r FULL OUTER JOIN booked b ON r.user_id = b.user_id
    )
    SELECT COUNT(*) AS total_keys,
      CAST(SUM(CASE WHEN sim_balance != prod_balance THEN 1 ELSE 0 END) AS BIGINT) AS mismatch_keys,
      CAST(MAX(ABS(sim_balance - prod_balance)) AS DOUBLE) AS max_abs_diff
    FROM comp
    """,
    tags=("T8", "J4", "A7"),
)
def reconcile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online reconciliation (T8) — simulate a balance two ways, full-
    outer join (J4), and emit the mismatch summary dict (A7:
    total_skus / mismatch_skus / max_abs_diff,
    stock_points_helpers.py:68-79). The two methods differ exactly on
    keys with absolute (signup) events, so mismatches are real signal.
    """
    ev = read_table(spark, sf_dir, "events")
    v = dec(F.col("value"))
    zero = F.lit(0).cast("decimal(18,2)")
    sim = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "error", v * -1)
            .when(F.col("event_type") == "signup", zero)
            .otherwise(v)
        ).alias("sim_balance")
    )
    prod = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "error", v * -1).otherwise(v)
        ).alias("prod_balance")
    )
    comp = (
        sim.join(prod, "user_id", "full_outer")
        .select(
            F.coalesce(F.col("sim_balance"), zero).alias("sim_balance"),
            F.coalesce(F.col("prod_balance"), zero).alias("prod_balance"),
        )
    )
    return comp.agg(
        F.count(F.lit(1)).alias("total_keys"),
        F.sum(
            F.when(F.col("sim_balance") != F.col("prod_balance"), 1).otherwise(0)
        ).alias("mismatch_keys"),
        dbl(F.max(F.abs(F.col("sim_balance") - F.col("prod_balance")))).alias("max_abs_diff"),
    )


@query(
    "dq_outliers_iqr",
    oracle="""
    WITH base AS (
      SELECT event_id, event_type, CAST(value AS DOUBLE) AS v
      FROM events WHERE value IS NOT NULL
    ),
    ranked AS (
      SELECT event_type, v,
        ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) AS r,
        COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM base
    ),
    thr AS (
      SELECT event_type,
        MAX(CASE WHEN r = CAST(CEIL(0.25 * n) AS BIGINT) THEN v END) AS q1,
        MAX(CASE WHEN r = CAST(CEIL(0.75 * n) AS BIGINT) THEN v END) AS q3
      FROM ranked GROUP BY event_type
    )
    SELECT b.event_id, b.event_type, b.v AS value,
      (t.q1 - 1.5 * (t.q3 - t.q1)) AS lo,
      (t.q3 + 1.5 * (t.q3 - t.q1)) AS hi
    FROM base b JOIN thr t ON b.event_type = t.event_type
    WHERE b.v < t.q1 - 1.5 * (t.q3 - t.q1)
       OR b.v > t.q3 + 1.5 * (t.q3 - t.q1)
    """,
    tags=("dq", "outliers", "scale-shape"),
)
def dq_outliers_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier detection per event_type: rows outside
    [q1 − 1.5·IQR, q3 + 1.5·IQR] — the threshold-free companion to
    ``dq_bounds_offenders`` (whose bounds are hand-configured).

    Scale shape: per-group quartiles via grouped percentile_approx
    (one map-side-combined aggregate — groups are few, so the sketch
    table broadcasts back over the scan; no per-row window, no global
    sort). Parity uses the exact-regime rank rule (order statistic at
    ceil(p·n), accuracy 10⁷ ≫ group size) with the oracle reproducing
    the rank explicitly — same contract as rfm_segmentation_scalable.
    """
    ev = read_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    base = ev.select("event_id", "event_type", F.col("value").cast("double").alias("v"))
    ps = F.array(F.lit(0.25), F.lit(0.75))
    thr = base.groupBy("event_type").agg(
        F.percentile_approx("v", ps, F.lit(10_000_000)).alias("q")
    )
    q1, q3 = F.col("q")[0], F.col("q")[1]
    lo = q1 - 1.5 * (q3 - q1)
    hi = q3 + 1.5 * (q3 - q1)
    return (
        base.join(F.broadcast(thr), "event_type")
        .select(
            "event_id",
            "event_type",
            F.col("v").alias("value"),
            lo.alias("lo"),
            hi.alias("hi"),
        )
        .filter((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")))
    )


@query(
    "distribution_drift_bins",
    oracle="""
    WITH binned AS (
      SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS price_bin,
             EXTRACT(YEAR FROM o_orderdate) AS yr
      FROM orders
      WHERE EXTRACT(YEAR FROM o_orderdate) IN (1996, 1997)
    ),
    counts AS (
      SELECT price_bin,
        CAST(SUM(CASE WHEN yr = 1996 THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
        CAST(SUM(CASE WHEN yr = 1997 THEN 1 ELSE 0 END) AS BIGINT) AS n_curr
      FROM binned GROUP BY price_bin
    ),
    totals AS (
      SELECT SUM(n_base) AS t_base, SUM(n_curr) AS t_curr FROM counts
    )
    SELECT c.price_bin, c.n_base, c.n_curr,
      CAST(c.n_base AS DOUBLE) / CAST(t.t_base AS DOUBLE) AS share_base,
      CAST(c.n_curr AS DOUBLE) / CAST(t.t_curr AS DOUBLE) AS share_curr,
      (CAST(c.n_base AS DOUBLE) / CAST(t.t_base AS DOUBLE)
         - CAST(c.n_curr AS DOUBLE) / CAST(t.t_curr AS DOUBLE))
      * (CAST(c.n_base AS DOUBLE) / CAST(t.t_base AS DOUBLE)
         - CAST(c.n_curr AS DOUBLE) / CAST(t.t_curr AS DOUBLE))
      / (CAST(c.n_base AS DOUBLE) / CAST(t.t_base AS DOUBLE)
         + CAST(c.n_curr AS DOUBLE) / CAST(t.t_curr AS DOUBLE)) AS chi2_contrib
    FROM counts c, totals t
    """,
    tags=("ext-dq", "drift"),
)
def distribution_drift_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: order-value histogram of a baseline
    period (1996) vs the current one (1997), with each bin's chi-square
    distance contribution — the DQ observability check that catches a
    silently shifted money distribution before it poisons downstream
    models. Per-bin OUTPUT (no final cross-row double sum) keeps the
    result bit-stable: a global chi2 would sum doubles in partition
    order. Arithmetic only — no ln/exp, whose last-ulp behavior differs
    across libm builds (same reason weighted_sample_pps avoids pow).
    Shape: one scan, one tiny bin agg, totals via broadcast 1-row
    crossJoin — the same pattern as tpch_q22's scalar average."""
    o = read_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1996, 1997)
    )
    binned = o.select(
        F.floor(F.col("o_totalprice") / 25000.0).cast("bigint").alias("price_bin"),
        F.year("o_orderdate").alias("yr"),
    )
    counts = binned.groupBy("price_bin").agg(
        F.sum(F.when(F.col("yr") == 1996, 1).otherwise(0)).cast("bigint").alias("n_base"),
        F.sum(F.when(F.col("yr") == 1997, 1).otherwise(0)).cast("bigint").alias("n_curr"),
    )
    totals = counts.agg(
        F.sum("n_base").alias("t_base"), F.sum("n_curr").alias("t_curr")
    )
    sa = F.col("n_base").cast("double") / F.col("t_base").cast("double")
    sb = F.col("n_curr").cast("double") / F.col("t_curr").cast("double")
    return counts.crossJoin(F.broadcast(totals)).select(
        "price_bin",
        "n_base",
        "n_curr",
        sa.alias("share_base"),
        sb.alias("share_curr"),
        ((sa - sb) * (sa - sb) / (sa + sb)).alias("chi2_contrib"),
    )


_SEG = 4096  # orderkeys per checksum segment


@query(
    "replica_segment_diff",
    oracle=f"""
    WITH rowhash AS (
      SELECT o_orderkey // {_SEG} AS segment,
        ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':'
                        || CAST(o_custkey AS VARCHAR)), 1, 7))::BIGINT AS h
      FROM orders
    ),
    replica_rowhash AS (
      SELECT o_orderkey // {_SEG} AS segment,
        ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':'
                        || CAST(CASE WHEN o_orderkey % 1009 = 0
                                     THEN o_custkey + 1 ELSE o_custkey END
                                AS VARCHAR)), 1, 7))::BIGINT AS h
      FROM orders
    ),
    a AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_a,
                 CAST(SUM(h) AS BIGINT) AS sum_a
          FROM rowhash GROUP BY segment),
    b AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_b,
                 CAST(SUM(h) AS BIGINT) AS sum_b
          FROM replica_rowhash GROUP BY segment)
    SELECT a.segment, a.n_a, b.n_b, a.sum_a, b.sum_b
    FROM a JOIN b ON a.segment = b.segment
    WHERE a.sum_a != b.sum_b OR a.n_a != b.n_b
    """,
    tags=("ext-dq", "anti-entropy"),
)
def replica_segment_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy segment checksums (the Merkle-tree leaf level):
    both replicas reduce to one (count, hash-sum) row per key segment,
    and only segments whose digests disagree are emitted — divergence
    localized to 1/N of the table with two scans and a tiny exchange,
    never a row-by-row full-outer compare (corpus_snapshot_diff is the
    row-level tool you run ON the flagged segments). The hash-sum is an
    md5-derived bounded bigint per row (portable across engines, sums
    exactly, commutative — partition-order-free); keys in the hash are
    integers only, so string formatting is engine-stable. The 'replica'
    here is the same table with every 1009th order's custkey corrupted
    — the query must flag exactly those segments."""
    o = read_table(spark, sf_dir, "orders")

    def seg_digest(df: DataFrame, cust_col) -> DataFrame:
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("o_orderkey").cast("string"),
                        cust_col.cast("string"),
                    )
                ),
                1,
                7,
            ),
            16,
            10,
        ).cast("bigint")
        return df.select(
            F.floor(F.col("o_orderkey") / _SEG).cast("bigint").alias("segment"),
            h.alias("__h"),
        ).groupBy("segment").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("__h").cast("bigint").alias("hsum"),
        )

    a = seg_digest(o, F.col("o_custkey")).select(
        "segment", F.col("n").alias("n_a"), F.col("hsum").alias("sum_a")
    )
    corrupted = F.when(
        F.col("o_orderkey") % 1009 == 0, F.col("o_custkey") + 1
    ).otherwise(F.col("o_custkey"))
    b = seg_digest(o, corrupted).select(
        "segment", F.col("n").alias("n_b"), F.col("hsum").alias("sum_b")
    )
    return a.join(b, "segment").filter(
        (F.col("sum_a") != F.col("sum_b")) | (F.col("n_a") != F.col("n_b"))
    )


_K_ANON = 5


@query(
    "k_anonymity_audit",
    oracle=f"""
    WITH cells AS (
      SELECT lang, source,
        CAST(FLOOR(n_chars / 100.0) AS BIGINT) AS size_bucket,
        CAST(COUNT(*) AS BIGINT) AS group_size
      FROM documents
      GROUP BY lang, source, CAST(FLOOR(n_chars / 100.0) AS BIGINT)
    )
    SELECT lang, source, size_bucket, group_size,
      (group_size < {_K_ANON}) AS violates_k
    FROM cells WHERE group_size < {_K_ANON}
    """,
    tags=("ext-privacy", "k-anonymity"),
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier combination
    (lang, source, size-bucket): any cell with fewer than k=5 members
    re-identifies its documents under linkage attacks, so these are
    the cells a release pipeline must generalize (coarser buckets) or
    suppress before publication. The audit is one hash aggregate over
    the QI columns — the same cost as any group-count — and the
    generalization loop it drives (widen bucket, re-audit) reuses the
    identical shape with a different bucket width, so privacy
    enforcement at 100 TB costs one aggregate per lattice level
    explored, not a per-row scan per level. Bucketing n_chars is
    itself the first generalization step: raw lengths are near-unique
    QIs, buckets of 100 are not."""
    d = read_table(spark, sf_dir, "documents")
    cells = d.groupBy(
        "lang",
        "source",
        F.floor(F.col("n_chars") / 100.0).cast("bigint").alias("size_bucket"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("group_size"))
    return cells.filter(F.col("group_size") < _K_ANON).select(
        "lang",
        "source",
        "size_bucket",
        "group_size",
        (F.col("group_size") < _K_ANON).alias("violates_k"),
    )


@query(
    "referential_integrity_audit",
    oracle="""
    SELECT 'lineitem->orders' AS fk, CAST(COUNT(*) AS BIGINT) AS n_orphans
    FROM lineitem l WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'lineitem->part', CAST(COUNT(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS (
      SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
    UNION ALL
    SELECT 'lineitem->supplier', CAST(COUNT(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS (
      SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
    UNION ALL
    SELECT 'orders->customer', CAST(COUNT(*) AS BIGINT)
    FROM orders o WHERE NOT EXISTS (
      SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'customer->nation', CAST(COUNT(*) AS BIGINT)
    FROM customer c WHERE NOT EXISTS (
      SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
    """,
    tags=("dq", "referential-integrity"),
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan audit across the star schema's five foreign keys in one
    DAG — the constraint check a lake has to run itself because parquet
    enforces nothing (the reference delegates this to MySQL FK DDL,
    create_raw_stock_movements.sql). Each FK is a LEFT ANTI join on the
    single-column PK projection of the referenced table, with NO
    broadcast hint: lineitem→orders anti-joins a 1.5M·SF key set and
    orders→customer a 150k·SF one — fact-proportional, so AQE decides
    from measured size (broadcast at bench scale, shuffle or a
    bloom prefilter via ops/bloom.py at 100 TB; a forced hint would
    OOM there and disable AQE's fallback). All five legs share scans
    where Catalyst can and reduce to one counter row each; zero rows
    moved beyond the five counts."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    p = read_table(spark, sf_dir, "part")
    s = read_table(spark, sf_dir, "supplier")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")

    def orphans(fact, dim, fk, pk, label):
        cnt = (
            fact.join(dim.select(pk), fact[fk] == dim[pk], "left_anti")
            .groupBy()
            .agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        return cnt.select(F.lit(label).alias("fk"), "n_orphans")

    legs = [
        orphans(li, o, "l_orderkey", "o_orderkey", "lineitem->orders"),
        orphans(li, p, "l_partkey", "p_partkey", "lineitem->part"),
        orphans(li, s, "l_suppkey", "s_suppkey", "lineitem->supplier"),
        orphans(o, c, "o_custkey", "c_custkey", "orders->customer"),
        orphans(c, n, "c_nationkey", "n_nationkey", "customer->nation"),
    ]
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionAll(leg)
    return out


@query(
    "dataset_profile_summary",
    oracle="""
    SELECT 'orders' AS tbl, 'rows' AS metric, CAST(COUNT(*) AS BIGINT) AS value
    FROM orders
    UNION ALL
    SELECT 'orders', 'distinct_custkey', CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders', 'null_orderdate',
      CAST(COUNT(*) FILTER (WHERE o_orderdate IS NULL) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'lineitem', 'rows', CAST(COUNT(*) AS BIGINT) FROM lineitem
    UNION ALL
    SELECT 'lineitem', 'distinct_orderkey',
      CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) FROM lineitem
    UNION ALL
    SELECT 'events', 'rows', CAST(COUNT(*) AS BIGINT) FROM events
    UNION ALL
    SELECT 'events', 'distinct_users',
      CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events
    UNION ALL
    SELECT 'events', 'null_props',
      CAST(COUNT(*) FILTER (WHERE props IS NULL) AS BIGINT) FROM events
    UNION ALL
    SELECT 'documents', 'rows', CAST(COUNT(*) AS BIGINT) FROM documents
    UNION ALL
    SELECT 'documents', 'distinct_lang',
      CAST(COUNT(DISTINCT lang) AS BIGINT) FROM documents
    """,
    tags=("dq", "profiling"),
)
def dataset_profile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-style profile across FOUR tables in one deliverable
    (long format: table, metric, value): row counts, key distinct
    counts, null counts — the stats a data catalog materializes
    nightly. Each table contributes one aggregate job's worth of
    map-side-combined counters; the long format means adding a metric
    is adding a row expression, not a schema migration. At 100 TB the
    exact distincts swap per-metric to approx_count_distinct with this
    exact query retained as the hash-gated auditor (approx_sketches
    pattern)."""

    # One aggregate PASS per table, metrics unpivoted from the single
    # row via explode (round 13): the former one-leg-per-metric union
    # scanned orders 3x, lineitem 2x, events 3x, documents 2x — 10 scan
    # subtrees for 4 tables. Same rows, same bigint values.
    def table_legs(df, tbl, metrics):
        row = df.groupBy().agg(
            *[expr.alias(f"__m{i}") for i, (_, expr) in enumerate(metrics)]
        )
        cells = F.array(
            *[
                F.struct(
                    F.lit(tbl).alias("tbl"),
                    F.lit(name).alias("metric"),
                    F.col(f"__m{i}").alias("value"),
                )
                for i, (name, _) in enumerate(metrics)
            ]
        )
        return row.select(F.explode(cells).alias("__c")).select(
            "__c.tbl", "__c.metric", "__c.value"
        )

    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    ev = read_table(spark, sf_dir, "events")
    d = read_table(spark, sf_dir, "documents")
    legs = [
        table_legs(o, "orders", [
            ("rows", F.count(F.lit(1))),
            ("distinct_custkey", F.countDistinct("o_custkey")),
            ("null_orderdate", F.count(F.when(F.col("o_orderdate").isNull(), 1))),
        ]),
        table_legs(li, "lineitem", [
            ("rows", F.count(F.lit(1))),
            ("distinct_orderkey", F.countDistinct("l_orderkey")),
        ]),
        table_legs(ev, "events", [
            ("rows", F.count(F.lit(1))),
            ("distinct_users", F.countDistinct("user_id")),
            ("null_props", F.count(F.when(F.col("props").isNull(), 1))),
        ]),
        table_legs(d, "documents", [
            ("rows", F.count(F.lit(1))),
            ("distinct_lang", F.countDistinct("lang")),
        ]),
    ]
    out = legs[0]
    for one in legs[1:]:
        out = out.unionAll(one)
    return out
