"""Final TPC-H shape batch: the nine spec queries whose plan shapes the
registry did not yet cover (Q4 EXISTS-semi, Q12 CASE-agg over join,
Q13 outer-join count distribution, Q14 global-ratio, Q16 distinct-count
with NOT-IN exclusion, Q17 correlated-avg decorrelation, Q19 disjunctive
OR-of-ANDs join, Q21 double-correlated EXISTS/NOT-EXISTS, Q22 scalar-avg
+ anti-join). Adapted to the generator's schema (no
commitdate/receiptdate/shipmode/phone columns): "late" means shipped
more than N days after the order date, Q12's mode dimension is
l_linestatus, Q22's country code is the customer-number suffix.

These are extension surface beyond the reference's pandas scripts
(SURVEY.md §2 families P4/P14/J5/A1/A7/O3); each one documents the plan
shape that must survive a 100 TB fact table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from osmart_etl_spark.io.sources import read_table
from osmart_etl_spark.queries.base import dbl, dec, query


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o.o_orderpriority
    """,
    tags=("tpch", "q4"),
)
def tpch_q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: priority counts for orders with at least one late
    line (shipped >30 days after the order date). The EXISTS becomes a
    LEFT SEMI join whose condition references BOTH sides — Catalyst
    keeps it a single semi hash join on l_orderkey with the date
    comparison as a join residual, so lineitem is never aggregated or
    deduplicated first. Scale shape: one shuffle pair on orderkey; the
    orders date filter is pushed to the scan, shrinking the probe side
    before the shuffle."""
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        o.join(li, on=late, how="left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
    )


@query(
    "tpch_q12_priority_by_status",
    oracle="""
    SELECT l.l_linestatus,
      CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
               THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
    tags=("tpch", "q12"),
)
def tpch_q12_priority_by_status(spark, sf_dir):
    """TPC-H Q12 shape (shipmode → linestatus on this schema): join then
    split counts by a CASE over the other table's column. One shuffle
    pair on orderkey; both CASE sums fold into the same hash aggregate
    (single pass, map-side partials); the shipdate year filter is pushed
    to the lineitem scan."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
    )


@query(
    "tpch_q13_order_count_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    tags=("tpch", "q13"),
)
def tpch_q13_order_count_distribution(spark, sf_dir):
    """TPC-H Q13: distribution of per-customer order counts, INCLUDING
    zero-order customers (the left outer join is load-bearing — COUNT of
    the nullable key, not COUNT(*)). Two cascaded aggregations: the
    first shuffles on custkey, the second on the tiny c_count domain —
    the second exchange is a few hundred groups regardless of data
    size, so the shape is one real shuffle."""
    c = read_table(spark, sf_dir, "customer").select("c_custkey")
    o = read_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))


@query(
    "tpch_q14_promo_revenue_share",
    oracle="""
    SELECT
      CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS ship_year,
      CAST(100.0
        * CAST(SUM(CASE WHEN p.p_type = 'ECONOMY'
                   THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        AS DOUBLE) AS promo_share
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT)
    """,
    tags=("tpch", "q14"),
)
def tpch_q14_promo_revenue_share(spark, sf_dir):
    """TPC-H Q14 shape: the global-ratio aggregate — promo revenue as a
    percent of all revenue, per ship year. Both the numerator (CASE'd)
    and denominator fold into ONE hash aggregate over the same join, so
    the ratio costs no extra pass. part is SF-linear and unhinted —
    AQE broadcasts it at bench scale, shuffles at 100 TB; the only
    planned shuffle is the per-year agg. Bit-safety: both sums are exact decimals; the
    division happens once, in double, in the same operand order on both
    engines."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = dec(F.col("l_extendedprice")) * (1 - dec(F.col("l_discount")))
    promo = F.when(F.col("p_type") == "ECONOMY", rev).otherwise(F.lit(0).cast("decimal(18,2)"))
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy(F.year("l_shipdate").cast("bigint").alias("ship_year"))
        .agg(
            (F.lit(100.0) * dbl(F.sum(promo)) / dbl(F.sum(rev))).alias("promo_share"),
        )
    )


@query(
    "tpch_q16_supplier_cnt",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
      CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    tags=("tpch", "q16"),
)
def tpch_q16_supplier_cnt(spark, sf_dir):
    """TPC-H Q16 shape (partsupp → lineitem on this schema): distinct
    suppliers per (brand, type, size), excluding a denylist (negative
    acctbal standing in for the complaints LIKE). The NOT IN becomes a
    LEFT ANTI join; the denylist is a filtered slice of supplier — an
    SF-linear table — so it carries NO forced hint and AQE makes the
    exclusion a map-side broadcast at bench scale, a shuffle at 100 TB. COUNT(DISTINCT) expands to a two-phase
    aggregate (dedup on group+suppkey, then count) — one shuffle keyed
    by the group columns, no row explosion."""
    li = read_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type", "p_size")
    bad = (
        read_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(bad, li["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


@query(
    "tpch_q17_small_qty_revenue",
    oracle="""
    WITH part_avg AS (
      SELECT l_partkey,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
          / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part_avg a ON a.l_partkey = l.l_partkey
    WHERE l.l_quantity < 0.5 * a.avg_qty
    """,
    tags=("tpch", "q17"),
)
def tpch_q17_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17: revenue from lines whose quantity is under half the
    part's average — the correlated scalar subquery, decorrelated into
    a per-part aggregate joined back to the fact. Both sides shuffle on
    partkey; AQE can reuse the exchange since the aggregate is built
    from the same scan. Bit-safety: avg = exact-decimal sum / count in
    double, and 0.5* is a power of two (exact), so the boundary
    comparison is bit-identical across engines."""
    li = read_table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy(F.col("l_partkey").alias("pa_key")).agg(
        (dbl(F.sum(dec(F.col("l_quantity")))) / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(part_avg, li["l_partkey"] == F.col("pa_key"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg((dbl(F.sum(dec(F.col("l_extendedprice")))) / F.lit(7.0)).alias("avg_yearly"))
    )


@query(
    "tpch_q19_disjunctive_join",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    GROUP BY ()
    """,
    tags=("tpch", "q19"),
)
def tpch_q19_disjunctive_join(spark, sf_dir):
    """TPC-H Q19: the disjunctive OR-of-ANDs join predicate. Catalyst
    factors the single-side conjuncts out of the OR: the part scan gets
    `p_brand IN (...)`-style pushdown and lineitem gets the quantity
    range union, so neither scan reads rows no branch could accept; the
    residual OR evaluates post-join inside codegen. part is SF-linear
    and unhinted: at bench scale AQE broadcasts it (zero shuffles
    before the single-row agg); at 100 TB the same plan degrades to a
    shuffle join instead of a forced multi-GB build."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    joined = li.join(p, li["l_partkey"] == p["p_partkey"])
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15) & q.between(20, 30))
    )
    rev = dec(F.col("l_extendedprice")) * (1 - dec(F.col("l_discount")))
    return joined.filter(cond).agg(
        dbl(F.sum(rev)).alias("revenue"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    )


@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
    WITH lo AS (
      SELECT l.l_orderkey, l.l_suppkey,
        (l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) AS is_late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
    ),
    stats AS (
      SELECT l_orderkey,
        COUNT(DISTINCT l_suppkey) AS n_supp,
        COUNT(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late
      FROM lo GROUP BY l_orderkey
    )
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lo
    JOIN stats t ON t.l_orderkey = lo.l_orderkey
               AND t.n_supp > 1 AND t.n_late = 1
    JOIN supplier s ON s.s_suppkey = lo.l_suppkey
    WHERE lo.is_late
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name ASC
    LIMIT 100
    """,
    tags=("tpch", "q21"),
)
def tpch_q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21: suppliers who single-handedly held up multi-supplier
    orders — the hardest correlation shape in the suite (EXISTS another
    supplier AND NOT EXISTS another LATE supplier, both over the same
    fact). Decorrelated into one per-order aggregate: n_supp>1 encodes
    the EXISTS, n_late=1 encodes the NOT-EXISTS (the late line's own
    supplier is the one late supplier). That turns two correlated
    self-joins into a single groupBy + join on orderkey — same key, so
    AQE reuses the exchange; supplier (SF-linear) is unhinted and
    AQE-dispatched. 'Late' = shipped >60
    days after the order date on this schema."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lo = (
        li.join(o.select("o_orderkey", "o_orderdate"), li["l_orderkey"] == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ).alias("is_late"),
        )
    )
    stats = lo.groupBy(F.col("l_orderkey").alias("st_key")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("n_late"),
    )
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        lo.filter(F.col("is_late"))
        .join(
            stats.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1)),
            F.col("l_orderkey") == F.col("st_key"),
        )
        .join(s, F.col("l_suppkey") == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


@query(
    "tpch_q22_global_sales_opportunity",
    oracle="""
    WITH pool AS (
      SELECT substr(c_name, 17, 2) AS cntrycode, c_custkey, c_acctbal
      FROM customer
      WHERE substr(c_name, 17, 2) IN ('02','03','11','13','23','29','31','34','83')
    ),
    avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS a
      FROM pool WHERE c_acctbal > 0.0
    )
    SELECT p.cntrycode,
      CAST(COUNT(*) AS BIGINT) AS numcust,
      CAST(SUM(CAST(p.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM pool p, avg_bal
    WHERE p.c_acctbal > avg_bal.a
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = p.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
    GROUP BY p.cntrycode
    """,
    tags=("tpch", "q22"),
)
def tpch_q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22: dormant high-balance customers by country code
    (customer-number suffix on this schema — there is no phone column;
    'dormant' = no order since 2000, because this generator gives every
    customer at least one lifetime order). Three shapes in one query: a
    scalar aggregate broadcast under the filter (crossJoin of a 1-row
    frame — never a shuffle), a NOT EXISTS as LEFT ANTI join against
    the recent-orders slice, and the final tiny-domain agg. The anti
    join is the only shuffle; the date filter and single-column
    projection shrink the orders side before it exchanges."""
    codes = ("02", "03", "11", "13", "23", "29", "31", "34", "83")
    c = read_table(spark, sf_dir, "customer").select(
        F.substring("c_name", 17, 2).alias("cntrycode"), "c_custkey", "c_acctbal"
    )
    pool = c.filter(F.col("cntrycode").isin(*codes))
    avg_bal = pool.filter(F.col("c_acctbal") > 0.0).agg(
        (dbl(F.sum(dec(F.col("c_acctbal")))) / F.count(F.lit(1))).alias("a")
    )
    o = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        pool.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, F.col("c_custkey") == o["o_custkey"], "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            dbl(F.sum(dec(F.col("c_acctbal")))).alias("totacctbal"),
        )
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("tpch", "q6"),
)
def tpch_q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: the pure scan-reduce query — every predicate pushes to
    the parquet scan (PushedFilters: ship-date range, discount range,
    quantity bound), then a single map-side-combined global SUM. The
    benchmark's canonical I/O-bound shape: at 100 TB with date
    partitioning the range predicate is partition pruning and the whole
    query reads one year of data, shuffles ONE row per task. Revenue is
    an exact decimal product-sum (price·discount at scale 4 is exact),
    cast to double once."""
    li = read_table(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.groupBy().agg(
        dbl(F.sum(dec(F.col("l_extendedprice")) * dec(F.col("l_discount")))).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "tpch_q8_market_share",
    oracle="""
    WITH volumes AS (
      SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
        CAST(l.l_extendedprice AS DECIMAL(18,2))
          * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
        ns.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = nc.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
      JOIN part p     ON p.p_partkey = l.l_partkey
      WHERE r.r_name = 'AMERICA'
        AND p.p_type LIKE '%AND%'
    )
    SELECT o_year,
      CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN volume
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM volumes GROUP BY o_year
    """,
    tags=("tpch", "q8"),
)
def tpch_q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape (national market share): a seven-table snowflake.
    Only the CONSTANT dimensions carry explicit broadcast hints —
    nation/region (25/5 rows at any SF). part (200k·SF), supplier
    (10k·SF), orders (1.5M·SF) and customer (150k·SF) all scale WITH
    the fact table — same exponent, smaller constants — so they get NO
    hint: at bench scale AQE still picks a broadcast build for them
    from measured sizes, while at 100 TB the same plan degrades
    gracefully to a shuffle join instead of OOMing on a forced
    multi-GB broadcast. The share is a
    conditional decimal sum over a filtered-dimension flag divided by
    the total — both sums exact, one double division. Region/part-type
    filters shrink the dimension hash tables BEFORE broadcast
    (predicate pushdown on the build side — visible as Filter under
    BroadcastExchange)."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_type").like("%AND%"))

    nc = n.select(F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region"))
    ns = n.select(F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation"))
    vol = dec(F.col("l_extendedprice")) * (F.lit(1) - dec(F.col("l_discount")))
    volumes = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(nc), c["c_nationkey"] == F.col("nc_key"))
        .join(F.broadcast(r), F.col("nc_region") == r["r_regionkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(ns), s["s_nationkey"] == F.col("ns_key"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return volumes.groupBy("o_year").agg(
        (
            dbl(F.sum(F.when(F.col("supp_nation") == "NATION_7", F.col("volume")).otherwise(zero)))
            / dbl(F.sum("volume"))
        ).alias("mkt_share")
    )


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
        SUM(CAST(l_extendedprice AS DECIMAL(18,2))
            * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
      CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s JOIN revenue r ON r.supplier_no = s.s_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("tpch", "q15"),
)
def tpch_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape (top supplier by quarterly revenue): the
    scalar-subquery-on-an-aggregate pattern. The revenue CTE reduces
    the date-pruned fact slice to one row per supplier (map-side
    combined); the MAX is a 1-row broadcast joined back as a filter —
    NOT a global sort — so ties surface as multiple rows exactly as the
    spec demands. Revenue equality is DECIMAL equality (exact), which
    is the only reason a '= MAX' filter is even well-defined across
    engines; the double cast happens after the comparison."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(dec(F.col("l_extendedprice")) * (F.lit(1) - dec(F.col("l_discount")))).alias(
            "__rev"
        )
    )
    mx = revenue.groupBy().agg(F.max("__rev").alias("__mx"))
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(mx), F.col("__rev") == F.col("__mx"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", dbl(F.col("__rev")).alias("total_revenue"))
    )
