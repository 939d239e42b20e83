"""SQL-surface queries — the engine's ``spark.sql`` API demonstrated
end-to-end (the reference's users write SQL: every extract is a .sql
file; SURVEY.md §3 'the frontend is Python scripts + SQL files').

These register the testdata as temp views and run the query through the
SQL frontend, proving the engine exposes the same surface idiomatically:
CTEs, subqueries (scalar / IN / EXISTS), HAVING, LIKE/regexp, and the
classic TPC-H shapes. Catalyst plans SQL and DataFrame identically, so
everything in SCALE.md applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from osmart_etl_spark.io.sources import read_table
from osmart_etl_spark.queries.base import query


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        read_table(spark, sf_dir, n).createOrReplaceTempView(n)


@query(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_qty,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("SQL", "TPCH-Q1"),
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary through the SQL frontend — scan +
    predicate + 2-key grouped decimal arithmetic; the canonical
    partial/final hash-agg benchmark query."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
          CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_qty,
          COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """)


@query(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    tags=("SQL", "TPCH-Q3"),
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact joins → grouped
    revenue → top-k. No join hints anywhere: customer is 150k·SF
    (fact-proportional), so AQE decides from the measured post-filter
    size — broadcast at bench scale, shuffle join at 100 TB."""
    _views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql("""
        SELECT l.l_orderkey,
          CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
          o.o_orderdate, o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, l.l_orderkey
        LIMIT 10
    """)


@query(
    "scalar_subquery_above_avg",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_retailprice > (SELECT AVG(CAST(p_retailprice AS DECIMAL(18,2))) FROM part)
    """,
    tags=("SQL", "subquery-scalar"),
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate — Catalyst plans the inner agg
    once and broadcasts the scalar. Decimal avg keeps the threshold
    bit-identical across engines."""
    _views(spark, sf_dir, "part")
    return spark.sql("""
        SELECT p_partkey, p_name, p_retailprice
        FROM part
        WHERE p_retailprice > (SELECT AVG(CAST(p_retailprice AS DECIMAL(18,2))) FROM part)
    """)


@query(
    "in_exists_subqueries",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_nationkey IN (
        SELECT n.n_nationkey FROM nation n WHERE n.n_regionkey = 1
      )
      AND EXISTS (
        SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45
      )
    """,
    tags=("SQL", "subquery-in-exists"),
)
def in_exists_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN + correlated EXISTS — RewritePredicateSubquery turns both into
    semi-joins (the same plan §2.3 J5 writes directly)."""
    _views(spark, sf_dir, "supplier", "nation", "lineitem")
    return spark.sql("""
        SELECT s.s_suppkey, s.s_name
        FROM supplier s
        WHERE s.s_nationkey IN (
            SELECT n.n_nationkey FROM nation n WHERE n.n_regionkey = 1
          )
          AND EXISTS (
            SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45
          )
    """)


@query(
    "having_like_regexp",
    oracle="""
    SELECT p_brand,
      COUNT(*) AS n_parts,
      CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS brand_value,
      MAX(regexp_extract(p_type, '^([A-Z]{3})', 1)) AS max_type_prefix
    FROM part
    WHERE p_name LIKE '%ol%' AND p_type NOT LIKE 'MEDIUM%'
    GROUP BY p_brand
    HAVING COUNT(*) >= 2
    """,
    tags=("SQL", "having-like-regexp"),
)
def having_like_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / NOT LIKE predicates, regexp_extract, and HAVING — the
    post-aggregation filter the reference never needed but any SQL user
    expects."""
    _views(spark, sf_dir, "part")
    return spark.sql("""
        SELECT p_brand,
          COUNT(*) AS n_parts,
          CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS brand_value,
          MAX(regexp_extract(p_type, '^([A-Z]{3})', 1)) AS max_type_prefix
        FROM part
        WHERE p_name LIKE '%ol%' AND p_type NOT LIKE 'MEDIUM%'
        GROUP BY p_brand
        HAVING COUNT(*) >= 2
    """)


@query(
    "datetime_rebuild",
    oracle="""
    SELECT event_id,
      try_strptime(CONCAT(SUBSTRING(CAST(ts AS VARCHAR), 1, 10), ' ', '12:34:56'),
                   '%Y-%m-%d %H:%M:%S') AS rebuilt_ts,
      try_strptime(CONCAT('garbage-', CAST(event_id AS VARCHAR)),
                   '%Y-%m-%d %H:%M:%S') AS bad_ts,
      CAST(ts AS DATE) - INTERVAL 1 DAY AS prev_day_ts
    FROM events
    """,
    tags=("F-date", "P-coerce"),
)
def datetime_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's datetime rebuild from string slices
    (transform.py:49-53: ``df['fecha'].str[:10] + ' ' + usuhora`` parsed
    with errors='coerce') — substring + concat + to_timestamp, where an
    unparseable input yields NULL (Spark non-ANSI parse == pandas
    coerce == DuckDB try_strptime; Spark 4 runs ANSI mode, so the
    tolerant form is try_to_timestamp)."""
    from pyspark.sql import functions as F

    ev = read_table(spark, sf_dir, "events")
    date_part = F.substring(F.col("ts").cast("string"), 1, 10)
    return ev.select(
        "event_id",
        F.try_to_timestamp(
            F.concat(date_part, F.lit(" "), F.lit("12:34:56")),
            F.lit("yyyy-MM-dd HH:mm:ss"),
        ).alias("rebuilt_ts"),
        F.try_to_timestamp(
            F.concat(F.lit("garbage-"), F.col("event_id").cast("string")),
            F.lit("yyyy-MM-dd HH:mm:ss"),
        ).alias("bad_ts"),
        (F.to_date("ts") - F.expr("interval 1 day")).cast("timestamp").alias("prev_day_ts"),
    )
