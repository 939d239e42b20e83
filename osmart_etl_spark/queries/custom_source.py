"""Registry query over the custom Python DataSource — the oracle
re-derives the source's deterministic generator ARITHMETICALLY in
DuckDB (md5-hex slices over generate_series), so the driver's parity
gate verifies the whole extension stack end-to-end: Python reader →
Arrow → Catalyst agg == pure SQL re-derivation. No parquet involved on
the Spark side at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osmart_etl_spark.queries.base import dbl, dec, query

_N_ROWS = 2000


@query(
    "custom_source_ledger_agg",
    oracle=f"""
    WITH gen AS (
      SELECT
        ('0x' || substr(md5('synth:' || i), 9, 2))::BIGINT % 5 AS e_idx,
        ('0x' || substr(md5('synth:' || i), 1, 8))::BIGINT % 1000 AS user_id,
        ROUND(CAST(('0x' || substr(md5('synth:' || i), 11, 6))::BIGINT % 50000
                   AS DOUBLE) / 100.0 - 50.0, 2) AS value,
        TIMESTAMP '2024-03-01 00:00:00'
          + (('0x' || substr(md5('synth:' || i), 17, 6))::BIGINT % 2592000)
            * INTERVAL 1 SECOND AS ts
      FROM (SELECT UNNEST(generate_series(0, {_N_ROWS - 1})) AS i)
    )
    SELECT
      CASE e_idx WHEN 0 THEN 'view' WHEN 1 THEN 'click' WHEN 2 THEN 'purchase'
                 WHEN 3 THEN 'error' ELSE 'signup' END AS event_type,
      CAST(COUNT(*) AS BIGINT) AS n,
      CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      MIN(ts) AS first_ts
    FROM gen GROUP BY 1
    """,
    tags=("ext-source", "python-datasource"),
)
def custom_source_ledger_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over the Python DataSource feed (io/pydatasource.py):
    per event type, row count, distinct users, exact-decimal value sum,
    first timestamp. The DuckDB oracle regenerates every row from the
    same md5 derivation — if the reader dropped, duplicated, or skewed
    a single row across its partitions, the value hash diverges.
    (sf_dir is unused: this source has no file behind it, which is the
    point.) Decimal-cast sums keep the float path bit-stable even
    though Python's round() and DuckDB's ROUND() may differ by an ulp
    on the raw doubles."""
    from osmart_etl_spark.io.pydatasource import SyntheticEventsDataSource

    # Required at EXECUTION time whenever a Python source implements
    # pushFilters (reader init fails otherwise), so it cannot be
    # restored after this function returns — the lazy DataFrame would
    # break. Deliberate, session-visible side effect; get_spark sets
    # the same default. Only touch the conf if it is not already on.
    key = "spark.sql.python.filterPushdown.enabled"
    if spark.conf.get(key, "false").lower() != "true":
        spark.conf.set(key, "true")
    spark.dataSource.register(SyntheticEventsDataSource)
    feed = (
        spark.read.format("synthetic_events")
        .option("n_rows", _N_ROWS)
        .option("partitions", 4)
        .load()
    )
    return feed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        dbl(F.sum(dec(F.col("value")))).alias("total_value"),
        F.min("ts").alias("first_ts"),
    )
