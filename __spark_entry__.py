"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over the engine's query registry
(``osmart_etl_spark/queries.py``): ``entry`` runs the flagship query at
sf0.001, ``queries``/``oracle_sql`` expose every implemented operator
from SURVEY.md §2 with its DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from osmart_etl_spark import queries as _q

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the EP1 sales conditional aggregation (SURVEY.md
    §2.4 A1/A2 — extract_sicar_sales.sql semantics on the events table).
    """
    return _q.sales_payment_split(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted → rows-only check)."""
    return _q.oracle_sql()
