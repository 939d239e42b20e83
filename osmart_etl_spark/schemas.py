"""Explicit StructType schemas — the engine never relies on inference for sinks.

Mirrors the reference's fixed DDL-declared storage schemas
(create_raw_stock_movements.sql:3-21, create_stock_points.sql:4-12,
etl_sales/db/db_helpers.py:7-23) re-typed for Spark (SURVEY.md §1.2):
money is DecimalType(20,2) — never degraded to double — ids are long,
event time is timestamp, day grain is date.

Also declares the driver testdata schemas (TESTDATA.md) so scans can be
schema-checked instead of inferred.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Engine tables (reference parity)
# ---------------------------------------------------------------------------

#: Append-only stock-movement event log.
#: Ref: etl_inventory/sql/create_raw_stock_movements.sql:3-21
RAW_STOCK_MOVEMENTS = StructType(
    [
        StructField("id", LongType(), False),
        StructField("fecha", TimestampType(), False),
        StructField("art_id", LongType(), False),
        StructField("tienda_id", IntegerType(), False),
        StructField("tipo_movimiento", StringType(), False),
        StructField("delta_cantidad", LongType(), True),
        StructField("is_absolute", BooleanType(), False),
        StructField("abs_stock_after", LongType(), True),
        StructField("usuario", StringType(), True),
        StructField("tabla_origen", StringType(), True),
        StructField("id_origen", LongType(), True),
        StructField("extracted_at", TimestampType(), True),
    ]
)

#: Sparse start-of-day stock change-points.
#: Ref: etl_inventory/sql/create_stock_points.sql:4-12
STOCK_POINTS = StructType(
    [
        StructField("store_id", IntegerType(), False),
        StructField("art_id", LongType(), False),
        StructField("point_date", DateType(), False),
        StructField("sod_stock", LongType(), False),
        StructField("updated_at", TimestampType(), True),
    ]
)

#: Unified clean-sales fact table.
#: Ref: etl_sales/db/db_helpers.py:7-23 (DECIMAL(20,2) money columns)
VENTAS_LIMPIAS = StructType(
    [
        StructField("ven_id", LongType(), False),
        StructField("fecha_hora", TimestampType(), True),
        StructField("caja", StringType(), True),
        StructField("usuario", StringType(), True),
        StructField("efectivo", DecimalType(20, 2), True),
        StructField("tarjeta", DecimalType(20, 2), True),
        StructField("otros", DecimalType(20, 2), True),
        StructField("total_venta", DecimalType(20, 2), True),
        StructField("tienda", StringType(), False),
        StructField("source_db", StringType(), True),
        StructField("source_system", StringType(), False),
        StructField("extracted_at", TimestampType(), True),
    ]
)

#: Per-store incremental watermarks.
#: Ref: etl_progress usage — etl_sales/update_clean_data.py:42-48,
#: etl_inventory/sql/get_last_raw_ts.sql:1-3
ETL_PROGRESS = StructType(
    [
        StructField("store_name", StringType(), False),
        StructField("last_raw_ts", TimestampType(), True),
        StructField("last_points_dt", DateType(), True),
        StructField("last_processed_ven_id", LongType(), True),
        StructField("updated_at", TimestampType(), True),
    ]
)

#: DQ exclusions registry (quarantine audit log).
#: Ref: etl_inventory/dq_exclusions_csv.py:8,22-27
DQ_EXCLUSIONS = StructType(
    [
        StructField("store_id", IntegerType(), True),
        StructField("art_id", LongType(), True),
        StructField("hist_id", LongType(), True),
        StructField("fecha_iso", StringType(), True),
        StructField("reason", StringType(), False),
        StructField("uniq", StringType(), False),
        StructField("logged_at", TimestampType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Driver testdata tables (TESTDATA.md)
# ---------------------------------------------------------------------------

TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": StructType(
        [
            StructField("r_regionkey", IntegerType()),
            StructField("r_name", StringType()),
        ]
    ),
    "nation": StructType(
        [
            StructField("n_nationkey", IntegerType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", IntegerType()),
        ]
    ),
    "customer": StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_name", StringType()),
            StructField("c_nationkey", IntegerType()),
            StructField("c_acctbal", DoubleType()),
            StructField("c_mktsegment", StringType()),
        ]
    ),
    "supplier": StructType(
        [
            StructField("s_suppkey", LongType()),
            StructField("s_name", StringType()),
            StructField("s_nationkey", IntegerType()),
            StructField("s_acctbal", DoubleType()),
        ]
    ),
    "part": StructType(
        [
            StructField("p_partkey", LongType()),
            StructField("p_name", StringType()),
            StructField("p_brand", StringType()),
            StructField("p_type", StringType()),
            StructField("p_size", IntegerType()),
            StructField("p_retailprice", DoubleType()),
        ]
    ),
    "orders": StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderdate", TimestampType()),
            StructField("o_orderpriority", StringType()),
        ]
    ),
    "lineitem": StructType(
        [
            StructField("l_orderkey", LongType()),
            StructField("l_partkey", LongType()),
            StructField("l_suppkey", LongType()),
            StructField("l_linenumber", IntegerType()),
            StructField("l_quantity", DoubleType()),
            StructField("l_extendedprice", DoubleType()),
            StructField("l_discount", DoubleType()),
            StructField("l_tax", DoubleType()),
            StructField("l_returnflag", StringType()),
            StructField("l_linestatus", StringType()),
            StructField("l_shipdate", TimestampType()),
        ]
    ),
    "events": StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    ),
    "documents": StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    ),
    "embeddings": StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    ),
}

TESTDATA_TABLES = tuple(TESTDATA_SCHEMAS)
