from osmart_etl_spark.io.sources import read_table, read_tables  # noqa: F401
