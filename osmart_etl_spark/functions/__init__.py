from osmart_etl_spark.functions.udfs import (  # noqa: F401
    calendar_udtf,
    tag_issue_native,
    tag_issue_pandas_udf,
    tag_issue_python_udf,
    waterfall_pandas_iter_udf,
    weighted_avg_grouped_agg,
)
