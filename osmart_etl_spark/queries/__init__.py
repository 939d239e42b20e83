"""Driver-facing query registry (package).

Submodules register queries by importing ``query``/``REGISTRY`` from
``osmart_etl_spark.queries.base``; importing this package pulls them all
in. ``__spark_entry__`` re-exports ``queries()``/``oracle_sql()``.
"""

from osmart_etl_spark.queries.base import (  # noqa: F401
    REGISTRY,
    QueryDef,
    dbl,
    dec,
    oracle_sql,
    queries,
    query,
)

# Import for registration side effects — order defines registry order.
# The driver's correctness snapshot covers the FIRST 50 entries, so the
# modules whose queries have never had a driver row (text/similarity/
# sql_api/functions_surface — 32 queries) come first, followed by dq and
# temporal (fresh row for the fixed session_windows). relational and
# aggregates have two rounds of driver green already.
from osmart_etl_spark.queries import text  # noqa: F401, E402
from osmart_etl_spark.queries import similarity  # noqa: F401, E402
from osmart_etl_spark.queries import sql_api  # noqa: F401, E402
from osmart_etl_spark.queries import functions_surface  # noqa: F401, E402
from osmart_etl_spark.queries import dq  # noqa: F401, E402
from osmart_etl_spark.queries import temporal  # noqa: F401, E402
from osmart_etl_spark.queries import aggregates  # noqa: F401, E402
from osmart_etl_spark.queries import relational  # noqa: F401, E402
from osmart_etl_spark.queries import cleaning  # noqa: F401, E402
from osmart_etl_spark.queries import quantization  # noqa: F401, E402
from osmart_etl_spark.queries import tpch_more  # noqa: F401, E402
from osmart_etl_spark.queries import tpch_final  # noqa: F401, E402
from osmart_etl_spark.queries import corpus_ops  # noqa: F401, E402
from osmart_etl_spark.queries import custom_source  # noqa: F401, E402
from osmart_etl_spark.queries import sketch_quality  # noqa: F401, E402
from osmart_etl_spark.queries.relational import sales_payment_split  # noqa: F401
