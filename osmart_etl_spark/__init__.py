"""osmart_etl_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference retail-ETL system (Oscar-Duque/osmart-etl, surveyed in
SURVEY.md): relational operators, window/temporal operators (incl. the
segmented-reset stock replay), incremental/streaming semantics, DQ
quarantine + reconciliation — re-expressed Spark-first on the DataFrame /
SQL / Catalyst / Structured Streaming stack, plus large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal column plumbing).

Everything here derives from public knowledge only: the Apache Spark /
PySpark API, the read-only reference repo, and published papers.
"""

__version__ = "0.1.0"

from osmart_etl_spark.session import get_spark  # noqa: F401
