"""Single-pass data-quality observability via Spark's Observation API.

The reference logs row counts after every load step
(etl_sales/update_clean_data.py:76, etl_inventory/extract.py:28) —
which in naive Spark becomes an extra .count() action, i.e. a SECOND
full scan per metric. ``df.observe(...)`` attaches aggregate metrics to
the one action that already runs: the executors fold the metrics while
producing the real output, and the driver reads them after the action
for free. At 100 TB this is the difference between "pipeline with
monitoring" and "pipeline that runs twice".

Metrics must be aggregate expressions without distinct/grouping —
Spark's observation contract — so the helpers stick to count/sum/min/
max shapes, which cover the reference's operational logging.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_dq(
    df: DataFrame,
    name: str = "dq",
    *,
    null_cols: tuple[str, ...] = (),
    bounds: dict[str, tuple[float, float]] | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach standard DQ counters to ``df``: total rows, per-column
    NULL counts, and per-column out-of-bounds counts. Returns the
    observed frame (use it in place of ``df``) and the Observation —
    read ``obs.get`` AFTER an action has materialized the frame.

    The counters ride the existing job: zero extra scans, zero extra
    shuffles (metrics fold map-side and merge on the driver)."""
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_cols:
        metrics.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"null_{c}")
        )
    for c, (lo, hi) in (bounds or {}).items():
        metrics.append(
            F.sum(
                F.when((F.col(c) < lo) | (F.col(c) > hi), 1).otherwise(0)
            ).alias(f"oob_{c}")
        )
    obs = Observation(name)
    return df.observe(obs, *metrics), obs
