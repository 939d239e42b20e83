"""Skew mitigation operators (SURVEY.md §4 / SCALE.md).

At 100 TB a single hot key (one SKU with 10⁹ events, one user generating
half the log) turns a groupBy/join partition into a straggler. AQE's
skew-join splitting covers sort-merge joins; for aggregations and
broadcast-ineligible joins the classic fixes are explicit:

- **Salted two-phase aggregation**: spray each key across N salt
  buckets, partially aggregate per (key, salt), then merge partials per
  key. The second shuffle carries N rows per key instead of the raw
  event count. Works for any algebraic aggregate (sum/count/min/max —
  anything with a merge function).
- **Salted join** (not needed for any current query, shape documented
  here): replicate the small side N× with salt ids, salt the big side's
  key randomly, join on (key, salt).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value: Column,
    n_salts: int = 16,
    value_alias: str = "total",
    count_alias: str = "n",
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Skew-proof SUM + COUNT per key via two-phase salted aggregation.

    Phase 1 groups by (keys…, salt) — the hot key's rows spread over
    ``n_salts`` reducers; phase 2 merges the ≤n_salts partials per key.
    Results are identical to a plain groupBy (sum/count are algebraic).

    The salt hashes **stable row content** (``salt_from``, e.g. a unique
    event id), never ``rand()`` or ``monotonically_increasing_id()``:
    both of those depend on run/partition layout, so a stage retry after
    a fetch failure can route recomputed rows to different (key, salt)
    reducers (SPARK-23207-class loss/duplication) and reproducibility
    audits break. ``salt_from`` is required so the determinism guarantee
    is real, not aspirational.
    """
    if not salt_from:
        raise ValueError(
            "salt_from is required: pass stable unique column(s) (e.g. an "
            "event id) so the salt is deterministic under task retry"
        )
    salt = (
        F.abs(F.hash(*[F.col(c) for c in salt_from])) % n_salts
    ).alias("__salt")
    partial = (
        df.select(*keys, value.alias("__v"), salt)
        .groupBy(*keys, "__salt")
        .agg(F.sum("__v").alias("__pv"), F.count(F.lit(1)).alias("__pc"))
    )
    return partial.groupBy(*keys).agg(
        F.sum("__pv").alias(value_alias), F.sum("__pc").cast("bigint").alias(count_alias)
    )
