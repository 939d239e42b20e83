"""DataFrame-native Bloom filter: build a ~KB bitmap over a key column
and probe it map-side — the shuffle-shrinking join pre-filter.

Why not ``df.stat.bloomFilter``: that collects the filter to the
driver as a JVM object that PySpark cannot re-apply as a Column
predicate; this implementation keeps BOTH sides as DataFrames (the
bitmap is one row of ``map<bigint,bigint>``), so the filter itself is
a broadcast join + codegen bit test, persistable and reusable across
queries — unlike Spark's internal runtime bloom filter
(spark.sql.optimizer.runtime.bloomFilter.enabled), which is planned
per-query and only when the optimizer's heuristics fire.

No cross-engine hash portability is required (the bitmap never leaves
Spark); xxhash64 is the fastest JVM-side hash with a seedable column
form. False positives are always removed by the downstream exact join,
so correctness is unconditional; the knobs trade bitmap size for probe
selectivity only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 1 << 15  # 4 KiB
DEFAULT_K = 4


def build_bloom(
    df: DataFrame, key: str, bits: int = DEFAULT_BITS, k: int = DEFAULT_K
) -> DataFrame:
    """Fold ``df[key]`` into a 1-row Bloom bitmap.

    Shape: explode k positions per key (map-side), bit_or partial
    aggregation onto ≤ bits/64 words (map-side combinable — the
    shuffle moves at most ``bits/64`` longs per input partition), then
    one collect_list into a map. Cost is one tiny exchange regardless
    of build-side row count.
    """
    positions = [
        F.pmod(F.xxhash64(F.lit(i), F.col(key)), F.lit(bits)).cast("bigint")
        for i in range(k)
    ]
    words = (
        df.select(F.explode(F.array(*positions)).alias("pos"))
        .select(
            F.expr("pos DIV 64").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )
    return words.groupBy().agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("__bf")
    )


def membership_expr(key: str, bits: int = DEFAULT_BITS, k: int = DEFAULT_K) -> Column:
    """Codegen predicate: all k bits of ``key`` set in the broadcast
    ``__bf`` map column (attach via ``df.join(F.broadcast(bloom))``)."""
    checks = []
    for i in range(k):
        pos = f"pmod(xxhash64({i}, {key}), {bits})"
        checks.append(
            f"(coalesce(element_at(__bf, ({pos}) DIV 64), CAST(0 AS BIGINT))"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(({pos}) % 64 AS INT))) != 0"
        )
    return F.expr(" AND ".join(checks))


def probe_bloom(
    df: DataFrame,
    key: str,
    bloom: DataFrame,
    bits: int = DEFAULT_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Filter ``df`` to rows whose ``key`` might be in the bloom set
    (no false negatives; FP rate set by bits/k vs build cardinality)."""
    return df.join(F.broadcast(bloom)).filter(membership_expr(key, bits, k)).drop("__bf")
