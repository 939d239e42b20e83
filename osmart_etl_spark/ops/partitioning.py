"""Volume-scaled partition counts for numbered repartitions.

Numbered (user-specified) repartitions exist to shield CPU-heavy
narrow-row reduce stages from AQE's byte-based coalescing, which
serializes them into 1-2 tasks when the shuffle payload is small per
record (measured: the round-5 serial-reduce pathology, and again round
10 where a fixed 2x-cores count OOMed 7.5M-row per-task sorts at x100
amplification while a blanket 4x count sextupled bench-scale wall time
in scheduler overhead). The count therefore has to SCALE WITH VOLUME:
derive it from the scan's plan-statistics size — parquet footer
metadata, available at plan time with no job — targeting one ~32 MB
input slice per task, floored at 2x cores (bench-scale parallelism)
and capped at 16x cores (scheduler sanity).

On a real cluster ``defaultParallelism`` is total executor cores, so
the same formula yields cluster-proportional counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: target bytes of upstream scan per partition
_BYTES_PER_PART = 32 << 20


def scaled_partitions(
    df: DataFrame,
    *,
    floor_mult: int = 2,
    cap_mult: int = 16,
    bytes_per_part: int = _BYTES_PER_PART,
    min_parts: int = 2,
) -> int:
    """Partition count proportional to ``df``'s plan-statistics byte
    size, clamped to [max(floor_mult x defaultParallelism, min_parts),
    cap_mult x defaultParallelism]. Pass ``floor_mult=0`` for stages
    whose working set is a small projection of the scan (e.g. a
    per-entity aggregate): task-launch overhead dominates tiny sorts,
    so they should shrink all the way down at bench scale while still
    widening with volume."""
    cores = df.sparkSession.sparkContext.defaultParallelism
    size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    return max(
        floor_mult * cores,
        min_parts,
        min(cap_mult * cores, size // bytes_per_part),
    )


def scan_bytes(df: DataFrame) -> int:
    """Plan-statistics byte size of ``df`` (parquet footer metadata for
    scans — no job). The size-dispatch input for operators that switch
    plan shape with volume (cf. ops/dedup.choose_jaccard_verify)."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
