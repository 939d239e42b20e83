"""Sequence packing — greedy bin-packing of documents into fixed
token-capacity training sequences (the batch-construction step of an LLM
data pipeline: minimize padding by packing short docs together).

Greedy first-fit over a deterministic order is inherently sequential, so
the distributed form shards the corpus (deterministic ``doc_id %
n_shards``), packs each shard independently in one Arrow-batched
``applyInPandas`` pass (the legitimate UDF escape hatch: a running
accumulator whose reset depends on its own value is not a window
function), and namespaces bin ids by shard. At 100 TB each shard's pack
loop is O(shard docs) over integers — scale by raising ``n_shards``;
packing quality is unaffected because bins never span shards anyway.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

PACK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("shard", LongType()),
        StructField("bin_id", LongType()),
        StructField("bin_offset", LongType()),
        StructField("n_tokens", LongType()),
    ]
)


def pack_sequences(
    docs: DataFrame,
    id_col: str,
    token_count: F.Column,
    *,
    capacity: int,
    n_shards: int = 8,
) -> DataFrame:
    """Pack docs (ordered by id within ``doc_id % n_shards`` shards)
    into bins of at most ``capacity`` tokens; docs longer than capacity
    are truncated to it (one full bin). Output is one row per doc:
    (doc_id, shard, bin_id, bin_offset, n_tokens) — bin_id counts from 0
    within each shard, bin_offset is the doc's start position in its
    bin. Deterministic: same corpus → same packing, any partitioning.
    """
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("long").alias("shard"),
        # coalesce BEFORE the clamp: F.least skips NULLs, so a NULL
        # token count (null text) would silently become a phantom
        # full-capacity doc occupying a whole bin (round-12 review) —
        # an empty doc packs as 0 tokens instead.
        F.least(
            F.coalesce(token_count.cast("long"), F.lit(0)), F.lit(capacity)
        ).alias("n"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bin_id, fill = 0, 0
        bins, offs = [], []
        for n in pdf["n"]:
            if fill + n > capacity:  # n <= capacity, so fill=0 never overflows
                bin_id += 1
                fill = 0
            bins.append(bin_id)
            offs.append(fill)
            fill += n
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "shard": pdf["shard"],
                "bin_id": bins,
                "bin_offset": offs,
                "n_tokens": pdf["n"],
            }
        )
        return out

    return base.groupBy("shard").applyInPandas(pack, schema=PACK_SCHEMA)


def assign_token_shards(
    docs: DataFrame,
    id_col: str,
    token_col: str,
    *,
    n_shards: int,
    n_buckets: int = 32,
) -> DataFrame:
    """Token-balanced contiguous shard assignment via two-phase
    distributed prefix sum (the ``corpus_shard_packing`` core, exported
    so the sharded WRITER can reuse it): returns ``docs`` columns plus
    ``shard_id``, where shard = exclusive-token-prefix DIV
    ceil(total/n_shards). Exact (bigint DIV throughout), parallel across
    ``n_buckets`` contiguous id ranges, no single-partition window —
    see queries/scale_ops.corpus_shard_packing for the plan analysis.
    """
    from pyspark.sql import Window

    tot = docs.agg(
        F.max(id_col).alias("__max_id"), F.sum(token_col).alias("__total")
    )
    b = docs.crossJoin(F.broadcast(tot)).withColumn(
        "__bucket", F.expr(f"({id_col} * {n_buckets}) DIV (__max_id + 1)")
    )
    bucket_tot = b.groupBy("__bucket").agg(F.sum(token_col).alias("__btot"))
    w_off = (
        Window.partitionBy(F.lit(0))  # n_buckets rows — bounded
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bucket_off = bucket_tot.select(
        "__bucket", (F.sum("__btot").over(w_off) - F.col("__btot")).alias("__boff")
    )
    w_in = (
        Window.partitionBy("__bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        b.join(F.broadcast(bucket_off), "__bucket")
        .withColumn(
            "__cum_excl",
            F.col("__boff") + F.sum(token_col).over(w_in) - F.col(token_col),
        )
        .withColumn(
            "shard_id",
            F.expr(
                f"__cum_excl DIV ((__total + {n_shards - 1}) DIV {n_shards})"
            ).cast("bigint"),
        )
        .drop("__bucket", "__max_id", "__total", "__btot", "__boff", "__cum_excl")
    )
