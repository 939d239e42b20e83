"""Streaming twin of the exactly-once ADDITIVE sink: a change stream
drained through ``foreachBatch`` into
``io/sinks.merge_accumulate_versioned`` — round 12, VERDICT r11 #6.

The keep-latest streaming twin (``streaming/merge_stream.py``) gets
exactly-once from idempotence alone: replaying a batch re-merges the
same rows and keep-latest converges. ADDITION is not idempotent —
replaying a batch double-counts — so this twin leans on the sink's
transactional applied-batch ledger instead:

- every micro-batch folds under the structured batch id
  ``(writer_id, epoch)`` — Structured Streaming's epoch ids are exactly
  the monotonic per-writer sequence the round-12 bounded ledger wants,
  so the ledger holds ONE high-water-mark for the whole stream, forever
  (not one entry per epoch);
- a foreachBatch RETRY (crash after the sink's CAS commit, before the
  checkpoint commit) redelivers the same epoch; ``epoch <= hwm`` makes
  the refold a committed-ledger no-op — the redelivered-batch guarantee
  is the SINK's, not an ordering accident;
- aggregate table and ledger publish as one CAS commit, so there is no
  table-updated/ledger-missing window at any crash point.

Together: at-least-once delivery (checkpoint) + transactional
dedup (ledger) = exactly-once additive state, the streaming analogue of
the reference's watermark + re-filter + upsert discipline
(update_raw_stock_movements.py:69) for a sink where re-apply is NOT
harmless.

100 TB shape: state is the per-key aggregate table itself (one row per
key ever); each fold shuffles one row per (key, map partition) —
map-side-combined partials — and the ledger is O(1) per stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def run_accumulate_stream(
    spark: SparkSession,
    stream_df: DataFrame,
    table: str,
    keys: list[str],
    sum_cols: list[str],
    *,
    checkpoint_dir: str,
    writer_id: str = "stream",
) -> None:
    """Drain ``stream_df`` (availableNow), folding each micro-batch's
    additive partials into the versioned aggregate table at ``table``.
    ``writer_id`` must be stable across restarts of the SAME logical
    stream (it scopes the ledger's high-water-mark; two different
    streams folding one table use two writer_ids and coexist)."""
    from osmart_etl_spark.io.sinks import (
        merge_accumulate_versioned,
        read_accumulate_ledger,
    )

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return  # nothing to fold; hwm advances with the next real epoch
        applied = merge_accumulate_versioned(
            spark, batch_df, table, keys, sum_cols,
            batch_id=(writer_id, int(batch_id)),
        )
        if not applied:
            # The only legitimate no-op is crash-replay of the LAST
            # committed epoch (sink committed, checkpoint did not).
            # hwm AHEAD of the epoch means a FRESH checkpoint was
            # pointed at a table this writer_id already advanced — the
            # new epochs' row mix need not match the original batching,
            # so silently skipping drops data (round-12 review; the
            # same mismatch rule as streaming/hll_stream.py).
            hwm = read_accumulate_ledger(spark, table)["hwm"].get(writer_id)
            if hwm is None or hwm > int(batch_id):
                raise RuntimeError(
                    f"accumulate_stream state/checkpoint mismatch at {table}: "
                    f"writer '{writer_id}' has committed hwm {hwm} but the "
                    f"checkpoint delivered epoch {batch_id}. Point the query "
                    "at the original checkpoint, or use a NEW writer_id for "
                    "a genuinely new stream."
                )

    (
        stream_df.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
