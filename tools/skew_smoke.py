"""W2 skew smoke — the "one SKU with a million events" question, measured.

Synthesizes a movement log with one pathological hot key (default: 1M of
10M events on a single key, the rest uniform over ~100k keys) and times
the three W2 replay execution strategies on it:

- ``flat``     — the single-exchange window algebra
  (``ops.windows.replay_running_balance``). The hot key's entire history
  lands in ONE task: wall-clock degrades toward that task's sort+scan.
- ``chunked``  — the two-level segmented scan
  (``ops.windows.replay_running_balance_chunked``): bounded partitions,
  +1 shuffle +1 join of overhead.
- ``stateful`` — the ``applyInPandasWithState`` streaming fallback
  (``streaming.replay_stream.replay_stateful``) drained with an
  availableNow trigger: incremental, O(keys) state, but a Python loop
  per row.

All three compute per-row results; each is forced by a full aggregate
over the output (count + sums), which also cross-checks flat vs chunked
numerically. Usage::

    python tools/skew_smoke.py [n_rows] [hot_rows] [shuffle_parts] [out_json]

Results and the derived flat-vs-chunked threshold live in SCALE.md
("W2 under skew").
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_KEYS = 100_000
CHUNK_SPAN_US = 86_400 * 1_000_000  # 1-day chunks


def synth_skewed(spark: SparkSession, n_rows: int, hot_rows: int) -> DataFrame:
    """Deterministic skewed movement log. Hot key 0 owns ``hot_rows``
    events over ~12 days of per-second timestamps; the cold tail spreads
    uniformly over N_KEYS-1 keys. Hash-derived payloads — rerun-stable,
    no RNG state."""
    cold_keys = N_KEYS - 1
    df = spark.range(0, n_rows, 1, 64).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") < hot_rows, F.lit(0))
        .otherwise(F.col("id") % cold_keys + 1)
        .alias("user_id"),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000)
            + F.when(F.col("id") < hot_rows, F.col("id"))
            .otherwise(F.expr(f"id div {cold_keys}"))
            * 1_000_000
        ).alias("ts"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(37)) == 0).alias("is_abs"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1000)).cast("decimal(18,2)").alias("abs_value"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(21)) - 10)
        .cast("decimal(18,2)")
        .alias("delta"),
    )
    return df.withColumn("abs_value", F.when(F.col("is_abs"), F.col("abs_value"))).withColumn(
        "delta", F.when(F.col("is_abs"), F.lit(0).cast("decimal(18,2)")).otherwise(F.col("delta"))
    )


def _force(df: DataFrame) -> tuple[int, float, float]:
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("running").cast("double")).alias("sr"),
        F.sum(F.col("effective_delta").cast("double")).alias("sd"),
    ).collect()[0]
    return row["n"], row["sr"], row["sd"]


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    hot_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    parts = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    out_path = sys.argv[4] if len(sys.argv) > 4 else None

    from osmart_etl_spark.ops.windows import (
        replay_running_balance,
        replay_running_balance_chunked,
    )
    from osmart_etl_spark.streaming.replay_stream import REPLAY_OUTPUT_SCHEMA, replay_stateful

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="skew_smoke_")
    results: dict = {
        "n_rows": n_rows, "hot_rows": hot_rows, "n_keys": N_KEYS, "shuffle_parts": parts,
    }
    try:
        src = f"{tmp}/src"
        synth_skewed(spark, n_rows, hot_rows).write.mode("overwrite").parquet(src)
        mv = spark.read.parquet(src)

        kw = dict(
            key="user_id", order=["ts", "event_id"],
            delta_col="delta", is_absolute_col="is_abs", abs_value_col="abs_value",
        )

        t0 = time.monotonic()
        flat = _force(replay_running_balance(mv, **kw))
        results["flat_s"] = round(time.monotonic() - t0, 2)

        t0 = time.monotonic()
        chunked = _force(
            replay_running_balance_chunked(
                mv, chunk=F.floor(F.unix_micros("ts") / F.lit(CHUNK_SPAN_US)), **kw
            )
        )
        results["chunked_s"] = round(time.monotonic() - t0, 2)
        results["flat_eq_chunked"] = flat == chunked
        results["checksum"] = {"n": flat[0], "sum_running": flat[1], "sum_delta": flat[2]}

        # auto dispatch (round 11): the probe + whichever form it picks,
        # end-to-end — the number that shows the dispatch lands on the
        # winning side of the crossover at every skew level.
        from osmart_etl_spark.ops.windows import (
            REPLAY_TASK_ROW_BUDGET,
            replay_max_key_rows,
            replay_running_balance_auto,
        )

        t0 = time.monotonic()
        probe = replay_max_key_rows(mv, "user_id")
        results["probe_s"] = round(time.monotonic() - t0, 2)
        results["probe_max_key_rows"] = probe
        results["auto_picks"] = (
            "chunked" if probe > REPLAY_TASK_ROW_BUDGET else "flat"
        )
        t0 = time.monotonic()
        auto = _force(
            replay_running_balance_auto(
                mv, chunk=F.floor(F.unix_micros("ts") / F.lit(CHUNK_SPAN_US)), **kw
            )
        )
        results["auto_s"] = round(time.monotonic() - t0, 2)
        results["auto_eq_flat"] = auto == flat

        # Streaming stateful fallback: event_type encoding of the same log
        # (signup=absolute reset, error=negative, purchase=positive), one
        # availableNow drain into a throwaway sink.
        ev = mv.select(
            "event_id", "user_id", "ts",
            F.when(F.col("is_abs"), F.lit("signup"))
            .when(F.col("delta") < 0, F.lit("error"))
            .otherwise(F.lit("purchase"))
            .alias("event_type"),
            F.when(F.col("is_abs"), F.coalesce(F.col("abs_value"), F.lit(0)))
            .otherwise(F.abs(F.col("delta")))
            .cast("double")
            .alias("value"),
        )
        ev_src = f"{tmp}/ev"
        ev.write.mode("overwrite").parquet(ev_src)
        stream = spark.readStream.schema(ev.schema).parquet(ev_src)
        t0 = time.monotonic()
        q = (
            replay_stateful(stream)
            .writeStream.format("noop")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        results["stateful_s"] = round(time.monotonic() - t0, 2)
        _ = REPLAY_OUTPUT_SCHEMA  # imported for schema parity, not used here
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    line = json.dumps(results)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
