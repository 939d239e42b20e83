"""Structured Streaming layer (SURVEY.md §2.9 T3/T4/T5).

The reference's micro-batch semantics map 1:1:

- T3 completed-window-only emission ("process only through yesterday",
  update_stock_points.py:85-94) = append-mode tumbling window emitting on
  watermark passage;
- T4 SKU-day net delta = 1-day window aggregation;
- T5 keyed running state across batches (prior SOD seeds the replay) =
  ``applyInPandasWithState`` with per-key running balance in the state
  store.

State-store scale note: per-key state here is a single scalar per key —
O(distinct keys) bytes, far below the state store's comfort zone even at
hundreds of millions of SKUs; eviction/timeout is configured NoTimeout
because inventory keys live forever (the reference never expires a SKU).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def daily_net_windowed(events: DataFrame, late: str = "1 day") -> DataFrame:
    """T3/T4 — tumbling 1-day per-key net with late-data watermark.

    In append mode a (key, day) row emits only once its window is sealed
    by the watermark — exactly the reference's only-complete-days rule.
    Works identically on batch DataFrames (window() is just an expr).
    """
    # DECIMAL(18,2) accumulation (the engine-wide money rule, as the
    # sessionize/hopping siblings already do): raw-double sums depend on
    # per-micro-batch addition order, so stream==batch would only hold
    # under rounding (round-12 review).
    v = F.col("value").cast("decimal(18,2)")
    signed = F.when(F.col("event_type") == "error", -v).otherwise(v)
    return (
        events.withWatermark("ts", late)
        .groupBy(F.window("ts", "1 day").alias("w"), F.col("user_id"))
        .agg(
            F.sum(signed).cast("double").alias("net_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("day_start"),
            "user_id",
            "net_value",
            "n_events",
        )
    )


def hopping_engagement_windowed(events: DataFrame, late: str = "1 day") -> DataFrame:
    """Streaming twin of queries/analytics4.hopping_window_engagement:
    7-day window hopping by 1 day via the built-in sliding window()
    (state = 7 concurrently-open windows per key, sealed by the
    watermark in append mode). User counts are APPROXIMATE by design
    (approx_count_distinct/HLL, ~2% error — the column name says so);
    the batch twin makes the same swap at scale."""
    return (
        events.withWatermark("ts", late)
        .groupBy(F.window("ts", "7 days", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value"),
        )
        .select(
            F.col("w.start").cast("date").alias("win_start"),
            "n_events",
            "n_users_approx",
            F.col("total_value").cast("double").alias("total_value"),
        )
    )


def sessionize(events: DataFrame, gap: str = "6 hours", late: str = "1 day") -> DataFrame:
    """Native ``session_window`` twin of the batch gaps-and-islands
    query (queries/temporal.session_windows, ref session semantics):
    per-user sessions closed by >= ``gap`` of inactivity, aggregated to
    (start, end, n_events, value).

    Streaming shape: dynamic-gap session windows merge in the state
    store as events arrive; in append mode a session emits exactly once,
    when the watermark passes ``session_end + gap`` — so late data
    within the watermark still extends/merges its session, and a closed
    session is final (the reference recomputes closed sessions on every
    run; this emits each once, same output, O(open sessions) state).

    Works identically on batch DataFrames (session_window is a grouping
    expr; withWatermark is a no-op in batch). Boundary semantics: a gap
    of EXACTLY ``gap`` starts a new session here (session extent is
    [start, last+gap)), while the islands formulation keeps it
    (``> 6h``). Ties at exact microsecond-boundary gaps are the only
    divergence; the equality test guards that the fixture has none.

    Value sum in DECIMAL(18,2) then double — the engine-wide money rule,
    and exact under any micro-batch ordering.
    """
    return (
        events.withWatermark("ts", late)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("session_value"),
        )
        .select("user_id", "session_start", "session_end", "n_events", "session_value")
    )


def dedup_within_watermark(
    events: DataFrame, keys: list[str] | None = None, late: str = "1 day"
) -> DataFrame:
    """Streaming twin of the exact-dedup operator (queries/text
    ``dedup_exact`` / U5): at-most-once emission per key over an
    unbounded stream, with state bounded by the watermark.

    ``dropDuplicatesWithinWatermark`` keeps a key in the state store only
    until the watermark passes its first-seen event time + ``late`` — so
    re-deliveries inside the lateness window (the at-least-once source
    failure mode: replayed files, redelivered Kafka offsets) dedup
    exactly, while state stays O(keys per watermark window), not O(all
    keys ever). Contrast with batch dedup (full-history groupBy) and
    ``dropDuplicates`` (unbounded state). Works on batch frames too,
    where it degrades to plain dropDuplicates semantics.
    """
    return events.withWatermark("ts", late).dropDuplicatesWithinWatermark(
        list(keys) if keys else ["event_id"]
    )


REPLAY_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("running", DoubleType()),
    ]
)

REPLAY_STATE_SCHEMA = StructType([StructField("running", DoubleType())])


def replay_stateful(events: DataFrame) -> DataFrame:
    """T5 — per-key running balance maintained across micro-batches via
    ``applyInPandasWithState``: the streaming form of the W2 replay, with
    the state store playing the role of the reference's prior-SOD load
    (update_stock_points.py:127-147).

    Within a batch, events sort by (ts, event_id) — the W6 total order;
    across batches, continuity comes from the persisted state scalar.
    Absolute events (signup) reset the accumulator, like W2.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        running = state.get[0] if state.exists else 0.0
        out = []
        # ONE sort over the whole group: Arrow hands a key's micro-batch
        # as MULTIPLE chunks past maxRecordsPerBatch (default 10k rows),
        # and sorting each chunk independently only orders rows
        # per-chunk — a later-ts event in chunk 1 would be applied
        # before an earlier-ts event in chunk 2, silently corrupting
        # the running state (round-12 review). Concatenating first is
        # bounded by the key's per-micro-batch row count, which the
        # Python loop below holds in memory anyway.
        whole = pd.concat(list(pdfs), ignore_index=True)
        whole = whole.sort_values(["ts", "event_id"], kind="mergesort")
        for row in whole.itertuples(index=False):
            if row.event_type == "signup":
                running = float(row.value)
            elif row.event_type == "error":
                running -= float(row.value)
            else:
                running += float(row.value)
            out.append((user_id, row.event_id, row.ts, running))
        state.update((running,))
        yield pd.DataFrame(out, columns=["user_id", "event_id", "ts", "running"])

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=REPLAY_OUTPUT_SCHEMA,
        stateStructType=REPLAY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ewma8", DoubleType()),
    ]
)
EWMA_STATE_SCHEMA = StructType([StructField("hist", ArrayType(DoubleType()))])


def ewma_stateful(events: DataFrame) -> DataFrame:
    """Streaming twin of queries/scale_ops.ewma_lag_chain: the
    depth-8 half-life EWMA as keyed state — the carry is just the last
    7 values (state is O(depth), exactly as the batch docstring
    promises). Floating-point addition order matches the batch lag
    chain term-for-term (v, then each older value / 2^d, left to
    right), so streaming output equals the batch query BIT-FOR-BIT
    when micro-batches arrive in event-time order."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        hist = list(state.get[0]) if state.exists else []
        out = []
        # one sort over the whole group — per-chunk sorts are only a
        # partial order (see replay_stateful, round-12 review)
        whole = pd.concat(list(pdfs), ignore_index=True)
        whole = whole.sort_values(["ts", "event_id"], kind="mergesort")
        for row in whole.itertuples(index=False):
            v = float(row.value)
            e = v
            for d, pv in enumerate(hist):
                e = e + pv / float(1 << (d + 1))
            out.append((user_id, row.event_id, e))
            hist = [v] + hist[:6]
        state.update((hist,))
        yield pd.DataFrame(out, columns=["user_id", "event_id", "ewma8"])

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(
    stream_df: DataFrame, checkpoint_dir: str, query_name: str
) -> list:
    """Drain a stream with the availableNow trigger into a memory sink
    and return the collected rows — the test/bench harness for streaming
    operators (processes everything available, then stops, exactly like
    one cron-style incremental run)."""
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {query_name}").collect()


def replay_transform_with_state(events: DataFrame) -> DataFrame:
    """T5 via ``transformWithStateInPandas`` — Spark 4's successor to
    applyInPandasWithState (explicit typed state variables, timers,
    schema evolution). Same replay semantics as ``replay_stateful``;
    kept as the forward-looking twin so both stateful APIs are covered.

    Runtime dependency: the transformWithState driver worker speaks
    protobuf to the state server — requires a working ``google.protobuf``
    (absent in this container; the equivalence test skips there, and
    ``replay_stateful`` remains the exercised path).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class ReplayProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._running = handle.getValueState("running", "running DOUBLE")

        def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
            (user_id,) = key
            running = self._running.get()[0] if self._running.exists() else 0.0
            out = []
            # one sort over the whole group (see replay_stateful)
            whole = pd.concat(list(rows), ignore_index=True)
            whole = whole.sort_values(["ts", "event_id"], kind="mergesort")
            for row in whole.itertuples(index=False):
                if row.event_type == "signup":
                    running = float(row.value)
                elif row.event_type == "error":
                    running -= float(row.value)
                else:
                    running += float(row.value)
                out.append((user_id, row.event_id, row.ts, running))
            self._running.update((running,))
            yield pd.DataFrame(out, columns=["user_id", "event_id", "ts", "running"])

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        ReplayProcessor(),
        outputStructType=REPLAY_OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


def purchase_click_attribution(
    purchases: DataFrame,
    clicks: DataFrame,
    horizon: str = "1 hour",
    late: str = "1 day",
) -> DataFrame:
    """Stream-stream INNER join with bounded state: each purchase joins
    the same user's clicks from the preceding ``horizon`` (last-touch
    attribution). Works identically on static frames (the batch twin
    the tests compare against).

    State-boundedness is the whole design: watermarks on BOTH inputs
    plus the two-sided time-range condition tell Spark exactly how long
    a buffered click can still match a future purchase, so click state
    older than horizon+late is evicted instead of accumulating forever
    — without the range condition a stream-stream join keeps unbounded
    state and dies at 100 TB/day. Cf. T5/T8 semantics in
    etl_inventory's incremental joins (seed_stock_points.py), replayed
    here as a continuous operator."""
    is_stream = purchases.isStreaming
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    if is_stream:
        p = p.withWatermark("p_ts", late)
        c = c.withWatermark("c_ts", late)
    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {horizon}"))
    )
    return p.join(c, cond).select("p_user", "purchase_id", "click_id", "p_ts", "c_ts")
