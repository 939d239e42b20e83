"""Window / ordered-stateful operators (SURVEY.md §2.5 W1-W7).

This is the semantic heart of the engine. The reference runs these as
single-threaded pandas loops over ``groupby('art_id')``
(seed_stock_points.py:74-85); here every one is a Spark window over
long-form data — one shuffle on the partition key, then a single ordered
pass per partition, fully parallel across keys. The wide SKU×date pivot
the reference builds (seed_stock_points.py:99-106) exists only because
pandas lacks cheap partitioned windows; it never appears here.

Determinism rule (W6): Spark sort is not stable, so every window order
includes a unique tiebreaker column (the monotonic source id). The
reference gets the same effect from ``kind='mergesort'``
(seed_stock_points.py:70).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def running_total(
    df: DataFrame, keys: list[str], order: list[str | Column], value: str, out: str = "running"
) -> DataFrame:
    """W3 — cumulative sum per key over event order.

    Ref: seed_stock_points.py:105 (``wide.cumsum(axis=1)``).
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out, F.sum(value).over(w))


def shifted(
    df: DataFrame, keys: list[str], order: list[str | Column], value: str,
    out: str, offset: int = 1, default=0,
) -> DataFrame:
    """W4 — lag/shift: start-of-day stock = prior day's end-of-day.

    Ref: seed_stock_points.py:106 (``eod.shift(1, axis=1, fill_value=0)``).
    ``default`` may be a literal or a Column (lag's own default accepts
    only literals, so the fill goes through coalesce).
    """
    w = Window.partitionBy(*keys).orderBy(*order)
    fill = default if isinstance(default, Column) else F.lit(default)
    return df.withColumn(out, F.coalesce(F.lag(value, offset).over(w), fill))


def change_points(
    df: DataFrame, keys: list[str], order: list[str | Column], value: str
) -> DataFrame:
    """W5 — sparse encode: keep a row only when ``value`` changes.

    Ref: seed_stock_points.py:119-126 (``prev.isna() | sod.ne(prev)``).
    The inverse (dense reconstruction) is temporal.densify / J7 as-of.
    """
    w = Window.partitionBy(*keys).orderBy(*order)
    # Window expressions can't live in a WHERE clause — materialize the
    # lag as a column, filter, drop.
    return (
        df.withColumn("__prev", F.lag(value).over(w))
        .filter(F.col("__prev").isNull() | (F.col(value) != F.col("__prev")))
        .drop("__prev")
    )


# ---------------------------------------------------------------------------
# W2 — segmented-reset running balance (the flagship operator)
# ---------------------------------------------------------------------------

def replay_running_balance(
    df: DataFrame,
    key: str,
    order: list[str],
    *,
    delta_col: str = "delta",
    is_absolute_col: str = "is_absolute",
    abs_value_col: str = "abs_value",
    init_col: str | None = None,
    out_running: str = "running",
    out_delta: str = "effective_delta",
) -> DataFrame:
    """W2 — per-key running balance where absolute events RESET the
    accumulator, emitting each event's effective delta.

    Semantics (ref seed_stock_points.py:74-85; update variant :135-147):
    ordered by ``order`` within ``key``::

        running = init                  # 0 at seed, prior SOD at update
        for ev in events:
            if ev.is_absolute:
                target = coalesce(ev.abs_value, 0)
                d = target - running    # NULL abs -> 0 (ref :79)
                running = target
            else:
                d = ev.delta
                running += d

    Spark-first formulation — **no UDF, ONE exchange, ONE sort**: every
    window partitions by ``key`` alone and orders by ``order``, so
    Catalyst plans a single shuffle + sort feeding stacked Window
    operators. The segment decomposition (partitionBy(key, segment))
    would cost a second shuffle; instead the reset algebra uses only
    same-partitioning running expressions::

        cum_delta     = Σ delta over non-absolute rows so far
        base          = last absolute target at-or-before current row
        cum_at_base   = cum_delta AT that absolute row
        running       = coalesce(base, init) + cum_delta - cum_at_base

    ``init_col`` names a per-key initial-balance column already joined
    onto ``df`` (incremental mode, T5); None means init=0 (seed mode).
    The asymmetry is exactly the reference's seed-vs-update split.
    """
    init = F.coalesce(F.col(init_col), F.lit(0)) if init_col else F.lit(0)
    is_abs = F.col(is_absolute_col)
    w = Window.partitionBy(key).orderBy(*order)
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    cum_delta = F.sum(F.when(is_abs, F.lit(0)).otherwise(F.col(delta_col))).over(frame)
    base = F.last(
        F.when(is_abs, F.coalesce(F.col(abs_value_col), F.lit(0))), ignorenulls=True
    ).over(frame)
    df = df.withColumn("__cumd", cum_delta).withColumn("__base", base)

    # cum_delta at the most recent absolute row (nested-window-free:
    # __cumd is materialized by the first Window pass, same partitioning).
    cum_at_base = F.last(F.when(is_abs, F.col("__cumd")), ignorenulls=True).over(frame)
    df = df.withColumn(
        out_running,
        F.coalesce(F.col("__base"), init)
        + F.col("__cumd")
        - F.coalesce(cum_at_base, F.lit(0)),
    )

    prev_running = F.lag(F.col(out_running)).over(w)
    df = df.withColumn(out_delta, F.col(out_running) - F.coalesce(prev_running, init))
    return df.drop("__cumd", "__base")


def replay_running_balance_chunked(
    df: DataFrame,
    key: str,
    order: list[str],
    *,
    chunk: Column,
    delta_col: str = "delta",
    is_absolute_col: str = "is_absolute",
    abs_value_col: str = "abs_value",
    init_col: str | None = None,
    out_running: str = "running",
    out_delta: str = "effective_delta",
) -> DataFrame:
    """W2 with BOUNDED partitions — the skew-proof form of
    :func:`replay_running_balance` for keys whose event count exceeds a
    single task's comfort zone (the ref's pandas loop simply dies there;
    seed_stock_points.py:74-85 holds one SKU's history in memory).

    Two-level distributed segmented scan (the classic parallel-prefix
    decomposition, applied to the reset monoid):

    1. ``chunk`` splits each key's history into order-aligned ranges
       (the expression must be a non-decreasing function of the LEADING
       order column, e.g. ``floor(unix_micros(ts) / week)``), so every
       window below partitions by ``(key, chunk)`` — partition size is
       bounded by chunk span, never by key cardinality skew.
    2. Within-chunk pass: the same reset algebra as the flat form,
       partitioned by ``(key, chunk)``.
    3. Each chunk collapses to its effect on an incoming balance ``r``:
       ``out(r) = exit_base            if the chunk saw an absolute
                  r + delta_sum        otherwise``
       — which is exactly one (is_absolute, abs_value, delta) event at
       chunk granularity. The chunk-level scan is therefore a recursive
       call to :func:`replay_running_balance` over the tiny summary
       table (|keys| x |chunks| rows).
    4. Chunk entry state joins back on ``(key, chunk)`` — the same
       partitioning the rows already have.

    Cost vs the flat form: +1 shuffle (summary scan) +1 join. Use it
    when a single key's events exceed ~what one task should sort
    (measured threshold in SCALE.md); the flat single-exchange form
    wins below that.
    """
    is_abs = F.col(is_absolute_col)
    init = F.coalesce(F.col(init_col), F.lit(0)) if init_col else F.lit(0)

    df = df.withColumn("__chunk", chunk)
    wc = Window.partitionBy(key, "__chunk").orderBy(*order)
    frame = wc.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    cum_delta = F.sum(F.when(is_abs, F.lit(0)).otherwise(F.col(delta_col))).over(frame)
    base = F.last(
        F.when(is_abs, F.coalesce(F.col(abs_value_col), F.lit(0))), ignorenulls=True
    ).over(frame)
    df = df.withColumn("__cumd", cum_delta).withColumn("__base", base)
    df = df.withColumn(
        "__cumab", F.last(F.when(is_abs, F.col("__cumd")), ignorenulls=True).over(frame)
    )

    # Chunk effect = state of the LAST row (its cumulatives summarize the
    # chunk): same partitioning as wc, so no extra exchange for the take.
    wlast = Window.partitionBy(key, "__chunk").orderBy(*[F.col(c).desc() for c in order])
    last_rows = (
        df.withColumn("__rn", F.row_number().over(wlast))
        .filter(F.col("__rn") == 1)
        .select(
            key,
            "__chunk",
            F.col("__base").isNotNull().alias("__has_abs"),
            F.col("__cumd").alias("__add"),
            (F.col("__base") + F.col("__cumd") - F.coalesce(F.col("__cumab"), F.lit(0))).alias(
                "__exit_base"
            ),
            *([init_col] if init_col else []),
        )
    )

    # Chunk-level scan: the summary rows ARE reset-monoid events, so the
    # flat operator computes each chunk's exit balance directly.
    scanned = replay_running_balance(
        last_rows,
        key=key,
        order=["__chunk"],
        delta_col="__add",
        is_absolute_col="__has_abs",
        abs_value_col="__exit_base",
        init_col=init_col,
        out_running="__exit",
        out_delta="__exit_d",
    )
    wk = Window.partitionBy(key).orderBy("__chunk")
    incoming = scanned.select(
        key,
        "__chunk",
        F.coalesce(F.lag("__exit").over(wk), init).alias("__incoming"),
    )

    df = df.join(incoming, on=[key, "__chunk"])
    df = df.withColumn(
        out_running,
        F.when(
            F.col("__base").isNotNull(),
            F.col("__base") + F.col("__cumd") - F.coalesce(F.col("__cumab"), F.lit(0)),
        ).otherwise(F.col("__incoming") + F.col("__cumd")),
    )
    prev = F.lag(F.col(out_running)).over(wc)
    df = df.withColumn(out_delta, F.col(out_running) - F.coalesce(prev, F.col("__incoming")))
    return df.drop("__chunk", "__cumd", "__base", "__cumab", "__incoming")


#: Per-task row budget for the flat replay's single hot-key sort.
#: SCALE.md "W2 under skew" (tools/skew_smoke.py, 10M rows, local[32]):
#: flat still WINS at a 1M-row hot key (2.4 s vs chunked's 4.6 s — the
#: straggler finishes inside the other tasks' shadow) and LOSES at 5M
#: (8.9 s vs 3.8 s, one sort = the wall-clock); at ~10^9 hot-key rows
#: the flat sort also exceeds task memory, the real disqualifier. The
#: budget sits strictly between the two measured points and well under
#: a task's sort-memory ceiling (~2M rows × ~50 B ≈ 100 MB). Both
#: forms are bit-identical, so a pick near the boundary costs seconds,
#: never correctness.
REPLAY_TASK_ROW_BUDGET = 2_000_000


def replay_max_key_rows(df: DataFrame, key: str) -> int:
    """Skew probe for the replay dispatch: the largest single-key row
    count. One map-side-combined aggregate (shuffle carries one row per
    key per map partition, the driver reads ONE scalar) — cheap relative
    to the window sort it sizes, but still a full pass; callers that
    maintain key histograms can pass their number to
    :func:`replay_running_balance_auto` instead."""
    row = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg(F.max("__n").alias("__mx"))
        .collect()[0]
    )
    return int(row["__mx"] or 0)


def replay_running_balance_auto(
    df: DataFrame,
    key: str,
    order: list[str],
    *,
    chunk: Column,
    task_row_budget: int = REPLAY_TASK_ROW_BUDGET,
    max_key_rows: int | None = None,
    **kwargs,
) -> DataFrame:
    """W2 with measured skew dispatch — the operating rule from SCALE.md
    "W2 under skew" as code instead of prose (round-11, VERDICT r10 #1):

    - largest key fits a task's sort budget → :func:`replay_running_balance`
      (flat: ONE exchange, no join — wins at uniform and mild skew);
    - beyond the budget → :func:`replay_running_balance_chunked` with the
      caller's ``chunk`` expression (bounded partitions — skew-flat,
      +1 shuffle +1 join).

    ``max_key_rows`` short-circuits the probe when the caller already
    knows the histogram (e.g. table stats); otherwise
    :func:`replay_max_key_rows` measures it. Both forms are locked
    bit-identical by tests/test_windows_ops.py, so the dispatch can never
    change results — the same size-dispatch doctrine as
    ``rfm_segmentation`` / ``choose_jaccard_verify``.
    """
    if max_key_rows is None:
        max_key_rows = replay_max_key_rows(df, key)
    if max_key_rows <= task_row_budget:
        return replay_running_balance(df, key, order, **kwargs)
    return replay_running_balance_chunked(df, key, order, chunk=chunk, **kwargs)


def replay_running_balance_pandas(
    df: DataFrame,
    key: str,
    order: list[str],
    *,
    delta_col: str = "delta",
    is_absolute_col: str = "is_absolute",
    abs_value_col: str = "abs_value",
    init_col: str | None = None,
    out_running: str = "running",
    out_delta: str = "effective_delta",
) -> DataFrame:
    """W2 via ``applyInPandas`` — the literal per-key replay loop.

    Reference implementation (UDF escape hatch, §2.10): a direct
    transliteration of the reference's groupby loop, Arrow-batched per
    key group. Kept as the differential-testing oracle for
    ``replay_running_balance`` and as the template for genuinely
    non-window stateful logic. Slower than the window form (Python per
    group) but still fully parallel across keys.
    """
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(out_running, df.schema[delta_col].dataType, True),
           StructField(out_delta, df.schema[delta_col].dataType, True)]
    )

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        init = 0
        if init_col is not None and len(pdf) and pd.notnull(pdf[init_col].iloc[0]):
            init = pdf[init_col].iloc[0]
        running = init
        runs, deltas = [], []
        for _, row in pdf.iterrows():
            if row[is_absolute_col]:
                target = row[abs_value_col]
                target = 0 if pd.isnull(target) else target
                d = target - running
                running = target
            else:
                d = row[delta_col]
                running = running + d
            runs.append(running)
            deltas.append(d)
        pdf[out_running] = runs
        pdf[out_delta] = deltas
        return pdf

    return df.groupBy(key).applyInPandas(replay, schema=out_schema)


def distributed_ntile(
    df: DataFrame,
    sort_cols: list[Column],
    k: int,
    out_col: str,
    *,
    n_parts: int | None = None,
) -> DataFrame:
    """Exact ``NTILE(k)`` over a global order WITHOUT a single-partition
    sort — the two-phase distributed ranking pattern (same family as
    ``ops/packing.assign_token_shards``'s prefix sum):

    1. ``repartitionByRange`` on the sort key: partition i's keys all
       precede partition i+1's, each partition sorts locally in
       parallel.
    2. per-partition ``row_number`` + an exclusive prefix count of
       partition sizes (a <= n_parts-row aggregate — the only global
       window runs over THAT, bounded by construction) gives the exact
       global rank.
    3. NTILE arithmetic from the rank and the total count n (1-row
       broadcast): with q = n div k, r = n mod k, the first r buckets
       take q+1 rows — bit-identical to the window function on any
       engine given a total order, which callers pin with a unique
       tiebreak column.

    Output ranks are independent of where range boundaries land, so the
    result is deterministic under any sampling the partitioner does.
    """
    if n_parts is None:
        n_parts = df.sparkSession.sparkContext.defaultParallelism * 2
    part = df.repartitionByRange(n_parts, *sort_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    local = part.withColumn(
        "__lrn", F.row_number().over(Window.partitionBy("__pid").orderBy(*sort_cols))
    )
    counts = local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__c"))
    w_off = (
        Window.partitionBy(F.lit(0))  # <= n_parts rows — bounded
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offs = counts.select(
        "__pid", (F.sum("__c").over(w_off) - F.col("__c")).alias("__off")
    )
    tot = df.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    rn = F.col("__lrn") + F.col("__off")
    q = F.expr(f"__n DIV {k}")
    r = F.col("__n") % k
    # integer DIV throughout (exact); greatest(q, 1) guards the
    # never-taken otherwise branch when n < k (q = 0)
    bucket = (
        F.when(rn <= r * (q + 1), F.expr(f"(__lrn + __off - 1) DIV (__n DIV {k} + 1) + 1"))
        .otherwise(
            F.expr(
                f"__n % {k} + (__lrn + __off - 1 - (__n % {k}) * (__n DIV {k} + 1))"
                f" DIV greatest(__n DIV {k}, 1) + 1"
            )
        )
        .cast("bigint")
    )
    return (
        local.join(F.broadcast(offs), "__pid")
        .crossJoin(F.broadcast(tot))
        .withColumn(out_col, bucket)
        .drop("__pid", "__lrn", "__c", "__off", "__n")
    )
