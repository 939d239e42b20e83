"""Fourth analytics tranche: hopping (sliding) windows in batch,
containment-direction near-dup pairs, a deterministic permutation
test, and interval-to-day allocation.

Engine-portable per queries/base.py: exact reductions, md5-derived
randomness (never random()), fixed-order double math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window

from osmart_etl_spark.caching import led_persist
from pyspark.sql import functions as F

from osmart_etl_spark.io.sources import read_table
from osmart_etl_spark.queries.base import dbl, dec, query

# --------------------------------------------------------------------------
# Hopping windows (7-day window, 1-day hop) in batch
# --------------------------------------------------------------------------

_HOP_DAYS = 7


@query(
    "hopping_window_engagement",
    oracle=f"""
    WITH ev AS (
      SELECT CAST(ts AS DATE) AS d, user_id,
        CAST(value AS DECIMAL(18,2)) AS v
      FROM events
    ),
    exploded AS (
      SELECT d - (o.off * INTERVAL 1 DAY) AS win_start, user_id, v
      FROM ev CROSS JOIN (
        SELECT UNNEST(range(0, {_HOP_DAYS})) AS off
      ) o
    )
    SELECT win_start,
      CAST(COUNT(*) AS BIGINT) AS n_events,
      CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      CAST(SUM(v) AS DOUBLE) AS total_value
    FROM exploded GROUP BY win_start
    """,
    tags=("ext-temporal", "hopping-window"),
)
def hopping_window_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day sliding window (1-day hop) engagement totals — the batch
    twin of Structured Streaming's ``window(ts, '7 days', '1 day')``:
    each event belongs to exactly 7 window starts, materialized as a
    bounded explode (fan-out = window/hop, a constant — never a range
    join or a self-join over the window span) followed by one
    aggregate. The win_start key means a window's row carries the
    events from [win_start, win_start+7d).

    At 100 TB the fan-out constant is the entire cost model: shuffle
    volume is exactly 7× the daily aggregate's — predictable, skew-free
    (dates are uniform keys), and the explode happens AFTER map-side
    projection so only (day, user, value) triples are multiplied, not
    full rows. Distinct-user counts stay exact (count-distinct per
    window); the approx variant swaps in HLL sketches merged across
    hops (approx_sketches pattern)."""
    ev = read_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("d"),
        "user_id",
        dec(F.col("value")).alias("v"),
    )
    exploded = ev.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(_HOP_DAYS - 1)),
                lambda off: F.date_sub(F.col("d"), off),
            )
        ).alias("win_start"),
        "user_id",
        "v",
    )
    return exploded.groupBy("win_start").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        dbl(F.sum("v")).alias("total_value"),
    )


# --------------------------------------------------------------------------
# Containment pairs (asymmetric Jaccard): is A contained in B?
# --------------------------------------------------------------------------

_CT_T = 0.9


@query(
    "containment_pairs",
    oracle=f"""
    WITH shingles AS (
      SELECT DISTINCT doc_id, substr(norm, i, 9) AS shingle
      FROM (
        SELECT doc_id, regexp_replace(lower(trim(text)), ' +', ' ', 'g') AS norm
        FROM documents
      ) d
      CROSS JOIN LATERAL (
        SELECT UNNEST(generate_series(1, greatest(length(norm) - 8, 1))) AS i
      ) g
    ),
    sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_small, b.doc_id AS id_big, CAST(COUNT(*) AS BIGINT) AS n_inter
      FROM shingles a JOIN shingles b
        ON a.shingle = b.shingle AND a.doc_id != b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_small, id_big,
      CAST(n_inter AS DOUBLE) / CAST(ss.n AS DOUBLE) AS containment,
      CAST(n_inter AS DOUBLE) / CAST(ss.n + sb.n - n_inter AS DOUBLE) AS jaccard
    FROM inter
    JOIN sizes ss ON ss.doc_id = id_small
    JOIN sizes sb ON sb.doc_id = id_big
    WHERE CAST(n_inter AS DOUBLE) / CAST(ss.n AS DOUBLE) >= {_CT_T}
    """,
    tags=("ext-dedup", "containment"),
)
def containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIRECTED near-duplicate detection: containment
    C(A→B) = |A∩B|/|A| ≥ 0.9 — the metric that catches a doc QUOTED or
    EMBEDDED inside a larger one, which symmetric Jaccard dilutes away
    (J = C/(1 + |B|/|A| − C): full containment in a 3× larger doc is
    J ≈ 0.33). Jaccard rides along so downstream can split symmetric
    near-dups (J ≥ t too) from true one-directional embeddings.

    Candidate generation is EXACT by an A-side pigeonhole prefix —
    deliberately NOT the MinHash-LSH index: minhash estimates JACCARD,
    so its band-collision probability for a high-containment/low-J pair
    is tiny and recall collapses exactly where containment matters
    (measured here: at C ≥ 0.7 the LSH candidates missed oracle pairs
    and failed parity — kept as the design note). If C(A→B) ≥ t then B
    misses at most (1−t)·|A| of A's shingles, so A must share ≥1 of
    its ⌊(1−t)·|A|⌋+1 RAREST shingles (df-ascending order) with B:
    joining only those short per-doc prefixes against the corpus
    posting lists is complete for every target pair — the oracle's
    all-pairs definition proves it (a missed pair = row mismatch).

    Scale: prefix length tracks (1−t)·|set| (≈ 10% + 1 here); 9-gram
    shingles (not the dedup stack's 5-grams) keep the prefix postings
    short — measured at sf0.1, the 5-gram space is 2 041 shingles with
    median df 291 (no rare tail → 11.9M candidates), the 9-gram space
    is 26 951 with median df 14, and the same prefix join collapses to
    ≈|true pairs| candidates; verify
    is array_intersect over the broadcast set dimension,
    |candidates|-proportional (ops/dedup.jaccard_verify_bcast shape).
    Functional proof that it detects real embeddings (truncated-doc
    construction) lives in tests/test_scale_ops.py."""
    from osmart_etl_spark.ops.dedup import shingle_sets

    docs = read_table(spark, sf_dir, "documents")
    sets = shingle_sets(docs, "doc_id", "text", k=9).transform(led_persist)
    toks = sets.select("doc_id", F.explode("__sh").alias("token"))
    sizes = sets.select("doc_id", F.size("__sh").cast("bigint").alias("n"))
    # Numbered repartitions below pin reduce-stage parallelism: AQE
    # sizes these stages by shuffle BYTES and coalesced each to a
    # single task (measured 1.4-2.0 s serial apiece at sf0.1) even
    # though their CPU cost is per-record.
    n_par0 = spark.sparkContext.defaultParallelism * 2
    dfreq = (
        toks.repartition(n_par0, "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("__df"))
    )

    from pyspark.sql import Window

    wd = Window.partitionBy("doc_id").orderBy(F.asc("__df"), F.asc("token"))
    # EXTENDED prefix + count filter: with m = ⌊(1−t)n⌋+1+K rarest
    # shingles indexed, a qualifying pair must share ≥ K+1 of them
    # (pigeonhole: ≤ ⌊(1−t)n⌋ can be missing from B) — the count
    # threshold collapses 984k single-collision candidates to ~10³
    # before any array is touched (measured at sf0.1).
    K = 10
    prefix = (
        toks.join(dfreq, "token")
        .repartition(n_par0, "doc_id")
        .withColumn("__pos", F.row_number().over(wd))
        .join(sizes, "doc_id")
        .filter(
            F.col("__pos")
            <= F.floor(F.lit(1 - _CT_T) * F.col("n")).cast("bigint") + 1 + K
        )
        .select(F.col("doc_id").alias("id_small"), "token")
    )
    # Numbered repartition on the grouping keys UNDER the count agg:
    # the raw prefix-collision pair stream has low per-partition key
    # repetition, so adaptive partial aggregation bails out and the
    # agg's ENSURE_REQUIREMENTS exchange carries raw pairs — which AQE
    # then coalesces to a single reduce task by byte size (same
    # pathology measured at 5.7 s serial in setsim_exact_join). The
    # numbered exchange satisfies the agg requirement, is exempt from
    # AQE coalescing, and keeps the candidate count parallel.
    n_par = spark.sparkContext.defaultParallelism * 2
    cand = (
        prefix.join(
            toks.select(F.col("doc_id").alias("id_big"), "token"), "token"
        )
        .filter(F.col("id_small") != F.col("id_big"))
        .repartition(n_par, "id_small", "id_big")
        .groupBy("id_small", "id_big")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= K + 1)
        .select("id_small", "id_big")
    )
    a_s = sets.select(F.col("doc_id").alias("id_small"), F.col("__sh").alias("__sa"))
    b_s = sets.select(F.col("doc_id").alias("id_big"), F.col("__sh").alias("__sb"))
    full = cand.join(F.broadcast(a_s), "id_small").join(F.broadcast(b_s), "id_big")
    n_inter = F.size(F.array_intersect("__sa", "__sb")).cast("bigint")
    na = F.size("__sa").cast("bigint")
    nb = F.size("__sb").cast("bigint")
    return (
        full.select(
            "id_small",
            "id_big",
            (n_inter.cast("double") / na.cast("double")).alias("containment"),
            (
                n_inter.cast("double") / (na + nb - n_inter).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("containment") >= _CT_T)
    )


# --------------------------------------------------------------------------
# Deterministic permutation test
# --------------------------------------------------------------------------

_PERM_K = 20


@query(
    "permutation_test_mean_gap",
    oracle=f"""
    WITH perms AS (SELECT UNNEST(range(0, {_PERM_K + 1})) AS perm),
    assigned AS (
      SELECT e.event_type, p.perm,
        CASE WHEN p.perm = 0 THEN e.user_id % 2
             ELSE ('0x' || substr(md5('perm' || CAST(p.perm AS VARCHAR) || ':'
                                      || CAST(e.user_id AS VARCHAR)), 1, 7))::BIGINT % 2
        END AS arm,
        CAST(e.value AS DECIMAL(18,2)) AS v
      FROM events e CROSS JOIN perms p
    ),
    stats AS (
      SELECT event_type, perm,
        (CAST(SUM(v) FILTER (WHERE arm = 0) AS DOUBLE)
           / CAST(COUNT(*) FILTER (WHERE arm = 0) AS DOUBLE))
        - (CAST(SUM(v) FILTER (WHERE arm = 1) AS DOUBLE)
           / CAST(COUNT(*) FILTER (WHERE arm = 1) AS DOUBLE)) AS gap
      FROM assigned GROUP BY event_type, perm
    )
    SELECT s.event_type,
      MAX(CASE WHEN s.perm = 0 THEN s.gap END) AS observed_gap,
      CAST(COUNT(*) FILTER (WHERE s.perm > 0 AND
        abs(s.gap) >= abs((SELECT gap FROM stats o
                           WHERE o.event_type = s.event_type AND o.perm = 0)))
        AS BIGINT) AS n_exceed,
      CAST({_PERM_K} AS BIGINT) AS n_perms
    FROM stats s GROUP BY s.event_type
    """,
    tags=("scale-tech", "statistics"),
)
def permutation_test_mean_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation test for the A/B mean gap WITHOUT random():
    20 pseudo-permutations reassign each user's arm by a salted md5
    hash (engine-portable, rerun-stable, stratification-free by
    uniformity), the observed assignment is perm 0, and the p-value
    numerator counts permuted |gaps| ≥ |observed|. The
    distribution-free significance test — exactly what the z-test's
    normality assumption cannot give you — with the fan-out applied to
    PRE-AGGREGATED rows: every permutation's arm depends only on
    (user_id, perm), so events collapse first to one exact row per
    (event_type, user_id) — sum(v) is DECIMAL (associative, so the
    regrouped total is bit-identical to the event-level sum) and an
    event count carries the arm's denominator. Only then does the × 21
    label fan-out (and its md5) run, over user-cardinality rows instead
    of event-cardinality ones (measured 100k events / 1.5k users at
    sf0.1: 66× fewer md5 evaluations; guide §2.3 "aggregate before you
    shuffle"). The observed gap is attached back with a per-type window
    over the 21-row stats table rather than a broadcast self-join,
    which had duplicated the whole scan+fan-out subtree in the physical
    plan (2 scans → 1). At 100 TB the first aggregate is map-side
    combined and everything after it is user-cardinality-bounded."""
    ev = read_table(spark, sf_dir, "events")
    perms = spark.range(0, _PERM_K + 1).select(F.col("id").cast("int").alias("perm"))
    # Inner-join semantics of the original stats⋈obs: null event types
    # never reach the output.
    per_user = (
        ev.filter(F.col("event_type").isNotNull())
        .groupBy("event_type", "user_id")
        .agg(
            F.sum(dec(F.col("value"))).alias("sv"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    hash_arm = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("perm"),
                        F.col("perm").cast("string"),
                        F.lit(":"),
                        F.col("user_id").cast("string"),
                    )
                ),
                1,
                7,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    assigned = per_user.crossJoin(F.broadcast(perms)).select(
        "event_type",
        "perm",
        F.when(F.col("perm") == 0, F.col("user_id") % 2)
        .otherwise(hash_arm)
        .alias("arm"),
        "sv",
        "cnt",
    )
    arm0 = F.col("arm") == 0
    # coalesce(..., 0) replicates COUNT's empty-group zero (the
    # event-level form divided by count, which is 0 — not NULL — when
    # an arm is empty).
    n0 = F.coalesce(F.sum(F.when(arm0, F.col("cnt"))), F.lit(0))
    n1 = F.coalesce(F.sum(F.when(~arm0, F.col("cnt"))), F.lit(0))
    stats = assigned.groupBy("event_type", "perm").agg(
        (
            (dbl(F.sum(F.when(arm0, F.col("sv")))) / dbl(n0))
            - (dbl(F.sum(F.when(~arm0, F.col("sv")))) / dbl(n1))
        ).alias("gap")
    )
    wt = Window.partitionBy("event_type")
    return (
        stats.withColumn(
            "__obs", F.max(F.when(F.col("perm") == 0, F.col("gap"))).over(wt)
        )
        .groupBy("event_type")
        .agg(
            F.max(F.when(F.col("perm") == 0, F.col("gap"))).alias("observed_gap"),
            F.count(
                F.when(
                    (F.col("perm") > 0)
                    & (F.abs(F.col("gap")) >= F.abs(F.col("__obs"))),
                    1,
                )
            )
            .cast("bigint")
            .alias("n_exceed"),
            F.lit(_PERM_K).cast("bigint").alias("n_perms"),
        )
    )


# --------------------------------------------------------------------------
# Interval-to-day allocation
# --------------------------------------------------------------------------


@query(
    "interval_day_allocation",
    oracle="""
    WITH iv AS (
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d0,
        CAST(o_orderdate AS DATE) + ((CAST(o_orderkey AS BIGINT) % 5) * INTERVAL 1 DAY) AS d1,
        CAST(o_totalprice AS DECIMAL(18,2)) AS amount,
        (CAST(o_orderkey AS BIGINT) % 5) + 1 AS n_days
      FROM orders
    ),
    days AS (
      SELECT iv.o_orderkey,
        UNNEST(generate_series(iv.d0, iv.d1, INTERVAL 1 DAY))::DATE AS day,
        iv.amount, iv.n_days
      FROM iv
    )
    SELECT day,
      CAST(COUNT(*) AS BIGINT) AS n_intervals,
      CAST(SUM(CAST(amount / n_days AS DECIMAL(18,6))) AS DOUBLE) AS allocated
    FROM days GROUP BY day
    """,
    tags=("ext-temporal", "interval-allocation"),
)
def interval_day_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allocate each interval's amount evenly across the days it spans
    (service periods, subscriptions, accruals): explode the date range
    (bounded — span is derived data, ≤5 days here; at scale the span
    cap is the fan-out knob exactly like the hopping window) and sum
    per-day shares. The share ``amount/n_days`` is computed ONCE as a
    DECIMAL(18,6) division — identical banker-free truncation semantics
    in both engines, and exact re-aggregation afterwards (double shares
    would order-drift; decimal shares sum associatively). Daily totals
    then cast to double once."""
    orders = read_table(spark, sf_dir, "orders")
    iv = orders.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("d0"),
        (F.col("o_orderkey") % 5).cast("int").alias("__span"),
        dec(F.col("o_totalprice")).alias("amount"),
    ).select(
        "o_orderkey",
        "d0",
        F.date_add(F.col("d0"), F.col("__span")).alias("d1"),
        "amount",
        (F.col("__span") + 1).cast("bigint").alias("n_days"),
    )
    days = iv.select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day"),
        "amount",
        "n_days",
    )
    share = (F.col("amount") / F.col("n_days")).cast("decimal(18,6)")
    return days.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        dbl(F.sum(share)).alias("allocated"),
    )
