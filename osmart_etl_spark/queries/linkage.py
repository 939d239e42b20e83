"""Link-analysis operators: prefix-filtered set-similarity join
(AllPairs/PPJoin family) and fixed-point PageRank over the
customer-part bipartite graph.

The ssjoin is the third pillar of the dedup stack next to MinHash-LSH
(probabilistic recall) and SimHash (Hamming buckets): EXACT recall at a
similarity threshold with candidate generation that is sub-quadratic by
construction. PageRank is the canonical iterative-refinement shape —
the one the reference's pandas scripts could never express
incrementally — done here with pure integer arithmetic so three
engines' floating point never enters the fixed point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window

from osmart_etl_spark.caching import led_persist
from pyspark.sql import functions as F

from osmart_etl_spark.io.sources import read_table
from osmart_etl_spark.queries.base import query
from osmart_etl_spark.queries.text import _SHINGLES_SQL

# --------------------------------------------------------------------------
# Partition-based exact set-similarity self-join, shingle Jaccard >= 0.8
# --------------------------------------------------------------------------

_SS_T = 0.8
#: Pigeonhole tiers: a qualifying pair differs in at most
#: Δmax = (na+nb)·(1-t)/(1+t) shingles, so G universe partitions give a
#: valid agreement bound only while G > Δmax, i.e. na+nb ≤ 9·(G-1) at
#: t = 0.8. Tier 1 (G=64) covers pair sums ≤ 567 (most of the corpus);
#: tier 2 (G=96, docs with n > 217 only — both sides of a larger pair
#: must exceed 217) covers sums ≤ 855; tier 3 brute-forces pairs where
#: one side exceeds 427 (empty at every test SF — the linear-cost
#: safety valve that makes recall UNCONDITIONAL rather than a dataset
#: assumption).
_SS_TIER1_G = 64
_SS_TIER2_G = 96
_SS_TIER2_MIN_N = 217
_SS_TIER3_MIN_N = 427


@query(
    "setsim_exact_join",
    oracle=f"""
    WITH shingles AS ({_SHINGLES_SQL}),
    sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM shingles GROUP BY doc_id
    ),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_inter
      FROM shingles a JOIN shingles b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b, n_inter,
      CAST(n_inter AS DOUBLE)
        / CAST(sa.n + sb.n - n_inter AS DOUBLE) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(n_inter AS DOUBLE)
        / CAST(sa.n + sb.n - n_inter AS DOUBLE) >= {_SS_T}
    """,
    tags=("ext-dedup", "ssjoin"),
)
def setsim_exact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-recall set-similarity self-join at shingle-Jaccard ≥ 0.8 —
    the deterministic pillar of the dedup stack next to MinHash-LSH
    (probabilistic recall) and SimHash (Hamming buckets) — via
    PARTITION-BASED candidate generation (PassJoin/PartEnum family):

    Hash the shingle universe into G groups; per (doc, group) fold the
    doc's shingles in that group into one order-independent signature
    (bit_xor of per-shingle hashes — equal subsets always agree, so a
    signature can only create FALSE candidates, never misses). If
    J(a,b) ≥ t then |aΔb| ≤ (1−t)/(1+t)·(na+nb), so a qualifying pair
    must AGREE on ≥ G − Δmax group signatures (pigeonhole; empty-empty
    agreements are credited conservatively via min(Ea, Eb)). The bound
    is only valid while G > Δmax, so candidates come from THREE tiers
    with growing G and shrinking membership (see _SS_TIER* above) —
    recall is unconditional, not a dataset assumption. The classic
    length-ratio filter (J ≤ min(na,nb)/max(na,nb)) prunes every tier.
    Survivors get the exact array-intersect verify.

    Why not classic AllPairs prefix filtering: measured on this corpus
    the shingle-frequency profile is degenerate (2 041 distinct
    shingles across 5 000 docs at sf0.1, median df 291 — no rare-token
    tail), so every df-ordered prefix collides with hundreds of docs:
    the prefix join produced 9.2M raw candidates for 255 true pairs
    and OOM'd the array verify. Group signatures discriminate by WHOLE
    SUBSET equality instead of single-token sharing: an unrelated pair
    (Δ ≈ 300 over 64 groups) agrees on a group only with probability
    e^(−Δ/G) ≈ 0.01, while qualifying pairs agree on dozens — measured
    candidates collapse to ≈ the true-pair count (SCALE.md).

    The oracle is the DECLARATIVE all-pairs definition — parity proves
    completeness of the pigeonhole bound (a dropped true pair would be
    a row-count mismatch) and soundness of the verify.

    100 TB shape: signature build is one map-side-combinable aggregate
    per tier (|corpus shingles| rows → G·|docs| signatures); candidate
    joins key on (group, signature) whose posting lists are duplicate
    clusters only; verify is |candidates|-proportional; tier
    memberships shrink geometrically. No stage is quadratic in corpus
    size.
    """
    from osmart_etl_spark.ops.dedup import shingle_sets

    docs = read_table(spark, sf_dir, "documents")
    sets = shingle_sets(docs, "doc_id", "text", k=5).transform(led_persist)
    # Materialize the cache ONCE, in parallel, before the plan fans
    # out: the tiers spawn ~15 concurrent broadcast-subtree jobs that
    # all scan `sets`; on a cold cache they serialize behind the cache
    # write locks in 1.5-2 s waves (measured: the warm query spent the
    # majority of its wall time in those waits, not in compute). The
    # driver-side cost is one scalar count, never row data.
    sets.count()
    sizes = sets.select("doc_id", F.size("__sh").cast("bigint").alias("n"))
    ratio = (1 - _SS_T) / (1 + _SS_T)

    def tier_candidates(member: DataFrame, g: int) -> DataFrame:
        """Agreement-count candidates for one tier: docs in ``member``
        (doc_id, n), universe split into ``g`` groups."""
        toks = member.join(sets, "doc_id").select(
            "doc_id", F.explode("__sh").alias("token")
        )
        sums = (
            toks.select(
                "doc_id",
                F.pmod(F.xxhash64("token"), F.lit(g)).alias("g"),
                F.xxhash64(F.lit("sub"), F.col("token")).alias("h"),
            )
            .groupBy("doc_id", "g")
            .agg(F.expr("bit_xor(h)").alias("sig"))
            # referenced by both sides of the self-join below: persist,
            # or the explode+agg chain recomputes per reference (measured
            # 14.1 s -> ~6 s for tier 1 at sf0.1; Spark's exchange
            # reuse does not fire across these AQE-planned subtrees)
            .transform(led_persist)
        )
        # per-doc empty-group count from the cached shingle ARRAY — a
        # row-local array_distinct, no explode/shuffle. Computing it
        # from `sums` made the sa/sb broadcast subtrees recompute the
        # whole explode+agg DAG serially (AQE coalesced the cold-cache
        # exchange to ONE partition: a measured 8-12 s single-task
        # stage, the query's dominant cost).
        stats = member.join(sets, "doc_id").select(
            "doc_id",
            "n",
            (
                F.lit(g)
                - F.size(
                    F.array_distinct(
                        F.transform(
                            F.col("__sh"),
                            lambda t: F.pmod(F.xxhash64(t), F.lit(g)),
                        )
                    )
                )
            ).cast("bigint").alias("e"),
        )
        # Self-join on (group, signature): posting lists are duplicate
        # clusters only, so the pair fan-out is c-squared per cluster —
        # the inherent cost of exact agreement counting (a map-side
        # bucket-explode variant was tried and measured SLOWER at
        # sf0.1: 11.6 s vs 9.0 s, the collect_list+struct explosion
        # costs more than the hash join). The build side is a bounded
        # G·|docs| signature relation (broadcast here; at 100 TB both
        # sides are already exchanged on their join key, so Catalyst
        # plans the co-partitioned shuffle join instead).
        a = sums.alias("a")
        b = sums.alias("b")
        pairs = a.join(
            F.broadcast(b),
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        # Numbered repartition UNDER the groupBy: the raw agreement-pair
        # stream is c-squared per duplicate cluster (measured 6.2M rows
        # tier 1 / 3.8M tier 2 at sf0.1) and Spark's adaptive partial
        # aggregation bails out on it (pair keys repeat too little per
        # map partition), so the agg's own ENSURE_REQUIREMENTS exchange
        # carried the raw pairs — and AQE coalesced its reduce to ONE
        # task (measured 5.7 s serial, the query's largest stage). A
        # numbered hash repartition on the exact grouping keys satisfies
        # the agg requirement, is exempt from AQE coalescing, and keeps
        # the pair-count reduce cluster-wide.
        agree = (
            pairs.repartition(
                spark.sparkContext.defaultParallelism * 2, "id_a", "id_b"
            )
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        sa = stats.select(
            F.col("doc_id").alias("id_a"),
            F.col("n").alias("__na"),
            F.col("e").alias("__ea"),
        )
        sb = stats.select(
            F.col("doc_id").alias("id_b"),
            F.col("n").alias("__nb"),
            F.col("e").alias("__eb"),
        )
        dmax = (F.col("__na") + F.col("__nb")).cast("double") * F.lit(ratio)
        return (
            agree.join(F.broadcast(sa), "id_a")
            .join(F.broadcast(sb), "id_b")
            .filter(
                # length-ratio filter: J ≤ min/max of the set sizes
                (F.least("__na", "__nb").cast("double")
                 >= F.lit(_SS_T) * F.greatest("__na", "__nb").cast("double") - F.lit(1e-9))
                & (
                    F.col("__c")
                    >= F.lit(g) - dmax - F.least("__ea", "__eb") - F.lit(1e-9)
                )
                # pigeonhole validity window for this tier
                & ((F.col("__na") + F.col("__nb")) <= F.lit(9 * (g - 1)))
            )
            .select("id_a", "id_b")
        )

    t1 = tier_candidates(sizes, _SS_TIER1_G)
    t2 = tier_candidates(sizes.filter(F.col("n") > _SS_TIER2_MIN_N), _SS_TIER2_G)
    # Tier 3: unconditional brute force for pairs whose larger side
    # exceeds the tier-2 window (empty at test SFs; linear cost).
    big = sizes.filter(F.col("n") > _SS_TIER3_MIN_N).select(
        F.col("doc_id").alias("id_big"), F.col("n").alias("n_big")
    )
    # broadcast the (near-empty) big side: the nested-loop join then
    # keeps `sizes`'s partitioning. Without the hint Spark built a
    # ~1024-partition NLJ whose empty partitions leaked through the
    # union into distinct+verify as pure task-scheduling overhead
    # (measured: the 1026-task stage was ~2/3 of the query wall time).
    t3 = (
        F.broadcast(big)
        .join(
            sizes.select(F.col("doc_id").alias("id_o"), F.col("n").alias("n_o")),
            F.col("n_o").cast("double")
            >= F.lit(_SS_T) * F.col("n_big").cast("double") - F.lit(1e-9),
        )
        .filter(F.col("id_big") != F.col("id_o"))
        .select(
            F.least("id_big", "id_o").alias("id_a"),
            F.greatest("id_big", "id_o").alias("id_b"),
        )
    )
    # Explicit numbered repartition after distinct: AQE sizes the
    # post-distinct stage by its shuffle BYTES (tiny — candidate id
    # pairs), coalescing it to ONE partition; but that stage pipelines
    # the array_intersect verify, whose cost is per-pair CPU, not
    # bytes. Measured: the whole verify ran as a single 8.4 s task.
    # A numbered repartition is exempt from AQE coalescing, so the
    # verify keeps cluster-wide parallelism.
    n_par = spark.sparkContext.defaultParallelism * 2
    cand = t1.unionAll(t2).unionAll(t3).distinct().repartition(n_par)

    # Exact verify in ARRAY form: the per-doc shingle arrays are a
    # broadcastable dimension here (5 000 rows); at 100 TB this becomes
    # the id-pruned shuffle join of ops/dedup.jaccard_verify_sets.
    a_s = sets.select(F.col("doc_id").alias("id_a"), F.col("__sh").alias("__ta"))
    b_s = sets.select(F.col("doc_id").alias("id_b"), F.col("__sh").alias("__tb"))
    full = cand.join(F.broadcast(a_s), "id_a").join(F.broadcast(b_s), "id_b")
    n_inter = F.size(F.array_intersect("__ta", "__tb")).cast("bigint")
    denom = (
        F.size("__ta").cast("bigint") + F.size("__tb").cast("bigint") - n_inter
    )
    return (
        full.select(
            "id_a",
            "id_b",
            n_inter.alias("n_inter"),
            (n_inter.cast("double") / denom.cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= _SS_T)
    )


# --------------------------------------------------------------------------
# PageRank over the customer-part bipartite graph (integer-scaled)
# --------------------------------------------------------------------------

_PR_ITERS = 3
_PR_MASS = 10**12  # total scaled rank mass


def _pr_oracle() -> str:
    edges = """
      SELECT DISTINCT 'c:' || CAST(o.o_custkey AS VARCHAR) AS src,
                      'p:' || CAST(l.l_partkey AS VARCHAR) AS dst
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      UNION ALL
      SELECT DISTINCT 'p:' || CAST(l.l_partkey AS VARCHAR) AS src,
                      'c:' || CAST(o.o_custkey AS VARCHAR) AS dst
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    """
    sql = f"""
    WITH edges AS ({edges}),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
    r0 AS (SELECT node, CAST({_PR_MASS} AS BIGINT) // nn.n AS r FROM nodes, nn)
    """
    prev = "r0"
    for i in range(1, _PR_ITERS + 1):
        sql += f""",
    s{i} AS (
      SELECT e.dst AS node, CAST(SUM({prev}.r // d.deg) AS BIGINT) AS s
      FROM edges e
      JOIN {prev} ON {prev}.node = e.src
      JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    ),
    r{i} AS (
      SELECT nodes.node,
        (CAST(15 * {_PR_MASS} AS BIGINT) // (100 * nn.n))
          + (85 * COALESCE(s{i}.s, CAST(0 AS BIGINT))) // 100 AS r
      FROM nodes CROSS JOIN nn
      LEFT JOIN s{i} ON s{i}.node = nodes.node
    )
        """
        prev = f"r{i}"
    sql += f"""
    SELECT node, r AS rank_scaled FROM {prev}
    """
    return sql


@query("graph_pagerank", oracle=_pr_oracle(), tags=("ext-graph", "pagerank"))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (d = 0.85, 3 synchronous iterations) over the
    undirected customer↔part purchase graph, in PURE INTEGER
    arithmetic: total rank mass 10¹² is divided with integral DIV at
    every step (init split, per-edge contribution, damping 85/100), so
    the fixed-point iterate is bit-exact on any engine and any
    partitioning — float PageRank sums neighbor contributions in
    nondeterministic order and cannot be hash-compared. Truncation
    deliberately leaks ≤ deg−1 mass units per node per step (≈10⁻¹⁰
    relative); determinism is worth more than the tail digits.

    Per iteration: one shuffle join (ranks ⋈ edges on src, a key both
    sides can be co-partitioned on) + one map-side-combinable SUM by
    dst + one broadcast of the 1-row node count. Lineage stays O(1)
    per round via localCheckpoint-free chaining (3 rounds only; the
    bigstar CC op documents the persist discipline for deep loops).
    Both edge directions are materialized once and persisted — the
    out-degree table and every round reuse it.

    At 100 TB: ranks and edges co-partition on node key (bucketed
    tables make the per-round join shuffle-free); the node-count
    broadcast is metadata-sized; iterations stream without driver
    round-trips. Cf. ops/graph.py connected components for the same
    discipline with data-dependent round counts.
    """
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    cp = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("p:"), F.col("l_partkey").cast("string")).alias("p"),
        )
        .distinct()
    )
    # Both directions from ONE pass over the orders⋈lineitem distinct
    # (round 13, the connected_components explode discipline): the
    # two-branch unionAll evaluated the un-persisted `cp` join+distinct
    # once per branch when the edge cache materialized.
    edges = (
        cp.select(
            F.explode(
                F.array(
                    F.struct(F.col("c").alias("src"), F.col("p").alias("dst")),
                    F.struct(F.col("p").alias("src"), F.col("c").alias("dst")),
                )
            ).alias("__e")
        )
        .select("__e.src", "__e.dst")
        .transform(led_persist)
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = edges.select(F.col("src").alias("node")).distinct().transform(led_persist)
    nn = nodes.groupBy().agg(F.count(F.lit(1)).alias("__n"))

    ranks = nodes.join(F.broadcast(nn)).select(
        "node", F.expr(f"CAST({_PR_MASS} AS BIGINT) DIV __n").alias("r")
    )
    # The edge⋈degree table is loop-invariant: materialize once, reuse
    # every round. The per-round rank and contribution tables have NODE
    # cardinality — customers ∪ parts, i.e. fact-proportional — so they
    # carry NO forced broadcast hint: AQE broadcasts them at bench
    # scale (nodes ≪ edges by the average degree) and graduates to a
    # shuffle join when the node set outgrows the build threshold. At
    # 100 TB both tables bucket on the node key instead and the
    # per-round join is shuffle-free; the only unavoidable exchange is
    # the contribution SUM by dst. Only the 1-row node count keeps its
    # hint (bounded by construction).
    esrc = edges.join(deg, "src").select("src", "dst", "deg").transform(led_persist)
    for _ in range(_PR_ITERS):
        contribs = (
            esrc.join(ranks.withColumnRenamed("node", "src"), "src")
            .select("dst", F.expr("r DIV deg").alias("__c"))
            .groupBy("dst")
            .agg(F.sum("__c").alias("__s"))
        )
        ranks = (
            nodes.join(F.broadcast(nn))
            .join(
                contribs.withColumnRenamed("dst", "node"),
                "node",
                "left",
            )
            .select(
                "node",
                F.expr(
                    f"(CAST({15 * _PR_MASS} AS BIGINT) DIV (100 * __n))"
                    " + (85 * COALESCE(__s, CAST(0 AS BIGINT))) DIV 100"
                ).alias("r"),
            )
        )
    return ranks.select("node", F.col("r").alias("rank_scaled"))


# --------------------------------------------------------------------------
# PassJoin: partition-based edit-distance self-join with COMPLETE
# candidate generation (Li/Deng/Feng, "PASS-JOIN: A Partition-based
# Method for Similarity Joins", PVLDB 5(3), 2011 — public paper).
# --------------------------------------------------------------------------

_PJ_TAU = 2  # edit-distance threshold
_PJ_SEGS = _PJ_TAU + 1  # pigeonhole segment count
_PJ_KEYLEN = 40  # dedup key = first chars of the normalized text


def _pj_key_sql() -> str:
    """DuckDB expression for the dedup key (twin of the Spark side:
    normalize, then fixed-length prefix)."""
    return (
        f"substr(regexp_replace(lower(trim(text)), ' +', ' ', 'g'), 1, {_PJ_KEYLEN})"
    )


@query(
    "dedup_edit_passjoin",
    oracle=f"""
    WITH k AS (
      SELECT doc_id, {_pj_key_sql()} AS key FROM documents
      WHERE strlen({_pj_key_sql()}) = length({_pj_key_sql()})
        AND length({_pj_key_sql()}) >= {_PJ_SEGS}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(levenshtein(a.key, b.key) AS BIGINT) AS edit_dist
    FROM k a JOIN k b ON a.doc_id < b.doc_id
    WHERE abs(length(a.key) - length(b.key)) <= {_PJ_TAU}
      AND levenshtein(a.key, b.key) <= {_PJ_TAU}
    """,
    tags=("ext-dedup", "edit-distance", "passjoin"),
)
def dedup_edit_passjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup pairs (τ=2 on the 40-char normalized
    prefix) via PassJoin segment blocking — COMPLETE candidate
    generation, unlike the heuristic last-word block in
    ``entity_levenshtein_verify``.

    Algorithm (PVLDB 5(3) 2011): each indexed key of length l is split
    into τ+1 contiguous segments (even partition: the first
    ``SEGS - l%SEGS`` segments take ⌊l/SEGS⌋ chars, the rest one more).
    If ed(r, s) ≤ τ with len(s) = l ≤ len(r), at least one segment of s
    occurs VERBATIM in r (pigeonhole: τ edits can destroy at most τ of
    the τ+1 segments), and its start in r is within ±τ of its start in
    s (a larger shift needs > τ indels). So the probe side (the longer
    string) enumerates, for every candidate indexed length
    l ∈ [len(r)−τ, len(r)] and segment i, the ≤ 2τ+1 substrings in that
    position window, and an equi-join on (l, i, segment) yields a
    candidate superset — verified with one exact ``levenshtein`` call.

    100 TB shape: index side emits τ+1 short rows per doc, probe side
    ≤ (τ+1)²·(2τ+1) rows per doc — both linear in the corpus with tiny
    constant payloads (id + ≤⌈keylen/(τ+1)⌉-char fragment), feeding ONE
    equi-join shuffle keyed by (l, i, fragment); fragments are
    near-uniform so no skew. Candidates collapse to DISTINCT id pairs
    BEFORE the verify joins re-attach the two 40-char keys, so the wide
    strings never ride the blocking shuffle. No O(n²) anywhere; the
    brute-force quadratic pair scan is only in the DuckDB oracle.

    ASCII guard: Spark's ``levenshtein`` counts characters, DuckDB's
    counts bytes, so both sides filter to keys where byte length equals
    char length (the whole testdata corpus — the filter is the
    documented contract, not a data assumption). Keys shorter than τ+1
    cannot be evenly segmented and are excluded on both sides.
    """
    from osmart_etl_spark.io.sources import default_parallelism
    from osmart_etl_spark.ops.text import normalized_text

    docs = read_table(spark, sf_dir, "documents")
    n_parts = default_parallelism(spark)
    keys = (
        docs.repartition(n_parts)
        .select(
            "doc_id",
            F.substring(normalized_text(F.col("text")), 1, _PJ_KEYLEN).alias("key"),
        )
        .filter(
            (F.octet_length("key") == F.length("key"))
            & (F.length("key") >= _PJ_SEGS)
        )
    )

    m = _PJ_SEGS
    tau = _PJ_TAU

    def seg_len(l, i):  # noqa: E741 — l is the paper's symbol
        base = F.floor(l / m).cast("int")
        rem = (l % m).cast("int")
        return base + F.when(i >= m - rem, F.lit(1)).otherwise(F.lit(0))

    def seg_start(l, i):  # 1-based
        base = F.floor(l / m).cast("int")
        rem = (l % m).cast("int")
        return (i * base + F.greatest(i - (m - rem), F.lit(0)) + 1).cast("int")

    lr = F.length("key").cast("int")

    # Index side: the (τ+1) segments of this key.
    idx_structs = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda i: F.struct(
            lr.alias("l"),
            i.cast("int").alias("i"),
            F.col("key").substr(seg_start(lr, i), seg_len(lr, i)).alias("frag"),
        ),
    )
    index = keys.select(
        F.col("doc_id").alias("id_s"), F.explode(idx_structs).alias("g")
    ).select("id_s", "g.l", "g.i", "g.frag")

    # Probe side: for each candidate indexed length l ≤ len(r) within τ,
    # each segment i, each start within ±τ of that segment's position.
    probe_structs = F.flatten(
        F.transform(
            F.sequence(F.greatest(lr - tau, F.lit(m)), lr),
            lambda l: F.flatten(
                F.transform(
                    F.sequence(F.lit(0), F.lit(m - 1)),
                    lambda i: F.transform(
                        F.sequence(
                            F.greatest(seg_start(l, i) - tau, F.lit(1)),
                            F.least(
                                lr - seg_len(l, i) + 1, seg_start(l, i) + tau
                            ),
                        ),
                        lambda p: F.struct(
                            l.cast("int").alias("l"),
                            i.cast("int").alias("i"),
                            F.col("key").substr(p, seg_len(l, i)).alias("frag"),
                        ),
                    ),
                )
            ),
        )
    )
    probe = keys.select(
        F.col("doc_id").alias("id_r"), F.explode(probe_structs).alias("g")
    ).select("id_r", "g.l", "g.i", "g.frag")

    cand = (
        probe.join(index, ["l", "i", "frag"])
        .filter(F.col("id_r") != F.col("id_s"))
        .select(
            F.least("id_r", "id_s").alias("doc_a"),
            F.greatest("id_r", "id_s").alias("doc_b"),
        )
        .distinct()
    )

    ka = keys.select(F.col("doc_id").alias("doc_a"), F.col("key").alias("key_a"))
    kb = keys.select(F.col("doc_id").alias("doc_b"), F.col("key").alias("key_b"))
    return (
        cand.join(ka, "doc_a")
        .join(kb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("key_a", "key_b").cast("bigint").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= tau)
    )


# --------------------------------------------------------------------------
# k-core decomposition by iterative peeling (Matula & Beck 1983) over the
# co-purchase graph — the fixpoint iteration shape (peel until stable),
# complementing pagerank (fixed-T relaxation) and connected components
# (star contraction) in the iterative-algorithm surface.
# --------------------------------------------------------------------------

_KC_K = 3  # core order
_KC_MIN_CO = 2  # edge = parts co-purchased in >= this many distinct orders
#: Peel rounds. Peeling converges in <= max-removal-chain rounds (measured:
#: 10 at sf0.01, 2 at sf0.1, 0 at sf0.001); T adds headroom, and because
#: BOTH engines run the same T, the result stays oracle-exact even on a
#: corpus where T under-runs convergence (it is then "state after T peels",
#: bit-identical on both sides).
_KC_T = 16


def _kcore_oracle() -> str:
    parts = [
        "basket AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)",
        f"""pairs AS MATERIALIZED (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM basket a JOIN basket b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {_KC_MIN_CO})""",
        "sym AS MATERIALIZED (SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs)",
        "alive0 AS MATERIALIZED (SELECT DISTINCT u AS node FROM sym)",
    ]
    for t in range(1, _KC_T + 1):
        parts.append(
            f"""deg{t} AS MATERIALIZED (
      SELECT s.u AS node, CAST(COUNT(*) AS BIGINT) AS d FROM sym s
      JOIN alive{t - 1} a ON a.node = s.u
      JOIN alive{t - 1} b ON b.node = s.v
      GROUP BY s.u)"""
        )
        parts.append(
            f"alive{t} AS MATERIALIZED (SELECT node FROM deg{t} WHERE d >= {_KC_K})"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
    SELECT node AS part, d AS core_degree
    FROM deg{_KC_T} WHERE d >= {_KC_K}"""
    )


@query(
    "graph_kcore_peel",
    oracle=_kcore_oracle(),
    tags=("ext-graph", "kcore", "iterative"),
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core (k=3) of the co-purchase graph by iterative peeling: drop
    every node with degree < k, recompute degrees over the survivors,
    repeat. Output: the surviving nodes with their within-core degree —
    the dense-subgraph extractor (template/mirror cliques in a near-dup
    graph, spam rings in a link graph) that a degree threshold alone
    cannot compute, because removing one weak node can cascade.

    Iteration shape: the edge table is built ONCE (distinct-first
    basket pairing, the item_cooccurrence discipline: per-order fan-out
    bounded by basket size, never O(n²)) and persisted; each peel round
    is two semi-joins of edges against the shrinking alive set plus one
    map-side-combinable degree count, with the tiny alive list
    localCheckpoint'd so the plan stays flat across the 16 rounds. At
    100 TB the alive set is node-sized (≪ edges) and the per-round
    shuffle is bounded by the CURRENT edge count, which only shrinks —
    the standard distributed-peeling shape (Montresor et al. 2013 use
    the same edge-vs-alive iteration).
    """
    return graph_kcore_peel_at(spark, sf_dir)


#: Edge count below which the per-round alive sets broadcast (round 13).
#: alive ≤ 2·edges node ids (8 B each): 2M edges ⇒ ≤ 4M nodes ≈ 32 MB
#: per broadcast — far under the relation cap, and it only SHRINKS
#: round over round, so one dispatch decision holds for the whole peel.
_KC_BCAST_EDGE_BUDGET = 2_000_000


def graph_kcore_peel_at(
    spark: SparkSession,
    sf_dir: str,
    *,
    bcast_edge_budget: int = _KC_BCAST_EDGE_BUDGET,
    early_exit: bool = True,
) -> DataFrame:
    """Size-dispatched physical shape behind ``graph_kcore_peel`` (both
    paths compute identical rows; tests pin the equality).

    Round 13 (measured): left to the planner, every one of the 16 peel
    rounds BROADCAST THE FULL EDGE TABLE (27 MB at sf0.1 — build side
    of the first alive join) and sort-merge-joined the second —
    16 edge-table broadcasts + 16 sorts made this the suite's slowest
    query (6.9 s best-of-3). The peel joins exist only to intersect
    edges with the alive set, and ALIVE is the small, shrinking side:
    below the edge budget both alive probes are pinned as broadcast
    hash joins, so the persisted edge cache streams map-side through
    two hash probes into a partial degree count — one small exchange
    per round, zero sorts, zero edge-table broadcasts. Past the budget
    (node-sized alive too big to broadcast) the shuffle form is the
    correct 100 TB shape and runs unchanged; the dispatch is runtime
    stats (the same count that eagerly prices the edge cache), not a
    dataset assumption.
    """
    li = read_table(spark, sf_dir, "lineitem")
    # pair generation MAP-SIDE from per-order sorted arrays with
    # numbered repartitions (the item_cooccurrence discipline) — the
    # orderkey self-join variant let AQE byte-coalesce the 6M-record
    # post-distinct exchange into ONE task at amplified x100 (measured,
    # SCALE.md), serializing the pair-explode CPU; the distinct itself
    # gets the same guard (its two-bigint rows are byte-light but
    # record-heavy, exactly the coalescing trap)
    n_par = spark.sparkContext.defaultParallelism * 2
    basket = (
        li.select("l_orderkey", "l_partkey")
        .repartition(n_par, "l_orderkey", "l_partkey")
        .distinct()
    )
    arrs = (
        basket.repartition(n_par, "l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
    )
    pair_col = F.flatten(
        F.transform(
            F.col("ps"),
            lambda x, i: F.transform(
                F.slice(F.col("ps"), i + 2, F.size("ps")),
                lambda y: F.struct(x.alias("u"), y.alias("v")),
            ),
        )
    )
    pairs = (
        arrs.select(F.explode(pair_col).alias("__p"))
        .select(F.col("__p.u").alias("u"), F.col("__p.v").alias("v"))
        .repartition(n_par, "u", "v")
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= _KC_MIN_CO)
        .select("u", "v")
    )
    # Both directions from ONE pass over the pair pipeline (round 13,
    # the connected_components explode discipline): the former
    # two-branch union evaluated the full basket/explode/agg chain once
    # per branch when the cache materialized — measured as two
    # concurrent ~2 s full-pipeline stages in the sym.count() job.
    sym = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("u"), F.col("v")),
                    F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
                )
            ).alias("__e")
        )
        .select("__e.u", "__e.v")
        .transform(led_persist)
    )
    # ONE eager materialization: all 16 rounds read this cache, and the
    # scalar prices the broadcast dispatch (alive ≤ 2·n_e node ids).
    n_e = sym.count()
    small = n_e <= bcast_edge_budget

    alive = sym.select(F.col("u").alias("node")).distinct()
    deg = None
    # Early exit on the peel fixpoint (round 13, measured): peeling is
    # MONOTONE — alive_t ⊆ alive_{t-1} — so equal consecutive counts
    # mean equal sets, and from that round on every degree table is
    # bit-identical (deg_{t+1} counts the same edges over the same
    # alive set). Running the remaining rounds can only burn identical
    # jobs: the oracle's fixed T={_KC_T} unroll reaches the same
    # fixpoint, so the returned rows cannot differ. The per-round count
    # reads the alive checkpoint the next round's broadcast would
    # materialize anyway. sf0.1 converges after 2 peels: 16 degree
    # rounds -> 3 + the counts.
    prev_n = None
    for _ in range(_KC_T):
        a_u = alive.withColumnRenamed("node", "u")
        a_v = alive.withColumnRenamed("node", "v")
        if small:
            a_u, a_v = F.broadcast(a_u), F.broadcast(a_v)
        deg = (
            sym.join(a_u, "u")
            .join(a_v, "v")
            .groupBy("u")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        alive = (
            deg.filter(F.col("d") >= _KC_K)
            .select(F.col("u").alias("node"))
            .localCheckpoint(eager=False)
        )
        if early_exit:
            n_alive = alive.count()
            if n_alive == prev_n:
                break
            prev_n = n_alive
    return deg.filter(F.col("d") >= _KC_K).select(
        F.col("u").alias("part"), F.col("d").cast("bigint").alias("core_degree")
    )
