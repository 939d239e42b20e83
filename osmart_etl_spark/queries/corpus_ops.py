"""Corpus-maintenance operators: the shapes a training-data pipeline
runs REPEATEDLY as data arrives, not once — incremental near-dup
against an existing corpus, deterministic train/val/test assignment,
and SemDedup-style per-cluster canonical selection.

Extension surface beyond the reference (its pipelines are
full-refresh pandas scripts); the incremental probe mirrors the
reference's watermark-incremental philosophy (etl_sales incremental
extract) applied to LSH dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from osmart_etl_spark.caching import led_persist
from pyspark.sql import functions as F

from osmart_etl_spark.io.sources import read_table
from osmart_etl_spark.queries.base import query
from osmart_etl_spark.queries.similarity import _DOT, _NORM
from osmart_etl_spark.queries.text import _BANDS_SQL

# ONE bands-SQL definition for the whole LSH family — imported from
# text.py so the incremental query sees the SAME buckets as the
# full-corpus dedup (and there is exactly one copy of the seed formula
# to keep in lockstep with ops/dedup._minhash_seed).
@query(
    "dedup_incremental_lsh",
    oracle=f"""
    WITH {_BANDS_SQL}
    SELECT DISTINCT n.doc_id AS id_new, m.doc_id AS id_match,
           (m.doc_id % 10 < 8) AS from_base
    FROM bands n
    JOIN bands m
      ON m.band = n.band AND m.band_key = n.band_key
    WHERE n.doc_id % 10 >= 8
      AND (m.doc_id % 10 < 8 OR m.doc_id < n.doc_id)
    """,
    tags=("ext-dedup", "incremental"),
)
def dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup: a NEW batch of documents (doc_id%10>=8,
    ~20% of the corpus) probed against the BASE corpus (the other 80%)
    plus earlier arrivals in the same batch. Emits, per new doc, every
    LSH band-bucket collision: (id_new, id_match, from_base).

    This is the shape that matters at 100 TB: the nightly full-corpus
    self-join is O(corpus) shuffle, but a daily 1% batch only needs the
    NEW side's band keys — broadcast them, and the corpus-side band
    index is probed WHERE IT SITS (map-side hash lookup, zero corpus
    shuffle at probe time; in production the base index is a stored
    table bucketed by band_key, so even its one construction shuffle is
    amortized across every future batch). The self-pair half
    (new-vs-earlier-new) rides the same broadcast.

    Same hash family/banding as ``dedup_minhash_lsh`` — re-running a
    batch or the full corpus yields consistent buckets (cf.
    etl_sales/extract.py's idempotent incremental contract).
    """
    from osmart_etl_spark.ops.dedup import minhash_band_keys, shingle_sets

    d = read_table(spark, sf_dir, "documents")
    sets = shingle_sets(d, "doc_id", "text", k=5)
    bands = minhash_band_keys(sets, "doc_id", num_hashes=16, rows_per_band=4).transform(led_persist)
    new_b = bands.filter(F.col("doc_id") % 10 >= 8).select(
        "band", "band_key", F.col("doc_id").alias("id_new")
    )
    corpus = bands.select("band", "band_key", F.col("doc_id").alias("id_match"))
    hit = (F.col("id_match") % 10 < 8) | (F.col("id_match") < F.col("id_new"))
    return (
        corpus.join(F.broadcast(new_b), ["band", "band_key"])
        .filter(hit)
        .select("id_new", "id_match", (F.col("id_match") % 10 < 8).alias("from_base"))
        .distinct()
    )


_HASH_SPACE = 1 << 28
_TRAIN_THR = int(0.8 * _HASH_SPACE)  # 214748364
_VAL_THR = int(0.9 * _HASH_SPACE)  # 241591910


@query(
    "stratified_split_assign",
    oracle=f"""
    WITH assigned AS (
      SELECT lang, n_chars,
        CASE
          WHEN ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT
               < {_TRAIN_THR} THEN 'train'
          WHEN ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 7))::BIGINT
               < {_VAL_THR} THEN 'val'
          ELSE 'test'
        END AS split
      FROM documents
    )
    SELECT lang, split,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM assigned GROUP BY lang, split
    """,
    tags=("ext-mixing", "split"),
)
def stratified_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment with per-stratum
    (language) accounting. The split gate is a salted content hash
    (md5('split:'||doc_id)) — NOT random(): stable across runs, engines
    and partitionings, independent of the sampling gate's unsalted hash
    (a doc's split never correlates with whether mixing sampled it),
    and stratification is automatic because the hash is uniform within
    every stratum. Assignment is a pure projection (pushes to the scan,
    zero shuffle); the only exchange is the tiny (lang, split) summary
    agg. At 100 TB the projection pattern is the whole story: no
    global sort, no sampling pass, no state."""
    d = read_table(spark, sf_dir, "documents")
    gate = F.conv(
        F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 7),
        16,
        10,
    ).cast("bigint")
    split = (
        F.when(gate < _TRAIN_THR, "train").when(gate < _VAL_THR, "val").otherwise("test")
    )
    return (
        d.select("lang", "n_chars", split.alias("split"))
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


_SEM_THR = 0.35  # calibrated to the synthetic embedding space (cf. embedding_neardup_pairs)


@query(
    "semdedup_keep_list",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
             {_NORM.format(a="CAST(embedding AS DOUBLE[])")} AS nrm
      FROM embeddings
    ),
    dom AS (
      SELECT a.vec_id, CAST(COUNT(*) AS BIGINT) AS n_dominators
      FROM e a JOIN e b
        ON a.label = b.label AND b.vec_id < a.vec_id
      WHERE ({_DOT.format(a="a.v", b="b.v")} / (a.nrm * b.nrm)) >= {_SEM_THR}
      GROUP BY a.vec_id
    )
    SELECT e.vec_id, e.label,
      COALESCE(d.n_dominators, 0) AS n_dominators,
      (d.vec_id IS NULL) AS keep
    FROM e LEFT JOIN dom d ON d.vec_id = e.vec_id
    """,
    tags=("ext-dedup", "semdedup"),
)
def semdedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDedup-style semantic dedup keep-list (Abbas et al. 2023):
    within each coarse cluster (label — the IVF blocking, exactly as a
    real SemDedup pass runs inside k-means cells), a vector is DROPPED
    iff some lower-id cluster-mate is within cosine >= threshold; the
    lowest id of each semantic group survives. Deterministic keeper
    choice (id order), no iteration — unlike connected components, the
    keep rule is a single dominator count, so one cluster-blocked join
    + one agg. Scale shape: pair space is per-cluster (never global
    all-pairs); norms precomputed O(n*d) before pairing; skew guard is
    the cluster size cap upstream (ivf_build_assign balances cells)."""
    from osmart_etl_spark.ops.similarity import as_double_array, dot, l2_norm

    emb = read_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", "label", as_double_array(F.col("embedding")).alias("v")
    ).withColumn("nrm", l2_norm(F.col("v")))
    a = e.select(F.col("vec_id"), "label", F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = e.select(
        F.col("vec_id").alias("id_b"), "label", F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    dom = (
        a.join(b, "label")
        .filter(F.col("id_b") < F.col("vec_id"))
        .filter((dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))) >= _SEM_THR)
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_dominators"))
    )
    return (
        e.select("vec_id", "label")
        .join(dom.withColumnRenamed("vec_id", "d_id"), e["vec_id"] == F.col("d_id"), "left")
        .select(
            "vec_id",
            "label",
            F.coalesce(F.col("n_dominators"), F.lit(0).cast("bigint")).alias("n_dominators"),
            F.col("d_id").isNull().alias("keep"),
        )
    )


@query(
    "corpus_snapshot_diff",
    oracle="""
    WITH snap_a AS (
      SELECT doc_id, md5(text) AS digest FROM documents WHERE doc_id % 7 != 0
    ),
    snap_b AS (
      SELECT doc_id,
        md5(CASE WHEN doc_id % 11 = 0 THEN text || ' [rev2]' ELSE text END) AS digest
      FROM documents WHERE doc_id % 5 != 0
    )
    SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
      CASE WHEN a.doc_id IS NULL THEN 'added'
           WHEN b.doc_id IS NULL THEN 'removed'
           WHEN a.digest != b.digest THEN 'changed'
           ELSE 'unchanged' END AS status
    FROM snap_a a FULL OUTER JOIN snap_b b ON a.doc_id = b.doc_id
    WHERE a.doc_id IS NULL OR b.doc_id IS NULL OR a.digest != b.digest
    """,
    tags=("ext-versioning", "snapshot-diff"),
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-versioning diff: which documents were added, removed, or
    changed between two corpus snapshots (synthesized here from one
    table: snapshot A drops doc_id%7==0, snapshot B drops %5==0 and
    revises %11==0). The audit every reproducible-training setup runs
    before re-tokenizing — content compare via digest, never raw text,
    so the shuffle carries 32-byte hashes instead of documents, and
    'unchanged' rows (the overwhelming majority at 100 TB) are filtered
    OUT before the result materializes. One full-outer join on doc_id;
    at scale both snapshots would be bucketed by doc_id making it
    shuffle-free."""
    d = read_table(spark, sf_dir, "documents")
    snap_a = d.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id", F.md5(F.col("text")).alias("digest")
    )
    snap_b = d.filter(F.col("doc_id") % 5 != 0).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
            ).otherwise(F.col("text"))
        ).alias("digest"),
    )
    a = snap_a.select(F.col("doc_id").alias("a_id"), F.col("digest").alias("a_dig"))
    b = snap_b.select(F.col("doc_id").alias("b_id"), F.col("digest").alias("b_dig"))
    j = a.join(b, a["a_id"] == b["b_id"], "full_outer")
    status = (
        F.when(F.col("a_id").isNull(), "added")
        .when(F.col("b_id").isNull(), "removed")
        .when(F.col("a_dig") != F.col("b_dig"), "changed")
        .otherwise("unchanged")
    )
    return (
        j.select(F.coalesce(F.col("a_id"), F.col("b_id")).alias("doc_id"), status.alias("status"))
        .filter(F.col("status") != "unchanged")
    )


_RESERVOIR_K = 3


@query(
    "per_group_reservoir",
    oracle=f"""
    SELECT lang, doc_id, n_chars, rk
    FROM (
      SELECT lang, doc_id, n_chars,
        CAST(ROW_NUMBER() OVER (
          PARTITION BY lang
          ORDER BY md5('rsv:' || CAST(doc_id AS VARCHAR)), doc_id
        ) AS BIGINT) AS rk
      FROM documents
    )
    WHERE rk <= {_RESERVOIR_K}
    """,
    tags=("ext-mixing", "reservoir"),
)
def per_group_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic EXACT-k per-group sample (the reservoir pattern
    without randomness): rank group members by a salted content hash
    and keep the first k — every run, engine, and partitioning picks
    the same k docs per language, which is what an eval-set builder
    needs for reproducibility. Complements ``deterministic_sample``
    (expected-rate, no per-group guarantee) and ``weighted_sample_pps``
    (expected-k weighted). Shape: one hash-partition exchange on the
    group key; rank truncation happens inside the window sort with a
    doc_id tiebreaker (W6) — at 10^9 groups this stays one shuffle, no
    global sort, no driver state."""
    d = read_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    pri = F.md5(F.concat(F.lit("rsv:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(pri, F.col("doc_id"))
    return (
        d.select("lang", "doc_id", "n_chars")
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= _RESERVOIR_K)
    )


_Z_BITS = 16
_Z_BUCKET_SHIFT = 2 * _Z_BITS - 6  # top 6 bits -> 64 layout buckets


def _z_interleave_sql(xcol: str, ycol: str) -> str:
    """Machine-generated Morton-interleave SQL (bit b of x -> position
    2b, of y -> 2b+1) — the same formula ``ops of io/layout.zorder_key``
    builds as Spark shift/mask expressions."""
    terms = []
    for b in range(_Z_BITS):
        terms.append(f"((({xcol}) >> {b}) & 1) * {1 << (2 * b)}")
        terms.append(f"((({ycol}) >> {b}) & 1) * {1 << (2 * b + 1)}")
    return " + ".join(terms)


_Z_NORM_X = (
    "LEAST(CAST(FLOOR((CAST(o_custkey AS DOUBLE) - lo_c) / (hi_c - lo_c) * 65536.0)"
    " AS BIGINT), 65535)"
)
_Z_NORM_Y = (
    "LEAST(CAST(FLOOR((CAST(d AS DOUBLE) - lo_d) / (hi_d - lo_d) * 65536.0)"
    " AS BIGINT), 65535)"
)


@query(
    "zorder_skipping_audit",
    oracle=f"""
    WITH src AS (
      SELECT o_custkey,
        CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d
      FROM orders
    ),
    stats AS (
      SELECT CAST(MIN(o_custkey) AS DOUBLE) AS lo_c, CAST(MAX(o_custkey) AS DOUBLE) AS hi_c,
             CAST(MIN(d) AS DOUBLE) AS lo_d, CAST(MAX(d) AS DOUBLE) AS hi_d
      FROM src
    ),
    keyed AS (
      SELECT o_custkey, d,
        ({_z_interleave_sql(_Z_NORM_X, _Z_NORM_Y)}) AS zkey
      FROM src, stats
    )
    SELECT CAST(zkey >> {_Z_BUCKET_SHIFT} AS BIGINT) AS bucket,
      CAST(COUNT(*) AS BIGINT) AS n_rows,
      CAST(MIN(o_custkey) AS BIGINT) AS min_cust,
      CAST(MAX(o_custkey) AS BIGINT) AS max_cust,
      CAST(MIN(d) AS BIGINT) AS min_day,
      CAST(MAX(d) AS BIGINT) AS max_day
    FROM keyed GROUP BY 1
    """,
    tags=("ext-layout", "zorder"),
)
def zorder_skipping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton curve) data-skipping audit: orders keyed on the
    interleaved (custkey, order-day) curve, rolled up into the 64
    top-of-key buckets a compaction job would write as files — each
    bucket's min/max span in BOTH dimensions is what parquet footer
    pruning skips on, and on a Morton layout both spans are narrow
    SIMULTANEOUSLY (a custkey-sorted layout gives perfect custkey spans
    but full-range date spans, and vice versa). Same shift/mask
    interleave as ``io/layout.zorder_key`` / ``write_zordered`` (the
    actual layout writer, exercised in tests/test_layout.py); here the
    key+bucket are pure codegen projections over a broadcast 1-row
    min/max frame, one tiny bucket agg — the audit costs one scan."""
    from osmart_etl_spark.io.layout import _normalize, zorder_key

    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("d"),
    )
    stats = o.agg(
        F.min("o_custkey").alias("lo_c"),
        F.max("o_custkey").alias("hi_c"),
        F.min("d").alias("lo_d"),
        F.max("d").alias("hi_d"),
    )
    keyed = o.crossJoin(F.broadcast(stats)).select(
        "o_custkey",
        "d",
        zorder_key(
            [
                _normalize(F.col("o_custkey"), F.col("lo_c"), F.col("hi_c"), _Z_BITS),
                _normalize(F.col("d"), F.col("lo_d"), F.col("hi_d"), _Z_BITS),
            ],
            _Z_BITS,
        ).alias("zkey"),
    )
    return (
        keyed.groupBy(
            F.shiftright(F.col("zkey"), _Z_BUCKET_SHIFT).cast("bigint").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("o_custkey").cast("bigint").alias("min_cust"),
            F.max("o_custkey").cast("bigint").alias("max_cust"),
            F.min("d").cast("bigint").alias("min_day"),
            F.max("d").cast("bigint").alias("max_day"),
        )
    )


_FUZZY_THR = 0.4


@query(
    "entity_fuzzy_match",
    oracle=f"""
    WITH names AS (
      SELECT DISTINCT p_name, split_part(p_name, ' ', -1) AS block,
             regexp_replace(lower(trim(p_name)), ' +', ' ', 'g') AS norm
      FROM part
    ),
    grams AS (
      SELECT DISTINCT p_name, substr(norm, i, 3) AS g
      FROM names
      CROSS JOIN LATERAL (
        SELECT UNNEST(generate_series(1, greatest(length(norm) - 2, 1))) AS i
      ) s
    ),
    sizes AS (SELECT p_name, COUNT(*) AS n FROM grams GROUP BY p_name),
    cand AS (
      SELECT a.p_name AS name_a, b.p_name AS name_b
      FROM names a JOIN names b
        ON a.block = b.block AND a.p_name < b.p_name
    ),
    inter AS (
      SELECT c.name_a, c.name_b, COUNT(*) AS n_inter
      FROM cand c
      JOIN grams ga ON ga.p_name = c.name_a
      JOIN grams gb ON gb.p_name = c.name_b AND gb.g = ga.g
      GROUP BY c.name_a, c.name_b
    )
    SELECT i.name_a, i.name_b,
      CAST(i.n_inter AS DOUBLE)
        / CAST(sa.n + sb.n - i.n_inter AS DOUBLE) AS sim
    FROM inter i
    JOIN sizes sa ON sa.p_name = i.name_a
    JOIN sizes sb ON sb.p_name = i.name_b
    WHERE CAST(i.n_inter AS DOUBLE)
        / CAST(sa.n + sb.n - i.n_inter AS DOUBLE) >= {_FUZZY_THR}
    """,
    tags=("ext-entity-resolution",),
)
def entity_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution over a dimension table: near-identical part
    names found by character-trigram Jaccard INSIDE a blocking key (the
    name's last token), the standard MDM dedup shape — blocking bounds
    the pair space (never all-pairs, same idea as LSH bands) and
    trigram sets are a zero-shuffle projection.

    The load-bearing rewrite (measured 69 s → the distinct-first form
    at sf0.1): similarity is a function of the NAME, not the row, so
    the pair join runs over DISTINCT (name, block) — 20k parts collapse
    to ~500 names, shrinking the within-block pair space ~1600×; the
    instance-level duplication that made the row-level join quadratic
    in catalog reissues is exactly what DISTINCT removes. Pairs are
    canonical (name_a < name_b). A size-ratio prefilter drops pairs
    that provably cannot reach the threshold (J ≥ t ⇒ max|grams| ≤
    min|grams|/t) BEFORE the interpreted array_intersect — sound, no
    false drops, and the intersect is the cost center because
    higher-order array functions don't codegen."""
    from osmart_etl_spark.ops.dedup import shingle_array

    names = (
        read_table(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .select(
            "p_name",
            F.element_at(F.split(F.col("p_name"), " "), -1).alias("block"),
            F.array_distinct(shingle_array(F.col("p_name"), k=3)).alias("__g"),
        )
    )
    a = names.select(
        F.col("p_name").alias("name_a"), "block", F.col("__g").alias("ga")
    )
    b = names.select(
        F.col("p_name").alias("name_b"), "block", F.col("__g").alias("gb")
    )
    na, nb = F.size("ga"), F.size("gb")
    ratio_ok = F.greatest(na, nb).cast("double") <= (
        F.least(na, nb).cast("double") / F.lit(_FUZZY_THR)
    )
    n_inter = F.size(F.array_intersect(F.col("ga"), F.col("gb")))
    sim = n_inter.cast("double") / (na + nb - n_inter).cast("double")
    return (
        a.join(b, "block")
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(ratio_ok)
        .select("name_a", "name_b", sim.alias("sim"))
        .filter(F.col("sim") >= _FUZZY_THR)
    )


@query(
    "graph_triangle_count",
    oracle=f"""
    WITH {_BANDS_SQL},
    edges AS (
      SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    und AS (SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges),
    deg AS (SELECT u AS node, COUNT(*) AS d FROM und GROUP BY u),
    oriented AS (
      SELECT CASE WHEN (da.d, e.u) < (db.d, e.v) THEN e.u ELSE e.v END AS s,
             CASE WHEN (da.d, e.u) < (db.d, e.v) THEN e.v ELSE e.u END AS t,
             CASE WHEN (da.d, e.u) < (db.d, e.v) THEN db.d ELSE da.d END AS dt
      FROM edges e JOIN deg da ON da.node = e.u JOIN deg db ON db.node = e.v
    ),
    tri AS (
      SELECT COUNT(*) AS n_triangles FROM oriented o1
      JOIN oriented o2 ON o1.s = o2.s AND (o1.dt, o1.t) < (o2.dt, o2.t)
      JOIN oriented o3 ON o3.s = o1.t AND o3.t = o2.t
    )
    SELECT CAST(t.n_triangles AS BIGINT) AS n_triangles,
           CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges
    FROM tri t
    """,
    tags=("ext-graph", "triangles"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the near-dup candidate graph via
    DEGREE-ORDERED edge orientation — the shape that survives
    power-law graphs: every edge points from the (degree, id)-smaller
    endpoint to the larger, so each triangle is enumerated exactly once
    from its minimum-order apex, and a celebrity node with 10^6
    neighbors generates wedges only toward HIGHER-degree nodes — the
    classic O(m^1.5) bound instead of the naive per-node deg² blowup.
    (The wedge pair must be ordered by the SAME (degree, id) total
    order the orientation uses; ordering wedges by raw id undercounts
    — 563 vs the true 966 on this corpus — because the closing edge's
    orientation follows degree order, not id order. Verified against a
    naive u<v<w triple join.) Triangle density is the standard health
    metric for dedup graphs: near-dup clusters should be near-cliques,
    so a low triangle-to-wedge ratio flags a banding collision
    problem."""
    return graph_triangle_count_at(spark, sf_dir)


#: Edge count below which the oriented adjacency broadcasts (round 13).
#: (s, t, dt) rows are ~24 B framed; 2M edges ≈ 50 MB broadcast — far
#: under the 8 GB relation cap, comfortably inside executor memory.
_TRI_BCAST_EDGE_BUDGET = 2_000_000


def graph_triangle_count_at(
    spark: SparkSession, sf_dir: str, *, bcast_edge_budget: int = _TRI_BCAST_EDGE_BUDGET
) -> DataFrame:
    """Size-dispatched physical shape behind ``graph_triangle_count``
    (both paths compute identical rows; tests pin the equality).

    Round 13 (VERDICT r12 #1 — timings of 1.1/7.4/16.3/24.5 s across
    rounds on identical code+data): the instability was (a) the
    InferFiltersFromGenerate scan pathology in the shared shingle
    pipeline (fixed in session.py) and (b) every post-edge join left to
    AQE over unmaterialized tiny caches — 4 SortMergeJoins whose
    sort/exchange placement flapped run to run. Fix: materialize the
    edge cache ONCE eagerly (the setsim_exact_join discipline — the
    count also prices the dispatch below), then, while the oriented
    adjacency fits a broadcast, pin every downstream join as a
    broadcast hash join: degree attach, wedge self-join, closing-edge
    probe. The wedge stream — the one quadratic-ish intermediate — is
    then NEVER exchanged: it flows map-side from the oriented cache
    through two broadcast probes into a partial count
    (tests/test_plans.py plan-lock). Past the budget (graphs whose edge
    set outgrows a broadcast) the shuffle form is the correct shape —
    wedges ⋈ edges keyed on the closing edge is the classic
    distributed triangle count — and is what a 100 TB candidate graph
    would run; the dispatch is runtime stats, not dataset assumptions.
    """
    from osmart_etl_spark.ops.dedup import (
        candidate_pairs,
        minhash_band_keys,
        shingle_sets,
    )

    d = read_table(spark, sf_dir, "documents")
    bands = minhash_band_keys(
        shingle_sets(d, "doc_id", "text", k=5), "doc_id", num_hashes=16, rows_per_band=4
    )
    edges = candidate_pairs(bands, "doc_id").transform(led_persist)
    # ONE eager materialization: every downstream subtree (degree agg,
    # the oriented broadcasts, n_edges) reads this cache; cold
    # concurrent broadcast jobs otherwise race to build it serially.
    # The scalar doubles as the dispatch stat (a single count, no rows
    # to the driver).
    n_e = edges.count()
    small = n_e <= bcast_edge_budget
    und = edges.select(F.col("id_a").alias("n1"), F.col("id_b").alias("n2")).unionAll(
        edges.select(F.col("id_b").alias("n1"), F.col("id_a").alias("n2"))
    )
    deg = und.groupBy(F.col("n1").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    da = deg.select(F.col("node").alias("u_n"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("v_n"), F.col("d").alias("db"))
    if small:  # degree table ≤ 2·edges rows — broadcast the attach
        da, db = F.broadcast(da), F.broadcast(db)
    e = (
        edges.join(da, F.col("id_a") == F.col("u_n"))
        .join(db, F.col("id_b") == F.col("v_n"))
    )
    u_first = F.struct(F.col("da"), F.col("id_a")) < F.struct(F.col("db"), F.col("id_b"))
    oriented = e.select(
        F.when(u_first, F.col("id_a")).otherwise(F.col("id_b")).alias("s"),
        F.when(u_first, F.col("id_b")).otherwise(F.col("id_a")).alias("t"),
        F.when(u_first, F.col("db")).otherwise(F.col("da")).alias("dt"),
    ).transform(led_persist)
    oriented.count()  # materialize before the broadcast subtrees race
    o1 = oriented.select(F.col("s"), F.col("t").alias("t1"), F.col("dt").alias("dt1"))
    o2 = oriented.select(F.col("s"), F.col("t").alias("t2"), F.col("dt").alias("dt2"))
    closing = oriented.select(F.col("s").alias("c_s"), F.col("t").alias("c_t"))
    if small:
        o2, closing = F.broadcast(o2), F.broadcast(closing)
    wedges = o1.join(o2, "s").filter(
        F.struct(F.col("dt1"), F.col("t1")) < F.struct(F.col("dt2"), F.col("t2"))
    )
    tri = wedges.join(
        closing, (F.col("t1") == F.col("c_s")) & (F.col("t2") == F.col("c_t"))
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    n_edges = edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return tri.crossJoin(F.broadcast(n_edges))


_LEV_MAX = 4


@query(
    "entity_levenshtein_verify",
    oracle=f"""
    WITH names AS (
      SELECT DISTINCT p_name, split_part(p_name, ' ', -1) AS block,
             regexp_replace(lower(trim(p_name)), ' +', ' ', 'g') AS norm
      FROM part
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
      CAST(levenshtein(a.norm, b.norm) AS BIGINT) AS edit_dist
    FROM names a JOIN names b
      ON a.block = b.block AND a.p_name < b.p_name
    WHERE levenshtein(a.norm, b.norm) <= {_LEV_MAX}
      AND abs(length(a.norm) - length(b.norm)) <= {_LEV_MAX}
    """,
    tags=("ext-entity-resolution", "edit-distance"),
)
def entity_levenshtein_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verification for blocked name pairs — the second
    stage of a two-tier entity-resolution cascade (trigram Jaccard
    recalls candidates cheaply; Levenshtein confirms with the stricter
    character-level metric; both engines implement the same DP, so the
    integer distances hash-match). The length-difference prefilter is
    the standard sound bound (|len(a)-len(b)| ≤ d is necessary for
    dist ≤ d) and is sargable where the O(n·m) DP is not — at scale it
    prunes before the expensive comparator, same pattern as the
    size-ratio guard in entity_fuzzy_match. Distinct-name pairing
    keeps the pair space ~500 names, not 20k rows. (The last-word
    block is a RECALL HEURISTIC — a typo in the last word escapes it;
    ``dedup_edit_passjoin`` in queries/linkage.py is the
    provably-complete PassJoin segment blocking for when missed pairs
    are not acceptable.) Distances compare
    the NORMALIZED names (same lower/trim/collapse as the trigram
    stage — the cascade's two stages must agree on what a 'name'
    is)."""
    from osmart_etl_spark.ops.text import normalized_text

    names = (
        read_table(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .select(
            "p_name",
            F.element_at(F.split(F.col("p_name"), " "), -1).alias("block"),
            normalized_text(F.col("p_name")).alias("norm"),
        )
    )
    a = names.select(
        F.col("p_name").alias("name_a"), "block", F.col("norm").alias("norm_a")
    )
    b = names.select(
        F.col("p_name").alias("name_b"), "block", F.col("norm").alias("norm_b")
    )
    return (
        a.join(b, "block")
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(
            F.abs(F.length("norm_a") - F.length("norm_b")) <= _LEV_MAX
        )
        .select(
            "name_a",
            "name_b",
            F.levenshtein("norm_a", "norm_b").cast("bigint").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= _LEV_MAX)
    )


@query(
    "golden_record_survivorship",
    oracle="""
    WITH fp AS (
      SELECT doc_id, lang, source, n_chars,
        md5(substr(regexp_replace(lower(trim(text)), ' +', ' ', 'g'), 1, 30))
          AS digest
      FROM documents
    ),
    golden AS (
      SELECT digest,
        CAST(COUNT(*) AS BIGINT) AS n_members,
        MIN(doc_id) AS canonical_id,
        CAST(MAX(n_chars) AS BIGINT) AS best_n_chars,
        MIN(lang) AS lang_alpha,
        MAX(source) AS source_alpha_last
      FROM fp GROUP BY digest
    )
    SELECT digest, n_members, canonical_id, best_n_chars,
           lang_alpha, source_alpha_last
    FROM golden WHERE n_members > 1
    """,
    tags=("ext-entity-resolution", "survivorship"),
)
def golden_record_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship (golden-record construction) — the step AFTER
    matching in every MDM/dedup pipeline: match groups (here: shared
    normalized 30-char prefix — the boilerplate-opening blocking this
    corpus actually exhibits; exact-text digests find nothing in it)
    collapse to one record whose fields are chosen per-attribute by
    explicit rules
    (here: lowest id as canonical key, largest n_chars, deterministic
    alphabetical picks for lang/source — real pipelines plug in
    trust-ordered sources or recency instead; any such rule is a
    min/max over a rule-ordered struct, cf. latest_via_struct_max).
    The whole step is ONE map-side-combinable aggregate keyed by the
    match key — no window, no join-back — so survivorship costs the
    same shuffle the duplicate-detection groupBy already paid.
    Only multi-member groups are emitted (the records that actually
    merged)."""
    d = read_table(spark, sf_dir, "documents")
    from osmart_etl_spark.ops.text import normalized_text

    fp = d.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.md5(F.substring(normalized_text(F.col("text")), 1, 30)).alias("digest"),
    )
    return (
        fp.groupBy("digest")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.min("doc_id").alias("canonical_id"),
            F.max("n_chars").cast("bigint").alias("best_n_chars"),
            F.min("lang").alias("lang_alpha"),
            F.max("source").alias("source_alpha_last"),
        )
        .filter(F.col("n_members") > 1)
    )
