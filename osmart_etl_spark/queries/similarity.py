"""Similarity-search queries over ``embeddings`` (BASELINE.json
extension surface): brute-force cosine top-k baseline, IVF-probed ANN,
and embedding-cosine near-duplicate pairs.

Bit-determinism: all dot products are strict left-folds over
double-cast arrays (Spark ``F.aggregate`` ↔ DuckDB ``list_reduce``) —
see ops/similarity.py. The float→double element cast is exact, products
and the fold order are identical, so cosines match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osmart_etl_spark.io.sources import read_table
from osmart_etl_spark.ops.similarity import as_double_array, cosine
from osmart_etl_spark.queries.base import query

# DuckDB fragments: strict left-fold dot/norm over double-cast lists.
_DOT = (
    "list_reduce(list_prepend(0.0, list_transform(list_zip({a}, {b}),"
    " p -> p[1] * p[2])), (acc, x) -> acc + x)"
)
_NORM = (
    "sqrt(list_reduce(list_prepend(0.0, list_transform({a}, x -> x * x)),"
    " (acc, x) -> acc + x))"
)


def _cos_sql(a: str, b: str) -> str:
    return f"({_DOT.format(a=a, b=b)} / ({_NORM.format(a=a)} * {_NORM.format(a=b)}))"


_QVEC = "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)"


@query(
    "knn_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS q_vec FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, {_cos_sql("CAST(embedding AS DOUBLE[])", "q_vec")} AS cos_sim
    FROM embeddings, q
    WHERE vec_id != 0
    ORDER BY cos_sim DESC, vec_id ASC
    LIMIT 10
    """,
    tags=("ext-sim", "knn"),
)
def knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-10 for a fixed query vector
    (vec_id=0): the ANN baseline. Query side broadcast; corpus never
    shuffles; top-k = TakeOrderedAndProject (per-partition heaps)."""
    emb = read_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        as_double_array(F.col("embedding")).alias("q_vec")
    )
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            cosine(as_double_array(F.col("embedding")), F.col("q_vec")).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(10)


@query(
    "ann_ivf_probe",
    oracle=f"""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS q_vec FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT vec_id, label, {_cos_sql("CAST(embedding AS DOUBLE[])", "q_vec")} AS cos_sim
      FROM embeddings, q
      WHERE vec_id != 0
    ),
    best_clusters AS (
      SELECT label FROM scored
      GROUP BY label
      ORDER BY MAX(cos_sim) DESC, label ASC
      LIMIT 2
    )
    SELECT s.vec_id, s.label, s.cos_sim
    FROM scored s JOIN best_clusters b ON s.label = b.label
    ORDER BY s.cos_sim DESC, s.vec_id ASC
    LIMIT 10
    """,
    tags=("ext-sim", "ivf"),
)
def ann_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: ``label`` plays the coarse-quantizer cluster id;
    rank clusters, probe the best 2, top-10 within them
    (ops/similarity.ivf_probe_topk). At scale this prunes the scan to
    nprobe/K of the corpus before any ranking work."""
    from osmart_etl_spark.ops.similarity import ivf_probe_topk

    emb = read_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("q_id"), as_double_array(F.col("embedding")).alias("q_vec")
    )
    out = ivf_probe_topk(
        emb.filter(F.col("vec_id") != 0), qv, id_col="vec_id", vec_col="embedding",
        cluster_col="label", k=10, nprobe=2,
    )
    return out.select("vec_id", "label", "cos_sim")


@query(
    "embedding_neardup_pairs",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
             {_NORM.format(a="CAST(embedding AS DOUBLE[])")} AS nrm
      FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ({_DOT.format(a="a.v", b="b.v")} / (a.nrm * b.nrm)) AS cos_sim
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= 0.35
    """,
    tags=("ext-dedup", "embedding-cosine"),
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by the coarse cluster id
    (label) so the pair space is per-bucket, not global all-pairs — the
    same blocking idea as LSH bands. Threshold 0.35 (calibrated to the
    synthetic embedding space — real pipelines use ~0.95) on
    bit-identical cosines."""
    from osmart_etl_spark.ops.similarity import dot, l2_norm

    emb = read_table(spark, sf_dir, "embeddings")
    # Precompute each vector's norm ONCE (O(n·d)) instead of inside the
    # pair expression (O(pairs·d)) — higher-order array functions are
    # interpreted, not codegen'd, so per-pair work is the cost center.
    e = emb.select(
        "vec_id", "label",
        as_double_array(F.col("embedding")).alias("v"),
    ).withColumn("nrm", l2_norm(F.col("v")))
    a = e.select(F.col("vec_id").alias("id_a"), "label",
                 F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = e.select(F.col("vec_id").alias("id_b"), "label",
                 F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    pairs = a.join(b, "label").filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a", "id_b",
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.35)
    )


_N_SEEDS = 8


@query(
    "ivf_build_assign",
    oracle=f"""
    WITH seeds AS (
      SELECT vec_id AS seed_id, CAST(embedding AS DOUBLE[]) AS s_vec
      FROM embeddings WHERE vec_id < {_N_SEEDS}
    ),
    scored AS (
      SELECT e.vec_id, s.seed_id,
             {_cos_sql("CAST(e.embedding AS DOUBLE[])", "s.s_vec")} AS cos_sim
      FROM embeddings e CROSS JOIN seeds s
    ),
    ranked AS (
      SELECT vec_id, seed_id, cos_sim,
             ROW_NUMBER() OVER (
               PARTITION BY vec_id ORDER BY cos_sim DESC, seed_id ASC) AS rn
      FROM scored
    )
    SELECT vec_id, seed_id AS cluster_id, cos_sim FROM ranked WHERE rn = 1
    """,
    tags=("ext-sim", "ivf-build"),
)
def ivf_build_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer BUILD step: deterministic seed centroids
    (the first _N_SEEDS vectors — a k-means++-free seeding that stays
    engine-reproducible), every vector assigned to its best seed by
    cosine, ties to the lower seed id. ``ann_ivf_probe`` is the read
    side of this index; together they are the build/probe pair.

    Scale shape: seeds broadcast (a centroid table is always tiny),
    scoring is map-side, and the argmax is ONE partial-aggregated
    shuffle carrying a single struct per vector —
    ``max(struct(cos_sim, -seed_id))`` instead of a rank window, which
    would shuffle all |vectors|×|seeds| scored rows. At re-cluster time
    this runs once per Lloyd round with updated centroids.
    """
    emb = read_table(spark, sf_dir, "embeddings")
    seeds = emb.filter(F.col("vec_id") < _N_SEEDS).select(
        F.col("vec_id").alias("seed_id"),
        as_double_array(F.col("embedding")).alias("s_vec"),
    )
    scored = emb.crossJoin(F.broadcast(seeds)).select(
        "vec_id",
        "seed_id",
        cosine(as_double_array(F.col("embedding")), F.col("s_vec")).alias("cos_sim"),
    )
    best = scored.groupBy("vec_id").agg(
        F.max(F.struct(F.col("cos_sim"), (-F.col("seed_id")).alias("neg_seed"))).alias("b")
    )
    return best.select(
        "vec_id",
        (-F.col("b.neg_seed")).cast("bigint").alias("cluster_id"),
        F.col("b.cos_sim").alias("cos_sim"),
    )


def _srp_oracle_sql(tau: float = 0.35, rows_per_band: int = 8, n_bands: int = 4) -> str:
    """Oracle twin of embedding_srp_neardup: the SAME md5-derived
    hyperplane constants (srp_planes) rendered as double literals, the
    same left-fold dots, the same banding — engines must agree on every
    candidate pair and cosine bit."""
    from osmart_etl_spark.ops.similarity import srp_planes

    planes = srp_planes(n_bands * rows_per_band, 64)
    band_selects = []
    for b in range(n_bands):
        terms = []
        for r in range(rows_per_band):
            lit = "[" + ", ".join(repr(x) for x in planes[b * rows_per_band + r]) + "]"
            d = _DOT.format(a="v", b=lit)
            terms.append(f"(CASE WHEN {d} >= 0 THEN {1 << r} ELSE 0 END)")
        band_selects.append(
            f"SELECT vec_id, {b} AS band, ({' + '.join(terms)}) AS band_sig FROM v"
        )
    sig_union = " UNION ALL ".join(band_selects)
    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    sig AS ({sig_union}),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM sig a JOIN sig b
        ON a.band = b.band AND a.band_sig = b.band_sig AND a.vec_id < b.vec_id
    ),
    scored AS (
      SELECT c.id_a, c.id_b, {_cos_sql("va.v", "vb.v")} AS cos_sim
      FROM cand c JOIN v va ON va.vec_id = c.id_a JOIN v vb ON vb.vec_id = c.id_b
    )
    SELECT id_a, id_b, cos_sim FROM scored WHERE cos_sim >= {tau}
    """


@query(
    "embedding_srp_neardup",
    oracle=_srp_oracle_sql(),
    tags=("ext-sim", "srp-lsh", "scale-shape"),
)
def embedding_srp_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs via signed-random-projection LSH
    (Charikar STOC'02) — the hyperplane-sign sibling of the MinHash
    banding used for text, and a second independent blocking scheme
    next to the IVF-cluster-blocked ``embedding_neardup_pairs``:
    4 bands × 8 sign bits, candidates = any-band collision, then exact
    cosine ≥ 0.35 verification on candidates only (threshold calibrated
    to the synthetic corpus like the IVF sibling: max pairwise cosine
    there is ~0.51, so a web-scale 0.9 threshold would be vacuous).

    Scale shape: signatures are ONE zero-shuffle projection (the
    deterministic plane constants are plan literals — nothing joins in);
    candidate generation is one exchange keyed on (band, band_sig);
    verification is two broadcast-pairs joins, |candidates|-
    proportional. Never O(n²). At web scale, widen rows_per_band to
    keep Σ bucket² bounded (16-bit bands → 65k buckets/band) — the
    knob trades recall for bucket sharpness exactly like MinHash R.
    """
    from osmart_etl_spark.ops.similarity import srp_band_signatures, srp_planes

    emb = read_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", as_double_array(F.col("embedding")).alias("v"))
    sig = srp_band_signatures(vecs, "vec_id", "v", srp_planes(32, 64), rows_per_band=8)
    a = sig.select(F.col("vec_id").alias("id_a"), "band", "band_sig")
    b = sig.select(F.col("vec_id").alias("id_b"), "band", "band_sig")
    cand = (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = vecs.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    vb = vecs.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    return (
        va.join(F.broadcast(cand), "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.35)
    )


@query(
    "knn_batch_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_vec
      FROM embeddings WHERE vec_id < 5
    ),
    scored AS (
      SELECT q.q_id, e.vec_id,
        {_cos_sql("CAST(e.embedding AS DOUBLE[])", "q.q_vec")} AS cos_sim
      FROM embeddings e, q
      WHERE e.vec_id >= 5
    ),
    ranked AS (
      SELECT q_id, vec_id, cos_sim,
        ROW_NUMBER() OVER (PARTITION BY q_id
                           ORDER BY cos_sim DESC, vec_id ASC) AS r
      FROM scored
    )
    SELECT q_id, vec_id, cos_sim FROM ranked WHERE r <= 5
    """,
    tags=("ext-sim", "knn", "batch"),
)
def knn_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched exact KNN: top-5 cosine neighbors for EACH of 5 query
    vectors in one pass — the realistic retrieval workload (queries
    arrive in batches, not singly). The whole query batch broadcasts;
    the corpus is scanned once and never shuffles full rows: per-query
    top-k reduces through the two-phase partial-heap shape in
    ops/similarity (per-partition top-k, then final k per q_id), so
    the exchange carries ≤ k·partitions rows per query, not the corpus.
    At 10⁹ vectors × 10³-query batches the same plan holds — broadcast
    the batch, partial top-k per partition, tiny final merge.
    """
    from osmart_etl_spark.ops.similarity import brute_force_topk

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        as_double_array(F.col("embedding")).alias("q_vec"),
    )
    corpus = emb.filter(F.col("vec_id") >= 5)
    return brute_force_topk(corpus, queries, "vec_id", "embedding", k=5)


_MAT_PDIM = 16  # matryoshka prefix dims used for the cheap first pass
_MAT_PREK = 50  # candidates surviving the prefix pass


@query(
    "matryoshka_prefix_rerank",
    oracle=f"""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
    e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id != 0
    ),
    s1 AS (
      SELECT vec_id, v,
        {_cos_sql(f"v[1:{_MAT_PDIM}]", f"qv[1:{_MAT_PDIM}]")} AS prefix_sim
      FROM e, q
      ORDER BY prefix_sim DESC, vec_id ASC
      LIMIT {_MAT_PREK}
    )
    SELECT vec_id, prefix_sim,
      {_cos_sql("v", "qv")} AS cos_sim
    FROM s1, q
    ORDER BY cos_sim DESC, vec_id ASC
    LIMIT 10
    """,
    tags=("ext-sim", "matryoshka", "rerank"),
)
def matryoshka_prefix_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage matryoshka retrieval (Kusupati et al. 2022's use
    pattern): rank the corpus by cosine over only the FIRST 16 of 64
    dims (matryoshka prefixes are trained to be usable truncations),
    keep the top 50, then re-rank those exactly at full dimension for
    the final top-10. Output carries both scores so recall loss is
    auditable.

    Scale: stage 1 is the only corpus-wide pass and it reads 4x fewer
    vector bytes per row (with dim-sliced storage, 4x less I/O too);
    top-50 reduces via TakeOrderedAndProject per-partition heaps, so
    nothing shuffles full rows. Stage 2 touches 50 rows. At 10^9
    vectors the prefix pass is the cost and it is pure scan+fold —
    embarrassingly parallel, zero shuffle."""
    emb = read_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        as_double_array(F.col("embedding")).alias("qv")
    )
    pre = F.slice(F.col("v"), 1, _MAT_PDIM)
    qpre = F.slice(F.col("qv"), 1, _MAT_PDIM)
    s1 = (
        emb.filter(F.col("vec_id") != 0)
        .select("vec_id", as_double_array(F.col("embedding")).alias("v"))
        .crossJoin(F.broadcast(qv))
        .select("vec_id", "v", "qv", cosine(pre, qpre).alias("prefix_sim"))
        .orderBy(F.col("prefix_sim").desc(), F.col("vec_id").asc())
        .limit(_MAT_PREK)
    )
    return (
        s1.select(
            "vec_id", "prefix_sim", cosine(F.col("v"), F.col("qv")).alias("cos_sim")
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(10)
    )


_RA_NPROBE = 2
_RA_K = 10
_RA_NQ = 8  # probes: vec_id < 8; corpus: the rest


@query(
    "ann_recall_audit",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vv FROM embeddings
    ),
    q AS (SELECT vec_id AS q_id, vv AS qv FROM v WHERE vec_id < {_RA_NQ}),
    corpus AS (SELECT * FROM v WHERE vec_id >= {_RA_NQ}),
    scored AS (
      SELECT q.q_id, c.vec_id, c.label,
             {_cos_sql("c.vv", "q.qv")} AS cos_sim
      FROM corpus c CROSS JOIN q
    ),
    brute AS (
      SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id, ROW_NUMBER() OVER (
          PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS rn
        FROM scored) WHERE rn <= {_RA_K}
    ),
    crank AS (
      SELECT q_id, label FROM (
        SELECT q_id, label, ROW_NUMBER() OVER (
          PARTITION BY q_id ORDER BY c_score DESC, label ASC) AS crn
        FROM (SELECT q_id, label, MAX(cos_sim) AS c_score
              FROM scored GROUP BY q_id, label)
      ) WHERE crn <= {_RA_NPROBE}
    ),
    ivf AS (
      SELECT q_id, vec_id FROM (
        SELECT s.q_id, s.vec_id, ROW_NUMBER() OVER (
          PARTITION BY s.q_id ORDER BY s.cos_sim DESC, s.vec_id ASC) AS rn
        FROM scored s JOIN crank c ON c.q_id = s.q_id AND c.label = s.label
      ) WHERE rn <= {_RA_K}
    )
    SELECT b.q_id,
           CAST(COUNT(i.vec_id) AS BIGINT) AS n_overlap,
           COUNT(i.vec_id) / {float(_RA_K)} AS recall_at_k
    FROM brute b LEFT JOIN ivf i ON i.q_id = b.q_id AND i.vec_id = b.vec_id
    GROUP BY b.q_id
    """,
    tags=("ext-sim", "ivf", "recall-audit"),
)
def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the IVF probe against the brute-force ground truth,
    per probe query, AS DATA — the approximate index's quality contract
    moves from a pytest into the driver-verified surface (the
    minhash_estimate_quality pattern applied to ANN): a quantizer or
    probe-selection regression becomes a value-hash mismatch, not a
    silent recall drop discovered in production.

    Both rankings share one scored table and the same (cos desc, id
    asc) total order; recall = overlap/10 is one division of identical
    operands. At 100 TB the audit runs on a probe SAMPLE exactly like
    this (brute force over all queries is the thing IVF exists to
    avoid — auditing 8 probes costs one corpus scan, the same rotation
    idea as approx_sketches' hash-gated exact-quantile audit). Measured
    on the testdata: recall@10 is 0.3–0.5 at nprobe=2 because ``label``
    is a WEAK coarse quantizer for cosine neighborhoods here — which is
    precisely the kind of fact this audit exists to surface; raising
    nprobe raises recall monotonically (tested), and a trained
    quantizer (ivf_build_assign / kmeans_lloyd) is the structural fix.
    """
    return ann_recall_audit_at(spark, sf_dir)


def ann_recall_audit_at(
    spark: SparkSession, sf_dir: str, *, probe_block: int = 0
) -> DataFrame:
    """The ANN recall audit over an arbitrary probe block — the rotation
    surface behind the registry-pinned ``ann_recall_audit`` (exactly
    ``probe_block=0``): block ``b`` audits probe queries ``vec_id`` in
    ``[b*NQ, (b+1)*NQ)`` against the rest of the corpus, so successive
    snapshots rotate which vectors play the probe role (the same
    residue-rotation doctrine as ``lsh_recall_audit_at``).
    tests/test_similarity_recall.py sweeps blocks 1–3 and pins the
    recall band."""
    from osmart_etl_spark.ops.similarity import ivf_probe_topk

    lo, hi = probe_block * _RA_NQ, (probe_block + 1) * _RA_NQ
    emb = read_table(spark, sf_dir, "embeddings")
    probes = emb.filter(
        (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
    ).select(
        F.col("vec_id").alias("q_id"),
        as_double_array(F.col("embedding")).alias("q_vec"),
    )
    corpus = emb.filter((F.col("vec_id") < lo) | (F.col("vec_id") >= hi))

    v = as_double_array(F.col("embedding"))
    scored = corpus.crossJoin(F.broadcast(probes)).select(
        "q_id", "vec_id", cosine(v, F.col("q_vec")).alias("cos_sim")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    brute = (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= _RA_K)
        .select("q_id", "vec_id")
    )
    ivf = ivf_probe_topk(
        corpus, probes, id_col="vec_id", vec_col="embedding",
        cluster_col="label", k=_RA_K, nprobe=_RA_NPROBE,
    ).select("q_id", "vec_id", F.lit(1).alias("__hit"))
    return (
        brute.join(ivf, ["q_id", "vec_id"], "left")
        .groupBy("q_id")
        .agg(
            F.count("__hit").alias("n_overlap"),
            (F.count("__hit") / F.lit(float(_RA_K))).alias("recall_at_k"),
        )
    )
