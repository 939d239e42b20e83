"""Similarity search over embedding columns (BASELINE.json extension
surface): brute-force cosine top-k as the baseline; IVF-style
cluster-probed search as the scale path.

Determinism: dot products fold left-to-right over double-cast arrays via
``F.aggregate`` — a strict sequential reduction, so results are
bit-identical across engines (DuckDB's ``list_reduce`` folds the same
way) and across partitionings. Never sum float products with a
shuffle-order-dependent SUM when results feed an equality gate.

Scale notes: brute-force top-k is O(n·d) per query — fine fanned out as
``queries × vectors`` when queries are few (broadcast the query side).
The IVF path prunes to the best nprobe clusters first: with K clusters,
cost drops to ~nprobe/K of brute force; cluster scoring itself is
O(K·d) using the linearity trick (score(q, centroid) == avg over member
dots) so no centroid arrays are ever materialized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window

from osmart_etl_spark.caching import led_register
from pyspark.sql import functions as F


def _topk_per_query(scored: DataFrame, k: int, id_col: str) -> DataFrame:
    """Top-k rows per ``q_id`` (deterministic: cos desc, id asc).

    Two-phase so the final per-query rank never sees the full corpus:
    phase 1 keeps the top-k within each (q_id, input-partition) slice —
    the global per-query top-k is a subset of the union of per-slice
    top-k under ANY partition layout, so correctness is layout-
    independent — phase 2 ranks the ≤ k·n_partitions survivors per
    q_id. Scored rows are narrow (ids + one double; vectors already
    projected away), so the phase-1 shuffle is cheap, and hot queries
    don't serialize onto one reducer the way a single global
    ``Window.partitionBy(q_id)`` over raw scores would.
    """
    order = [F.col("cos_sim").desc(), F.col(id_col).asc()]
    w1 = Window.partitionBy("q_id", "__pid").orderBy(*order)
    pruned = (
        scored.withColumn("__pid", F.spark_partition_id())
        .withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k)
        .drop("__pid", "__rn")
    )
    w2 = Window.partitionBy("q_id").orderBy(*order)
    return (
        pruned.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
        .orderBy(F.col("q_id").asc(), F.col("cos_sim").desc(), F.col(id_col).asc())
    )


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Deterministic dot product: elementwise product, left-fold sum.

    With ``dim`` given, the fold is UNROLLED into a left-associative
    ``+`` chain of ``element_at`` terms — bit-identical to the fold
    (same evaluation order). MEASURED SLOWER at dim=64 (the ~380-node
    chain appears to fall out of whole-stage codegen and gets
    tree-walk-interpreted per row, losing to the HOF's tight loop:
    1.6s → 6.3s on the sf0.1 near-dup pair workload), so callers leave
    ``dim=None`` in the hot paths; the variant is kept for narrow
    vectors (dim ≤ ~16), where the chain stays codegen-sized."""
    if dim is not None:
        out = F.lit(0.0)
        for i in range(1, dim + 1):
            out = out + F.element_at(a, i) * F.element_at(b, i)
        return out
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column, dim: int | None = None) -> Column:
    if dim is not None:
        out = F.lit(0.0)
        for i in range(1, dim + 1):
            out = out + F.element_at(a, i) * F.element_at(a, i)
        return F.sqrt(out)
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (l2_norm(a, dim) * l2_norm(b, dim))


def as_double_array(a: Column) -> Column:
    return a.cast("array<double>")


def brute_force_topk(
    vectors: DataFrame,
    query: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    dim: int | None = None,
) -> DataFrame:
    """Baseline exact top-k by cosine, PER QUERY. ``query`` is a
    DataFrame with columns (q_id, q_vec) — broadcast so the corpus never
    shuffles; each query row gets its own k results (a global
    ``.limit(k)`` would hand all k slots to whichever q_id sorts
    lowest)."""
    v = as_double_array(F.col(vec_col))
    q = as_double_array(F.col("q_vec"))
    scored = vectors.crossJoin(F.broadcast(query)).select(
        F.col("q_id"), F.col(id_col), cosine(v, q, dim).alias("cos_sim")
    )
    return _topk_per_query(scored, k, id_col)


def ivf_probe_topk(
    vectors: DataFrame,
    query: DataFrame,
    id_col: str,
    vec_col: str,
    cluster_col: str,
    k: int = 10,
    nprobe: int = 2,
    dim: int | None = None,
) -> DataFrame:
    """IVF-style search: rank clusters by their best member similarity,
    probe the best ``nprobe``, emit top-k only from inside them.

    Cluster scoring uses MAX (order-independent, hence deterministic
    under any shuffle order) rather than a centroid mean — an avg of
    doubles depends on reduction order and would make cluster selection
    flap between runs/engines. In a production two-stage ANN the cluster
    score comes from a precomputed centroid table instead."""
    v = as_double_array(F.col(vec_col))
    q = as_double_array(F.col("q_vec"))
    scored = vectors.crossJoin(F.broadcast(query)).select(
        F.col("q_id"), F.col(id_col), F.col(cluster_col), cosine(v, q, dim).alias("cos_sim")
    )
    cw = Window.partitionBy("q_id").orderBy(
        F.col("c_score").desc(), F.col(cluster_col).asc()
    )
    # Cluster selection is per q_id (a global limit(nprobe) would probe
    # only the best clusters of one query); the ranked table is tiny
    # (queries × clusters), so the window costs nothing.
    cluster_rank = (
        scored.groupBy("q_id", cluster_col)
        .agg(F.max("cos_sim").alias("c_score"))
        .withColumn("__crn", F.row_number().over(cw))
        .filter(F.col("__crn") <= nprobe)
        .select("q_id", cluster_col)
    )
    probed = scored.join(F.broadcast(cluster_rank), ["q_id", cluster_col])
    return _topk_per_query(probed, k, id_col)


def recompute_centroids(
    assigned: DataFrame, vec_col: str, cluster_col: str = "cluster_id"
) -> DataFrame:
    """Elementwise-mean centroids per cluster, distributed.

    posexplode → groupBy (cluster, position) → avg → re-assemble sorted
    by position. The shuffle carries n·d scalar rows ONCE per Lloyd
    round — the idiomatic distributed array-mean (Spark has no native
    array-avg aggregate); partial aggregation halves it map-side. The
    output is K rows (centroid table) — always broadcastable.

    Float means are reduction-order-dependent, so refined centroids are
    NOT bit-reproducible across partitionings — fine for index BUILD
    (recall is measured, not hashed); the oracle-backed seed assignment
    (queries/similarity.ivf_build_assign) stays the engine-parity
    surface.
    """
    pos = assigned.select(
        cluster_col, F.posexplode(as_double_array(F.col(vec_col))).alias("pos", "x")
    )
    return (
        pos.groupBy(cluster_col, "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy(cluster_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(cluster_col, F.transform("pm", lambda s: s["m"]).alias("c_vec"))
    )


def assign_to_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int | None = None,
) -> DataFrame:
    """Assign every vector to its nearest centroid by cosine (argmax via
    one partial-aggregated struct-max — no rank window, no n×K shuffle).
    ``centroids``: (cluster_id, c_vec); broadcast — a centroid table is
    always tiny."""
    scored = vectors.crossJoin(F.broadcast(centroids)).select(
        id_col,
        "cluster_id",
        cosine(as_double_array(F.col(vec_col)), F.col("c_vec"), dim).alias("cos_sim"),
    )
    best = scored.groupBy(id_col).agg(
        F.max(F.struct(F.col("cos_sim"), (-F.col("cluster_id")).alias("neg_c"))).alias("b")
    )
    return best.select(
        id_col,
        (-F.col("b.neg_c")).cast("bigint").alias("cluster_id"),
        F.col("b.cos_sim").alias("cos_sim"),
    )


def lloyd_refine(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k_clusters: int,
    n_rounds: int = 3,
) -> DataFrame:
    """K-means (Lloyd) refinement of an IVF coarse quantizer.

    Seeds = the first ``k_clusters`` vectors by id (deterministic, no
    RNG); each round reassigns all vectors to the nearest centroid and
    recomputes elementwise-mean centroids. Returns the final assignment
    (id, cluster_id, cos_sim).

    Scale shape per round: one broadcast of K centroids, one map-side
    scoring pass, one partial-aggregated argmax shuffle, one n·d
    centroid-mean shuffle. The assignment is persisted per round and the
    previous round unpersisted — lineage stays O(1) across rounds
    instead of growing a 2^rounds replay chain.
    """
    seeds = (
        vectors.orderBy(F.col(id_col).asc())
        .limit(k_clusters)
        .select(
            F.row_number().over(Window.orderBy(F.col(id_col).asc())).alias("cluster_id"),
            as_double_array(F.col(vec_col)).alias("c_vec"),
        )
    )
    centroids = seeds
    assigned = None
    for _ in range(max(1, n_rounds)):
        prev = assigned
        assigned = assign_to_centroids(vectors, centroids, id_col, vec_col).join(
            vectors.select(id_col, vec_col), id_col
        )
        assigned = assigned.persist()
        assigned.count()  # materialize via the DAG path (AQE stays on)
        if prev is not None:
            prev.unpersist()
        centroids = recompute_centroids(assigned, vec_col)
    # final round's cache feeds the caller's action — ledger-registered
    # for release at the next query build (round 14)
    led_register(assigned)
    return assigned.select(id_col, "cluster_id", "cos_sim")


def ivf_probe_topk_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    query: DataFrame,
    id_col: str,
    vec_col: str,
    cluster_col: str = "cluster_id",
    k: int = 10,
    nprobe: int = 2,
    dim: int | None = None,
) -> DataFrame:
    """True-IVF probe: cluster selection costs Q×K centroid dots, and
    ONLY the members of the selected clusters are ever scored.

    ``ivf_probe_topk`` above ranks clusters by best member similarity —
    robust, but it scores the full corpus to find that max, so it prunes
    rank work, not scan work. With a centroid table (seed vectors or
    ``lloyd_refine`` output: (cluster_id, c_vec)) the selection phase
    touches no corpus rows at all; the scan reads ~nprobe/K of the
    corpus. That is the shape that survives 100 TB: centroid table
    broadcast twice (once against queries — trivially small — once as
    the per-query probe list joined into the corpus scan).

    On ISOTROPIC (unstructured) vectors coarse cells barely concentrate
    neighbors, so recall demands a high nprobe/K — see
    tests/test_similarity_recall.py, which pins that worst-case curve;
    clustered real-world embeddings reach the same recall at far lower
    probe fractions.
    """
    q = as_double_array(F.col("q_vec"))
    c_scored = query.crossJoin(F.broadcast(centroids)).select(
        "q_id", cluster_col, cosine(q, F.col("c_vec"), dim).alias("c_score")
    )
    cw = Window.partitionBy("q_id").orderBy(
        F.col("c_score").desc(), F.col(cluster_col).asc()
    )
    probe_list = (
        c_scored.withColumn("__crn", F.row_number().over(cw))
        .filter(F.col("__crn") <= nprobe)
        .select("q_id", cluster_col)
    )
    v = as_double_array(F.col(vec_col))
    # (q_id, cluster) pairs join corpus on cluster FIRST — rows outside
    # probed clusters never reach the scoring expression.
    probed = vectors.join(F.broadcast(probe_list), cluster_col).join(
        F.broadcast(query), "q_id"
    )
    scored = probed.select(
        "q_id", id_col, cosine(v, as_double_array(F.col("q_vec")), dim).alias("cos_sim")
    )
    return _topk_per_query(scored, k, id_col)


def srp_planes(n_planes: int = 32, dim: int = 64) -> list[list[float]]:
    """Deterministic signed-random-projection hyperplanes: md5-derived
    uniforms in [-1, 1), generated at plan-build time so the SAME
    constants embed into the Spark plan and the oracle SQL — no RNG, no
    engine-specific randomness. (Charikar STOC'02: P[sign match] =
    1 - angle/π, so sign-bit agreement is an unbiased cosine proxy.)"""
    import hashlib

    return [
        [
            int(hashlib.md5(f"srp:{p}:{i}".encode()).hexdigest()[:7], 16)
            / float(1 << 28)
            * 2.0
            - 1.0
            for i in range(dim)
        ]
        for p in range(n_planes)
    ]


def srp_band_signatures(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    planes: list[list[float]],
    rows_per_band: int = 8,
) -> DataFrame:
    """(id, band, band_sig) — banded SRP-LSH keys, one zero-shuffle
    projection. Each band's signature packs ``rows_per_band`` sign bits
    of deterministic hyperplane dot products; two vectors become
    candidates if ANY band signature collides (same OR-amplification as
    MinHash banding). All bands come from ONE explode over a computed
    struct array, so the vector column is read once per row."""
    n_bands = len(planes) // rows_per_band

    # The whole banded-signature expression is rendered as ONE SQL
    # string and parsed in a single expr() call: composing it from
    # per-plane Column objects (32 HOF dot-folds built via py4j) cost
    # ~2 s of driver-side chatter per query BUILD, before any action
    # (measured at sf0.1). Identical expression semantics — the dot is
    # the same zip_with + left-fold the Column form produced.
    def dot_sql(plane: list[float]) -> str:
        arr = "array(" + ",".join(f"{v!r}D" for v in plane) + ")"
        return (
            f"aggregate(zip_with({vec_col}, {arr}, (x, p) -> x * p), "
            f"CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
        )

    band_terms = []
    for b in range(n_bands):
        bits = " + ".join(
            f"(CASE WHEN {dot_sql(planes[b * rows_per_band + r])} >= 0 "
            f"THEN {1 << r} ELSE 0 END)"
            for r in range(rows_per_band)
        )
        band_terms.append(f"struct({b} AS band, ({bits}) AS band_sig)")
    bands_expr = F.expr("array(" + ", ".join(band_terms) + ")")
    return vectors.select(
        F.col(id_col), F.explode(bands_expr).alias("__b")
    ).select(id_col, F.col("__b.band").alias("band"), F.col("__b.band_sig").alias("band_sig"))


def topk_merge(
    prev_topk: DataFrame | None,
    new_scores: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Incremental top-k maintenance (the interactive-session pattern:
    keep per-query top-k current as new corpus vectors arrive, never
    rescoring the old corpus). State = the previous (q_id, id, cos_sim)
    top-k table — k rows per query, O(queries·k) total; merging a new
    batch is union → per-query rank → keep k. Correct because cosine
    scores are immutable per (q, id): the true top-k over (old ∪ new)
    is always contained in (top-k(old) ∪ new)."""
    merged = new_scores if prev_topk is None else prev_topk.unionByName(new_scores)
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def knn_incremental_update(
    state: DataFrame | None,
    new_vectors: DataFrame,
    query: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
) -> DataFrame:
    """One incremental KNN tick: score ONLY the newly-arrived vectors
    against the (broadcast) query batch and fold them into the running
    top-k state. Cost per tick is O(|new| · |queries|), independent of
    corpus size — the property a 100 TB interactive index needs."""
    v = as_double_array(F.col(vec_col))
    q = as_double_array(F.col("q_vec"))
    scored = new_vectors.crossJoin(F.broadcast(query)).select(
        F.col("q_id"), F.col(id_col), cosine(v, q).alias("cos_sim")
    )
    return topk_merge(state, scored, k=k, id_col=id_col)
