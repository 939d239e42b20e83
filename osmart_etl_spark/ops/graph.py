"""Iterative graph operators: connected components for dedup
canonicalization (BASELINE.json extension surface).

The near-dedup pipeline's last stage: verified similar-pairs form an
undirected graph; each connected component is one duplicate cluster and
every member maps to a canonical representative (the component's min
id). The reference has no graph stage (its dedup is key-equality
upserts, e.g. dq_exclusions_csv.py:46-49); this is the piece a
training-data pipeline adds on top.

Scale design
------------
- Min-label propagation: labels(node) starts at node, each round takes
  the min over the node's own label and its neighbors' labels. Converges
  in O(component diameter) rounds — near-dup clusters are shallow (dups
  of a common source), so 3-6 rounds in practice. Each round is one
  shuffle join (edges ⋈ labels) + one groupBy min; both hash-partition
  on the node id, so AQE reuses the partitioning.
- ``localCheckpoint`` after every round truncates the lineage — without
  it the plan doubles per iteration and Catalyst analysis time blows up
  long before data does (the classic iterative-algorithm failure mode).
- Convergence is a driver-side ``count`` of changed labels per round —
  the legitimate use of driver control flow: a data-dependent loop bound
  that Catalyst cannot express. The per-round data stays distributed.
- For planet-scale or adversarially-shaped graphs (a giant duplicate
  cluster, a long chain), ``connected_components_bigstar`` implements
  the two-phase large-star/small-star algorithm (Kiveris et al.,
  "Connected Components in MapReduce and Beyond", SOCC'14) — same
  join/groupBy primitives, provably O(log² n) rounds independent of
  component diameter, and every round's aggregate is map-side
  combinable so a 100×-sized hot component costs ~the same wall clock
  as uniform clusters (pinned by tests/test_graph.py skew test).
  Min-label propagation converges in O(diameter) rounds — the right
  default for near-dup clusters (dups of a common source, diameter
  2-3) because each round is cheaper; bigstar is the guard rail when
  cluster shape is unknown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from osmart_etl_spark.caching import led_register
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components of the undirected graph given by ``edges``.

    Returns (node, component) where component = min node id reachable
    from ``node``; only nodes that appear in at least one edge are
    emitted (isolated docs are their own trivial component — callers
    left-join and coalesce if they want the identity rows).
    """
    # Both directions from ONE pass over the input — a two-branch UNION
    # would evaluate the (possibly expensive, un-cached) upstream edge
    # pipeline once per branch; measured 2× the whole LSH+verify DAG.
    und = edges.select(
        F.explode(
            F.array(
                F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
            )
        ).alias("__e")
    ).select("__e.u", "__e.v")
    # Eager materialization of the EDGE SET is load-bearing: every
    # round references it, and without the cut the upstream pipeline
    # that produced the edges would re-execute once per round. persist +
    # count rather than localCheckpoint: checkpointing materializes via
    # the RDD path, which compiles the plan WITHOUT adaptive execution —
    # measured ~3× slower here for a shuffle-heavy upstream DAG.
    und = und.persist()
    und.count()
    # Round 0 folded into initialization: label = min(self, neighbors).
    # Saves one full round for the dominant case (pair/star clusters).
    labels = (
        und.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .union(und.select(F.col("u").alias("node"), F.col("u").alias("component")))
        .groupBy("node")
        .agg(F.min("component").alias("component"))
        .persist()
    )
    for i in range(max_iter):
        nbr = und.join(
            labels.select(F.col("node").alias("v"), "component"), "v"
        ).select(F.col("u").alias("node"), "component")
        new_labels = (
            labels.union(nbr).groupBy("node").agg(F.min("component").alias("component"))
        )
        # Persist bounds recompute; a lineage cut every 4th round keeps
        # plan depth (and Catalyst analysis time) from compounding —
        # per-round eager checkpoints were measured pure overhead at
        # small diameters.
        if (i + 1) % 4 == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.persist()
        changed = (
            new_labels.join(
                labels.withColumnRenamed("component", "old"), "node"
            )
            .filter(F.col("component") != F.col("old"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        # Exhausting max_iter without convergence leaves some nodes at
        # intermediate minima — a wrong ANSWER, not a degraded one (two
        # nodes of one component with different ids). Fail loudly, the
        # same contract as connected_components_bigstar (round-12
        # review; the bigstar twin is the right tool past ~25-round
        # diameters anyway).
        raise RuntimeError(
            f"connected_components: no fixed point after {max_iter} "
            "rounds (component diameter exceeds max_iter); raise "
            "max_iter or use connected_components_bigstar (O(log^2 n))"
        )
    # the changed-count actions materialized `labels`; the edge cache is
    # no longer needed — unpinning it here instead of leaking one copy
    # per call for the life of the session (round-12 review)
    und.unpersist()
    # the RETURNED frame's cache outlives this function by design (the
    # caller's action reads it) — ledger-registered so the next query
    # build releases it (round 14 cache-release discipline)
    return led_register(labels)


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round (Kiveris SOCC'14): every node u connects each
    strictly-LARGER neighbor v to m(u) = min(N(u) ∪ {u}). Input/output
    edges are canonical (u > v). The groupBy-min is map-side combinable,
    so a hot node's million edges collapse to one row per partition
    before the shuffle — this is where the skew-resistance comes from."""
    und = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("u"), F.col("v")),
                F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
            )
        ).alias("__e")
    ).select("__e.u", "__e.v")
    mins = (
        und.groupBy("u")
        .agg(F.min("v").alias("__mn"))
        .select("u", F.least(F.col("__mn"), F.col("u")).alias("m"))
    )
    return (
        und.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: for each node u over its smaller neighbors
    N(u) = {v < u}, connect every member of N(u) ∪ {u} to m = min(N(u)).
    Canonical (u > v) in, canonical out."""
    mins = edges.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = edges.join(mins, "u").select(F.col("v").alias("n"), "m")
    selfr = mins.select(F.col("u").alias("n"), "m")
    return (
        nbrs.union(selfr)
        .filter(F.col("n") != F.col("m"))
        .select(F.col("n").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def connected_components_bigstar(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components via large-star/small-star alternation —
    O(log² n) rounds regardless of component DIAMETER or SIZE, the
    planet-scale/skew-hardened twin of :func:`connected_components`
    (same output contract: (node, component=min reachable id), nodes
    appearing in ≥1 edge).

    Use when cluster shape is unknown: min-label propagation needs
    O(diameter) rounds (a 10⁴-long chain = 10⁴ shuffles) and its
    edge⋈labels join concentrates a giant component's traffic on hot
    keys; here every round's reduction is a map-side-combinable MIN and
    the edge set itself shrinks toward the final star per round.
    """
    canon = edges.select(
        F.greatest(F.col(src), F.col(dst)).alias("u"),
        F.least(F.col(src), F.col(dst)).alias("v"),
    ).persist()
    # nodes whose ONLY edges are self-loops would vanish at the u != v
    # filter, while the min-label twin emits them as trivial components
    # (its init includes the self rows) — capture them up front so both
    # implementations keep the same output contract (round-12 review).
    # Materialized eagerly (tiny) because `canon` unpersists right after.
    selfies = (
        canon.filter(F.col("u") == F.col("v"))
        .select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    cur = canon.filter(F.col("u") != F.col("v")).distinct().persist()
    cur.count()
    canon.unpersist()
    prev_sig = None
    for i in range(max_iter):
        # ONE alternation pair per materialization. Fusing two pairs
        # (LSLS) per job was tried and REVERTED: Spark does not dedupe
        # identical subplans inside a job, so the un-checkpointed inner
        # round recomputed once per reference (~4×) — measured 8.3 s →
        # 16.7 s at sf0.1. Exchange reuse only kicks in at runtime for
        # byte-identical exchanges; the groupBy/join mix here does not
        # qualify. Job-count reduction must come from reuse-safe
        # structures, not deeper lineage.
        # Cache the large-star intermediate within the round: small-star
        # references it three times (mins build, mins join, self rows),
        # and each reference would otherwise recompute the full
        # explode+agg+join+distinct pipeline.
        mid = _large_star(cur).persist()
        nxt = _small_star(mid)
        # HARD lineage cut every round: one bigstar round references its
        # input ~4 times (und twice, mins twice), so an un-truncated
        # plan grows 4^rounds — persist alone caches data but keeps the
        # logical tree, and by round ~15 merely PRINTING the plan OOMs
        # the driver. localCheckpoint resets the tree to a leaf; losing
        # AQE for these constant-shape per-round jobs is the cheap side
        # of that trade (unlike the propagation loop above, whose single
        # shuffle-heavy upstream made checkpoint 3× slower). LAZY
        # checkpoint: materialization happens inside the signature job
        # below — one job per round, not a checkpoint job + a sig job
        # (measured ~2× on the per-round latency floor).
        nxt = nxt.localCheckpoint(eager=False)
        sig_row = nxt.agg(
            F.count(F.lit(1)).alias("n"),
            # per-row terms bounded < 2^30 so the sum stays far from
            # bigint overflow (ANSI mode errors on wrap) up to ~10^9 edges
            F.coalesce(
                F.sum(F.pmod(F.xxhash64("u", "v"), F.lit(1_073_741_789))), F.lit(0)
            ).alias("h"),
        ).collect()[0]
        sig = (sig_row["n"], sig_row["h"])
        mid.unpersist()
        # Free the PREVIOUS round's blocks now that this round's
        # checkpoint is materialized — without this every round's edge
        # set stays pinned in executor storage for the whole run.
        cur.unpersist()
        cur = nxt
        # Fixed point: the edge set is stable == every edge already
        # points at its component min. (A (count, bounded-hash-sum)
        # collision between two DIFFERENT consecutive edge sets would end
        # the loop one round early — ~2^-60 per round and detectable in
        # any downstream differential check; accepted.)
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        # Exhausting max_iter without a fixed point means labels may be
        # inconsistent (some nodes at intermediate minima) — that is a
        # wrong ANSWER, not a degraded one; fail loudly.
        raise RuntimeError(
            f"connected_components_bigstar: no fixed point after {max_iter} "
            "alternation rounds; raise max_iter (rounds needed grow "
            "O(log^2 n) with graph size)"
        )
    led_register(cur)  # released at the next query build (round 14)
    comps = cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = cur.select(F.col("v").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return (
        comps.union(roots)
        .union(selfies)
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )
