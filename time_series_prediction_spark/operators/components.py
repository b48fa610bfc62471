"""Connected components via iterative min-label propagation.

The last stage of a near-dup pipeline: candidate PAIRS (from
MinHash-LSH / SimHash / Jaccard) must become CLUSTERS so one canonical
document survives per group. Pairs form a graph; clusters are its
connected components.

Algorithm (the standard large-graph approach — no driver-side graph):
every vertex starts labeled with itself; each round, every vertex
takes the min label among itself and its neighbors; repeat until no
label changes. Each round is one join + one aggregation (both
hash-partitioned on vertex), so a round costs O(E) shuffle;
convergence needs at most diameter rounds — near-dup graphs are
star-like, so typically 2–3.

Spark-specific care: the loop grows the lineage, so labels are
localCheckpoint()ed each round (truncates the plan; at cluster scale
use reliable checkpointing to the DFS instead); convergence is
detected with a count of changed labels (one small action per round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """Return (vertex, component) where component = min vertex id
    reachable. Edges are undirected (both directions added here)."""
    # Materialize the directed edges FIRST: the union below references
    # the subtree twice (forward + swapped), and the upstream pair
    # generation (shingling + similarity join) is the expensive part —
    # without this the whole candidate pipeline runs twice.
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint()
    und = (
        fwd.unionAll(fwd.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint()  # reused every round: materialize once
    )

    # Seed with round 0 fused into initialization: label = min(self,
    # direct neighbors) in ONE aggregation — saves a full join round.
    labels = (
        und.groupBy("a")
        .agg(F.min("b").alias("_nmin"))
        .select(
            F.col("a").alias("vertex"),
            F.least(F.col("a"), F.col("_nmin")).alias("component"),
        )
        .localCheckpoint()
    )

    for _ in range(max_iterations):
        neighbor_min = (
            und.join(labels, und.b == labels.vertex)
            .groupBy(und.a)
            .agg(F.min("component").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, labels.vertex == neighbor_min.a, "left")
            .select(
                "vertex",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
                (
                    F.col("nmin").isNotNull()
                    & (F.col("nmin") < F.col("component"))
                ).alias("_changed"),
            )
        )
        updated = updated.localCheckpoint()
        changed = updated.where(F.col("_changed")).count()
        labels = updated.drop("_changed")
        if changed == 0:
            break
    return labels


def dedup_canonical_assignment(
    pairs: DataFrame,
    id_a: str = "doc_id_a",
    id_b: str = "doc_id_b",
) -> DataFrame:
    """From near-dup pairs to (doc_id, canonical_id): every clustered
    doc maps to its component's min id (the survivor)."""
    comp = connected_components(pairs, src=id_a, dst=id_b)
    return comp.select(
        F.col("vertex").alias("doc_id"), F.col("component").alias("canonical_id")
    )
