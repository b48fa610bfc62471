"""Connected components via iterative min-label propagation.

The last stage of a near-dup pipeline: candidate PAIRS (from
MinHash-LSH / SimHash / Jaccard) must become CLUSTERS so one canonical
document survives per group. Pairs form a graph; clusters are its
connected components.

Algorithm (the standard large-graph approach — no driver-side graph):
every vertex starts labeled with itself; each round, every vertex
takes the min label among itself and its neighbors (one-hop
propagation), then every vertex shortcuts to its label's label
(pointer jumping / path halving — labels are themselves vertex ids,
so ``label := label[label]`` is one equi self-join). Propagation
alone needs diameter rounds — fine for star-like dup graphs, fatal
for chains; the pointer jump compresses label chains geometrically,
giving O(log diameter) rounds total (the same idea as two-phase
large-star/small-star). Each round is two joins + one aggregation,
all hash-partitioned on vertex, so a round costs O(E) shuffle.

Spark-specific care: the loop grows the lineage, so labels are
materialize()d each round (localCheckpoint by default — truncates
the plan; spark.tsp.materialize.mode=reliable switches to a
DFS-backed checkpoint for real clusters); convergence is
detected with a count of changed labels (one small action per round).
Exhausting max_iterations with labels still changing RAISES — a
partially-converged labeling would silently merge or split dedup
clusters downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from time_series_prediction_spark.operators.materialize import materialize

# Bounded driver fast path (guide §1.2: the per-round fixed job cost
# dominates on small graphs — a dup-pair graph of ≤ this many edges is
# metadata-sized, the same discipline as the CoW manifest's 100 K-key
# cap with distributed fallback). 0 disables the fast path.
DRIVER_EDGE_CAP_CONF = "spark.tsp.cc.driverEdgeCap"
_DRIVER_EDGE_CAP_DEFAULT = 100_000


def _driver_components(rows: list) -> list[tuple[int, int]]:
    """Union-find over collected (a, b) edges; component = min vertex
    of the set — identical to the converged min-label propagation."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for r in rows:
        a, b = r[0], r[1]
        for v in (a, b):
            if v not in parent:
                parent[v] = v
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    cmin: dict[int, int] = {}
    for v in parent:
        r = find(v)
        if r not in cmin or v < cmin[r]:
            cmin[r] = v
    return [(v, cmin[find(v)]) for v in sorted(parent)]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """Return (vertex, component) where component = min vertex id
    reachable. Edges are undirected (both directions added here)."""
    if max_iterations < 1:
        raise ValueError(f"max_iterations must be >= 1, got {max_iterations}")
    # Materialize the directed edges FIRST: the union below references
    # the subtree twice (forward + swapped), and the upstream pair
    # generation (shingling + similarity join) is the expensive part —
    # without this the whole candidate pipeline runs twice.
    # fwd stays EAGER: the union below references it twice inside one
    # job — a lazy checkpoint would race both branches into computing
    # the expensive upstream pair pipeline concurrently.
    fwd = materialize(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    )
    spark = edges.sparkSession
    cap = int(
        spark.conf.get(DRIVER_EDGE_CAP_CONF, str(_DRIVER_EDGE_CAP_DEFAULT))
    )
    if cap > 0 and fwd.count() <= cap:
        # metadata-sized graph: one collect of the (already pinned)
        # edge list + driver union-find replaces ~log(diameter) rounds
        # of join+checkpoint+count jobs; result provably identical
        # (component = min reachable vertex either way)
        assign = _driver_components(fwd.collect())
        if assign and len(assign) <= 20_000:
            # VALUES literal -> LocalTableScan: downstream actions
            # (broadcast builds, collects) run zero extra jobs, unlike
            # an RDD-backed createDataFrame
            rows = ", ".join(f"({v}L, {c}L)" for v, c in assign)
            return spark.sql(
                f"SELECT * FROM (VALUES {rows}) AS t(vertex, component)"
            )
        return spark.createDataFrame(
            assign, "vertex long, component long"
        )
    und = (
        fwd.unionAll(fwd.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
    )
    und = materialize(und, eager=False)  # reused every round; the seed
    # aggregation below is the materializing action

    # Seed with round 0 fused into initialization: label = min(self,
    # direct neighbors) in ONE aggregation — saves a full join round.
    labels = (
        und.groupBy("a")
        .agg(F.min("b").alias("_nmin"))
        .select(
            F.col("a").alias("vertex"),
            F.least(F.col("a"), F.col("_nmin")).alias("component"),
        )
    )
    labels = materialize(labels, eager=False)  # round 1 materializes it

    for _ in range(max_iterations):
        # Both steps read only the CHECKPOINTED labels, so the round
        # needs exactly one new checkpoint (of its output): a one-hop
        # neighbor-min propagation plus a pointer jump through the
        # previous round's pointers (component := labels[component] —
        # every label is a vertex id, so a unique-key equi self-join).
        # The stale-by-one jump still compresses label chains
        # geometrically (convergence on a 1000-node path within 15
        # rounds is pinned in tests/test_components.py).
        neighbor_min = (
            und.join(labels, und.b == labels.vertex)
            .groupBy(und.a)
            .agg(F.min("component").alias("_nmin"))
        )
        jump = labels.select(
            F.col("vertex").alias("_jv"), F.col("component").alias("_jc")
        )
        step = labels.join(
            neighbor_min, labels.vertex == neighbor_min.a, "left"
        ).select(
            "vertex",
            F.col("component").alias("_old"),
            F.least(
                F.col("component"), F.coalesce(F.col("_nmin"), F.col("component"))
            ).alias("_c1"),
        )
        updated = (
            step.join(jump, step["_c1"] == jump["_jv"], "left")
            .select(
                "vertex",
                "_old",
                F.least(
                    F.col("_c1"), F.coalesce(F.col("_jc"), F.col("_c1"))
                ).alias("component"),
            )
        )
        updated = materialize(updated, eager=False)
        # the convergence count IS the materializing action (one job,
        # not checkpoint-job + count-job)
        changed = updated.where(F.col("component") < F.col("_old")).count()
        labels = updated.drop("_old")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} "
        f"iterations ({changed} labels still changing) — with pointer "
        f"jumping convergence needs ~log2(diameter) rounds; raise "
        f"max_iterations"
    )


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
