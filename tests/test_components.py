"""Connected-components hardening: long chains (pointer jumping),
union-find parity on random graphs, and loud non-convergence.
"""

from __future__ import annotations

import random

import pytest

from time_series_prediction_spark.operators.components import (
    DRIVER_EDGE_CAP_CONF,
    connected_components,
)


def _spark_components(spark, edge_list, driver_cap="0", **kw):
    """Default driver_cap='0' pins the DISTRIBUTED loop — these tests
    exist to prove pointer jumping; the bounded driver fast path has
    its own equivalence test below."""
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    spark.conf.set(DRIVER_EDGE_CAP_CONF, driver_cap)
    try:
        rows = connected_components(edges, **kw).collect()
    finally:
        spark.conf.unset(DRIVER_EDGE_CAP_CONF)
    return {r["vertex"]: r["component"] for r in rows}


def _union_find(edge_list):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical: min vertex per component
    comp: dict[int, int] = {}
    for v in parent:
        comp[v] = find(v)
    return comp


def test_long_chain_converges_in_log_rounds(spark):
    """A 1000-node path graph has diameter 999; plain min-label
    propagation would need ~999 rounds. Pointer jumping must converge
    within max_iterations=15 (~log2 diameter + margin)."""
    edge_list = [(i, i + 1) for i in range(999)]
    got = _spark_components(spark, edge_list, max_iterations=15)
    assert len(got) == 1000
    assert set(got.values()) == {0}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    # 300 vertices, sparse edges -> many non-trivial components
    edge_list = [
        (rng.randrange(300), rng.randrange(300)) for _ in range(160)
    ]
    edge_list = [(a, b) for a, b in edge_list if a != b]
    got = _spark_components(spark, edge_list, max_iterations=15)
    want = _union_find(edge_list)
    assert got == want


def test_driver_fast_path_matches_loop(spark):
    """The bounded driver union-find (edge count <= cap) must produce
    exactly the labels the distributed loop converges to."""
    rng = random.Random(11)
    edge_list = [
        (rng.randrange(400), rng.randrange(400)) for _ in range(220)
    ]
    edge_list = [(a, b) for a, b in edge_list if a != b]
    loop = _spark_components(spark, edge_list, max_iterations=15)
    fast = _spark_components(
        spark, edge_list, driver_cap="100000", max_iterations=15
    )
    assert fast == loop == _union_find(edge_list)


def test_driver_fast_path_empty_edges(spark):
    got = _spark_components(spark, [], driver_cap="100000")
    assert got == {}


def test_nonconvergence_raises(spark):
    """Partial labels must never be returned silently: a chain too deep
    for the iteration budget raises instead of mislabeling clusters."""
    edge_list = [(i, i + 1) for i in range(200)]
    with pytest.raises(RuntimeError, match="did not converge"):
        _spark_components(spark, edge_list, max_iterations=2)


def test_invalid_iteration_budget_raises(spark):
    """max_iterations < 1 is a caller error — clean ValueError up front,
    not a NameError from the never-entered loop."""
    with pytest.raises(ValueError, match="max_iterations"):
        _spark_components(spark, [(1, 2)], max_iterations=0)


def test_dedup_clusters_reliable_checkpoints_end_to_end(spark, sf_dir, tmp_path):
    """The cluster-mode path proven on the real query, not just the
    materialize() unit test: run the full dedup_clusters pipeline
    (shingling -> candidate pairs -> iterative CC) with
    materialize(mode='reliable'), assert the clusters are identical to
    the default local-checkpoint run AND that reliable checkpoints
    actually landed in the configured directory."""
    import os

    import time_series_prediction_spark.plans.text_queries as tq
    from time_series_prediction_spark.operators.materialize import (
        CHECKPOINT_DIR_CONF,
        MODE_CONF,
    )

    tq._ASSIGN_CACHE.clear()  # force a real run for each mode
    baseline = sorted(
        map(tuple, tq.dedup_clusters(spark, sf_dir).collect())
    )
    ckdir = str(tmp_path / "reliable-ck")
    spark.conf.set(MODE_CONF, "reliable")
    spark.conf.set(CHECKPOINT_DIR_CONF, ckdir)
    tq._ASSIGN_CACHE.clear()
    try:
        got = sorted(map(tuple, tq.dedup_clusters(spark, sf_dir).collect()))
    finally:
        spark.conf.unset(MODE_CONF)
        spark.conf.unset(CHECKPOINT_DIR_CONF)
        tq._ASSIGN_CACHE.clear()  # don't leak reliable-mode frames
    assert got == baseline
    landed = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(ckdir)
        for f in fs
        if not f.startswith(".")
    ]
    assert landed, "no reliable checkpoint files written"
