"""Integer PageRank over the basket-adjacency graph: oracle parity,
float-PageRank agreement, and shuffle-order independence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.oracle_harness import assert_matches_oracle, duck_connection
from time_series_prediction_spark.plans.graph_queries import (
    PART_PAGERANK_SQL,
    part_basket_pagerank,
)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


def test_pagerank_matches_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        part_basket_pagerank(spark, sf_dir),
        duck,
        PART_PAGERANK_SQL,
        name="part_basket_pagerank",
    )


def test_pagerank_agrees_with_float_reference(spark, sf_dir):
    """The integer-division rank must track a plain float PageRank on
    the same graph: every returned top-20 part sits in the float
    top-40 (integer truncation can only reorder near-ties), and rank
    values stay in (0, 1e9]."""
    import duckdb

    got = part_basket_pagerank(spark, sf_dir).collect()
    assert len(got) == 20
    for r in got:
        assert 0 < r["rank_nano"] <= 1_000_000_000

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    edges = con.execute(
        """
        WITH adj AS (
          SELECT l_partkey AS src,
                 lead(l_partkey) OVER (
                     PARTITION BY l_orderkey
                     ORDER BY l_linenumber, l_partkey) AS dst
          FROM lineitem)
        SELECT src, dst, count(*) AS w FROM (
          SELECT src, dst FROM adj WHERE dst IS NOT NULL AND dst <> src
          UNION ALL
          SELECT dst, src FROM adj WHERE dst IS NOT NULL AND dst <> src)
        GROUP BY src, dst
        """
    ).fetchall()
    wdeg: dict[int, float] = {}
    for s, _, w in edges:
        wdeg[s] = wdeg.get(s, 0.0) + w
    nodes = sorted(wdeg)
    n = len(nodes)
    rank = {u: 1.0 / n for u in nodes}
    for _ in range(3):
        s: dict[int, float] = {u: 0.0 for u in nodes}
        for a, b, w in edges:
            s[b] += rank[a] * w / wdeg[a]
        rank = {u: 0.15 / n + 0.85 * s[u] for u in nodes}
    float_top = [
        u for u, _ in sorted(rank.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:40]
    for r in got:
        assert r["p_partkey"] in float_top, r


def test_pagerank_partitioning_independent(spark, sf_dir):
    """All arithmetic is integer (order-free), so any input
    partitioning must produce the identical answer."""
    a = [tuple(r) for r in part_basket_pagerank(spark, sf_dir).collect()]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = [
            tuple(r) for r in part_basket_pagerank(spark, sf_dir).collect()
        ]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b


def test_new_analytics_plans_stay_jvm_side(spark, sf_dir):
    """Journey/stats/graph queries: no Python eval stages, no
    cartesian products, no nested-loop joins anywhere."""
    from time_series_prediction_spark.plans.journey_queries import (
        JOURNEY_QUERIES,
    )
    from time_series_prediction_spark.plans.stats_queries import (
        STATS_QUERIES,
    )
    from time_series_prediction_spark.plans.graph_queries import (
        GRAPH_QUERIES,
    )

    for name, (fn, _) in {
        **JOURNEY_QUERIES, **STATS_QUERIES, **GRAPH_QUERIES
    }.items():
        plan = fn(spark, sf_dir)._jdf.queryExecution() \
            .executedPlan().toString()
        for marker in (
            "BatchEvalPython",
            "ArrowEvalPython",
            "CartesianProduct",
            "BroadcastNestedLoopJoin",
        ):
            assert marker not in plan, (name, marker)
