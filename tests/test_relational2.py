"""Batch-2 relational queries vs DuckDB oracles."""

from __future__ import annotations

import pytest

from tests.oracle_harness import assert_matches_oracle, duck_connection
from time_series_prediction_spark.plans.relational2 import RELATIONAL2_QUERIES


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(RELATIONAL2_QUERIES))
def test_relational2_query_matches_oracle(spark, sf_dir, duck, name):
    fn, sql = RELATIONAL2_QUERIES[name]
    if sql is None:  # approx/rows-only: runs with stable schema
        df = fn(spark, sf_dir)
        assert df.count() > 0
        return
    assert_matches_oracle(fn(spark, sf_dir), duck, sql, name=name)


def test_approx_dau_within_rsd_of_exact(spark, sf_dir):
    from pyspark.sql import functions as F

    from time_series_prediction_spark.plans.relational import daily_active_users
    from time_series_prediction_spark.plans.sketch_queries import (
        approx_distinct_users_daily,
    )

    exact = daily_active_users(spark, sf_dir).select("day", "dau")
    approx = approx_distinct_users_daily(spark, sf_dir).select(
        "day", "approx_dau"
    )
    joined = exact.join(approx, "day")
    bad = joined.where(
        F.abs(F.col("approx_dau") - F.col("dau")) > F.col("dau") * 0.1 + 2
    ).count()
    assert bad == 0


def test_dau_sketch_rollup_merge_lossless_and_bounded(spark, sf_dir):
    """The HLL mergeability contract: the union merges the partials'
    REGISTERS losslessly, but its estimate may legitimately differ
    from a directly-built sketch's — a direct sketch uses the HIP
    estimator, which a union result cannot (the sparse regime, where
    both are exact, coincides only at small scale; at sf0.1 daily
    cardinality ~1300 leaves sparse mode and the estimators diverge
    by up to ~1×RSE ≈ 1.6% at lgK=12). The contract tested: union and
    direct agree within 2×RSE, and both sit within the sketch's error
    bound of the exact DAU — at EVERY fixture scale."""
    from pyspark.sql import functions as F

    from time_series_prediction_spark.plans.relational import daily_active_users
    from time_series_prediction_spark.plans.relational2 import (
        events_dau_sketch_rollup,
    )
    from time_series_prediction_spark.sources.io import read_table

    merged = events_dau_sketch_rollup(spark, sf_dir)
    direct = (
        read_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).alias("direct_est")
        )
    )
    j = merged.join(direct, "day")
    # 2×RSE at lgK=12 (1.04/sqrt(2^12) ≈ 1.6%) + slack for tiny days
    bad_vs_direct = j.where(
        F.abs(F.col("dau_est") - F.col("direct_est"))
        > F.col("direct_est") * 0.033 + 2
    ).count()
    assert bad_vs_direct == 0, (
        "sharded union estimate diverges from the direct sketch beyond "
        "the HIP-vs-composite estimator gap"
    )
    exact = daily_active_users(spark, sf_dir).select("day", "dau")
    bad = (
        merged.join(exact, "day")
        .where(F.abs(F.col("dau_est") - F.col("dau")) > F.col("dau") * 0.1 + 2)
        .count()
    )
    assert bad == 0
    assert merged.agg(F.max("n_partials")).first()[0] <= 8
