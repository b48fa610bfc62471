"""Bucketed-table layout: the join must be exchange-free and
sort-free, one file per bucket, and change nothing but the plan."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from time_series_prediction_spark.operators.bucketing import (
    bucketed_join,
    ensure_bucketed,
)
from time_series_prediction_spark.plans.bucketed_queries import (
    bucketed_orders_revenue,
)
from time_series_prediction_spark.sources.io import read_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_no_exchange_no_sort(spark, sf_dir):
    """The whole point of the layout: join over pre-clustered,
    pre-sorted buckets — the only exchange left is the final agg's."""
    df = bucketed_orders_revenue(spark, sf_dir)
    plan = _plan(df)
    assert "SortMergeJoin" in plan
    assert plan.count("Exchange") == 1  # groupBy only
    # sortBy at write time: SMJ needs no Sort on either side
    assert plan.count("Sort ") == 0
    assert "Bucketed: true" in plan


def test_bucketed_one_file_per_bucket(spark, sf_dir):
    name = ensure_bucketed(
        spark, sf_dir, "orders", "o_orderkey", 8,
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    loc = spark.table(name).inputFiles()
    assert len(loc) == 8
    # one parquet file per bucket id (no tasks×buckets explosion)
    base = os.path.dirname(loc[0].removeprefix("file:"))
    files = glob.glob(os.path.join(base, "part-*"))
    assert len(files) == 8


def test_bucketed_join_matches_plain_join(spark, sf_dir):
    bucketed = bucketed_orders_revenue(spark, sf_dir)
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    plain = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .where(F.col("o_orderdate") >= F.lit("1995-01-01"))
        .groupBy(
            "o_orderpriority", F.year("o_orderdate").cast("int").alias("o_year")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(
                F.expr(
                    "CAST(round(l_extendedprice * (1 - l_discount) * 100)"
                    " AS BIGINT)"
                )
            ).alias("revenue_cents"),
        )
    )
    a = sorted(map(tuple, bucketed.collect()))
    b = sorted(map(tuple, plain.collect()))
    assert a == b


def test_ensure_bucketed_is_idempotent_per_process(spark, sf_dir):
    n1 = ensure_bucketed(
        spark, sf_dir, "orders", "o_orderkey", 8,
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    files1 = sorted(spark.table(n1).inputFiles())
    n2 = ensure_bucketed(
        spark, sf_dir, "orders", "o_orderkey", 8,
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    assert n1 == n2
    assert sorted(spark.table(n2).inputFiles()) == files1


def test_bucketed_spec_change_rebuilds(spark, sf_dir):
    n8 = ensure_bucketed(
        spark, sf_dir, "orders", "o_orderkey", 8,
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    n4 = ensure_bucketed(
        spark, sf_dir, "orders", "o_orderkey", 4,
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    assert n8 != n4
    assert len(spark.table(n4).inputFiles()) == 4


def test_bucketed_reregisters_published_layout(spark, sf_dir):
    """Cross-process reuse: with the catalog entry gone but the
    published files present (a fresh process), ensure_bucketed must
    re-register via DDL — same files, still a bucketed scan."""
    name = ensure_bucketed(
        spark, sf_dir, "orders", "o_orderkey", 8,
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    files = sorted(spark.table(name).inputFiles())
    spark.sql(f"DROP TABLE {name}")  # catalog forgets; bytes remain
    name2 = ensure_bucketed(
        spark, sf_dir, "orders", "o_orderkey", 8,
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    assert name2 == name
    assert sorted(spark.table(name2).inputFiles()) == files
    # the re-registered DDL must carry the bucket spec: a self-join on
    # the bucket key runs bucketed with no exchange and no sort
    a = spark.table(name2).alias("a")
    b = spark.table(name2).selectExpr(
        "o_orderkey AS k2", "o_orderpriority AS p2"
    ).alias("b")
    plan = (
        a.hint("merge")
        .join(b, a.o_orderkey == b.k2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Bucketed: true") == 2
    assert "Exchange" not in plan
    assert plan.count("Sort ") == 0


def test_bucketed_groupby_needs_no_exchange(spark, sf_dir):
    """The layout serves aggregation too: a groupBy on the bucket key
    reads pre-clustered buckets and aggregates with ZERO exchanges —
    at 100 TB this is the difference between a full-table shuffle per
    rollup and none."""
    name = ensure_bucketed(
        spark, sf_dir, "lineitem", "l_orderkey", 8,
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    agg = spark.table(name).groupBy("l_orderkey").agg(
        F.sum(
            F.expr(
                "CAST(round(l_extendedprice * (1 - l_discount) * 100)"
                " AS BIGINT)"
            )
        ).alias("rev_cents")
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Bucketed: true" in plan
    assert agg.count() > 0


def test_user_features_zero_exchange(spark, sf_dir):
    """The feature-table build: groupBy(user_id) INCLUDING the
    distinct-day aggregate runs entirely on the bucketed layout —
    zero exchanges in the whole plan (HashPartitioning(user_id)
    satisfies the (user_id, day) clustering of the inner distinct
    aggregate)."""
    from time_series_prediction_spark.plans.bucketed_queries import (
        events_user_features,
    )

    df = events_user_features(spark, sf_dir)
    plan = _plan(df)
    assert "Exchange" not in plan
    assert "Bucketed: true" in plan
    assert df.count() > 0
