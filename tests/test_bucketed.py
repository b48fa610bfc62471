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


def test_corrupted_published_layout_rebuilds(spark, sf_dir):
    """Safety precondition of the session-wide sort-elision flag:
    a published dir where some bucket has TWO files (partial publish,
    foreign writer) must be detected and rebuilt at registration —
    never registered as-is (sorts would be elided unsoundly)."""
    import shutil

    name = ensure_bucketed(
        spark, sf_dir, "supplier", "s_suppkey", 4,
        columns=["s_suppkey", "s_name"],
    )
    loc = os.path.dirname(
        spark.table(name).inputFiles()[0].removeprefix("file:")
    )
    truth = sorted(map(tuple, spark.table(name).collect()))
    spark.sql(f"DROP TABLE {name}")
    # duplicate one bucket's file under a different task prefix: same
    # `_NNNNN` bucket id, so the bucket now has two files
    victim = sorted(glob.glob(os.path.join(loc, "part-*")))[0]
    dup = os.path.join(loc, "part-99999-" + os.path.basename(victim).split("-", 2)[2])
    shutil.copyfile(victim, dup)
    name2 = ensure_bucketed(
        spark, sf_dir, "supplier", "s_suppkey", 4,
        columns=["s_suppkey", "s_name"],
    )
    assert name2 == name
    # rebuilt: invariant restored, content identical, no dup rows
    loc2 = os.path.dirname(
        spark.table(name2).inputFiles()[0].removeprefix("file:")
    )
    files = glob.glob(os.path.join(loc2, "part-*"))
    ids = [f.rsplit("_", 1)[1] for f in files]
    assert len(ids) == len(set(ids))
    assert sorted(map(tuple, spark.table(name2).collect())) == truth


_RACE_SCRIPT = r"""
import sys
from pyspark.sql import SparkSession
from time_series_prediction_spark.operators.bucketing import ensure_bucketed

sf_dir = sys.argv[1]
spark = (
    SparkSession.builder.master("local[2]")
    .appName(f"race-{sys.argv[2]}")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    .getOrCreate()
)
name = ensure_bucketed(
    spark, sf_dir, "customer", "c_custkey", 4,
    columns=["c_custkey", "c_nationkey"],
)
n = spark.table(name).count()
print(f"RESULT {name} {n}", flush=True)
spark.stop()
"""


def test_cross_process_publish_race(spark, sf_dir, tmp_path):
    """Brief #7: two real processes build the SAME layout spec
    concurrently — exactly one publish wins the atomic rename, the
    loser discards its build, BOTH register and read identical data,
    and no half-built dirs survive."""
    import shutil
    import subprocess
    import sys
    import tempfile

    # a private copy of the fixture => a layout key unique to this
    # test, so both children race on a cache entry nobody else owns
    race_sf = tmp_path / "sf"
    race_sf.mkdir()
    shutil.copy(
        os.path.join(sf_dir, "customer.parquet"),
        race_sf / "customer.parquet",
    )
    script = tmp_path / "race_child.py"
    script.write_text(_RACE_SCRIPT)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(race_sf), str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            cwd="/root/repo",
            env={**os.environ, "PYTHONPATH": "/root/repo"},
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    results = []
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"child failed:\n{out}\n{err}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][0]
        results.append(tuple(line.split()[1:]))
    # same table name, same row count from both processes
    assert results[0] == results[1]
    name = results[0][0]
    # one published dir, zero leftover build dirs for this key
    root = os.path.join(tempfile.gettempdir(), "tsp_buckets")
    leftovers = [e for e in os.listdir(root) if e.startswith(f"{name}.build-")]
    assert leftovers == []
    assert os.path.exists(os.path.join(root, name, "_SUCCESS"))


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


def test_session_stats_bucketed_zero_exchanges(spark, sf_dir):
    """Sessionization without its shuffle: windows + both aggregates
    ride HashPartitioning(user_id) from the bucketed scan — the whole
    plan must contain ZERO exchanges (sorts are allowed: the layout
    is sorted by user_id alone, the window needs (user_id, ts))."""
    from time_series_prediction_spark.plans.bucketed_queries import (
        events_session_stats_bucketed,
    )

    df = events_session_stats_bucketed(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0, plan
