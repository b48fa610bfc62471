"""Column profiling + drift: exact stats, slice parity, single scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from time_series_prediction_spark.operators.profile import (
    drift_report,
    profile_columns,
)
from time_series_prediction_spark.plans.warehouse_queries import (
    events_profile_drift,
)


def test_profile_exact_stats(spark):
    df = spark.createDataFrame(
        [(1, 2.0, "a"), (2, None, "b"), (2, 8.0, None), (None, -1.0, "a")],
        "k int, v double, s string",
    )
    prof = {
        r.column: r
        for r in profile_columns(
            df, numeric_cols=["k", "v"], categorical_cols=["s"]
        ).collect()
    }
    k, v, s = prof["k"], prof["v"], prof["s"]
    assert (k.n, k.n_null, k.n_distinct, k.min_d, k.max_d) == (4, 1, 2, 1.0, 2.0)
    assert (v.n, v.n_null, v.n_distinct, v.min_d, v.max_d) == (4, 1, 3, -1.0, 8.0)
    assert (s.n, s.n_null, s.n_distinct, s.min_d, s.max_d) == (4, 1, 2, None, None)


def test_profile_is_single_scan(spark):
    df = spark.range(50).select(
        F.col("id"), (F.col("id") % 5).alias("a"), (F.col("id") % 2).alias("b")
    )
    prof = profile_columns(df, numeric_cols=["id", "a", "b"])
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan") <= 1
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_drift_report_pairs_slices(spark):
    df = spark.createDataFrame(
        [("x", 1, 1.0), ("x", 2, 2.0), ("y", 3, 30.0)],
        "half string, k int, v double",
    )
    prof = profile_columns(
        df, numeric_cols=["k", "v"], slice_col="half"
    )
    rep = {r.column: r for r in drift_report(prof, "half", "x", "y").collect()}
    assert rep["k"].n_before == 2 and rep["k"].n_after == 1
    assert rep["v"].max_d_before == 2.0 and rep["v"].max_d_after == 30.0


def test_events_drift_query_shape(spark, sf_dir):
    rows = {r.column: r for r in events_profile_drift(spark, sf_dir).collect()}
    assert set(rows) == {"user_id", "value", "event_type"}
    for r in rows.values():
        assert r.n_before > 0 and r.n_after > 0
    assert rows["event_type"].min_d_before is None
    assert rows["user_id"].n_distinct_before > 0
