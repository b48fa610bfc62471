"""Flagship end-to-end query: the reference's cashflow-forecast
pipeline applied to the driver's events fixture.

events → exact-cents daily series per user → wide arrays (long→wide
reshape) → cleaning flag → seasonal-decompose trend (freq=7 for the
~30-day fixtures) → linear trend extrapolation 14 days ahead →
trajectory slope metric — i.e. the reference lifecycle (SURVEY §3.3
serving path) compressed to one lazy DataFrame: generation-scale
array math with no Python UDFs and exactly TWO small shuffles — the
(user, day) rollup exchange and the per-user collect exchange, both
over already-aggregated rows; all per-series math afterwards is
shuffle-free array expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from time_series_prediction_spark.operators import timeseries as ts
from time_series_prediction_spark.operators.reshape import long_to_wide
from time_series_prediction_spark.plans.timeseries_queries import daily_series


def cashflow_wide_pipeline(
    spark: SparkSession,
    sf_dir: str,
    freq: int = 7,
    horizon_days: int = 14,
    trend_window_days: int = 7,
    threshold_count: int = 5,
) -> DataFrame:
    """Per-user forecast summary: (user_id, n_days, keep_ts,
    trajectory, forecast array<float> of len horizon_days)."""
    long_df = daily_series(spark, sf_dir).select(
        "user_id", "day", (F.col("cents") / 100.0).alias("value")
    )
    wide = long_to_wide(
        long_df,
        id_col="user_id",
        ds_col="day",
        value_col="value",
        out_date="days",
        out_value="balance",
    )
    return (
        wide.withColumn("n_days", F.size("balance"))
        .where(F.col("n_days") >= freq + 2)
        .withColumn("keep_ts", ts.keep_ts("balance", threshold_count))
        .where(F.col("keep_ts") == 1)
        .withColumn("trend", ts.trend("balance", freq=freq))
        .withColumn(
            "forecast",
            ts.extrapolate_trend(
                "trend",
                window_days=trend_window_days,
                horizon_days=horizon_days,
                median=True,
                serving=True,
            ),
        )
        .withColumn("trajectory", ts.trajectory("trend", window_months=1))
        .select("user_id", "n_days", "keep_ts", "trajectory", "forecast")
    )


def cashflow_scoring_pipeline(
    spark: SparkSession,
    sf_dir: str,
    x_days: int = 14,
    y_days: int = 7,
    freq: int = 7,
    threshold_count: int = 5,
) -> DataFrame:
    """The reference's FULL scoring lifecycle S.1 → S.3 + E.2 (SURVEY
    §3.3; reference ``notebooks/scoring.py:184-488``) as one registry
    query: events → wide per-user series → clean (native keep_ts
    predicate) → pre_processing (trend/detrend/scale/get_X/get_y,
    evaluation mode) → iterator-pandas_udf scoring with the
    last-value persistence model → post_processing (rescale +
    as-shipped no-op retrend) → Spark-native R² (reference
    ``metric_extraction``, utils.py:502-538, computed distributed
    instead of toPandas).

    Horizons are scaled to the fixture (series are 21-30 days):
    X = 14 days, y = 7 days, R² at the full horizon and at 3 days.
    Rows-only driver check — the pandas_udf scoring stage is not
    ANSI-SQL-expressible; model-quality ordering (last-value beats
    zero model) is pinned in tests/test_model_scoring.py."""
    from time_series_prediction_spark.model.scoring import (
        last_value_model_factory,
        score_dataframe,
    )
    from time_series_prediction_spark.plans.preprocess import (
        clean_series,
        post_processing,
        pre_processing,
        r2_metrics,
    )

    long_df = daily_series(spark, sf_dir).select(
        "user_id", "day", (F.col("cents") / 100.0).alias("value")
    )
    wide = long_to_wide(
        long_df,
        id_col="user_id",
        ds_col="day",
        value_col="value",
        out_date="days",
        out_value="balance",
    ).where(F.size("balance") >= x_days + y_days)
    cleaned = clean_series(wide, threshold_count=threshold_count)
    pre = pre_processing(
        cleaned,
        end_date="2024-01-01",
        serving=False,
        freq=freq,
        x_days=x_days,
        y_days=y_days,
        trend_window_days=freq,
    )
    scored = score_dataframe(
        pre, last_value_model_factory(y_days), horizon=y_days
    )
    post = post_processing(scored)
    return r2_metrics(post, y_days=y_days, one_month_days=3).select(
        F.col("r2_3month").alias("r2_horizon"),
        F.col("r2_1month").alias("r2_3day"),
        F.col("n_series").cast("long").alias("n_series"),
    )


def cashflow_wide_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry-facing scalar projection of cashflow_wide_pipeline:
    result canonicalizers hash scalar cells, so the forecast array is
    reduced to its endpoints (day-1, final-day) plus the horizon
    length. entry() still returns the full-array form."""
    wide = cashflow_wide_pipeline(spark, sf_dir)
    return wide.select(
        "user_id",
        "n_days",
        "keep_ts",
        "trajectory",
        F.element_at("forecast", 1).cast("double").alias("forecast_d1"),
        F.element_at("forecast", -1).cast("double").alias("forecast_last"),
        F.size("forecast").cast("bigint").alias("horizon_days"),
    )
