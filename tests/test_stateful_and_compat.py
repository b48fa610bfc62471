"""Stateful streaming operator + grouped-map trend compat mode."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from time_series_prediction_spark.operators import timeseries as ts
from time_series_prediction_spark.operators.trend_compat import trend_compat
from time_series_prediction_spark.sources.generate import generate_series_frame
from time_series_prediction_spark.streaming.events import (
    read_events_stream,
    run_to_memory_sink,
)
from time_series_prediction_spark.streaming.stateful import running_user_totals


def test_stateful_running_totals_match_batch(spark, sf_dir):
    stream = running_user_totals(read_events_stream(spark, sf_dir))
    q = run_to_memory_sink(stream, "state_out", output_mode="update")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # last update per user == batch totals (exact cents)
    got = spark.sql(
        """
        SELECT user_id, total_value, n_events FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY last_ts DESC, n_events DESC) AS rn
          FROM state_out
        ) WHERE rn = 1
        """
    )
    from time_series_prediction_spark.sources.io import read_table

    want = (
        read_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            (
                F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")) / 100.0
            ).alias("total_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    diff = (
        got.join(want, "user_id")
        .where(
            (F.abs(got.total_value - want.total_value) > 1e-9)
            | (got.n_events != want.n_events)
        )
        .count()
    )
    assert got.count() == want.count()
    assert diff == 0


def test_trend_compat_matches_native_trend(spark):
    raw = generate_series_frame(spark, 20, seed=4)
    native = raw.withColumn("t", ts.trend("balance")).select(
        "primaryaccountholder", "t"
    )
    compat = trend_compat(raw).select(
        "primaryaccountholder", F.col("balance_trend_1MW").alias("t")
    )
    n_rows = native.orderBy("primaryaccountholder").collect()
    c_rows = compat.orderBy("primaryaccountholder").collect()
    assert len(n_rows) == len(c_rows) == 20
    for nr, cr in zip(n_rows, c_rows):
        a = np.asarray(nr["t"], dtype=float)
        b = np.asarray(cr["t"], dtype=float)
        ok = np.isclose(a, b, rtol=3e-7, atol=1.5e-3)
        assert ok.all(), f"compat trend differs at {np.where(~ok)[0][:5]}"
