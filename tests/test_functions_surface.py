"""The public functions package: importable, composable, correct."""

from __future__ import annotations

from pyspark.sql import functions as F

import time_series_prediction_spark.functions as fn


def test_functions_surface_composes(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox", 12.34)], "id long, text string, amount double"
    ).select(
        fn.cents("amount").alias("c"),
        fn.token_count("text").alias("tc"),
        F.size(F.split(F.col("text"), " ")).alias("n"),
    )
    row = df.first()
    assert row["c"] == 1234
    assert row["tc"] == row["n"] == 4


def test_functions_exports_are_columns_or_factories():
    public = [n for n in dir(fn) if not n.startswith("_")]
    # the curated surface must keep its core names stable
    for name in [
        "trend", "scaling", "gradient", "extrapolate_trend", "keep_ts",
        "token_count", "lang_id", "quality_score", "fingerprint",
        "cosine_expr", "quantize", "simhash64", "hamming64",
        "cents", "epoch_us", "date_sequence_col",
    ]:
        assert name in public, name
