"""Validate-on-ingest: planted violations are quarantined with their
reasons, landed data is clean, replay is idempotent."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from time_series_prediction_spark.operators.quality_checks import (
    in_range,
    not_null,
    satisfies,
)
from time_series_prediction_spark.streaming.audit import (
    audited_ingest_sink,
    split_by_checks,
)

_CHECKS = None


def _checks():
    return [
        not_null("user_id"),
        in_range("value", lo=0.0, hi=1000.0),
        satisfies("type_known", F.col("event_type").isin("view", "purchase")),
    ]


def _dirty(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "view"),
            (2, 20.0, "purchase"),
            (None, 30.0, "view"),          # null user
            (4, -5.0, "view"),             # range
            (5, 50.0, "refund"),           # unknown type
            (None, 2000.0, "refund"),      # all three
        ],
        "user_id int, value double, event_type string",
    )


def test_split_attributes_every_failure(spark):
    clean, bad = split_by_checks(_dirty(spark), _checks())
    assert clean.count() == 2
    reasons = [
        (r.user_id, sorted(r._failed_checks)) for r in bad.collect()
    ]
    assert sorted(reasons, key=str) == sorted(
        [
            (4, ["value_in_range"]),
            (5, ["type_known"]),
            (None, ["user_id_not_null"]),
            (None, ["type_known", "user_id_not_null", "value_in_range"]),
        ],
        key=str,
    )


def test_split_is_one_python_free_pass(spark):
    clean, bad = split_by_checks(_dirty(spark), _checks())
    for df in (clean, bad):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "Exchange" not in plan  # narrow split over the batch


def test_audited_sink_lands_clean_quarantines_bad(spark, tmp_path):
    out = str(tmp_path / "tbl")
    sink = audited_ingest_sink(out, _checks())
    sink(_dirty(spark), 0)

    landed = spark.read.parquet(os.path.join(out, "batch-0"))
    assert landed.count() == 2
    assert landed.where(F.col("user_id").isNull()).count() == 0

    quarantined = spark.read.parquet(out + "_quarantine/batch-0")
    assert quarantined.count() == 4
    assert "_failed_checks" in quarantined.columns

    report = spark.read.parquet(out + "_audit_report/batch-0")
    row = report.first()
    assert (row.n_rows, row.n_clean, row.n_quarantined) == (6, 2, 4)

    # replay of the same batch_id: identical state, no duplication
    sink(_dirty(spark), 0)
    assert spark.read.parquet(os.path.join(out, "batch-0")).count() == 2
    assert spark.read.parquet(out + "_quarantine/batch-0").count() == 4


def test_audited_sink_through_a_real_stream(spark, tmp_path):
    """End-to-end through Structured Streaming: multiple micro-batches
    with planted violations; total landed + quarantined == source."""
    src = str(tmp_path / "src")
    rows = spark.range(3_000).select(
        F.when(F.col("id") % 100 == 7, None)
        .otherwise(F.col("id"))
        .cast("int")
        .alias("user_id"),
        (F.when(F.col("id") % 50 == 3, -1.0).otherwise(F.col("id") % 900))
        .cast("double")
        .alias("value"),
        F.when(F.col("id") % 2 == 0, "view").otherwise("purchase").alias(
            "event_type"
        ),
    )
    rows.repartition(3).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "tbl")
    stream = (
        spark.readStream.schema("user_id int, value double, event_type string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(audited_ingest_sink(out, _checks()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    landed = spark.read.option("recursiveFileLookup", "true").parquet(out)
    quarantined = spark.read.option("recursiveFileLookup", "true").parquet(
        out + "_quarantine"
    )
    report = spark.read.option("recursiveFileLookup", "true").parquet(
        out + "_audit_report"
    )
    n_bad_expected = 3_000 // 100 + 3_000 // 50  # nulls + negatives, disjoint
    assert quarantined.count() == n_bad_expected
    assert landed.count() == 3_000 - n_bad_expected
    agg = report.agg(
        F.sum("n_rows").alias("r"),
        F.sum("n_clean").alias("c"),
        F.sum("n_quarantined").alias("q"),
    ).first()
    assert (agg.r, agg.c, agg.q) == (3_000, 3_000 - n_bad_expected, n_bad_expected)
    # the landing zone itself re-audits clean
    assert landed.where(F.col("user_id").isNull()).count() == 0
    assert landed.where(F.col("value") < 0).count() == 0
