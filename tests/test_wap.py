"""Write-Audit-Publish: green publishes atomically, red quarantines
with artifacts, retries are idempotent, readers never see staging."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from time_series_prediction_spark.operators.quality_checks import (
    in_range,
    not_null,
)
from time_series_prediction_spark.operators.wap import (
    AuditFailure,
    read_published,
    wap_publish,
)


def _clean(spark):
    return spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") % 100).cast("double").alias("v")
    )


def _checks():
    return [not_null("k"), in_range("v", lo=0.0, hi=99.0)]


def test_green_audit_publishes(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    out = wap_publish(_clean(spark), tbl, "batch-1", _checks(), unique_cols=["k"])
    assert out == os.path.join(tbl, "batch-1")
    assert read_published(spark, tbl).count() == 500
    assert not any(d.startswith("_staged") for d in os.listdir(tbl))


def test_red_audit_rejects_and_preserves_artifacts(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    wap_publish(_clean(spark), tbl, "batch-1", _checks())
    dirty = _clean(spark).withColumn(
        "v", F.when(F.col("k") % 10 == 0, -1.0).otherwise(F.col("v"))
    )
    with pytest.raises(AuditFailure) as ei:
        wap_publish(dirty, tbl, "batch-2", _checks())
    # nothing new published; readers still see only batch-1
    assert read_published(spark, tbl).count() == 500
    # artifacts: rejected data + the violation report, debuggable alone
    rej = ei.value.rejected
    assert os.path.isdir(rej)
    rep = {
        r.check_name: r.n_violations
        for r in spark.read.parquet(os.path.join(rej, "_audit_report")).collect()
    }
    assert rep["v_in_range"] == 50 and rep["k_not_null"] == 0


def test_bounded_violation_rate_admits(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    dirty = _clean(spark).withColumn(
        "v", F.when(F.col("k") % 100 == 0, -1.0).otherwise(F.col("v"))
    )  # 1% violations
    out = wap_publish(
        dirty, tbl, "batch-1", _checks(), max_violation_rate=0.02
    )
    assert out is not None
    with pytest.raises(AuditFailure):
        wap_publish(
            dirty, tbl, "batch-2", _checks(), max_violation_rate=0.005
        )


def test_publish_is_idempotent(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    assert wap_publish(_clean(spark), tbl, "b", _checks()) is not None
    assert wap_publish(_clean(spark), tbl, "b", _checks()) is None
    assert read_published(spark, tbl).count() == 500


def test_duplicate_key_gate(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    dup = _clean(spark).union(_clean(spark).limit(5))
    with pytest.raises(AuditFailure) as ei:
        wap_publish(dup, tbl, "b", _checks(), unique_cols=["k"])
    assert any(n == "k_unique" and v == 5 for n, _, v in ei.value.report)


def test_wap_ingest_sink_through_a_stream(spark, tmp_path):
    """Streamed WAP: a poisoned micro-batch is rejected with its
    artifacts while the stream continues publishing clean batches;
    replaying the rejected batch after relaxing the contract
    publishes it."""
    from time_series_prediction_spark.operators.wap import wap_ingest_sink

    src = str(tmp_path / "src")
    rows = spark.range(3_000).select(
        F.col("id").alias("k"),
        F.when((F.col("id") >= 1_000) & (F.col("id") < 2_000), -1.0)
        .otherwise((F.col("id") % 100).cast("double"))
        .alias("v"),
    )
    # one file per 1000-row slice so the middle BATCH is exactly the
    # poisoned slice (range repartitioning samples boundaries and
    # would smear the poison across files)
    for i in range(3):
        rows.where(
            (F.col("k") >= i * 1_000) & (F.col("k") < (i + 1) * 1_000)
        ).coalesce(1).write.mode("append").parquet(src)
    tbl = str(tmp_path / "tbl")
    stream = (
        spark.readStream.schema("k long, v double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(wap_ingest_sink(tbl, _checks()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    published = read_published(spark, tbl)
    assert published.count() == 2_000
    assert published.where(F.col("v") < 0).count() == 0
    rejected = [
        d for d in os.listdir(tbl) if d.startswith("_rejected-batch-")
    ]
    assert len(rejected) == 1
    rej_dir = os.path.join(tbl, rejected[0])
    assert spark.read.option("pathGlobFilter", "*.parquet").parquet(
        rej_dir
    ).count() == 1_000

    # contract relaxed → replaying the rejected batch publishes it
    bad_batch = spark.read.option("pathGlobFilter", "*.parquet").parquet(
        rej_dir
    )
    batch_id = rejected[0].removeprefix("_rejected-")
    sink = wap_ingest_sink(tbl, [not_null("k")])  # no range check now
    sink(bad_batch, int(batch_id.removeprefix("batch-")))
    assert read_published(spark, tbl).count() == 3_000
