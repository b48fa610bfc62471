"""Validate-on-ingest: the quality gate a production stream runs in
front of its landing zone. Each micro-batch is split by the declared
row-level checks (operators/quality_checks.ColumnCheck) into clean
rows (landed) and violating rows (quarantined WITH the names of the
checks they failed), plus one per-batch report row — so bad data
never reaches training tables and every rejection is attributable.

Spark shape: the check predicates compile into ONE array expression
(``filter(array(CASE WHEN …), x -> x IS NOT NULL)``) evaluated per
row inside whole-stage codegen — adding a check never adds a pass,
and the batch is scanned once for the split and once for the landed
write (both from the same materialized frame). Replay-idempotent the
same way zorder_ingest_sink is: every output keyed by batch_id with
overwrite semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from time_series_prediction_spark.operators.materialize import materialize
from time_series_prediction_spark.operators.quality_checks import ColumnCheck


def failed_checks_col(checks: list[ColumnCheck]):
    """array<string> of the check names the row violates (empty for a
    clean row) — one codegen'd expression however many checks."""
    entries = [
        F.when(c.violation, F.lit(c.name)).otherwise(F.lit(None))
        for c in checks
    ]
    return F.array_compact(F.array(*entries))


def split_by_checks(
    df: DataFrame, checks: list[ColumnCheck]
) -> tuple[DataFrame, DataFrame]:
    """(clean_rows, quarantined_rows): quarantined rows carry a
    ``_failed_checks`` array naming every violated check. The input
    is materialized once so the two outputs don't recompute it."""
    flagged = materialize(
        df.withColumn("_failed_checks", failed_checks_col(checks))
    )
    clean = flagged.where(F.size("_failed_checks") == 0).drop("_failed_checks")
    bad = flagged.where(F.size("_failed_checks") > 0)
    return clean, bad


def audited_ingest_sink(
    data_path: str,
    checks: list[ColumnCheck],
    quarantine_path: str | None = None,
    report_path: str | None = None,
):
    """``foreachBatch`` sink: land clean rows under
    ``data_path/batch-{id}``, quarantine violating rows (with their
    failure reasons) under ``quarantine_path/batch-{id}``, and append
    a per-batch report row (batch_id, n_rows, n_clean, n_quarantined)
    — each per-batch dir overwritten on replay, so re-delivery of a
    micro-batch is idempotent."""
    quarantine_path = quarantine_path or data_path + "_quarantine"
    report_path = report_path or data_path + "_audit_report"

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        clean, bad = split_by_checks(batch_df, checks)
        clean.write.mode("overwrite").parquet(
            os.path.join(data_path, f"batch-{batch_id}")
        )
        n_bad = bad.count()
        if n_bad:
            bad.write.mode("overwrite").parquet(
                os.path.join(quarantine_path, f"batch-{batch_id}")
            )
        spark = batch_df.sparkSession
        n_clean = clean.count()
        spark.createDataFrame(
            [(int(batch_id), n_clean + n_bad, n_clean, n_bad)],
            "batch_id long, n_rows long, n_clean long, n_quarantined long",
        ).write.mode("overwrite").parquet(
            os.path.join(report_path, f"batch-{batch_id}")
        )

    return _sink
