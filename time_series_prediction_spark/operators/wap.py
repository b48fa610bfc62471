"""Write-Audit-Publish: the lakehouse commit discipline (Iceberg's
WAP / Delta's staging pattern) composed from this engine's pieces —
stage the batch where readers can't see it, run the declarative
audit against the STAGED files (auditing exactly the bytes that
would publish, not the upstream frame), and only then atomically
move it into the readable location.

Contract:

* Readers never observe a partial or failing batch: the staged dir
  lives under an underscore-prefixed name (invisible to Spark's
  data-file discovery of the parent), and publication is a single
  ``os.rename`` — the same atomic-pointer discipline as
  ``streaming/layout.publish_manifest``.
* A failing audit leaves the staged dir in place under ``_rejected``
  with the violation report beside it (parquet), so the failure is
  debuggable from the artifacts alone; nothing is published.
* Publication is idempotent per target name: an existing published
  dir makes the publish a no-op (first committer wins), so a
  crashed-and-retried job cannot double-publish.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from time_series_prediction_spark.operators.quality_checks import (
    ColumnCheck,
    audit_columns,
)


class AuditFailure(Exception):
    """Raised when a staged batch violates its quality contract; the
    staging artifacts are preserved under the path in ``rejected``."""

    def __init__(self, rejected: str, report: list[tuple[str, int, int]]):
        self.rejected = rejected
        self.report = report
        detail = ", ".join(
            f"{name}: {viol}/{n}" for name, n, viol in report if viol
        )
        super().__init__(f"audit failed ({detail}); staged at {rejected}")


def violation_summary(report_df: DataFrame) -> list[tuple[str, int, int]]:
    return [
        (r.check_name, r.n_checked, r.n_violations) for r in report_df.collect()
    ]


def wap_publish(
    df: DataFrame,
    table_dir: str,
    batch_name: str,
    checks: list[ColumnCheck],
    unique_cols: list[str] = (),
    max_violation_rate: float = 0.0,
) -> str | None:
    """Stage ``df`` as parquet, audit the staged files, publish
    atomically as ``table_dir/{batch_name}`` on a green audit.

    Returns the published path, or None when ``batch_name`` was
    already published (idempotent retry). Raises ``AuditFailure`` on
    a red audit, leaving ``_rejected-{batch_name}`` (data + report)
    for inspection.

    ``max_violation_rate`` admits a bounded fraction of violations
    per check (0.0 = strict); the gate compares exact integer counts,
    never accumulated floats.
    """
    spark = df.sparkSession
    final = os.path.join(table_dir, batch_name)
    if os.path.exists(final):
        return None
    # pid-suffixed staging dir: two concurrent retries of the same
    # batch each stage privately, so the atomic rename into ``final``
    # is the ONLY cross-process contention point (same build protocol
    # as operators/bucketing.py) — a shared staging path would let one
    # process rename a dir the other is mid-overwrite on
    staged = os.path.join(table_dir, f"_staged-{batch_name}-{os.getpid()}")
    df.write.mode("overwrite").parquet(staged)

    # audit the STAGED bytes — what would actually publish
    staged_df = spark.read.parquet(staged)
    report_df = audit_columns(staged_df, checks, unique_cols=unique_cols)
    report = violation_summary(report_df)
    bad = [
        (name, n, viol)
        for name, n, viol in report
        if n > 0 and viol > max_violation_rate * n
    ]
    if bad:
        rejected = os.path.join(table_dir, f"_rejected-{batch_name}")
        if os.path.exists(rejected):  # replayed rejected batch: the
            import shutil  # retry recomputed the same artifacts

            shutil.rmtree(rejected, ignore_errors=True)
        os.rename(staged, rejected)
        # report is already collected — write it from the rows, never
        # from report_df, whose lineage still points at the moved
        # staging files
        spark.createDataFrame(
            report, "check_name string, n_checked long, n_violations long"
        ).write.mode("overwrite").parquet(
            os.path.join(rejected, "_audit_report")
        )
        raise AuditFailure(rejected, report)

    try:
        os.rename(staged, final)  # atomic publish
    except OSError:
        # lost the publish race to an identical retry: keep the winner
        if os.path.exists(final):
            import shutil

            shutil.rmtree(staged, ignore_errors=True)
            return None
        raise
    return final


def read_published(spark: SparkSession, table_dir: str) -> DataFrame:
    """Every published batch; staged/rejected dirs are underscore-
    prefixed and therefore invisible to the reader."""
    return (
        spark.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(table_dir)
    )


def wap_ingest_sink(
    table_dir: str,
    checks: list[ColumnCheck],
    unique_cols: list[str] = (),
    max_violation_rate: float = 0.0,
):
    """``foreachBatch`` form of the WAP gate: each micro-batch stages,
    audits, and publishes as ``batch-{id}`` — a red batch lands in
    ``_rejected-batch-{id}`` (data + report) and the STREAM CONTINUES;
    one poisoned batch must not take down ingestion, and the rejected
    artifacts are the on-call debugging surface. Replays are safe in
    both directions: a published batch re-delivers as a no-op, a
    rejected batch re-audits (the contract may have been fixed) and
    replaces its old rejection artifacts."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        try:
            wap_publish(
                batch_df,
                table_dir,
                f"batch-{batch_id}",
                checks,
                unique_cols=unique_cols,
                max_violation_rate=max_violation_rate,
            )
        except AuditFailure:
            pass  # artifacts preserved under _rejected-batch-{id}

    return _sink
