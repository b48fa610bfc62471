"""Streaming MERGE: apply a change stream to a copy-on-write keyed
table, one micro-batch at a time — the CDC-apply loop (Delta's
``foreachBatch`` + ``MERGE INTO`` idiom) on this engine's manifest
commit protocol.

Semantics per micro-batch:

* rows are upserts keyed by ``key`` (last-writer-wins within the
  batch by ``seq_col``, a CDC sequence/LSN column that must be unique
  per key within a batch — real change feeds carry one; without it,
  intra-batch duplicate keys are rejected rather than resolved
  arbitrarily);
* the first non-empty batch bootstraps the table (``init_table``);
  every later batch is a file-granular ``merge_upsert`` — only files
  whose key range overlaps the batch's keys are rewritten.

Replay discipline: Structured Streaming re-runs a failed micro-batch
with the same data. A blind append sink would duplicate rows; this
sink is STATE-idempotent instead — re-merging identical upserts
replaces rows with identical rows, so the committed table equals the
exactly-once result (a replay does burn an extra manifest version,
which retention reclaims). Pinned in tests by applying a batch twice.

Scale shape: each commit's work is proportional to the batch and the
overlapping files, never the table; the overlap test is a broadcast
range join against the tiny manifest (operators/cow.py). A
key-clustered table receiving localized change batches (the common
CDC case — recent keys churn) rewrites a sliver of its files per
commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from time_series_prediction_spark.operators.cow import (
    init_table,
    merge_upsert,
)
from time_series_prediction_spark.streaming.layout import (
    current_manifest,
    manifest_root,
)


def dedup_last_writer(df: DataFrame, key: str, seq_col: str) -> DataFrame:
    """One row per key: the greatest ``seq_col`` wins. Raises if any
    (key, seq) pair repeats — a change feed with a non-unique
    sequence has no defined winner, and picking one silently would be
    nondeterministic across retries."""
    dup = (
        df.groupBy(key, seq_col).count().where("count > 1").limit(1).count()
    )
    if dup:
        raise ValueError(
            f"change batch has duplicate ({key}, {seq_col}) pairs — "
            "no deterministic last writer"
        )
    w = Window.partitionBy(key).orderBy(F.col(seq_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where("_rn = 1")
        .drop("_rn")
    )


def merge_ingest_sink(
    data_path: str,
    key: str,
    seq_col: str | None = None,
    drop_seq: bool = False,
    stats_cols: list[str] | None = None,
    n_files: int = 4,
    bootstrap_n_files: int = 8,
    root: str | None = None,
    keep_versions: int = 2,
):
    """``foreachBatch`` body applying each micro-batch of upserts to
    the cow table at ``data_path``. ``seq_col`` enables last-writer-
    wins within a batch (and is dropped from the stored schema when
    ``drop_seq``); without it, batches must already be key-unique."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if seq_col is not None:
            batch_df = dedup_last_writer(batch_df, key, seq_col)
            if drop_seq:
                batch_df = batch_df.drop(seq_col)
        mroot = root or manifest_root(data_path)
        if current_manifest(spark, mroot) is None:
            init_table(
                spark, data_path, batch_df, key=key,
                stats_cols=stats_cols, n_files=bootstrap_n_files,
                root=mroot, keep_versions=keep_versions,
            )
        else:
            merge_upsert(
                spark, data_path, batch_df, key=key,
                stats_cols=stats_cols, n_files=n_files, root=mroot,
                keep_versions=keep_versions,
            )

    return _sink


def cdc_apply_sink(
    data_path: str,
    key: str,
    op_col: str = "op",
    delete_op: str = "D",
    seq_col: str | None = None,
    stats_cols: list[str] | None = None,
    n_files: int = 4,
    bootstrap_n_files: int = 8,
    root: str | None = None,
    keep_versions: int = 2,
    maintain_max_files: int | None = None,
    maintain_target_files: int = 8,
    maintain_grace_s: float = 3600.0,
    bloom_col: str | None = None,
):
    """``foreachBatch`` body applying a FULL change stream — upserts
    and deletes — to the cow table. Per batch: last-writer-wins per
    key over ``seq_col`` (so a key that is updated then deleted in
    one batch resolves to its final op), then upserts commit as one
    file-granular MERGE and deletes as one deletion-vector commit
    (metadata cost however scattered the deleted keys are —
    ``operators/cow.delete_keys_dv``). Replays are state-idempotent:
    re-merging the same upserts rewrites identical rows, re-adding
    the same tombstones is a set union.

    Compaction policy: a long-running stream accretes one MERGE + one
    DV commit per micro-batch. With ``maintain_max_files`` set, the
    sink runs ``operators/cow.maintain_table`` after any batch that
    leaves more committed files than the threshold — OPTIMIZE
    (materializing accumulated deletion vectors, resetting the file
    count to ``maintain_target_files``) then vacuum of generations
    unreferenced by every retained version and older than
    ``maintain_grace_s`` — so file count and on-disk footprint stay
    bounded however long the stream runs. The maintenance commit uses
    the same pinned-version CAS as every other writer; the sink is
    single-threaded per stream, so it never races its own merges.
    Default off: tables maintained on an external cadence shouldn't
    pay compaction inside the ingest path.

    Rows with a NULL ``op_col`` are an error, not a silent drop: a
    null op matches neither the upsert nor the delete branch, and a
    CDC row that vanishes without trace is the worst failure mode a
    change pipeline can have."""
    from time_series_prediction_spark.operators.cow import (
        delete_keys_dv,
        maintain_table,
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if seq_col is not None:
            batch_df = dedup_last_writer(batch_df, key, seq_col)
            batch_df = batch_df.drop(seq_col)
        if not batch_df.where(F.col(op_col).isNull()).isEmpty():
            raise ValueError(
                f"CDC batch {batch_id} carries rows with NULL "
                f"{op_col!r} — they would match neither the upsert "
                "nor the delete branch and silently vanish; fix the "
                "feed or map nulls to an explicit op upstream"
            )
        ups = batch_df.where(F.col(op_col) != F.lit(delete_op)).drop(op_col)
        dels = batch_df.where(F.col(op_col) == F.lit(delete_op)).select(key)
        mroot = root or manifest_root(data_path)
        if current_manifest(spark, mroot) is None:
            if ups.isEmpty():
                return  # nothing to bootstrap from yet
            # bloom_col opts the bootstrapped table into the per-file
            # bloom key index (operators/cow._BLOOM_MARKER): every
            # subsequent per-batch MERGE then keeps file granularity
            # even when the stream's keys don't correlate with the
            # clustered layout — without it a uniform-key change
            # stream rewrites the whole table every batch
            init_table(
                spark, data_path, ups, key=key, stats_cols=stats_cols,
                n_files=bootstrap_n_files, root=mroot,
                keep_versions=keep_versions, bloom_col=bloom_col,
            )
        elif not ups.isEmpty():
            merge_upsert(
                spark, data_path, ups, key=key, stats_cols=stats_cols,
                n_files=n_files, root=mroot, keep_versions=keep_versions,
            )
        if not dels.isEmpty():
            delete_keys_dv(
                spark, data_path, dels, key=key, root=mroot,
                keep_versions=keep_versions,
            )
        if maintain_max_files is not None:
            maintain_table(
                spark, data_path, zcols=[key],
                max_files=maintain_max_files,
                target_files=maintain_target_files,
                grace_s=maintain_grace_s, root=mroot,
                keep_versions=keep_versions,
            )

    return _sink
