"""Streaming lakehouse ingestion: z-ordered append + incremental
stats-manifest maintenance per micro-batch.

Composes the batch pieces the engine already has —
``operators.zorder.write_zordered`` (per-batch Morton layout) and
``operators.manifest.update_manifest`` (footer-read only the delta) —
into the continuous loop a 100 TB pipeline actually runs: a
``foreachBatch`` sink that lands each micro-batch as its own set of
Morton-sorted files and folds just their footers into a versioned
manifest.

Design points (the Delta/Iceberg commit protocol, minus the format):

* **Idempotent replay.** Structured Streaming re-runs a micro-batch
  with the same ``batch_id`` after a failure; the sink writes each
  batch into its own ``batch-{id}`` subdirectory with ``overwrite``
  mode, so a replay rewrites the same directory instead of appending
  duplicates. The manifest update then sees the replay's fresh file
  names (old ones vanish, new ones appear) and stays consistent.
* **Atomic manifest versions.** Each batch publishes the manifest as
  a new ``v{batch_id}`` directory and then atomically ``os.replace``s
  a tiny ``_LATEST`` pointer file (the ``_last_checkpoint`` pattern):
  readers either see the previous complete version or the new one,
  never a half-written directory. The pointed-to version is
  additionally gated on its ``_SUCCESS`` marker.
* **Bounded metadata.** Only the newest manifest versions are kept
  (``keep_versions``); the per-batch update footer-reads ONLY the new
  files, so steady-state cost is proportional to the batch, not the
  table.
* **Readers skip, never re-scan.** ``current_manifest`` +
  ``operators.manifest.pruned_scan`` answer range queries reading
  only overlapping files; the underscore-prefixed manifest root is
  invisible to Spark's data-file discovery.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from time_series_prediction_spark.operators.manifest import (
    build_stats_manifest,
    update_manifest,
)
from time_series_prediction_spark.operators.zorder import write_zordered

_LATEST = "_LATEST"


def manifest_root(data_path: str) -> str:
    """Default manifest location: an underscore-prefixed dir inside
    the table, hidden from Spark's data-file discovery and this
    module's own recursive listing."""
    return os.path.join(data_path, "_manifest_log")


def publish_manifest(
    man: DataFrame, root: str, version: int, keep_versions: int = 2
) -> str:
    """Write ``man`` as ``root/v{version}`` and atomically repoint
    ``root/_LATEST`` at it; prune all but the newest
    ``keep_versions`` version dirs. Single-writer (the streaming
    query) by construction — the pointer flip is the commit."""
    os.makedirs(root, exist_ok=True)
    vname = f"v{version}"
    man.write.mode("overwrite").parquet(os.path.join(root, vname))
    tmp = os.path.join(root, f".latest.tmp.{os.getpid()}")
    with open(tmp, "w") as fh:
        fh.write(vname)
    os.replace(tmp, os.path.join(root, _LATEST))  # atomic commit
    versions = sorted(
        (d for d in os.listdir(root) if d.startswith("v")),
        key=lambda d: int(d[1:]),
    )
    for stale in versions[:-keep_versions]:
        shutil.rmtree(os.path.join(root, stale), ignore_errors=True)
    return os.path.join(root, vname)


def current_manifest(spark: SparkSession, root: str) -> DataFrame | None:
    """The manifest version the ``_LATEST`` pointer commits to, or
    None when nothing has been published (or the pointed-to write
    never completed — its ``_SUCCESS`` is the completeness gate)."""
    try:
        with open(os.path.join(root, _LATEST)) as fh:
            vname = fh.read().strip()
    except OSError:
        return None
    vdir = os.path.join(root, vname)
    if not os.path.exists(os.path.join(vdir, "_SUCCESS")):
        return None
    return spark.read.parquet(vdir)


def zorder_ingest_sink(
    data_path: str,
    zcols: list[str],
    n_files: int = 4,
    root: str | None = None,
):
    """``foreachBatch`` function landing each micro-batch as its own
    z-ordered ``batch-{id}`` directory and committing an incrementally
    updated manifest version. Pass to
    ``stream.writeStream.foreachBatch(...)``."""
    root = root or manifest_root(data_path)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        bdir = os.path.join(data_path, f"batch-{batch_id}")
        # overwrite the SAME per-batch dir → replay-idempotent
        write_zordered(batch_df, bdir, zcols, n_files=n_files)
        prev = current_manifest(spark, root)
        man = (
            build_stats_manifest(spark, data_path, zcols)
            if prev is None
            else update_manifest(spark, prev, data_path, zcols)
        )
        publish_manifest(man, root, batch_id)

    return _sink


def read_layout(spark: SparkSession, data_path: str) -> DataFrame:
    """Full-table read of a streamed layout: per-batch subdirectories
    are plain nested dirs (NOT partition dirs — no schema column is
    derived from them), so the scan needs recursive lookup."""
    return (
        spark.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(data_path)
    )
