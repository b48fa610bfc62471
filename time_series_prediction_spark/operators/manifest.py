"""File-statistics manifest: lakehouse-style file skipping for plain
parquet directories.

Z-ordering (operators/zorder.py) makes per-file column ranges narrow;
this module exploits them the way Delta/Iceberg metadata does, without
requiring either format: build a (file, column, min, max, rows)
manifest once, then answer range/point queries by scanning ONLY the
files whose ranges overlap the predicate.

Scale shape: footer reads are distributed — the file list parallelizes
across executors and each task opens only metadata (no data pages), so
a million-file table builds its manifest in one embarrassingly
parallel pass. The manifest itself is tiny (files × columns rows) and
is the natural thing to persist alongside the data and maintain
incrementally on append. Pruning is a filter over the manifest plus a
parquet scan of the surviving paths; the predicate is re-applied after
the scan, so pruning can only skip work, never change results
(verified in tests against the unpruned scan).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST_SCHEMA = (
    "file string, col string, n_rows long, vmin double, vmax double, "
    "has_nulls boolean"
)


def list_parquet_files(path: str) -> list[str]:
    """Data files under ``path`` (non-recursive, skips _SUCCESS etc.)."""
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )


def _footer_stats(file_df: DataFrame, cols: list[str]) -> DataFrame:
    """mapInPandas footer scan over a one-column (file) frame —
    metadata only, no data pages; executor-side via pyarrow."""
    import pandas as pd

    want = list(cols)

    def read_footers(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for f in pdf["file"]:
                meta = pq.ParquetFile(f).metadata
                idx = {
                    meta.schema.column(i).path: i
                    for i in range(meta.num_columns)
                }
                for c in want:
                    if c not in idx:
                        continue
                    mn = mx = None
                    nulls = False
                    for g in range(meta.num_row_groups):
                        st = meta.row_group(g).column(idx[c]).statistics
                        if st is None or st.min is None:
                            nulls = True
                            continue
                        vmin, vmax = float(st.min), float(st.max)
                        mn = vmin if mn is None else min(mn, vmin)
                        mx = vmax if mx is None else max(mx, vmax)
                        if st.null_count:
                            nulls = True
                    out.append(
                        (f, c, meta.num_rows, mn, mx, nulls)
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "file", "col", "n_rows", "vmin", "vmax", "has_nulls"
                ],
            )

    return file_df.mapInPandas(read_footers, schema=_MANIFEST_SCHEMA)


def build_stats_manifest(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """One manifest row per (file, column): min/max over the file's row
    groups (numeric columns), row count, and null presence. Footer
    reads happen executor-side via mapInPandas over the parallelized
    file list — metadata only, no data pages."""
    files = list_parquet_files(path)
    if not files:
        raise ValueError(f"no parquet files under {path}")
    file_df = spark.createDataFrame(
        [(f,) for f in files], "file string"
    ).repartition(min(len(files), 64))
    return _footer_stats(file_df, cols)


def update_manifest(
    spark: SparkSession,
    manifest: DataFrame,
    path: str,
    cols: list[str],
) -> DataFrame:
    """Incrementally maintain a manifest after appends/deletes: stats
    are built ONLY for files on disk that the manifest has not seen,
    and rows for files that vanished (compaction, retention) are
    dropped. Equivalent to a full rebuild (pinned in tests) at the
    cost of footer-reading just the delta — the property that makes a
    manifest viable on a table receiving thousands of appends a day."""
    on_disk = set(list_parquet_files(path))
    known = {r["file"] for r in manifest.select("file").distinct().collect()}
    new_files = sorted(on_disk - known)
    if on_disk:
        disk_df = spark.createDataFrame([(f,) for f in sorted(on_disk)], "file string")
        kept = manifest.join(disk_df, "file", "left_semi")
    else:
        kept = manifest.where(F.lit(False))
    if not new_files:
        return kept
    fresh = build_stats_manifest_for_files(spark, new_files, cols)
    return kept.unionByName(fresh)


def build_stats_manifest_for_files(
    spark: SparkSession, files: list[str], cols: list[str]
) -> DataFrame:
    """build_stats_manifest over an explicit file list (the
    incremental-update entry point)."""
    if not files:
        raise ValueError("empty file list")
    tmp = spark.createDataFrame([(f,) for f in files], "file string")
    return _footer_stats(tmp.repartition(min(len(files), 64)), cols)


def prune_files(
    manifest: DataFrame, predicates: dict[str, tuple[float, float]]
) -> list[str]:
    """Files that might contain rows matching ALL [lo, hi] range
    predicates: a file survives unless some predicate column's stats
    EXCLUDE the range (stats-missing columns keep the file — skipping
    is only ever an optimization). The collect is file PATHS after
    pruning — the same driver-side list any format's scan planner
    materializes."""
    if not predicates:
        return [r["file"] for r in manifest.select("file").distinct().collect()]
    excluded = None
    for c, (lo, hi) in predicates.items():
        miss = (
            (F.col("col") == c)
            & F.col("vmin").isNotNull()
            & ~F.col("has_nulls")
            & ((F.col("vmax") < F.lit(lo)) | (F.col("vmin") > F.lit(hi)))
        )
        excluded = miss if excluded is None else (excluded | miss)
    bad = manifest.where(excluded).select("file").distinct()
    keep = (
        manifest.select("file")
        .distinct()
        .join(bad, "file", "left_anti")
        .collect()
    )
    return sorted(r["file"] for r in keep)


def pruned_scan(
    spark: SparkSession,
    manifest: DataFrame,
    predicates: dict[str, tuple[float, float]],
) -> DataFrame:
    """Scan only the files the manifest cannot rule out, then re-apply
    the exact predicate — identical results to the full scan, touching
    a subset of files. Returns an empty-but-typed frame when every
    file prunes away is not needed here: at least one file always
    survives a consistent predicate, and callers with impossible
    predicates get the correctly-empty result from the re-applied
    filter."""
    files = prune_files(manifest, predicates)
    if not files:
        raise ValueError("every file pruned away — check the predicates")
    df = spark.read.parquet(*files)
    for c, (lo, hi) in predicates.items():
        df = df.where((F.col(c) >= lo) & (F.col(c) <= hi))
    return df
