"""Hive-style bucketed table layout: shuffle-free co-located joins.

The reference joins its inter-stage tables with whatever physical
strategy the engine picks per query (`/root/reference/src/demo/
training.py:70-90` rebuilds the join from scratch each run). At 100 TB
the dominant cost of a fact-fact join (lineitem ⋈ orders, events ⋈
users) is the shuffle of BOTH sides on the join key — paid on every
query. Bucketing pays that shuffle ONCE at write time: each side is
hash-clustered into the same number of buckets on its join key, the
scan then reports ``HashPartitioning(key, n)`` and sort order, and a
sort-merge join runs with ZERO exchanges and ZERO sorts. This is the
standard warehouse layout lever (Spark `bucketBy`, Hive bucketed
tables, Iceberg bucket partition transforms).

Write discipline: the frame is ``repartition(n, key)``-ed before
``bucketBy(n, key)`` so each task holds exactly one bucket's rows
(Spark's repartition and bucketBy share the murmur3 ``pmod`` bucket
function) — yielding ONE file per bucket. That matters twice: it
avoids the tasks×buckets small-file explosion, and Spark only reports
the per-bucket sort order (eliding the SMJ sorts) when every bucket
has a single file.

The layout is a CROSS-PROCESS content-keyed cache (the same protocol
as the z-order layout cache): the dir name hashes the source's
(path, size, mtime) identity plus the bucketing spec, a build lands
in a pid-suffixed temp dir and publishes via one atomic rename
(losers of a publish race discard their build), and later processes
re-register the existing files with ``CREATE TABLE … CLUSTERED BY …
LOCATION`` DDL — the bucket metadata lives in the catalog entry, the
bytes are written once per fixture content. This is exactly how a
production warehouse treats bucketed tables: layout amortized across
every job that joins on the key.

All filesystem touches go through the Hadoop FileSystem API
(``sources/fsops.py``) so the cache works on ``file:`` URIs and HDFS
alike; see fsops' module doc for the S3 no-atomic-rename caveat.
"""

from __future__ import annotations

import hashlib
import os
import re
import tempfile
import threading
import time

from pyspark.sql import DataFrame, SparkSession

from time_series_prediction_spark.sources.fsops import Fs, fs_for
from time_series_prediction_spark.sources.io import read_table

# builds may be submitted from concurrent threads (the bootstrap
# intentionally parallelizes independent tables); serialize per table
# name so two callers never interleave a check+build+register
_LOCKS_GUARD = threading.Lock()
_BUILD_LOCKS: dict[str, threading.Lock] = {}

# grace window protecting another process's IN-FLIGHT `.build-` dir;
# published dirs are the shared cache and are never GC'd here
_GC_MIN_AGE_S = 3600.0


# NOTE: bucketed layouts keep their own build protocol rather than
# operators/mview.ensure_artifact: the artifact is a CATALOG TABLE
# (saveAsTable + DDL re-registration) with a one-file-per-bucket
# invariant re-checked on every entry — catalog state cannot be
# staged into a tmp dir and renamed. The on-disk race discipline
# (pid-keyed tmp + atomic publish_dir) is the same.
def _build_lock(name: str) -> threading.Lock:
    with _LOCKS_GUARD:
        return _BUILD_LOCKS.setdefault(name, threading.Lock())


def _gc_stale_build_dirs(fs: Fs, root: str) -> None:
    """Reclaim ABANDONED build temp dirs (crashed writers) past the
    grace window. Published layout dirs are left alone — they are the
    cross-process cache other sessions are actively reading."""
    now_ms = time.time() * 1000.0
    for entry in fs.list_names(root):
        if ".build-" not in entry:
            continue
        path = os.path.join(root, entry)
        st = fs.status(path)
        if st is not None and now_ms - st[1] > _GC_MIN_AGE_S * 1000.0:
            fs.delete(path)


def _src_ident(fs: Fs, sf_dir: str, table: str) -> str:
    path = os.path.join(sf_dir, f"{table}.parquet")
    st = fs.status(path)
    if st is None:
        raise FileNotFoundError(path)
    return f"{fs.qualified(path)}|{st[0]}|{st[1]}"


# Spark bucketed file names carry the bucket id as the `_NNNNN`
# suffix before the codec extension: part-00000-<uuid>_00003.c000...
_BUCKET_ID_RE = re.compile(r"_(\d{5})\.")


def _one_file_per_bucket(fs: Fs, loc: str, n_buckets: int) -> bool:
    """Safety precondition for the session-wide
    ``legacy.bucketedTableScan.outputOrdering`` flag (session.py):
    per-bucket sort order only holds when each bucket is a SINGLE
    file (multi-file buckets are concatenated, not merged, so the
    elided SMJ sorts would silently produce wrong joins). Verified
    cheaply from the published dir's file names before every DDL
    re-registration rather than assumed from write discipline."""
    entries = fs.list_names(loc)
    if not entries:
        return False
    seen: set[str] = set()
    for entry in entries:
        if not entry.endswith(".parquet"):
            continue
        m = _BUCKET_ID_RE.search(entry)
        if m is None or m.group(1) in seen:
            return False
        seen.add(m.group(1))
    return 0 < len(seen) <= n_buckets


def _register_existing(
    spark: SparkSession,
    name: str,
    loc: str,
    df: DataFrame,
    bucket_col: str,
    n_buckets: int,
) -> None:
    """Catalog entry over an already-published bucketed dir: the DDL
    declares the bucketing/sort spec so scans read the layout
    co-located and pre-sorted without rewriting a byte."""
    cols = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {name} ({cols}) USING parquet "
        f"CLUSTERED BY ({bucket_col}) SORTED BY ({bucket_col}) "
        f"INTO {n_buckets} BUCKETS LOCATION '{loc}'"
    )


def ensure_bucketed(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    bucket_col: str,
    n_buckets: int,
    columns: list[str] | None = None,
) -> str:
    """Materialize ``table`` bucketed+sorted by ``bucket_col`` into
    ``n_buckets`` and register it; returns the catalog table name.

    Idempotent per (source identity, spec) ACROSS processes: the
    first caller anywhere pays the one-time shuffle; everyone else
    (including later bench/validate runs) re-registers the published
    files via DDL in milliseconds.
    """
    root = os.path.join(tempfile.gettempdir(), "tsp_buckets")
    fs = fs_for(spark, root)
    spec = f"{table}|{bucket_col}|{n_buckets}|{','.join(columns or [])}"
    key = hashlib.md5(
        f"{_src_ident(fs, sf_dir, table)}|{spec}".encode()
    ).hexdigest()[:16]
    name = f"tsp_bkt_{table}_{key}"
    with _build_lock(name):
        if spark.catalog.tableExists(name):
            return name
        df = read_table(spark, sf_dir, table)
        if columns:
            df = df.select(*columns)

        loc = os.path.join(root, name)
        _gc_stale_build_dirs(fs, root)
        if fs.exists(
            os.path.join(loc, "_SUCCESS")
        ) and not _one_file_per_bucket(fs, loc, n_buckets):
            # published dir violates the one-file-per-bucket invariant
            # (partial publish or a foreign writer config): rebuild
            # instead of registering a layout that would break the
            # sort-elision safety precondition
            fs.delete(loc)
        if not fs.exists(os.path.join(loc, "_SUCCESS")):
            tmp = f"{loc}.build-{os.getpid()}"
            tmp_name = f"{name}_build_{os.getpid()}"
            fs.delete(tmp)
            (
                df.repartition(n_buckets, bucket_col)
                .write.mode("overwrite")
                .bucketBy(n_buckets, bucket_col)
                .sortBy(bucket_col)
                .option("path", tmp)
                .format("parquet")
                .saveAsTable(tmp_name)
            )
            spark.sql(f"DROP TABLE {tmp_name}")  # files stay; re-point below
            if not fs.publish_dir(tmp, loc):
                # lost the publish race to another process's identical
                # build — verify theirs is complete, then discard ours
                if fs.exists(os.path.join(loc, "_SUCCESS")):
                    fs.delete(tmp)
                else:
                    raise RuntimeError(
                        f"publish of {tmp} to {loc} failed with no "
                        f"complete winner present"
                    )
        if not _one_file_per_bucket(fs, loc, n_buckets):
            raise RuntimeError(
                f"bucketed layout {loc} does not have one file per "
                f"bucket; refusing to register it (sort elision would "
                f"be unsound)"
            )
        _register_existing(spark, name, loc, df, bucket_col, n_buckets)
        return name


def bucketed_join(
    spark: SparkSession, left: str, right: str, left_key: str, right_key: str
) -> DataFrame:
    """Co-located equi-join of two same-bucket-count tables.

    ``hint("merge")`` pins sort-merge so the plan demonstrates the
    exchange-free + sort-free bucketed path even at fixture sizes
    where AQE would otherwise broadcast the small side (at 100 TB
    neither side is broadcastable — SMJ is the strategy of record,
    and bucketing removes both its shuffles and its sorts).
    """
    ldf = spark.table(left).hint("merge")
    rdf = spark.table(right)
    return ldf.join(rdf, ldf[left_key] == rdf[right_key])
