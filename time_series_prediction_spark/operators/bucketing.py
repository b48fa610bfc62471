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

Tables are written as EXTERNAL tables under a per-process temp dir
keyed by the source's (path, size, mtime) identity and the bucketing
parameters — a regenerated fixture or changed spec rebuilds, and
concurrent processes never race on a shared path (unlike a shared
warehouse dir, where two writers could interleave files).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import threading
import time

from pyspark.sql import DataFrame, SparkSession

from time_series_prediction_spark.sources.io import read_table

# (session, src ident, spec) -> registered table name; the external
# dir is immutable once written, so within a process the catalog
# entry is reused rather than rewritten
_TABLE_CACHE: dict[tuple[str, str], str] = {}

# layout builds may be submitted from concurrent threads (the
# bootstrap intentionally parallelizes independent tables); serialize
# per table name so two callers never interleave a check+rmtree+write
_LOCKS_GUARD = threading.Lock()
_BUILD_LOCKS: dict[str, threading.Lock] = {}

# per-process dirs from finished runs are dead the moment their
# process exits; anything idle past the grace window is reclaimable
# (same policy as the layout cache GC)
_GC_MIN_AGE_S = 3600.0


def _build_lock(name: str) -> threading.Lock:
    with _LOCKS_GUARD:
        return _BUILD_LOCKS.setdefault(name, threading.Lock())


def _gc_stale_bucket_dirs(root: str, keep: str) -> None:
    """Best-effort reclaim of other processes' abandoned bucket dirs
    (each process writes under unique pid-suffixed names, so stale
    dirs accumulate otherwise). Only dirs untouched for the grace
    window are removed — a live writer's dir always has fresh mtimes."""
    try:
        entries = os.listdir(root)
    except OSError:
        return
    now = time.time()
    for entry in entries:
        path = os.path.join(root, entry)
        if path == keep:
            continue
        try:
            if now - os.stat(path).st_mtime > _GC_MIN_AGE_S:
                shutil.rmtree(path, ignore_errors=True)
        except OSError:
            continue


def _src_ident(sf_dir: str, table: str) -> str:
    path = os.path.join(sf_dir, f"{table}.parquet")
    st = os.stat(path)
    return f"{os.path.realpath(path)}|{st.st_size}|{st.st_mtime_ns}"


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

    Idempotent per (process, source identity, spec): the one-time
    write is the shuffle every later join on ``bucket_col`` skips.
    """
    spec = f"{table}|{bucket_col}|{n_buckets}|{','.join(columns or [])}"
    key = hashlib.md5(f"{_src_ident(sf_dir, table)}|{spec}".encode()).hexdigest()[:16]
    name = f"tsp_bkt_{table}_{key}_{os.getpid()}"
    with _build_lock(name):
        cache_key = (spark.sparkContext.applicationId, name)
        if cache_key in _TABLE_CACHE and spark.catalog.tableExists(name):
            return name

        root = os.path.join(tempfile.gettempdir(), "tsp_buckets")
        loc = os.path.join(root, name)
        _gc_stale_bucket_dirs(root, keep=loc)
        if os.path.exists(loc):  # crashed prior attempt in THIS process
            shutil.rmtree(loc, ignore_errors=True)
        df = read_table(spark, sf_dir, table)
        if columns:
            df = df.select(*columns)
        (
            df.repartition(n_buckets, bucket_col)
            .write.mode("overwrite")
            .bucketBy(n_buckets, bucket_col)
            .sortBy(bucket_col)
            .option("path", loc)
            .format("parquet")
            .saveAsTable(name)
        )
        _TABLE_CACHE[cache_key] = name
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
