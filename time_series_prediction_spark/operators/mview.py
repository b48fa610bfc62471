"""Disk-backed materialized views with source-fingerprint
invalidation — the layout-cache protocol the engine's own fixtures
run on (content identity → build lock → atomic publish), generalized
into a user-facing operator.

``refresh_if_stale(spark, name, build, sources)`` returns the
materialized DataFrame, rebuilding ONLY when any source's
(path, size, mtime) fingerprint changed since the last publish:

* **identity** — the concatenated qualified-path|size|mtime of every
  source plus the caller's ``version`` tag; any drift produces a new
  cache key, so readers never see a stale view and never pay a
  rebuild for an unchanged one;
* **build lock** — one in-process builder per target (concurrent
  sessions race benignly: both build, one publishes, the loser
  discards — the same discipline as every plans/ layout);
* **atomic publish** — the view becomes visible via one rename;
  a crashed build leaves only an orphaned build dir (reclaimed by
  the next builder), never a half-written view.

At 100 TB this is the "gold table refresh" primitive: the check is
pure metadata (one status call per source), the rebuild is whatever
the build function costs, and stale generations are deleted AFTER the
new publish so concurrent readers finish their scans (same grace
rationale as vacuum).

No counterpart in the reference repo (it rebuilds every table every
run — reference ``src/demo/training.py:70-90``); this is the
incremental-freshness layer above it.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import threading
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from time_series_prediction_spark.sources.fsops import fs_for

_LOCKS_GUARD = threading.Lock()
_LOCKS: dict[str, threading.Lock] = {}


def _lock(key: str) -> threading.Lock:
    with _LOCKS_GUARD:
        return _LOCKS.setdefault(key, threading.Lock())


def view_root(base: str | None = None) -> str:
    return base or os.path.join(tempfile.gettempdir(), "tsp_mviews")


def source_fingerprint(spark: SparkSession, sources: list[str]) -> str:
    """Concatenated (qualified path, size, mtime) of every source —
    the staleness identity. Missing sources raise: a view over
    nothing is a caller bug, not an empty fingerprint."""
    fs = fs_for(spark, sources[0])
    parts = []
    for s in sources:
        st = fs.status(s)
        if st is None:
            raise FileNotFoundError(s)
        parts.append(f"{fs.qualified(s)}|{st[0]}|{st[1]}")
    return ";".join(parts)


def refresh_if_stale(
    spark: SparkSession,
    name: str,
    build: Callable[[SparkSession], DataFrame],
    sources: list[str],
    base: str | None = None,
    version: str = "v1",
) -> tuple[DataFrame, bool]:
    """Return ``(view_df, rebuilt)`` — the materialized view over
    ``sources``, rebuilt only if their fingerprint drifted (or the
    caller bumped ``version`` after changing the build logic)."""
    root = view_root(base)
    fs = fs_for(spark, root)
    fs.mkdirs(root)
    ident = f"{version}|{source_fingerprint(spark, sources)}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    target = os.path.join(root, f"{name}_{key}")
    rebuilt = False
    with _lock(target):
        if not fs.exists(os.path.join(target, "_IDENT")):
            tmp = f"{target}.build-{os.getpid()}"
            fs.delete(tmp)
            build(spark).write.mode("overwrite").parquet(
                os.path.join(tmp, "data")
            )
            fs.write_text(os.path.join(tmp, "_IDENT"), ident)
            if not fs.publish_dir(tmp, target):
                fs.delete(tmp)  # concurrent winner published first
            rebuilt = True
            # stale generations of THIS view (older fingerprints) are
            # reclaimed after the new publish — readers mid-scan on
            # the old generation finish; the next call won't find it
            prefix = f"{name}_"
            for entry in fs.list_names(root):
                suffix = entry[len(prefix):]
                if (
                    entry.startswith(prefix)
                    and suffix != key
                    # exactly this view's generations — a 16-hex key
                    # suffix — never another view sharing the prefix
                    and len(suffix) == 16
                    and all(c in "0123456789abcdef" for c in suffix)
                    and fs.exists(os.path.join(root, entry, "_IDENT"))
                ):
                    fs.delete(os.path.join(root, entry))
    return spark.read.parquet(os.path.join(target, "data")), rebuilt
