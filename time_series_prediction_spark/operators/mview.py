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
import time
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


def ensure_artifact(
    spark: SparkSession,
    target: str,
    ident: str,
    build_into: Callable[[str], None],
) -> bool:
    """THE build-once cache protocol — the single implementation every
    content-keyed on-disk artifact in this engine runs on (mviews here,
    and every ``plans/`` fixture layout builder): per-target in-process
    lock → ``_IDENT`` existence check → build into a private pid-keyed
    tmp dir → ``_IDENT`` written LAST → one atomic ``publish_dir``
    rename. Concurrent processes race benignly (both build, one
    publishes, the loser discards); a crashed build leaves only an
    orphaned ``*.build-{pid}`` dir, never a half-visible artifact.
    Returns True when THIS call built (and published or lost the
    race), False on a cache hit.

    ``build_into(tmp_dir)`` materializes the artifact's contents under
    ``tmp_dir``; everything it writes becomes visible in one rename.

    Centralizing this exists so there is ONE protocol to test for
    races (see tests/test_mview.py and the subprocess race in
    tests/test_manifest.py) instead of one copy per module."""
    fs = fs_for(spark, target)
    with _lock(target):
        if fs.exists(os.path.join(target, "_IDENT")):
            _gc_crashed_builds(fs, target)
            return False
        tmp = f"{target}.build-{os.getpid()}"
        fs.delete(tmp)
        build_into(tmp)
        fs.write_text(os.path.join(tmp, "_IDENT"), ident)
        _gc_crashed_builds(fs, target, keep=tmp)
        if not fs.publish_dir(tmp, target):
            # a failed publish means a concurrent winner ONLY if the
            # target actually exists; on a genuine rename failure
            # (permissions, dead mount) silently discarding the build
            # would leave callers failing later on a missing target
            # with the real cause destroyed (round-9 ADVICE)
            if not fs.exists(os.path.join(target, "_IDENT")):
                raise RuntimeError(
                    f"publishing {tmp} -> {target} failed and no "
                    "concurrent winner exists — rename failure, "
                    "build retained for inspection"
                )
            fs.delete(tmp)  # concurrent winner published first
        return True


# build dirs from writers that crashed mid-build (an exception inside
# build_into leaves `{target}.build-{pid}` behind — pid-keyed, so the
# crashed process never reclaims it itself). Reclaimed by any LATER
# builder/reader of the same target once old enough that no live build
# attempt can own them — same rationale and horizon as the manifest
# layer's staging GC.
_CRASHED_BUILD_AGE_S = 3600.0


def _gc_crashed_builds(fs, target: str, keep: str | None = None) -> None:
    import time as _time

    parent = os.path.dirname(target)
    prefix = os.path.basename(target) + ".build-"
    now_ms = _time.time() * 1000.0
    try:
        names = fs.list_names(parent)
    except Exception:  # noqa: BLE001 — listing is best-effort GC
        return
    for name in names:
        if not name.startswith(prefix):
            continue
        p = os.path.join(parent, name)
        if keep is not None and p == keep:
            continue
        st = fs.status(p)
        if st is not None and now_ms - st[1] > _CRASHED_BUILD_AGE_S * 1000.0:
            fs.delete(p)


def source_fingerprint(spark: SparkSession, sources: list[str]) -> str:
    """Concatenated (qualified path, size, mtime) of every source —
    the staleness identity. Missing sources raise: a view over
    nothing is a caller bug, not an empty fingerprint.

    Caveats (documented, not bugs at current scope): (a) mtime
    granularity on some object stores is 1 s — a same-second in-place
    rewrite of a source with identical size is invisible to this
    fingerprint; writers that rewrite sources in place should bump
    ``version`` or write a new path (the engine's own CoW/layout
    sources always publish NEW generation dirs, so their fingerprints
    always drift). (b) the per-target ``_LOCKS`` map grows by one
    entry per distinct view name for the process lifetime — bounded
    by the registry size here; a long-lived service hosting unbounded
    view names should evict on publish."""
    parts = []
    for s in sources:
        # one handle PER source — sources may live on different
        # filesystems/schemes; statting them all through sources[0]'s
        # handle would fingerprint the wrong path
        fs = fs_for(spark, s)
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
    stale_grace_s: float = 300.0,
) -> tuple[DataFrame, bool]:
    """Return ``(view_df, rebuilt)`` — the materialized view over
    ``sources``, rebuilt only if their fingerprint drifted (or the
    caller bumped ``version`` after changing the build logic).

    ``stale_grace_s``: older generations of this view are reclaimed
    only once their publish marker is at least this old — the build
    lock is process-local, so a reader in ANOTHER process may still
    be scanning a generation it resolved before this publish;
    deleting it immediately would fail that scan mid-flight. Same
    rationale (and default horizon) as ``vacuum_layout``'s grace.
    Pass 0 for tests / known single-process deployments."""
    root = view_root(base)
    fs = fs_for(spark, root)
    fs.mkdirs(root)
    ident = f"{version}|{source_fingerprint(spark, sources)}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    target = os.path.join(root, f"{name}_{key}")

    def _build(tmp: str) -> None:
        build(spark).write.mode("overwrite").parquet(
            os.path.join(tmp, "data")
        )

    rebuilt = ensure_artifact(spark, target, ident, _build)
    if rebuilt:
        # stale generations of THIS view (older fingerprints) are
        # reclaimed after the new publish AND a grace window —
        # cross-process readers mid-scan on an old generation
        # finish; the next resolve won't find it
        prefix = f"{name}_"
        now_ms = time.time() * 1000.0
        for entry in fs.list_names(root):
            suffix = entry[len(prefix):]
            ident_p = os.path.join(root, entry, "_IDENT")
            if (
                entry.startswith(prefix)
                and suffix != key
                # exactly this view's generations — a 16-hex key
                # suffix — never another view sharing the prefix
                and len(suffix) == 16
                and all(c in "0123456789abcdef" for c in suffix)
            ):
                st = fs.status(ident_p)
                if st is not None and (
                    now_ms - st[1] >= stale_grace_s * 1000.0
                ):
                    fs.delete(os.path.join(root, entry))
    return spark.read.parquet(os.path.join(target, "data")), rebuilt
