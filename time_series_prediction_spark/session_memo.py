"""Session-scoped derived-state memos, centrally registered.

Several plans memoize expensive derived state per (applicationId,
input) — the connected-components assignment, trained IVF/PQ/LSH
quantizers, layout manifests, corpus sizing counts. Reuse within a
session is the intended production behavior (deterministic state,
observationally identical to recompute). The one consumer that must
be able to UNDO it is ``bench.py``: its second (timed) pass has to
measure first-touch compute — the same thing every earlier round's
single-pass bench measured — not memo reads, so it resets every
registered memo (and Spark's persisted blocks) at the pass boundary.
"""

from __future__ import annotations

_REGISTRY: list[dict] = []


def session_memo(d: dict) -> dict:
    """Register a module-level memo dict for bench-boundary resets."""
    _REGISTRY.append(d)
    return d


def clear_session_memos(spark=None) -> int:
    """Clear every registered memo; with ``spark``, also drop cached
    tables and unpersist every persisted/localCheckpoint'd RDD so the
    next action recomputes from source. Returns the number of memo
    entries dropped."""
    n = sum(len(d) for d in _REGISTRY)
    for d in _REGISTRY:
        d.clear()
    if spark is not None:
        spark.catalog.clearCache()
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rdd in list(jmap.values()):
            rdd.unpersist()
    return n
