#!/usr/bin/env python3
"""Benchmark: run the engine's headline queries and print ONE JSON line.

  {"metric": "total_query_seconds", "value": N, "unit": "sec",
   "queries": {...slowest 10...}, "n_queries": N,
   "warmup_seconds": N, "sf": 0.1,
   "control_observed": {...}, "control_band": {...}}

The printed line is kept compact (slowest-10 + controls) so it
survives line-capture buffers; the FULL per-query dict — including
the cold (warm-up pass) times and every timed pass — is written to
bench_times.json beside this script.

FOUR passes (r13 VERDICT Next #4 — noise-proofing). Pass 1 runs every
registry query once, UNTIMED in the headline: derived artifacts
(materialized views, CoW fixtures, streamed layouts under
/tmp/tsp_layouts) build on first touch, and charging those one-time
builds to query lines is how BENCH_r11 came to carry ~17 s of phantom
regression after a container restart cleared the cache
(part_basket_pagerank 7.45 s cold vs 0.26 s warm, same tree). The
warm-up also covers JVM codegen, file-listing, and Python-worker
spin-up; its total is ``warmup_seconds`` and its per-query times are
``cold_queries`` in the sidecar — build cost is visible, never
charged to a query line. Passes 2-4 are the measurement: each query
is timed THREE times and the headline records the per-query MEDIAN,
so a single ambient-load spike (the r12/r13 adjudication problem —
two consecutive rounds of driver numbers needed control-based
correction) cannot distort a query line. Session memos (CC
assignments, trained quantizers, layout manifests) and persisted
localCheckpoint blocks are reset before EVERY timed pass so each
measures the same first-touch compute.

AMBIENT-LOAD CONTROLS (r13 VERDICT Next #7 — two, uncorrelated, so
"the machine was loaded" separates from "a control's own code
regressed"; both bands measured across the r12-r14 quiet runs at
sf0.1 and emitted in the artifact itself):

* ``q20_dominant_part_suppliers`` — plain TPC-H join/agg, no
  artifact/memo dependence. Quiet band 1.5-2.0 s at sf0.1.
* ``ts_daily_series`` — pure scan + window over events, no joins.
  Quiet band 0.25-0.45 s at sf0.1.

A run whose controls BOTH sit above band is ambient-loaded: judge the
per-query numbers against the controls, not the wall clock.
(``dedup_clusters`` was the control through r12; its code changed in
r13 when the dedup family's pair pipeline moved to a shared on-disk
artifact, so it no longer qualifies.)

Data dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1);
cores from $SPARK_GRAFT_CPUS (default 32). Each query is executed to
completion with a count() action (forces the full plan incl. joins,
windows, and array math; result sets are small aggregates so count()
is not a shortcut).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from time_series_prediction_spark.session import get_spark  # noqa: E402

_TIMED_PASSES = 3
# quiet bands at sf0.1 (seconds) — see module docstring
_CONTROL_BANDS = {
    "q20_dominant_part_suppliers": [1.5, 2.0],
    "ts_daily_series": [0.25, 0.45],
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(Path(sf_dir).name.replace("sf", ""))
    except ValueError:
        sf = -1.0

    spark = get_spark(
        app_name="tsps-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus), 4) if cpus.isdigit() else 32,
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()

    # Pass 1 — warm-up (see module docstring): every query once, cold
    # times recorded for the sidecar but never charged to the headline.
    cold: dict[str, float] = {}
    for name in sorted(queries):
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).count()
        cold[name] = round(time.perf_counter() - t0, 3)
    warmup_total = round(sum(cold.values()), 3)

    from time_series_prediction_spark.session_memo import (
        clear_session_memos,
    )

    # Passes 2..4 — the measurement. Memos reset before each pass so
    # every pass measures identical first-touch compute; only the
    # JVM/codegen/file cache and on-disk derived artifacts stay warm,
    # which is exactly the intent.
    passes: list[dict[str, float]] = []
    for _ in range(_TIMED_PASSES):
        clear_session_memos(spark)
        times: dict[str, float] = {}
        for name in sorted(queries):
            fn = queries[name]
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            times[name] = round(time.perf_counter() - t0, 3)
        passes.append(times)

    med = {
        name: round(statistics.median(p[name] for p in passes), 3)
        for name in sorted(queries)
    }
    total = round(sum(med.values()), 3)
    control_observed = {
        c: med[c] for c in _CONTROL_BANDS if c in med
    }
    full = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": med,
        "n_queries": len(med),
        "timed_passes": _TIMED_PASSES,
        "pass_times": passes,
        "warmup_seconds": warmup_total,
        "cold_queries": cold,
        "control_observed": control_observed,
        "control_band": _CONTROL_BANDS,
        "control_band_sf": 0.1,  # bands measured at sf0.1, quiet
        "sf": sf,
    }
    side = Path(__file__).resolve().parent / "bench_times.json"
    side.write_text(json.dumps(full, indent=1) + "\n")
    slowest = dict(sorted(med.items(), key=lambda kv: -kv[1])[:10])
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": slowest,
                "n_queries": len(med),
                "timed_passes": _TIMED_PASSES,
                "warmup_seconds": warmup_total,
                "control_observed": control_observed,
                "control_band": _CONTROL_BANDS,
                "control_band_sf": 0.1,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
