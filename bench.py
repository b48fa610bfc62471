#!/usr/bin/env python3
"""Benchmark: run the engine's headline queries and print ONE JSON line.

  {"metric": "total_query_seconds", "value": N, "unit": "sec",
   "queries": {...slowest 10...}, "n_queries": N,
   "warmup_seconds": N, "sf": 0.1}

The printed line is kept compact (slowest-10 only) so it survives
line-capture buffers; the FULL per-query dict — including the cold
(warm-up pass) times — is written to bench_times.json beside this
script.

Two passes. The first pass runs every registry query once, UNTIMED in
the headline: derived artifacts (materialized views, CoW fixtures,
streamed layouts under /tmp/tsp_layouts) build on first touch, and
charging those one-time builds to query lines is how BENCH_r11 came
to carry ~17 s of phantom regression after a container restart
cleared the cache (part_basket_pagerank 7.45 s cold vs 0.26 s warm,
same tree). The warm-up pass also covers JVM codegen, file-listing,
and Python-worker spin-up. Its total is reported as
``warmup_seconds`` and its per-query times as ``cold_queries`` in the
sidecar — build cost is visible, just never charged to a query line.
The second pass is the measurement: steady-state per-query seconds.

Data dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1);
cores from $SPARK_GRAFT_CPUS (default 32). Each query is executed to
completion with a count() action (forces the full plan incl. joins,
windows, and array math; result sets are small aggregates so count()
is not a shortcut).

AMBIENT-LOAD CONTROL: ``q20_dominant_part_suppliers`` — a plain
TPC-H join/agg with no artifact/memo dependence, ~1.5-2.0 s quiet at
sf0.1. Compare a suspect regression against this line first.
(``dedup_clusters`` was the control through r12; its code changed in
r13 when the dedup family's pair pipeline moved to a shared on-disk
artifact, so it no longer qualifies.)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from time_series_prediction_spark.session import get_spark  # noqa: E402


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

    # Pass boundary: the warm pass leaves in-session memos (the CC
    # assignment, trained quantizers, layout manifests) and persisted
    # localCheckpoint blocks behind. The timed pass must measure
    # FIRST-TOUCH compute — what every earlier round's single-pass
    # bench measured — so reset them all; only the JVM/codegen/file
    # cache and on-disk derived artifacts stay warm, which is exactly
    # the intent.
    from time_series_prediction_spark.session_memo import (
        clear_session_memos,
    )

    clear_session_memos(spark)

    # Pass 2 — the measurement.
    times: dict[str, float] = {}
    for name in sorted(queries):
        fn = queries[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    full = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "n_queries": len(times),
        "warmup_seconds": warmup_total,
        "cold_queries": cold,
        "sf": sf,
    }
    side = Path(__file__).resolve().parent / "bench_times.json"
    side.write_text(json.dumps(full, indent=1) + "\n")
    slowest = dict(sorted(times.items(), key=lambda kv: -kv[1])[:10])
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": slowest,
                "n_queries": len(times),
                "warmup_seconds": warmup_total,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
