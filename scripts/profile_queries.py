#!/usr/bin/env python3
"""Per-query optimization profiler (guide §1: measure first).

For each named registry query: build the DataFrame (construction =
driver/plan-build cost), execute with the SAME action the bench uses
(count()), report wall seconds + how many Spark jobs the query
launched (extra jobs = hidden collects / eager materializations), and
optionally dump .explain('formatted') to plans/r14/<name>_<tag>.txt.

Usage:
  python scripts/profile_queries.py [sf_dir] --only=a,b --tag=before \
      [--reps=3] [--explain]

Runs every query once untouched (warm-up: JVM, codegen, derived
artifacts) before the timed reps; session memos are cleared before
each timed rep, mirroring bench.py's first-touch discipline.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    sf_dir = "/root/testdata/sf0.1"
    only: list[str] = []
    tag = None
    reps = 3
    do_explain = False
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")
        elif a.startswith("--tag="):
            tag = a.split("=", 1)[1]
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a == "--explain":
            do_explain = True
        elif not a.startswith("--"):
            sf_dir = a

    import __spark_entry__ as entrymod
    from time_series_prediction_spark.session import get_spark
    from time_series_prediction_spark.session_memo import clear_session_memos

    spark = get_spark(app_name="profile-queries", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    qs = entrymod.queries()
    names = only if only else sorted(qs)

    plans_dir = Path(__file__).resolve().parents[1] / "plans" / "r14"
    plans_dir.mkdir(parents=True, exist_ok=True)

    # warm-up: one untimed full run of each profiled query
    for name in names:
        qs[name](spark, sf_dir).count()

    print(f"{'query':45s} {'build_s':>8s} {'exec_s':>8s} {'jobs':>5s}")
    for name in names:
        best = None
        for rep in range(reps):
            clear_session_memos(spark)
            group = f"prof-{name}-{rep}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            njobs = len(sc.statusTracker().getJobIdsForGroup(group))
            sc.setJobGroup(None, None)
            row = (t1 - t0, t2 - t1, njobs)
            if best is None or row[0] + row[1] < best[0] + best[1]:
                best = row
        print(f"{name:45s} {best[0]:8.3f} {best[1]:8.3f} {best[2]:5d}",
              flush=True)
        if do_explain and tag:
            clear_session_memos(spark)
            df = qs[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            (plans_dir / f"{name}_{tag}.txt").write_text(txt)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
