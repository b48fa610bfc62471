#!/usr/bin/env python3
"""Core-scaling probe (r15, VERDICT r14 Next #2).

The sf0.1 fixtures are single-row-group single-file tables, so every
scan-side stage is 1-3 tasks BY LAYOUT and the 8-core vs 32-core
bench totals sit within 1% of each other — the driver's
``suspect_cpus_ignored`` heuristic fires spuriously every round even
though the env-var contract is honored. This probe derives a
multi-file, key-shifted 10x copy of the sf0.1 fixtures under /tmp
(probe-only artifact — the bench and the oracle never see it) and
times a representative query set at LOW and HIGH core counts in
separate processes (``master=local[N]`` is fixed per JVM), so
low/high ratios measure parallel work, not fixed overhead.

Key shifting (replica i adds i*10^9 to every join key) keeps join
fan-out LINEAR in the replication factor — naive row duplication
would square the per-key join output and corrupt the measurement.
region/nation stay unreplicated (dims shared by every replica; join
output still scales linearly).

Usage:
    python scripts/core_scaling_probe.py [--low=8] [--high=32] \
        [--reps=3] [q1,q9,...]
Prints one line per query plus a JSON tail; the committed artifact is
SCALING_r15_cores.log.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SRC_SF = "/root/testdata/sf0.1"
REPLICAS = 40
N_FILES = 64
SHIFT = 10**9

# (table, [key columns to shift per replica])
TABLES = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "nation": [],  # shared dims: copied once, unshifted
    "region": [],
}

# queries with linear join fan-out under key-shifted replication and
# no fixture-cardinality asserts; all read exclusively via
# read_table(sf_dir), so pointing sf_dir at the derived dir suffices
# CPU-bound shapes separate core counts; pure scan/agg shapes on a
# page-cached single box are memory-bandwidth-bound (8 cores already
# saturate the channel — a real finding about the floor, noted in the
# log, not a harness flaw)
DEFAULT = [
    "lineitem_correlation_matrix",   # per-row integer/limb arithmetic
    "events_json_props",             # 4M JSON parses
    "ts_backtest_linear",            # per-series rolling OLS
    "ts_seasonality_detect",         # per-(user,period) ANOVA
    "embedding_cosine_topk",         # NumPy panel pass over vectors
    "q9_profit_by_nation_year",      # multi-join + agg
    "q18_large_volume_customers",    # big-side SMJ + having
    "events_sessionization",         # window gap sessionize
    "features_pit_training_join",    # agg + window + as-of union
    "q1_pricing_summary",            # scan+agg (bandwidth control)
]


def build_derived(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from time_series_prediction_spark.sources.io import read_table

    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, "_READY")
    if os.path.exists(marker):
        return
    for t, keys in TABLES.items():
        df = read_table(spark, SRC_SF, t)
        if keys:
            rep = df.crossJoin(
                spark.range(REPLICAS).toDF("_rep")
            )
            for k in keys:
                rep = rep.withColumn(
                    k, F.col(k) + F.col("_rep") * F.lit(SHIFT)
                )
            out = rep.drop("_rep").repartition(N_FILES)
        else:
            out = df
        out.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{t}.parquet")
        )
    Path(marker).write_text("ok")


def run_one_process(cpus: int, names: list[str], out_dir: str,
                    reps: int) -> dict[str, float]:
    """Child-process entry: time each query at local[cpus]."""
    import __spark_entry__ as entrymod

    from time_series_prediction_spark.session import get_spark
    from time_series_prediction_spark.session_memo import (
        clear_session_memos,
    )

    spark = get_spark(
        app_name=f"core-scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 4),
        # probe-local sizing (bench/oracle sessions untouched):
        # - 16g heap: a 1 GiB default made 32 concurrent tasks
        #   spill/GC-bound (measured: 32c SLOWER than 8c);
        # - scan-split floor + 8m advisory shuffle size: the 40x
        #   fixture is still only ~0.1-1 GB per table, so the default
        #   128 MB splits / 64 MB AQE advisory coalesce every stage
        #   to a handful of tasks at BOTH core counts and the ratio
        #   measures nothing. Per-core split sizing mirrors what the
        #   same data volume per core looks like on a real cluster.
        extra_conf={
            "spark.driver.memory": "16g",
            "spark.sql.files.minPartitionNum": str(2 * cpus),
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    build_derived(spark, out_dir)
    qs = entrymod.queries()
    out: dict[str, float] = {}
    for n in names:
        qs[n](spark, out_dir).count()  # warm: plan, codegen, listing
        best = None
        for _ in range(reps):
            clear_session_memos(spark)
            t0 = time.perf_counter()
            qs[n](spark, out_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[n] = round(best, 3)
    spark.stop()
    return out


def main() -> int:
    low, high, reps = 8, 32, 3
    names = list(DEFAULT)
    for a in sys.argv[1:]:
        if a.startswith("--low="):
            low = int(a.split("=", 1)[1])
        elif a.startswith("--high="):
            high = int(a.split("=", 1)[1])
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a == "--child":
            pass
        elif not a.startswith("--"):
            names = a.split(",")

    out_dir = f"/tmp/tsp_scaleprobe_x{REPLICAS}_sf0.1"
    if os.environ.get("TSP_PROBE_CHILD"):
        cpus = int(os.environ["TSP_PROBE_CHILD"])
        if cpus == 0:  # build-only child: keeps GC/page-cache churn
            from time_series_prediction_spark.session import get_spark

            spark = get_spark(
                app_name="core-scaling-build", master="local[*]",
                extra_conf={"spark.driver.memory": "16g"},
            )
            spark.sparkContext.setLogLevel("ERROR")
            build_derived(spark, out_dir)
            spark.stop()
            print("{}")
            return 0
        print(json.dumps(run_one_process(cpus, names, out_dir, reps)))
        return 0

    results: dict[int, dict] = {}
    # build child first (keeps its GC/page-cache churn out of the
    # timed children), then TWO interleaved rounds per core count —
    # per-query MIN across rounds — so ambient drift cannot charge
    # one core count systematically
    for cpus in (0, low, high, low, high):
        env = dict(os.environ, TSP_PROBE_CHILD=str(cpus))
        p = subprocess.run(
            [sys.executable, __file__, ",".join(names),
             f"--reps={reps}"],
            env=env, capture_output=True, text=True,
        )
        line = p.stdout.strip().splitlines()[-1]
        if cpus:
            got = json.loads(line)
            prev = results.get(cpus)
            results[cpus] = (
                got if prev is None
                else {n: min(prev[n], got[n]) for n in got}
            )

    print(f"{'query':34s} {f'{low}c':>8s} {f'{high}c':>8s} {'ratio':>7s}")
    ratios = {}
    for n in names:
        lo, hi = results[low][n], results[high][n]
        r = round(lo / hi, 2) if hi > 0 else float("nan")
        ratios[n] = r
        print(f"{n:34s} {lo:8.3f} {hi:8.3f} {r:7.2f}")
    n_scaling = sum(1 for r in ratios.values() if r >= 2.0)
    print(f"queries with ratio >= 2.0: {n_scaling}/{len(names)}")
    print(json.dumps({
        "cpus_low": low, "cpus_high": high,
        "replicas": REPLICAS, "n_files": N_FILES,
        "low": results[low], "high": results[high],
        "ratio_low_over_high": ratios,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
