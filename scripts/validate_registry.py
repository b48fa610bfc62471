#!/usr/bin/env python3
"""Pre-handoff gate: run EVERY __spark_entry__ registry query at a
given scale factor and compare against its DuckDB oracle (when one is
declared), mimicking the external harness: row count + column names +
order-insensitive value comparison. Prints one line per query and a
final summary; exits non-zero on any failure.

Usage: python scripts/validate_registry.py [sf_dir] [--only name1,name2]
"""

from __future__ import annotations

import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else "/root/testdata/sf0.01"
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only"):
            only = set(a.split("=", 1)[1].split(","))

    from oracle_harness import assert_matches_oracle, duck_connection

    import __spark_entry__ as entrymod
    from time_series_prediction_spark.session import get_spark

    spark = get_spark(app_name="registry-validate", master="local[16]",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connection(sf_dir)

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failed: list[str] = []
    for name in sorted(qs):
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, sf_dir)
            if name in oracles:
                assert_matches_oracle(df, con, oracles[name], name=name)
                status = "oracle-ok"
            else:
                n = df.count()
                assert n >= 0
                status = f"rows-only({n})"
        except Exception:
            status = "FAIL"
            failed.append(name)
            traceback.print_exc(limit=3)
        print(f"{name:45s} {status:15s} {time.perf_counter() - t0:6.2f}s",
              flush=True)

    print(f"\n{len(qs) - len(failed)}/{len(qs)} ok at {sf_dir}")
    if failed:
        print("FAILED:", ", ".join(failed))
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
