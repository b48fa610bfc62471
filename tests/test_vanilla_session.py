"""Reproduce the external-harness condition: a VANILLA SparkSession
(no engine defaults from session.py) must be able to run events-based
queries, because read_table self-provisions the runtime-settable
``spark.sql.legacy.parquet.nanosAsLong`` conf.

Round-1 regression: the conf lived only in the session factory, so any
session the engine did not build threw PARQUET_TYPE_ILLEGAL on
events.parquet — killing 17 externally-checked queries. This test runs
in a SUBPROCESS with a bare ``SparkSession.builder.getOrCreate()`` so no
fixture session (which carries engine defaults) can mask the bug.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[2]")
    .appName("vanilla")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
import __spark_entry__ as entrymod

# flagship smoke: exactly what the external harness calls
df = entrymod.entry(spark)
assert df.count() >= 0

# one events-family query end-to-end on the bare session
qs = entrymod.queries()
n = qs["events_hourly"](spark, {sf_dir!r}).count()
assert n > 0, n

# read_table must also have pinned UTC: date bucketing (to_date /
# datediff on events.ts) would otherwise follow the host timezone and
# silently diverge from the tz-naive DuckDB oracle on non-UTC hosts
assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
lag = qs["events_signup_to_purchase_lag"](spark, {sf_dir!r}).count()
assert lag >= 0
print("VANILLA_OK", n)
spark.stop()
"""


def test_vanilla_session_reads_events(sf_dir):
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_TEST_SF_DIR", sf_dir)
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=str(REPO), sf_dir=sf_dir)],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "VANILLA_OK" in proc.stdout
