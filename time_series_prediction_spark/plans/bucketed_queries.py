"""Bucketed-warehouse queries: the co-located-join layout lever
(operators/bucketing.py) surfaced as an oracle-backed registry query.

Beyond-reference scope (the reference re-shuffles its join inputs on
every run — ``src/demo/training.py:70-90``). The query materializes
orders and lineitem bucketed by orderkey (once per process+fixture),
then answers a fact-fact join+agg whose physical plan contains ONE
exchange total (the final groupBy) — the join itself runs over the
pre-clustered, pre-sorted buckets with no shuffle and no sort. The
oracle never sees the layout: DuckDB runs the same join over the raw
parquet, so correctness pins that bucketing changed nothing but the
plan. Plan shape is asserted in tests/test_bucketed.py.

100 TB shape: one write-time shuffle per table amortized over every
subsequent orderkey join; scans prune to the selected columns; the
only per-query exchange moves the tiny (priority, year) aggregate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from time_series_prediction_spark.operators.bucketing import (
    bucketed_join,
    ensure_bucketed,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

_N_BUCKETS = 8


def bucketed_orders_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the two one-time layout builds are independent Spark jobs —
    # submit them concurrently (Spark schedules jobs from separate
    # threads onto the same executors; on a cluster this halves the
    # wall-clock of the layout bootstrap, and a no-op once built)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_orders = pool.submit(
            ensure_bucketed,
            spark,
            sf_dir,
            "orders",
            "o_orderkey",
            _N_BUCKETS,
            ["o_orderkey", "o_orderdate", "o_orderpriority"],
        )
        f_lineitem = pool.submit(
            ensure_bucketed,
            spark,
            sf_dir,
            "lineitem",
            "l_orderkey",
            _N_BUCKETS,
            ["l_orderkey", "l_extendedprice", "l_discount"],
        )
        orders = f_orders.result()
        lineitem = f_lineitem.result()
    joined = bucketed_join(spark, orders, lineitem, "o_orderkey", "l_orderkey")
    return (
        joined.where(F.col("o_orderdate") >= F.lit("1995-01-01"))
        .groupBy(
            "o_orderpriority", F.year("o_orderdate").cast("int").alias("o_year")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(
                F.expr(
                    "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"
                )
            ).alias("revenue_cents"),
        )
    )


BUCKETED_ORDERS_REVENUE_SQL = """
SELECT o_orderpriority,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
WHERE o_orderdate >= DATE '1995-01-01'
GROUP BY o_orderpriority, o_year
"""


def events_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user feature rollup (the feature table every ML pipeline
    builds from its event log) over a user_id-bucketed events layout:
    the groupBy reads pre-clustered buckets and aggregates with ZERO
    exchanges — at 100 TB this turns the single most frequent shuffle
    in the warehouse (events by user) into a free scan, amortized by
    one write-time clustering. The distinct-day count also rides the
    layout: HashPartitioning(user_id) satisfies the (user_id, day)
    clustering of the inner distinct aggregate, so no exchange there
    either (plan-pinned in tests/test_bucketed.py)."""
    events = ensure_bucketed(
        spark,
        sf_dir,
        "events",
        "user_id",
        _N_BUCKETS,
        columns=["user_id", "value", "ts"],
    )
    ev = spark.table(events)
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct(F.to_date("ts")).cast("long").alias("n_active_days"),
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias(
            "total_cents"
        ),
        F.min(F.to_date("ts")).alias("first_day"),
        F.max(F.to_date("ts")).alias("last_day"),
    )


EVENTS_USER_FEATURES_SQL = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_active_days,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
       min(CAST(ts AS DATE)) AS first_day,
       max(CAST(ts AS DATE)) AS last_day
FROM events
GROUP BY user_id
"""


def events_session_stats_bucketed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-user session summary over the user-bucketed layout with
    ZERO exchanges end-to-end: the gap-split windows and the final
    per-user aggregate all ride HashPartitioning(user_id) from the
    bucketed scan — only an in-partition sort on (user_id, ts) is
    paid (the layout is sorted by user_id alone). At 100 TB this is
    sessionization without its shuffle, the dominant cost of every
    clickstream pipeline; the unbucketed registry twin
    (events_sessionization, plans/relational.py) pays one exchange
    for the same answer. Oracle recomputes sessions from the raw
    table — the layout changes the plan, never the result."""
    from pyspark.sql.window import Window

    events = ensure_bucketed(
        spark,
        sf_dir,
        "events",
        "user_id",
        _N_BUCKETS,
        columns=["user_id", "value", "ts"],
    )
    ev = spark.table(events)
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    sessions = (
        ev.withColumn(
            "is_new",
            F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(
                0
            ),
        )
        .withColumn(
            "session_id",
            F.sum("is_new")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("bigint"),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ev"),
            (
                F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))
            ).alias("dur_us"),
        )
    )
    return sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("n_ev").cast("long").alias("total_events"),
        F.max("n_ev").cast("long").alias("longest_session_events"),
        F.sum("dur_us").cast("long").alias("total_duration_us"),
    )


EVENTS_SESSION_STATS_SQL = """
WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sessions AS (
  SELECT user_id, ts,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_id
  FROM gaps
), per_session AS (
  SELECT user_id, session_id,
         CAST(count(*) AS BIGINT) AS n_ev,
         epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
  FROM sessions
  GROUP BY user_id, session_id
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(n_ev) AS BIGINT) AS total_events,
       CAST(max(n_ev) AS BIGINT) AS longest_session_events,
       CAST(sum(dur_us) AS BIGINT) AS total_duration_us
FROM per_session
GROUP BY user_id
"""


BUCKETED_QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "events_session_stats_bucketed": (
        events_session_stats_bucketed,
        EVENTS_SESSION_STATS_SQL,
    ),
    "bucketed_orders_revenue": (
        bucketed_orders_revenue,
        BUCKETED_ORDERS_REVENUE_SQL,
    ),
    "events_user_features": (events_user_features, EVENTS_USER_FEATURES_SQL),
}
