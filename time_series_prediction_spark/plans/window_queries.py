"""Window-function and reshaping coverage, batch 3: range frames,
rank family, multi-granularity rollups, unpivot.

Same determinism contract (exact integer cents; rank-family outputs
are integer-derived; every ORDER BY carries a unique tiebreak so
row-dependent functions like ntile are engine-independent).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from time_series_prediction_spark.plans.relational import _cents, _sql_cents
from time_series_prediction_spark.plans.timeseries_queries import (
    DAILY_CTE,
    daily_series,
)
from time_series_prediction_spark.sources.io import read_table

QueryFn = Callable[[SparkSession, str], DataFrame]


def ts_trailing_week_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (time-based, not row-based): trailing 7-day sum per
    user — days with gaps weigh correctly, unlike a ROWS frame.
    Spark ranges over ``unix_date(day)`` in days; DuckDB over the date
    with an INTERVAL range — identical inclusive semantics."""
    d = daily_series(spark, sf_dir).withColumn(
        "_epoch_day", F.expr("unix_date(day)")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("_epoch_day")
        .rangeBetween(-7, 0)
    )
    return d.select(
        "user_id",
        "day",
        (F.col("cents") / 100.0).alias("value"),
        (F.sum("cents").over(w) / 100.0).alias("trailing_week_total"),
        F.count(F.lit(1)).over(w).alias("days_in_window"),
    )


TS_TRAILING_RANGE_SQL = (
    DAILY_CTE
    + """
SELECT user_id, day,
       CAST(cents AS DOUBLE) / 100.0 AS value,
       CAST(sum(cents) OVER w AS DOUBLE) / 100.0 AS trailing_week_total,
       count(*) OVER w AS days_in_window
FROM daily
WINDOW w AS (PARTITION BY user_id ORDER BY day
             RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
"""
)


def customer_value_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-family coverage: rank / dense_rank / percent_rank /
    cume_dist / ntile(10) over customers by lifetime order value.
    Unique tiebreak (custkey) makes ntile deterministic."""
    orders = read_table(spark, sf_dir, "orders")
    totals = orders.groupBy("o_custkey").agg(
        F.sum(_cents("o_totalprice")).alias("_tc")
    )
    w = Window.orderBy(F.desc("_tc"), F.asc("o_custkey"))
    return totals.select(
        "o_custkey",
        (F.col("_tc") / 100.0).alias("lifetime_value"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("dense_rnk"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(10).over(w).cast("int").alias("decile"),
    )


CUSTOMER_RANKS_SQL = f"""
SELECT o_custkey,
       CAST(_tc AS DOUBLE) / 100.0 AS lifetime_value,
       CAST(rank()         OVER w AS BIGINT) AS rnk,
       CAST(dense_rank()   OVER w AS BIGINT) AS dense_rnk,
       percent_rank()      OVER w            AS pct_rank,
       cume_dist()         OVER w            AS cume,
       CAST(ntile(10)      OVER w AS INTEGER) AS decile
FROM (
  SELECT o_custkey, sum({_sql_cents('o_totalprice')}) AS _tc
  FROM orders GROUP BY o_custkey
)
WINDOW w AS (ORDER BY _tc DESC, o_custkey ASC)
"""


def events_multi_granularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style rollup: the same measure at day/week/month
    grains in one result (UNION ALL of grains with a grain label) —
    the precomputed-rollup pattern continuous aggregates rely on.

    Scale shape: ONE scan + one shuffle builds the day grain; week and
    month re-aggregate the day rows (day buckets nest exactly inside
    both, and the cent sums are associative integers) — the classic
    rollup hierarchy. The naive per-grain form scans and shuffles the
    fact three times; this reads it once and re-rolls O(days) rows.
    The day aggregate feeds three branches, so it is pinned."""
    from time_series_prediction_spark.operators.materialize import materialize

    ev = read_table(spark, sf_dir, "events")
    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    day = materialize(
        ev.groupBy(F.date_trunc("day", "ts").alias("bucket")).agg(
            F.sum(cents).alias("_sc"), F.count(F.lit(1)).alias("n_events")
        )
    )

    def emit(df: DataFrame, unit: str) -> DataFrame:
        return df.select(
            F.lit(unit).alias("grain"),
            "bucket",
            (F.col("_sc") / 100.0).alias("total_value"),
            "n_events",
        )

    def reroll(unit: str) -> DataFrame:
        return (
            day.groupBy(F.date_trunc(unit, "bucket").alias("bucket"))
            .agg(F.sum("_sc").alias("_sc"), F.sum("n_events").alias("n_events"))
        )

    return (
        emit(day, "day")
        .unionAll(emit(reroll("week"), "week"))
        .unionAll(emit(reroll("month"), "month"))
    )


EVENTS_GRAINS_SQL = """
SELECT 'day' AS grain, date_trunc('day', ts) AS bucket,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value,
       count(*) AS n_events
FROM events GROUP BY date_trunc('day', ts)
UNION ALL
SELECT 'week', date_trunc('week', ts),
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0,
       count(*)
FROM events GROUP BY date_trunc('week', ts)
UNION ALL
SELECT 'month', date_trunc('month', ts),
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0,
       count(*)
FROM events GROUP BY date_trunc('month', ts)
"""


def lineitem_measures_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long measures) via ``stack``: per returnflag,
    totals of each measure as (measure, total) rows."""
    li = read_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.sum(_cents("l_quantity")).alias("qty_c"),
        F.sum(_cents("l_extendedprice")).alias("price_c"),
        F.sum(_cents("l_discount")).alias("disc_c"),
    )
    return agg.select(
        "l_returnflag",
        F.expr(
            "stack(3, 'quantity', qty_c, 'extendedprice', price_c, "
            "'discount', disc_c) AS (measure, _c)"
        ),
    ).select(
        "l_returnflag", "measure", (F.col("_c") / 100.0).alias("total")
    )


LINEITEM_UNPIVOT_SQL = f"""
WITH agg AS (
  SELECT l_returnflag,
         sum({_sql_cents('l_quantity')})      AS qty_c,
         sum({_sql_cents('l_extendedprice')}) AS price_c,
         sum({_sql_cents('l_discount')})      AS disc_c
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'quantity' AS measure, CAST(qty_c AS DOUBLE) / 100.0 AS total FROM agg
UNION ALL
SELECT l_returnflag, 'extendedprice', CAST(price_c AS DOUBLE) / 100.0 FROM agg
UNION ALL
SELECT l_returnflag, 'discount', CAST(disc_c AS DOUBLE) / 100.0 FROM agg
"""


WINDOW_QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "ts_trailing_week_range": (ts_trailing_week_range, TS_TRAILING_RANGE_SQL),
    "customer_value_ranks": (customer_value_ranks, CUSTOMER_RANKS_SQL),
    "events_multi_granularity": (events_multi_granularity, EVENTS_GRAINS_SQL),
    "lineitem_measures_unpivot": (lineitem_measures_unpivot, LINEITEM_UNPIVOT_SQL),
}
