"""User-journey analytics over the events stream: Markov transition
matrix and marketing-touch revenue attribution — the path-analysis
layer that sits beside funnels (plans/warehouse_queries.py) in any
event warehouse.

Beyond-reference scope: the reference models per-customer cashflow
series (reference ``src/demo/create_time_series.py``) and has no
event-path surface; these operators are part of this engine's
large-scale analytics completeness.

Determinism contract (same as the rest of the registry): every window
ordering is totalized with ``event_id`` as the tie-break, aggregates
are exact bigint counts / cents, and each probability or rate is ONE
final double division of two exact integers — bit-identical in Spark
and DuckDB.

Scale shape: both queries are a single (user_id)-partitioned window
pass (one shuffle, whole-stage codegen throughout — no Python) feeding
a tiny-cardinality aggregate (|event_type|² and |channels| rows) with
map-side partial combine. At 100 TB the window state per user is one
row of lag context; nothing is ever collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from time_series_prediction_spark.plans.text_queries import QueryFn
from time_series_prediction_spark.sources.io import read_table


def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types: for every
    (from_type, to_type) adjacency in a user's (ts, event_id)-ordered
    stream, the transition count and the row-normalized probability
    P(to | from). The classic product-analytics "what do users do
    next" operator."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("_next", F.lead("event_type").over(w))
        .where(F.col("_next").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("_next").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )
    w_from = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(w_from).cast("double")
        ).alias("p_transition"),
    )


EVENTS_TRANSITION_SQL = """
WITH pairs AS (
    SELECT event_type AS from_type,
           lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS to_type
    FROM events
),
counts AS (
    SELECT from_type, to_type,
           CAST(count(*) AS BIGINT) AS n_transitions
    FROM pairs WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
)
SELECT from_type, to_type, n_transitions,
       CAST(n_transitions AS DOUBLE)
         / CAST(sum(n_transitions) OVER (PARTITION BY from_type)
                AS DOUBLE) AS p_transition
FROM counts
"""


def events_attribution_last_touch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Last-touch revenue attribution: each purchase's value (held as
    exact cents) is credited to the nearest PRECEDING non-purchase
    event type in the same user's ordered stream — 'direct' when the
    purchase has no preceding touch. One ignore-nulls window pass
    (running last-touch context carried per user, never a self-join)
    then a |channels|-row rollup."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touched = ev.withColumn(
        "_touch",
        F.last(
            F.when(F.col("event_type") != "purchase", F.col("event_type")),
            ignorenulls=True,
        ).over(w),
    )
    return (
        touched.where(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce(F.col("_touch"), F.lit("direct")).alias("channel")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
            .cast("long")
            .alias("attributed_cents"),
        )
    )


EVENTS_ATTRIBUTION_SQL = """
WITH touched AS (
    SELECT event_type, value,
           last_value(
               CASE WHEN event_type <> 'purchase' THEN event_type END
               IGNORE NULLS
           ) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS touch
    FROM events
)
SELECT coalesce(touch, 'direct') AS channel,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS attributed_cents
FROM touched
WHERE event_type = 'purchase'
GROUP BY coalesce(touch, 'direct')
"""


def events_cohort_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-active
    week; for each (cohort_week, week_offset) the distinct users
    still active and their share of the cohort — the classic
    triangle every growth dashboard draws. Exact integers + one
    final division; offset-0 share is 1.0 by construction."""
    ev = read_table(spark, sf_dir, "events")
    weekly = (
        ev.select(
            "user_id",
            F.expr(
                "CAST(datediff(to_date(ts), DATE '2024-01-01') div 7"
                " AS INT)"
            ).alias("week"),
        )
        .distinct()
    )
    cohort = weekly.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    sizes = cohort.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    cells = (
        weekly.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    return cells.join(F.broadcast(sizes), "cohort_week").select(
        F.col("cohort_week").cast("long").alias("cohort_week"),
        F.col("week_offset").cast("long").alias("week_offset"),
        "n_active",
        (
            F.col("n_active").cast("double")
            / F.col("cohort_size").cast("double")
        ).alias("retention"),
    )


EVENTS_COHORT_SQL = """
WITH weekly AS (
    SELECT DISTINCT user_id,
           CAST((CAST(ts AS DATE) - DATE '2024-01-01') // 7 AS INT)
             AS week
    FROM events
),
cohort AS (
    SELECT user_id, min(week) AS cohort_week FROM weekly GROUP BY user_id
),
sizes AS (
    SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
    FROM cohort GROUP BY cohort_week
),
cells AS (
    SELECT c.cohort_week, w.week - c.cohort_week AS week_offset,
           CAST(count(*) AS BIGINT) AS n_active
    FROM weekly w JOIN cohort c ON c.user_id = w.user_id
    GROUP BY c.cohort_week, w.week - c.cohort_week
)
SELECT CAST(cells.cohort_week AS BIGINT) AS cohort_week,
       CAST(week_offset AS BIGINT) AS week_offset,
       n_active,
       CAST(n_active AS DOUBLE) / CAST(cohort_size AS DOUBLE)
         AS retention
FROM cells JOIN sizes ON sizes.cohort_week = cells.cohort_week
"""


def features_pit_training_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Feature-store point-in-time training join: each purchase
    (label) is attached to the user's LATEST feature snapshot whose
    availability timestamp precedes the label — daily cumulative
    features stamped available at next-day midnight, so a label can
    never see same-day (future-leaking) activity. This is the PIT
    correctness contract every feature store ships (Feast/Tecton
    get_historical_features); here it is the engine's as-of join
    (operators/asof.py — union-and-carry, ONE shuffle, no per-label
    subquery) against the snapshot stream.

    The oracle replays it with DuckDB's native ASOF JOIN — two
    independent as-of implementations agreeing on every aggregate.
    Output: label counts and exact label/feature cents split by
    whether the user had any pre-label history."""
    from time_series_prediction_spark.operators.asof import asof_join

    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
        .cast("long")
        .alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    snap = daily.select(
        "user_id",
        F.to_timestamp(F.date_add("day", 1)).alias("avail_ts"),
        F.sum("n").over(w).cast("long").alias("n_todate"),
        F.sum("cents").over(w).cast("long").alias("cents_todate"),
    )
    labels = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias(
            "label_cents"
        ),
    )
    j = asof_join(
        labels,
        snap,
        on="user_id",
        left_ts="ts",
        right_ts="avail_ts",
        right_payload=["n_todate", "cents_todate"],
    )
    return j.groupBy(
        F.col("avail_ts_asof").isNotNull().alias("has_history")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_labels"),
        F.sum("label_cents").cast("long").alias("total_label_cents"),
        F.sum(F.coalesce(F.col("n_todate_asof"), F.lit(0)))
        .cast("long")
        .alias("total_feat_events"),
        F.sum(F.coalesce(F.col("cents_todate_asof"), F.lit(0)))
        .cast("long")
        .alias("total_feat_cents"),
    )


FEATURES_PIT_SQL = """
WITH daily AS (
    SELECT user_id, CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM events GROUP BY user_id, CAST(ts AS DATE)
),
snap AS (
    SELECT user_id,
           CAST(day + 1 AS TIMESTAMP) AS avail_ts,
           CAST(sum(n) OVER (PARTITION BY user_id ORDER BY day)
                AS BIGINT) AS n_todate,
           CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY day)
                AS BIGINT) AS cents_todate
    FROM daily
),
labels AS (
    SELECT user_id, ts,
           CAST(round(value * 100) AS BIGINT) AS label_cents
    FROM events WHERE event_type = 'purchase'
)
SELECT s.avail_ts IS NOT NULL AS has_history,
       CAST(count(*) AS BIGINT) AS n_labels,
       CAST(sum(l.label_cents) AS BIGINT) AS total_label_cents,
       CAST(sum(coalesce(s.n_todate, 0)) AS BIGINT)
         AS total_feat_events,
       CAST(sum(coalesce(s.cents_todate, 0)) AS BIGINT)
         AS total_feat_cents
FROM labels l
ASOF LEFT JOIN snap s
  ON l.user_id = s.user_id AND l.ts >= s.avail_ts
GROUP BY s.avail_ts IS NOT NULL
"""


def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event-type trigram paths: the 15 most common 3-step
    sequences (``a > b > c``) across all users' (ts, event_id)-ordered
    streams, with each path's exact count and its share of all
    trigrams — the path-mining upgrade of the first-order transition
    matrix (``events_transition_matrix`` only sees adjacent pairs;
    trigrams expose the second-order structure funnels miss).

    Scale shape: ONE (user_id)-partitioned window pass producing two
    lead columns (no self-joins — the naive formulation is a triple
    self-join on consecutive ranks), then a groupBy whose key space is
    bounded by |event_type|³ (125 here), so the aggregate is
    metadata-sized with map-side combine and the share division runs
    over that tiny relation. Top-k is a TakeOrdered, never a full
    sort."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        ev.withColumn("_e2", F.lead("event_type", 1).over(w))
        .withColumn("_e3", F.lead("event_type", 2).over(w))
        .where(F.col("_e3").isNotNull())
    )
    counts = tri.groupBy(
        F.concat_ws(" > ", "event_type", "_e2", "_e3").alias("path")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_paths"))
    w_all = Window.partitionBy()
    return (
        counts.select(
            "path",
            "n_paths",
            (
                F.col("n_paths").cast("double")
                / F.sum("n_paths").over(w_all).cast("double")
            ).alias("path_share"),
        )
        .orderBy(F.desc("n_paths"), F.asc("path"))
        .limit(15)
    )


EVENTS_TOP_PATHS_SQL = """
WITH tri AS (
    SELECT event_type AS e1,
           lead(event_type, 1) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS e2,
           lead(event_type, 2) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS e3
    FROM events
),
counts AS (
    SELECT e1 || ' > ' || e2 || ' > ' || e3 AS path,
           CAST(count(*) AS BIGINT) AS n_paths
    FROM tri WHERE e3 IS NOT NULL
    GROUP BY e1 || ' > ' || e2 || ' > ' || e3
)
SELECT path, n_paths,
       CAST(n_paths AS DOUBLE)
         / CAST(sum(n_paths) OVER () AS DOUBLE) AS path_share
FROM counts
ORDER BY n_paths DESC, path ASC
LIMIT 15
"""


JOURNEY_QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "events_top_paths": (
        events_top_paths,
        EVENTS_TOP_PATHS_SQL,
    ),
    "events_cohort_matrix": (
        events_cohort_matrix,
        EVENTS_COHORT_SQL,
    ),
    "features_pit_training_join": (
        features_pit_training_join,
        FEATURES_PIT_SQL,
    ),
    "events_transition_matrix": (
        events_transition_matrix,
        EVENTS_TRANSITION_SQL,
    ),
    "events_attribution_last_touch": (
        events_attribution_last_touch,
        EVENTS_ATTRIBUTION_SQL,
    ),
}
