"""Warehouse-pattern queries over the events stream: SCD2 dimension
builds, funnel conversion, and lifecycle lag — the modeling layer a
production analytics engine needs beside raw rollups.

Determinism: every window/array ordering is totalized with event_id as
the tie-break (two events can share a timestamp), and all aggregates
follow the exact-integer contract (counts, timestamp comparisons, one
final double division).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from time_series_prediction_spark.plans.text_queries import QueryFn
from time_series_prediction_spark.sources.io import read_table


def events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build from an event stream:
    collapse each user's event_type stream into validity intervals
    (user_id, event_type, valid_from, valid_to, is_current), where a
    new interval opens whenever the type CHANGES (consecutive repeats
    collapse into one interval) and the latest interval is open-ended.

    Shape: two window passes over ONE (user_id)-partitioning — lag for
    change detection, lead for interval close — so the whole build is
    a single shuffle; at 100 TB this is the standard merge-free SCD2
    derivation (no MERGE INTO round-trips per batch).
    """
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select("user_id", "event_id", "ts", "event_type")
        .withColumn("_prev", F.lag("event_type").over(w))
        .where(F.col("_prev").isNull() | (F.col("_prev") != F.col("event_type")))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )


EVENTS_SCD2_SQL = """
SELECT user_id, event_type,
       ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       lead(ts) OVER w IS NULL AS is_current
FROM (
  SELECT user_id, event_id, ts, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS prev_type
  FROM events
)
WHERE prev_type IS NULL OR prev_type <> event_type
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (view → click → purchase): a user
    converts step k only with an event AFTER their step-k−1 time.

    Computed in the ARRAY domain: one groupBy collects each user's
    sorted (ts, event_id, type) structs — a single shuffle — then the
    sequential min-after-previous-step logic is pure array expressions
    (filter/transform/array_min), not three cascaded join-aggregates.
    Per-user event counts are bounded (retention window), so the
    collected array is bounded; the alternative 3-shuffle join chain is
    what this replaces at 100 TB.
    """
    ev = read_table(spark, sf_dir, "events")
    per_user = (
        ev.select("user_id", "event_id", "ts", "event_type")
        .groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("_evs")
        )
        .select(
            "user_id",
            F.expr(
                "array_min(transform(filter(_evs, x -> x.event_type = 'view'),"
                " x -> x.ts))"
            ).alias("t_view"),
            F.col("_evs").alias("_evs"),
        )
        .select(
            "user_id",
            "t_view",
            F.expr(
                "array_min(transform(filter(_evs, x -> x.event_type = 'click'"
                " AND x.ts > t_view), x -> x.ts))"
            ).alias("t_click"),
            F.col("_evs").alias("_evs"),
        )
        .select(
            "user_id",
            "t_view",
            "t_click",
            F.expr(
                "array_min(transform(filter(_evs, x -> x.event_type = 'purchase'"
                " AND x.ts > t_click), x -> x.ts))"
            ).alias("t_purchase"),
        )
    )
    return per_user.agg(
        F.count("t_view").cast("bigint").alias("n_viewed"),
        F.count("t_click").cast("bigint").alias("n_clicked"),
        F.count("t_purchase").cast("bigint").alias("n_purchased"),
        # nullif the denominators: on an empty funnel stage Spark's
        # double division yields NULL but recent DuckDB yields inf —
        # pin both engines to NULL.
        (
            F.count("t_click").cast("double")
            / F.nullif(F.count("t_view"), F.lit(0))
        ).alias("view_to_click"),
        (
            F.count("t_purchase").cast("double")
            / F.nullif(F.count("t_click"), F.lit(0))
        ).alias("click_to_purchase"),
    )


EVENTS_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT CAST(count(v.user_id) AS BIGINT) AS n_viewed,
       CAST(count(c.user_id) AS BIGINT) AS n_clicked,
       CAST(count(p.user_id) AS BIGINT) AS n_purchased,
       CAST(count(c.user_id) AS DOUBLE) / nullif(count(v.user_id), 0)
         AS view_to_click,
       CAST(count(p.user_id) AS DOUBLE) / nullif(count(c.user_id), 0)
         AS click_to_purchase
FROM v
LEFT JOIN c ON v.user_id = c.user_id
LEFT JOIN p ON v.user_id = p.user_id
"""


def events_signup_to_purchase_lag(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Lifecycle lag histogram: whole days between a user's first
    signup and their first purchase AFTER it, bucketed — time-to-value
    analytics. One user-keyed aggregation (array domain again) + one
    tiny histogram aggregation."""
    ev = read_table(spark, sf_dir, "events")
    lag_days = (
        ev.select("user_id", "ts", "event_type")
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
                "t_signup"
            ),
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("event_type") == "purchase", F.col("ts")
                    )
                )
            ).alias("_purchases"),
        )
        .select(
            "user_id",
            F.expr(
                "array_min(filter(_purchases, t -> t > t_signup))"
            ).alias("t_purchase"),
            "t_signup",
        )
        .where(F.col("t_signup").isNotNull() & F.col("t_purchase").isNotNull())
        .select(
            F.datediff(
                F.to_date("t_purchase"), F.to_date("t_signup")
            ).cast("bigint").alias("lag_days")
        )
    )
    return (
        lag_days.groupBy("lag_days")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


EVENTS_SIGNUP_LAG_SQL = """
WITH s AS (
  SELECT user_id, min(ts) AS t_signup FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN s ON e.user_id = s.user_id AND e.ts > s.t_signup
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT CAST(date_diff('day', CAST(s.t_signup AS DATE),
                      CAST(p.t_purchase AS DATE)) AS BIGINT) AS lag_days,
       CAST(count(*) AS BIGINT) AS n_users
FROM s JOIN p ON s.user_id = p.user_id
GROUP BY 1
"""


def orders_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit (operators/quality_checks.py)
    over the orders/lineitem feed: completeness, domain, uniqueness,
    and referential integrity in three scans TOTAL (one conditional-
    aggregate pass per table + one distinct-key anti-join), however
    many checks are declared. The gate a 100 TB ingest runs before
    anything trains on the batch; zero violations on the clean
    fixture is the expected — and asserted — answer."""
    from time_series_prediction_spark.operators.quality_checks import (
        audit_columns,
        audit_reference,
        in_range,
        not_null,
        satisfies,
    )

    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    o_report = audit_columns(
        orders,
        [
            not_null("o_custkey"),
            not_null("o_orderdate"),
            in_range("o_totalprice", lo=0.0),
            satisfies(
                "o_status_valid", F.col("o_orderstatus").isin("O", "F", "P")
            ),
        ],
        unique_cols=["o_orderkey"],
    )
    l_report = audit_columns(
        lineitem,
        [
            in_range("l_quantity", lo=1.0, hi=50.0),
            in_range("l_discount", lo=0.0, hi=0.1),
            satisfies(
                "l_flags_valid",
                F.col("l_returnflag").isin("A", "N", "R")
                & F.col("l_linestatus").isin("O", "F"),
            ),
        ],
    )
    fk = audit_reference(
        lineitem, "l_orderkey", orders, "o_orderkey", "l_orderkey_fk"
    )
    return o_report.unionByName(l_report).unionByName(fk)


ORDERS_QUALITY_AUDIT_SQL = """
WITH o AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_custkey,
         CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_orderdate,
         CAST(sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_totalprice,
         CAST(sum(CASE WHEN NOT coalesce(o_orderstatus IN ('O','F','P'), FALSE)
                       THEN 1 ELSE 0 END) AS BIGINT) AS v_status,
         CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT) AS v_unique
  FROM orders
), l AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
         CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
         CAST(sum(CASE WHEN NOT coalesce(l_returnflag IN ('A','N','R')
                                         AND l_linestatus IN ('O','F'), FALSE)
                       THEN 1 ELSE 0 END) AS BIGINT) AS v_flags
  FROM lineitem
), ck AS (
  SELECT DISTINCT l_orderkey AS k FROM lineitem WHERE l_orderkey IS NOT NULL
), fk AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v
  FROM ck LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
    ON ck.k = o.o_orderkey
)
SELECT 'o_custkey_not_null' AS check_name, n AS n_checked, v_custkey AS n_violations FROM o
UNION ALL SELECT 'o_orderdate_not_null', n, v_orderdate FROM o
UNION ALL SELECT 'o_totalprice_in_range', n, v_totalprice FROM o
UNION ALL SELECT 'o_status_valid', n, v_status FROM o
UNION ALL SELECT 'o_orderkey_unique', n, v_unique FROM o
UNION ALL SELECT 'l_quantity_in_range', n, v_qty FROM l
UNION ALL SELECT 'l_discount_in_range', n, v_disc FROM l
UNION ALL SELECT 'l_flags_valid', n, v_flags FROM l
UNION ALL SELECT 'l_orderkey_fk', n, v FROM fk
"""


def events_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift monitoring (operators/profile.py): profile user_id/value
    (numeric) and event_type (categorical) over the first vs second
    half of the events window and report per-column before/after
    stats — ONE scan produces both sides (the halves are slices of
    the same grouped aggregate). All metrics are exact integers or
    exact data values, so the report is oracle-checkable; at 100 TB
    the same call profiles a daily partition against a stored
    reference profile."""
    from time_series_prediction_spark.operators.profile import (
        drift_report,
        profile_columns,
    )

    ev = read_table(spark, sf_dir, "events").withColumn(
        "half",
        F.when(F.to_date("ts") < F.lit("2024-01-16"), "before").otherwise(
            "after"
        ),
    )
    prof = profile_columns(
        ev,
        numeric_cols=["user_id", "value"],
        categorical_cols=["event_type"],
        slice_col="half",
    )
    return drift_report(prof, "half", "before", "after")


EVENTS_PROFILE_DRIFT_SQL = """
WITH h AS (
  SELECT CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
              THEN 'before' ELSE 'after' END AS half,
         user_id, value, event_type
  FROM events
), agg AS (
  SELECT half,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS u_null,
         CAST(count(DISTINCT user_id) AS BIGINT) AS u_dist,
         CAST(min(user_id) AS DOUBLE) AS u_min,
         CAST(max(user_id) AS DOUBLE) AS u_max,
         CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null,
         CAST(count(DISTINCT value) AS BIGINT) AS v_dist,
         CAST(min(value) AS DOUBLE) AS v_min,
         CAST(max(value) AS DOUBLE) AS v_max,
         CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS t_null,
         CAST(count(DISTINCT event_type) AS BIGINT) AS t_dist
  FROM h GROUP BY half
), p AS (
  SELECT half, n, 'user_id' AS col, u_null AS n_null, u_dist AS n_distinct,
         u_min AS min_d, u_max AS max_d FROM agg
  UNION ALL
  SELECT half, n, 'value', v_null, v_dist, v_min, v_max FROM agg
  UNION ALL
  SELECT half, n, 'event_type', t_null, t_dist,
         CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM agg
)
SELECT b.col AS column,
       b.n AS n_before, b.n_null AS n_null_before,
       b.n_distinct AS n_distinct_before,
       b.min_d AS min_d_before, b.max_d AS max_d_before,
       a.n AS n_after, a.n_null AS n_null_after,
       a.n_distinct AS n_distinct_after,
       a.min_d AS min_d_after, a.max_d AS max_d_after
FROM p b JOIN p a ON b.col = a.col
WHERE b.half = 'before' AND a.half = 'after'
"""


WAREHOUSE_QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "events_scd2_intervals": (events_scd2_intervals, EVENTS_SCD2_SQL),
    "events_funnel": (events_funnel, EVENTS_FUNNEL_SQL),
    "events_signup_to_purchase_lag": (
        events_signup_to_purchase_lag,
        EVENTS_SIGNUP_LAG_SQL,
    ),
    "orders_quality_audit": (orders_quality_audit, ORDERS_QUALITY_AUDIT_SQL),
    "events_profile_drift": (events_profile_drift, EVENTS_PROFILE_DRIFT_SQL),
}
