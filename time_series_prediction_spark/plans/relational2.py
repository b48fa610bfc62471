"""Relational coverage, batch 2: subqueries, conditional aggregation,
pivot, exact percentiles, per-group sampling, string predicates.

Same determinism contract as plans/relational.py (exact integer cents,
one final IEEE division, no rounding of accumulated doubles).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from time_series_prediction_spark.plans.relational import _cents, _sql_cents
from time_series_prediction_spark.sources.io import read_table

QueryFn = Callable[[SparkSession, str], DataFrame]


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 flavor: orders (in a window) having at least one line
    shipped after order date — EXISTS as a left-semi join."""
    orders = read_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    late = li.join(
        orders, li.l_orderkey == orders.o_orderkey, "inner"
    ).where(F.col("l_shipdate") > F.col("o_orderdate")).select("l_orderkey")
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o.o_orderkey AND l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 flavor: conditional aggregation — ECONOMY-type parts'
    share of monthly revenue (CASE inside exact-integer sums)."""
    li = read_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = read_table(spark, sf_dir, "part")
    rev = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    econ = F.when(F.col("p_type") == "ECONOMY", rev).otherwise(F.lit(0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.date_trunc("month", "l_shipdate").alias("month"))
        .agg(
            F.sum(econ).alias("_e"),
            F.sum(rev).alias("_t"),
        )
        .select(
            "month",
            (F.col("_e") / 1e4).alias("economy_revenue"),
            (F.col("_t") / 1e4).alias("total_revenue"),
            (F.col("_e").cast("double") / F.col("_t")).alias("economy_share"),
        )
    )


_REV = f"{_sql_cents('l_extendedprice')} * (100 - {_sql_cents('l_discount')})"

Q14_SQL = f"""
SELECT date_trunc('month', l_shipdate) AS month,
       CAST(sum(CASE WHEN p_type = 'ECONOMY' THEN {_REV} ELSE 0 END) AS DOUBLE) / 1e4
         AS economy_revenue,
       CAST(sum({_REV}) AS DOUBLE) / 1e4 AS total_revenue,
       CAST(sum(CASE WHEN p_type = 'ECONOMY' THEN {_REV} ELSE 0 END) AS DOUBLE)
         / CAST(sum({_REV}) AS DOUBLE) AS economy_share
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY date_trunc('month', l_shipdate)
"""


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 flavor: customers whose single order exceeds 250 units
    (IN-subquery over a grouped HAVING, then join back)."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_totalprice",
            "total_qty",
        )
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_totalprice, total_qty
FROM (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
) big
JOIN orders   ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 flavor: customers with above-average balance and no
    orders since 1999 (scalar subquery + anti join)."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    # scalar subquery as a broadcast 1-row crossJoin — stays lazy, no
    # driver-side collect (exact-cents average balance)
    threshold_df = cust.agg(
        (
            F.sum(_cents("c_acctbal")).cast("double")
            / (100.0 * F.count(F.lit(1)))
        ).alias("_threshold")
    )
    return (
        cust.crossJoin(F.broadcast(threshold_df))
        .where(F.col("c_acctbal") > F.col("_threshold"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_cents("c_acctbal")).alias("_sb"),
        )
        .select(
            "c_mktsegment",
            "n_customers",
            (F.col("_sb") / 100.0).alias("total_balance"),
        )
    )


Q22_SQL = f"""
SELECT c_mktsegment, count(*) AS n_customers,
       CAST(sum({_sql_cents('c_acctbal')}) AS DOUBLE) / 100.0 AS total_balance
FROM customer c
WHERE c_acctbal > (SELECT CAST(sum({_sql_cents('c_acctbal')}) AS DOUBLE)
                          / (100.0 * count(*)) FROM customer)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c.c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_mktsegment
"""


def orders_above_customer_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery pattern: orders priced above their own
    customer's average order price (window mean, exact cents)."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    cents = _cents("o_totalprice")
    avg_c = F.sum(cents).over(w).cast("double") / (
        100.0 * F.count(F.lit(1)).over(w)
    )
    return (
        orders.withColumn("cust_avg", avg_c)
        .where(F.col("o_totalprice") > F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "cust_avg")
    )


ORDERS_ABOVE_AVG_SQL = f"""
SELECT o_orderkey, o_custkey, o_totalprice, cust_avg
FROM (
  SELECT o_orderkey, o_custkey, o_totalprice,
         CAST(sum({_sql_cents('o_totalprice')}) OVER w AS DOUBLE)
           / (100.0 * count(*) OVER w) AS cust_avg
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey)
)
WHERE o_totalprice > cust_avg
"""


def order_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per priority with one column per status.
    Spark ``pivot()``; the oracle is the equivalent manual CASE pivot
    (engine-agnostic SQL)."""
    orders = read_table(spark, sf_dir, "orders")
    statuses = ["F", "O", "P"]
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", statuses)
        .agg(F.count(F.lit(1)))
        .na.fill(0, statuses)
        .select(
            "o_orderpriority",
            *[F.col(s).cast("bigint").alias(f"status_{s}") for s in statuses],
        )
    )


ORDER_STATUS_PIVOT_SQL = """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS status_F,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS status_O,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS status_P
FROM orders
GROUP BY o_orderpriority
"""


def price_percentiles_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (median, p90) of order price per market
    segment — linear-interpolation quantiles over exact integer cents
    (Spark ``percentile`` == DuckDB ``quantile_cont`` definition)."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.expr(
                "percentile(CAST(round(o_totalprice * 100) AS BIGINT), 0.5)"
            ).alias("_p50"),
            F.expr(
                "percentile(CAST(round(o_totalprice * 100) AS BIGINT), 0.9)"
            ).alias("_p90"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            "c_mktsegment",
            (F.col("_p50") / 100.0).alias("median_price"),
            (F.col("_p90") / 100.0).alias("p90_price"),
            "n_orders",
        )
    )


PRICE_PERCENTILES_SQL = f"""
SELECT c_mktsegment,
       quantile_cont({_sql_cents('o_totalprice')}, 0.5) / 100.0 AS median_price,
       quantile_cont({_sql_cents('o_totalprice')}, 0.9) / 100.0 AS p90_price,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def top3_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group sample head (reference A7's grouped head, made
    deterministic): 3 highest-priced parts per brand."""
    part = read_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), F.asc("p_partkey")
    )
    return (
        part.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "p_brand",
            "p_partkey",
            "p_name",
            "p_retailprice",
            F.col("rn").cast("int").alias("rn"),
        )
    )


TOP3_PARTS_SQL = """
SELECT p_brand, p_partkey, p_name, p_retailprice, CAST(rn AS INTEGER) AS rn
FROM (
  SELECT *, row_number() OVER (PARTITION BY p_brand
                               ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
  FROM part
)
WHERE rn <= 3
"""


def string_predicate_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function coverage: LIKE, substring, upper, length over
    part names."""
    part = read_table(spark, sf_dir, "part")
    return part.where(F.col("p_name").like("%a%")).select(
        "p_partkey",
        F.upper(F.substring("p_name", 1, 5)).alias("name_prefix"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


STRING_PREDICATE_SQL = """
SELECT p_partkey,
       upper(substring(p_name, 1, 5)) AS name_prefix,
       CAST(length(p_name) AS BIGINT) AS name_len,
       concat_ws('|', p_brand, p_type) AS brand_type
FROM part
WHERE p_name LIKE '%a%'
"""


def distinct_part_types_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts per supplier over its shipped parts; the
    approx variant (approx_count_distinct / HLL) is the scale path and
    is covered rows-only in bench."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(
            F.countDistinct("p_type").alias("n_types"),
            F.countDistinct("p_brand").alias("n_brands"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


DISTINCT_TYPES_SQL = """
SELECT l_suppkey,
       count(DISTINCT p_type)  AS n_types,
       count(DISTINCT p_brand) AS n_brands,
       count(*)                AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY l_suppkey
"""


def salted_event_type_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe aggregation: event value totals per event_type via the
    two-phase salted groupBy (operators/skew). The oracle is the PLAIN
    GROUP BY — the salted plan must reproduce it exactly, which the
    exact-cents domain guarantees."""
    from time_series_prediction_spark.operators.skew import salted_sum_count

    ev = read_table(spark, sf_dir, "events")
    out = salted_sum_count(
        ev,
        ["event_type"],
        F.expr("CAST(round(value * 100) AS BIGINT)"),
        n_salts=16,
        sum_alias="_sc",
        count_alias="n_events",
    )
    return out.select(
        "event_type",
        (F.col("_sc") / 100.0).alias("total_value"),
        "n_events",
    )


SALTED_TOTALS_SQL = """
SELECT event_type,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value,
       count(*) AS n_events
FROM events
GROUP BY event_type
"""


# approx_distinct_users_daily moved to plans/sketch_queries.py in
# round 8: reimplemented on the portable HLL
# (operators/sketch_portable.py) so it is oracle-backed; Spark's
# engine-native approx_count_distinct remains demonstrated by
# events_dau_sketch_rollup below.


def events_dau_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch DAU: per-(day, shard) HyperLogLog partials
    unioned into a daily estimate — the pattern that maintains
    distinct counts incrementally at 100 TB (persist the tiny partial
    sketches; a new batch unions its sketch in, no rescan of history,
    and region/day partials roll up to any coarser grain without the
    raw data). Two-level plan: narrow partial `hll_sketch_agg` per
    shard (map-side, bounded sketch bytes), then `hll_union_agg` over
    ≤ n_shards rows per day. Rows-only: sketch estimates are
    engine-specific. Estimator nuance at scale: a union result cannot
    use the HIP estimator a directly-built sketch uses, so past the
    sparse regime the two estimates differ by up to ~1×RSE (measured
    1.6% max at sf0.1, lgK=12) — the union is still a lossless merge
    of REGISTERS, and both estimates hold the error bound vs exact
    DAU; pinned at every fixture scale in tests/test_relational2.py.

    SELF-VERIFYING (r12 Next #5): the query joins its own
    oracle-backed PORTABLE twin (``portable_hll_daily_sql``, the SQL
    text the ``events_dau_sketch_rollup_portable`` oracle runs) and
    emits ``portable_est`` + ``est_gap_frac`` columns — a silent
    native-sketch regression can no longer hide behind the rows-only
    check (the gap bound is pinned in tests/test_sketch_portable.py
    at sf0.1)."""
    from time_series_prediction_spark.operators.sketch_portable import (
        portable_hll_daily_sql,
    )

    ev = read_table(spark, sf_dir, "events")
    partials = (
        ev.select(
            F.to_date("ts").alias("day"),
            F.pmod(F.col("user_id"), F.lit(8)).alias("_shard"),
            "user_id",
        )
        .groupBy("day", "_shard")
        .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("_sk"))
    )
    native = partials.groupBy("day").agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("dau_est"),
        F.count(F.lit(1)).cast("long").alias("n_partials"),
    )
    ev.createOrReplaceTempView("_ev_dau_native_check")
    portable = spark.sql(
        portable_hll_daily_sql("_ev_dau_native_check", m=1024)
    ).selectExpr("day", "approx_dau AS portable_est")
    return native.join(portable, "day").select(
        "day",
        "dau_est",
        "n_partials",
        "portable_est",
        (
            F.abs(F.col("dau_est") - F.col("portable_est"))
            / F.col("portable_est")
        ).alias("est_gap_frac"),
    )


RELATIONAL2_QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "salted_event_type_totals": (salted_event_type_totals, SALTED_TOTALS_SQL),
    "events_dau_sketch_rollup": (events_dau_sketch_rollup, None),
    "q4_order_priority": (q4_order_priority, Q4_SQL),
    "q14_promo_revenue_share": (q14_promo_revenue_share, Q14_SQL),
    "q18_large_volume_customers": (q18_large_volume_customers, Q18_SQL),
    "q22_idle_rich_customers": (q22_idle_rich_customers, Q22_SQL),
    "orders_above_customer_average": (
        orders_above_customer_average,
        ORDERS_ABOVE_AVG_SQL,
    ),
    "order_status_pivot": (order_status_pivot, ORDER_STATUS_PIVOT_SQL),
    "price_percentiles_by_segment": (
        price_percentiles_by_segment,
        PRICE_PERCENTILES_SQL,
    ),
    "top3_parts_per_brand": (top3_parts_per_brand, TOP3_PARTS_SQL),
    "string_predicate_scan": (string_predicate_scan, STRING_PREDICATE_SQL),
    "distinct_part_types_per_supplier": (
        distinct_part_types_per_supplier,
        DISTINCT_TYPES_SQL,
    ),
}
