"""Relational coverage batch 7: the last TPC-H plan shapes not yet in
the registry — q9 (multi-dimension profit rollup), q11 (HAVING against
a scalar subquery), q12 (conditional two-way counts), q20 (semi-join
chain off a grouped threshold), q21 (per-group argmax + multi-party
existence).

The fixture star schema (FIXTURES.md §B) lacks partsupp,
l_commitdate/l_receiptdate/l_shipmode and supplycost, so each query
substitutes equivalent predicates over the columns that exist — the
plan *shape* is the point, noted per query. Reference scope note: the
reference itself has no relational layer (SURVEY §2.3 — one crossJoin,
`src/demo/create_time_series.py:195`); this module is engine surface
for the driver's TPC-H-ish harness.

Same contract as plans/relational.py: Spark plan beside its DuckDB
oracle, money aggregated in exact integer cents, dimensions broadcast,
native predicates that push into the parquet scan.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from time_series_prediction_spark.operators.materialize import materialize
from time_series_prediction_spark.plans.relational import (
    _cents,
    _revenue_e4,
    _REV_E4_SQL,
    _sql_cents,
)
from time_series_prediction_spark.sources.io import read_table

QueryFn = Callable[[SparkSession, str], DataFrame]


def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit rolled up by (supplier nation, order
    year) for a part-name pattern. No partsupp in the fixture, so
    profit is revenue (extendedprice net of discount) rather than
    revenue − supplycost·qty; the plan shape is identical: one big
    fact scan, four dimension joins, two-level rollup.

    Scale: part is filtered BEFORE its broadcast (name pattern prunes
    ~1/3 of rows), supplier/nation broadcast; orders joins on the
    fact's own key so AQE picks the strategy; single exchange for the
    final (nation, year) aggregate."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").where(F.col("p_name").contains("red"))
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    orders = read_table(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(_revenue_e4().alias("_p"))
        .select(
            "nation", "o_year", (F.col("_p") / 1e4).alias("sum_profit")
        )
    )


Q9_SQL = f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST({_REV_E4_SQL} AS DOUBLE) / 1e4 AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
"""


def q11_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value for one region's suppliers,
    kept only when above a fixed fraction of the group total — the
    HAVING-against-a-scalar-subquery pattern. partsupp is absent, so
    value is net lineitem revenue instead of supplycost·availqty, and
    the selector is a region (a nation can be supplier-empty at tiny
    SF — FIXTURES.md: 10 suppliers across 25 nations at sf0.001).

    The original's fixed fraction (0.0001/SF) is scale-DEPENDENT by
    design; a fixed share here would go empty (or total) as SF moves,
    so the threshold is relative to the mean part value: keep parts
    above 1.5x the group mean — non-empty and ~15% selective at every
    fixture SF.

    Scale: the threshold compare is done in exact integer 1e-4 units
    (2 * n * value > 3 * total avoids any float fraction), so the
    filter is deterministic across engines. The scalar (count, total)
    pair is a second aggregation over the SAME filtered join subtree;
    Spark gets it as a 1-row crossJoin (BroadcastNestedLoopJoin —
    broadcast cost is one row)."""
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").where(
        F.col("r_name") == "EUROPE"
    )
    base = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    per_part = materialize(
        base.groupBy("l_partkey").agg(_revenue_e4().alias("_v"))
    )  # feeds the threshold branch AND its own total: without pinning,
    # the lineitem join subtree executes twice (verified: 2 FileScans)
    total = per_part.agg(
        F.sum("_v").alias("_t"), F.count(F.lit(1)).alias("_n")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("_v") * F.col("_n") * 2 > F.col("_t") * 3)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("_v") / 1e4).alias("part_value"),
        )
    )


Q11_SQL = f"""
WITH base AS (
  SELECT l_partkey, l_extendedprice, l_discount
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), per_part AS (
  SELECT l_partkey AS p_partkey, {_REV_E4_SQL} AS _v
  FROM base GROUP BY l_partkey
)
SELECT p_partkey, CAST(_v AS DOUBLE) / 1e4 AS part_value
FROM per_part
WHERE _v * (SELECT count(*) FROM per_part) * 2
      > (SELECT sum(_v) FROM per_part) * 3
"""


def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional two-way counts over a lateness
    predicate. The fixture has no shipmode/commitdate/receiptdate, so
    'late' is l_shipdate more than 60 days after o_orderdate and the
    grouping key is l_returnflag; high/low split on o_orderpriority
    exactly as in the original.

    Scale: the date predicate is a pure column comparison between the
    two join sides — evaluated post-join but before the aggregate, so
    the exchange carries only (returnflag, priority-bit). One shuffle
    for the join (AQE), one for the tiny final aggregate."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    late = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).where(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        late.groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_returnflag AS returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_returnflag
"""


def q20_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: a grouped threshold feeding back into the
    supplier dimension — which suppliers dominate the shipping of
    parts (the fixture's stand-in for 'availqty above half the
    shipped volume', partsupp being absent). 'Dominates' = strictly
    the largest shipper of the part AND more than 2x the part's
    average per-supplier quantity; an absolute share threshold would
    be scale-dependent (per-part supplier counts grow with SF), so
    dominance is relative and the output is the top-25 suppliers by
    dominated-part count.

    Scale: one shuffle groups (part, supplier) quantities; all four
    per-part stats (max, tie count at max, supplier count, total)
    come from ONE window over the part key — a second pass over the
    same exchange, no join; integer compares (quantities summed in
    exact hundredths) are engine-deterministic; the final top-25 is a
    tiny aggregate + broadcast join to supplier names."""
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_cents("l_quantity")).alias("_q")
    )
    w = Window.partitionBy("l_partkey")
    x = (
        per_ps.withColumn("_mx", F.max("_q").over(w))
        .withColumn(
            "_n_at_max",
            F.sum(F.when(F.col("_q") == F.col("_mx"), 1).otherwise(0)).over(w),
        )
        .withColumn("_n_supp", F.count(F.lit(1)).over(w))
        .withColumn("_tot", F.sum("_q").over(w))
    )
    dominated = x.where(
        (F.col("_q") == F.col("_mx"))
        & (F.col("_n_at_max") == 1)
        & (F.col("_q") * F.col("_n_supp") > F.col("_tot") * 2)
    )
    return (
        dominated.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dominated"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "n_dominated")
        .orderBy(F.desc("n_dominated"), F.asc("s_suppkey"))
        .limit(25)
    )


Q20_SQL = f"""
WITH per_ps AS (
  SELECT l_partkey, l_suppkey, sum({_sql_cents("l_quantity")}) AS _q
  FROM lineitem GROUP BY l_partkey, l_suppkey
), x AS (
  SELECT l_partkey, l_suppkey, _q,
         max(_q)   OVER (PARTITION BY l_partkey) AS _mx,
         count(*)  OVER (PARTITION BY l_partkey) AS _n_supp,
         sum(_q)   OVER (PARTITION BY l_partkey) AS _tot
  FROM per_ps
), y AS (
  SELECT *, count(*) FILTER (_q = _mx) OVER (PARTITION BY l_partkey) AS _n_at_max
  FROM x
)
SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS n_dominated
FROM y JOIN supplier ON l_suppkey = s_suppkey
WHERE _q = _mx AND _n_at_max = 1 AND _q * _n_supp > _tot * 2
GROUP BY s_suppkey, s_name
ORDER BY n_dominated DESC, s_suppkey ASC
LIMIT 25
"""


def q21_last_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: per-group argmax plus multi-party existence —
    for finished multi-supplier orders, which supplier shipped the
    final line (Q21's 'supplier who kept waiting' without
    receipt/commit dates). Ties on the max ship date credit every
    tying supplier, keeping the count engine-deterministic.

    Scale: ONE exchange on l_orderkey computes both window aggregates
    (max ship date, distinct-supplier count); the orders join filters
    status='F' fact-side; the final per-supplier count is a tiny
    second exchange. No self-join of lineitem — the window form reads
    the fact once."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    supp = read_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("l_orderkey")
    last = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .withColumn("_max_sd", F.max("l_shipdate").over(w))
        .withColumn("_n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .where(
            (F.col("_n_supp") >= 2) & (F.col("l_shipdate") == F.col("_max_sd"))
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        last.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_suppkey"))
        .limit(20)
    )


Q21_SQL = """
WITH f AS (
  SELECT l_orderkey, l_suppkey, l_shipdate,
         max(l_shipdate) OVER (PARTITION BY l_orderkey) AS _max_sd,
         count(DISTINCT l_suppkey) OVER (PARTITION BY l_orderkey) AS _n_supp
  FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
), last AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM f WHERE _n_supp >= 2 AND l_shipdate = _max_sd
)
SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
FROM last JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey ASC
LIMIT 20
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the supplier in one
    region offering it at minimum cost — the correlated-MIN-subquery
    pattern. partsupp is absent, so the (part, supplier) cost table is
    derived from lineitem: cost = the cheapest line price (exact
    integer cents, no float division) that supplier ever shipped the
    part at. The original's size + type-suffix filter is adapted to
    the fixture's p_type domain ({ECONOMY..SMALL}, no BRASS suffix):
    p_size = 15 AND p_type IN (PROMO, LARGE) — selective but nonempty
    at every fixture scale, like q9/q11 adapt their predicates.
    Region is EUROPE; ties on min cost keep all suppliers, as in the
    original.

    Scale: the only wide shuffle is the (l_partkey, l_suppkey)
    aggregate — map-side combine collapses it to one row per pair
    before the exchange. part/supplier/nation/region are broadcast
    (part filtered BEFORE broadcast), and the correlated min is a
    window over the pair table partitioned by part — no join-back, no
    second scan of lineitem."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & F.col("p_type").isin("PROMO", "LARGE")
    )
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    pair_cost = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey", "p_name")
        .agg(F.min(_cents("l_extendedprice")).alias("_cost_c"))
    )
    w = Window.partitionBy("l_partkey")
    return (
        pair_cost.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .withColumn("_min_c", F.min("_cost_c").over(w))
        .where(F.col("_cost_c") == F.col("_min_c"))
        .select(
            F.col("s_acctbal"),
            F.col("s_name"),
            F.col("n_name"),
            F.col("l_partkey").alias("p_partkey"),
            F.col("p_name"),
            (F.col("_cost_c") / 100.0).alias("min_cost"),
        )
    )


Q2_SQL = f"""
WITH pair_cost AS (
  SELECT l_partkey AS p_partkey, l_suppkey, p_name,
         min({_sql_cents('l_extendedprice')}) AS _cost_c
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_size = 15 AND p_type IN ('PROMO', 'LARGE')
  GROUP BY l_partkey, l_suppkey, p_name
), regional AS (
  SELECT pc.*, s_acctbal, s_name, n_name,
         min(_cost_c) OVER (PARTITION BY p_partkey) AS _min_c
  FROM pair_cost pc
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       CAST(_cost_c AS DOUBLE) / 100.0 AS min_cost
FROM regional
WHERE _cost_c = _min_c
"""


BLOOM_JOIN_SQL = """
SELECT o_orderpriority,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_c,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderdate >= TIMESTAMP '1997-03-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
GROUP BY o_orderpriority
"""

_BLOOM_CONFS = {
    # thresholds sized for the sf0.1 harness; at warehouse scale the
    # DEFAULTS (creation ≤ 10 MB, application ≥ 10 GB scan) already
    # admit exactly this query shape — a month of orders vs years of
    # lineitem — so production needs no tuning at all
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
    "spark.sql.optimizer.runtime.bloomFilter."
    "applicationSideScanSizeThreshold": "0",
}


def bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter semi-join reduction: revenue by priority
    for ONE month of orders joined to the full lineitem scan.

    The 100 TB problem this demonstrates: when the filtered dim side
    is too big to broadcast, a plain shuffle join shuffles the ENTIRE
    fact side — petabytes of lineitem — only to drop ~97% of it at
    the join. Catalyst's InjectRuntimeFilter instead builds a bloom
    filter over the filtered orders keys (one pass over the small
    side) and pushes ``might_contain(l_orderkey)`` beneath the fact
    side's exchange, so non-matching rows are dropped BEFORE they are
    ever shuffled. The plan is compiled eagerly under temporarily
    lowered thresholds (local fixture sizes are below the production
    defaults) and the session confs are restored before returning —
    the physical plan is cached on the DataFrame, later actions reuse
    it, and no other query in the session sees the tuned confs
    (asserted in tests/test_plan_quality.py).

    AQE may still upgrade the join itself to broadcast at runtime at
    this fixture scale; the injected filter remains in the plan —
    harmless here, decisive at scale."""
    saved = {k: spark.conf.get(k) for k in _BLOOM_CONFS}
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        orders = read_table(spark, sf_dir, "orders").where(
            (F.col("o_orderdate") >= F.lit("1997-03-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        li = read_table(spark, sf_dir, "lineitem")
        out = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.sum(_cents("l_extendedprice")).alias("revenue_c"),
                F.count(F.lit(1)).cast("long").alias("n_lines"),
            )
        )
        # force physical planning NOW, while the tuned confs are live;
        # QueryExecution caches the result for every later action
        out._jdf.queryExecution().executedPlan()
        return out
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


RELATIONAL4_QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "q2_min_cost_supplier": (q2_min_cost_supplier, Q2_SQL),
    "q9_profit_by_nation_year": (q9_profit_by_nation_year, Q9_SQL),
    "q11_important_part_values": (q11_important_part_values, Q11_SQL),
    "q12_late_shipment_priority": (q12_late_shipment_priority, Q12_SQL),
    "q20_dominant_part_suppliers": (q20_dominant_part_suppliers, Q20_SQL),
    "q21_last_shipper": (q21_last_shipper, Q21_SQL),
    "bloom_pruned_join": (bloom_pruned_join, BLOOM_JOIN_SQL),
}
