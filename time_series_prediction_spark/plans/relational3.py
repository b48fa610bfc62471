"""Relational coverage batch 6: the remaining TPC-H-shaped queries
expressible over the fixture star schema (q7, q13, q15, q16, q17,
q19) plus the approximate-quantile scale path.

Same contract as plans/relational.py: each Spark plan beside its
DuckDB oracle, money in exact integer cents, dimension joins
broadcast, predicates native so they push into the parquet scan.
The fixture lacks partsupp and some lineitem columns (shipmode,
receiptdate, container), so q16/q17/q19 substitute equivalent
predicates over the columns that exist — the plan *shapes* (distinct
aggregation, correlated per-group average, disjunctive multi-column
predicate) are the point, and each is noted inline.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Bounded driver dictionary for part_type_cooccurrence (r14 VERDICT
# Next #5 — the components.py driverEdgeCap discipline): p_type is
# the fixed 150-value TPC-H domain at every SF, but the distinct
# collect must stay bounded on ANY input; over the cap the query
# falls back to the distributed lexical row_number dictionary.
# 0 disables the driver path.
TYPE_DICT_CAP_CONF = "spark.tsp.cooc.typeDictCap"
_TYPE_DICT_CAP_DEFAULT = 100_000

from time_series_prediction_spark.plans.relational import _cents
from time_series_prediction_spark.sources.io import read_table

QueryFn = Callable[[SparkSession, str], DataFrame]


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations by year.

    Plan shape: lineitem is the only large input; supplier/customer
    join via orders, nation twice (aliased) — both broadcast. The
    nation-pair disjunction is applied AFTER the joins (it references
    both sides), but each nation scan itself prunes to the two names,
    shrinking the broadcast to 2 rows."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    pair = ("NATION_1", "NATION_2")
    n1 = nation.where(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.where(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    rev = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(rev).alias("_r"))
        .select(
            "supp_nation",
            "cust_nation",
            F.col("l_year").cast("long").alias("l_year"),
            (F.col("_r") / 1e4).alias("revenue"),
        )
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(vol) AS DOUBLE) / 1e4 AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS vol
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name IN ('NATION_1', 'NATION_2')
    AND n2.n_name IN ('NATION_1', 'NATION_2')
    AND n1.n_name <> n2.n_name
    AND l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
) GROUP BY supp_nation, cust_nation, l_year
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of customers by order count (including
    zero-order customers via left outer join — the classic
    outer-join-then-double-aggregate shape). The priority filter
    stands in for Q13's comment NOT LIKE predicate."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .select(F.col("c_count").cast("long"), F.col("custdist").cast("long"))
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) GROUP BY c_count
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with maximum revenue over one quarter —
    aggregate, then a scalar-subquery max over the aggregate. Exact
    integer-cents revenue makes the max and the equality
    engine-independent (no float ties)."""
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    rev = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    revenue = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(rev).alias("_r"))
    )
    # the aggregate feeds its own max AND the equality join: pin it so
    # the filtered lineitem scan runs once (verified: 2 FileScans without)
    from time_series_prediction_spark.operators.materialize import materialize

    revenue = materialize(revenue)
    top = revenue.agg(F.max("_r").alias("_m"))
    return (
        revenue.join(F.broadcast(top), F.col("_r") == F.col("_m"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").cast("long"),
            "s_name",
            (F.col("_r") / 1e4).alias("total_revenue"),
        )
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) / 1e4 AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
"""


def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: COUNT(DISTINCT supplier) per part attribute
    group, with an excluded brand. The fixture has no partsupp, so the
    part↔supplier relation comes from lineitem (same distinct-agg
    plan: expand → two-phase distinct aggregation)."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#13") & (F.col("p_size") <= 25)
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .select(
            "p_brand",
            "p_type",
            F.col("p_size").cast("long"),
            F.col("supplier_cnt").cast("long"),
        )
    )


Q16_SQL = """
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13' AND p_size <= 25
GROUP BY p_brand, p_type, p_size
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: average yearly revenue lost if small-quantity orders
    (< 20% of the part's average order quantity) were not filled.

    The correlated per-part average becomes a self-aggregate + join;
    the 20%-of-average comparison is kept in pure integers
    (5·qty·cnt < Σqty ⇔ qty < 0.2·avg) so both engines decide ties
    identically. p_size < 10 stands in for Q17's container filter."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#13") & (F.col("p_size") < 10)
    )
    qty = F.col("l_quantity").cast("long")  # integer-valued doubles
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(qty).alias("sq"), F.count(F.lit(1)).alias("cnt")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("pk"))
        .where(qty * 5 * F.col("cnt") < F.col("sq"))
        .agg((F.sum(_cents("l_extendedprice")) / 100.0 / 7.0).alias("avg_yearly"))
    )


Q17_SQL = """
WITH pq AS (
  SELECT l_partkey AS pk, SUM(CAST(l_quantity AS BIGINT)) AS sq,
         COUNT(*) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
         / 100.0 / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN pq ON l_partkey = pk
WHERE p_brand = 'Brand#13' AND p_size < 10
  AND CAST(l_quantity AS BIGINT) * 5 * cnt < sq
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under a three-branch disjunctive
    predicate spanning both join sides (brand × size-range ×
    quantity-range). Exercises OR-of-ANDs predicate handling: Catalyst
    extracts the common l_partkey=p_partkey conjunct so the join stays
    an equi hash join, with the residual disjunction as a post-join
    filter (container/shipmode branches replaced by size bands)."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    branch = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & qty.between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#7")
            & F.col("p_size").between(1, 25)
            & qty.between(10, 25)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(1, 35)
            & qty.between(20, 35)
        )
    )
    rev = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(branch)
        .agg((F.sum(rev) / 1e4).alias("revenue"))
    )


Q19_SQL = """
SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
            * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)
         / 1e4 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1  AND 15)
   OR (p_brand = 'Brand#7'  AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 35)
"""


def lineitem_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (Greenwald-Khanna sketch) of
    l_extendedprice per returnflag — the single-pass, bounded-memory
    scale path beside the exact sort-based percentiles
    (price_percentiles_by_segment). Sketches merge associatively
    across partitions, so at 100 TB this is one scan + tiny exchange
    of sketch state, no full sort. Engine-specific sketch ⇒ rows-only
    driver check; the error bound vs exact percentiles is pinned in
    tests/test_relational3.py.

    Output is four scalar columns (p25/p50/p75/p95) rather than one
    array column — array cells are unhashable for downstream
    canonicalizers (pandas sort) and scalar columns are the friendlier
    relational shape anyway.

    SELF-VERIFYING (r12 Next #5): joins its oracle-backed PORTABLE
    twin (``portable_quantile_sql``, relative error ≤ 2^-4 by
    construction, reporting bucket LOWER bounds) and emits
    ``max_gap_frac`` = the worst per-percentile relative gap — a
    silent native-GK regression can't hide behind the rows-only
    check (bound pinned in tests/test_sketch_portable.py at sf0.1)."""
    from time_series_prediction_spark.operators.sketch_portable import (
        portable_quantile_sql,
    )

    li = read_table(spark, sf_dir, "lineitem")
    q = F.percentile_approx("l_extendedprice", [0.25, 0.5, 0.75, 0.95], 10000)
    native = (
        li.groupBy("l_returnflag")
        .agg(q.alias("_q"), F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            "l_returnflag",
            F.col("_q")[0].alias("p25"),
            F.col("_q")[1].alias("p50"),
            F.col("_q")[2].alias("p75"),
            F.col("_q")[3].alias("p95"),
            "n",
        )
    )
    li.createOrReplaceTempView("_li_quant_native_check")
    portable = spark.sql(
        portable_quantile_sql("_li_quant_native_check")
    ).selectExpr(
        "l_returnflag",
        "p25 AS q25",
        "p50 AS q50",
        "p75 AS q75",
        "p95 AS q95",
    )
    gap = F.greatest(
        *[
            F.abs(F.col(f"p{p}") - F.col(f"q{p}")) / F.col(f"p{p}")
            for p in (25, 50, 75, 95)
        ]
    )
    return native.join(portable, "l_returnflag").select(
        "l_returnflag", "p25", "p50", "p75", "p95", "n",
        gap.alias("max_gap_frac"),
    )


def events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind cube/rollup,
    both covered elsewhere): per (type, day), per type, and grand
    total in ONE pass — Catalyst plans a single Expand + aggregation
    rather than three scans + union. grouping() flags disambiguate
    'null because rolled up' from 'null in the data'."""
    read_table(spark, sf_dir, "events").createOrReplaceTempView("_ev_gs")
    return spark.sql(
        """
        SELECT event_type,
               to_date(ts) AS day,
               CAST(grouping(event_type) AS BIGINT) AS g_type,
               CAST(grouping(to_date(ts)) AS BIGINT) AS g_day,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
                 AS total_value
        FROM _ev_gs
        GROUP BY GROUPING SETS ((event_type, to_date(ts)), (event_type), ())
        """
    )


EVENTS_GROUPING_SETS_SQL = """
SELECT event_type,
       CAST(ts AS DATE) AS day,
       CAST(GROUPING(event_type) AS BIGINT) AS g_type,
       CAST(GROUPING(CAST(ts AS DATE)) AS BIGINT) AS g_day,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS total_value
FROM events
GROUP BY GROUPING SETS ((event_type, CAST(ts AS DATE)), (event_type), ())
"""


def order_cohort_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation composition: customers ordering in BOTH 1996 and
    1997 (INTERSECT) minus customers who ever placed an URGENT order
    (EXCEPT). Complements the INTERSECT-only query in plans/relational;
    Catalyst rewrites both ops to semi/anti joins — no sort-unique
    pass over the data."""
    orders = read_table(spark, sf_dir, "orders")

    def keys(year: int) -> DataFrame:
        return orders.where(F.year("o_orderdate") == year).select("o_custkey")

    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    return (
        keys(1996)
        .intersect(keys(1997))
        .subtract(urgent)  # EXCEPT (distinct) — matches the SQL twin
        .select(F.col("o_custkey").cast("long").alias("custkey"))
    )


ORDER_COHORT_SETOPS_SQL = """
SELECT CAST(o_custkey AS BIGINT) AS custkey FROM (
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
  INTERSECT
  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
)
EXCEPT
SELECT CAST(o_custkey AS BIGINT) FROM orders
WHERE o_orderpriority = '1-URGENT'
"""


def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: quartile scores for Recency (latest order),
    Frequency (order count), Monetary (lifetime cents), combined into
    a 3-digit segment code, then segment-level accounting. Every ntile
    ORDER BY carries the unique custkey tiebreak so quartile cuts are
    engine-independent (ntile over ties is otherwise row-order-
    dependent). One aggregation + three windows over the same
    partitioning + one small re-aggregation."""
    orders = read_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    base = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(_cents("o_totalprice")).alias("monetary_cents"),
    )
    r = F.ntile(4).over(
        Window.orderBy(F.desc("last_order"), F.asc("o_custkey"))
    )
    f = F.ntile(4).over(
        Window.orderBy(F.desc("frequency"), F.asc("o_custkey"))
    )
    m = F.ntile(4).over(
        Window.orderBy(F.desc("monetary_cents"), F.asc("o_custkey"))
    )
    scored = base.select(
        "o_custkey",
        "monetary_cents",
        (r * 100 + f * 10 + m).alias("rfm_segment"),
    )
    return scored.groupBy("rfm_segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        (F.sum("monetary_cents") / 100.0).alias("segment_value"),
    )


CUSTOMER_RFM_SQL = """
WITH base AS (
  SELECT o_custkey,
         MAX(o_orderdate) AS last_order,
         COUNT(*) AS frequency,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS monetary_cents
  FROM orders GROUP BY o_custkey
), scored AS (
  SELECT o_custkey, monetary_cents,
         ntile(4) OVER (ORDER BY last_order DESC, o_custkey ASC) * 100
       + ntile(4) OVER (ORDER BY frequency DESC, o_custkey ASC) * 10
       + ntile(4) OVER (ORDER BY monetary_cents DESC, o_custkey ASC)
         AS rfm_segment
  FROM base
)
SELECT rfm_segment, COUNT(*) AS n_customers,
       CAST(SUM(monetary_cents) AS DOUBLE) / 100.0 AS segment_value
FROM scored GROUP BY rfm_segment
"""


def part_type_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: top-50 pairs of part types bought
    in the same order. Plan shape: ONE shuffle (groupBy order) collects
    each basket's sorted distinct types, then ordered pairs are
    generated by a pair of codegen'd explodes — no self equi-join, so
    the order-keyed subtree is computed once, and the quadratic
    blow-up is bounded per order (basket size), never global.

    r14 (guide §2.3/§4.1): the ~25-char p_type strings are
    dictionary-encoded to ints BEFORE the basket shuffle — codes are
    assigned in lexical order, so every array sort, pair direction and
    the top-50 tie-break are bit-identical on codes — and the
    interpreted nested-``transform`` pair lambda is replaced by
    posexplode+slice+explode, which stays inside WholeStageCodegen.
    The dictionary itself is DRIVER-side (guide §1.2): p_type is the
    fixed TPC-H 6×5×5 = 150-value domain at EVERY scale factor, so one
    bounded distinct-collect replaces a window subplan that three
    separate broadcast builds (pcode, ta, tb) each re-computed —
    encode/decode become literal-map lookups, no joins at all."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    # lexical dictionary: code order == string order, so the top-50
    # cut on codes selects exactly the rows the string cut would.
    # r15 (VERDICT Next #5): the collect is CAPPED — limit(cap+1)
    # bounds the driver pull; a dictionary over the cap falls back to
    # the distributed lexical row_number dictionary (identical codes,
    # identical result; pinned by test via cap=0).
    cap = int(
        spark.conf.get(TYPE_DICT_CAP_CONF, str(_TYPE_DICT_CAP_DEFAULT))
    )
    tvals = (
        sorted(
            r[0]
            for r in part.select("p_type")
            .distinct()
            .limit(cap + 1)
            .collect()
        )
        if cap > 0
        else None
    )
    driver_dict = tvals is not None and len(tvals) <= cap
    if driver_dict:
        enc = F.create_map(
            *[x for t, i in zip(tvals, range(1, len(tvals) + 1))
              for x in (F.lit(t), F.lit(i))]
        )
        pcode = part.select(
            "p_partkey", F.element_at(enc, F.col("p_type")).alias("tcode")
        )
    else:
        tdict = (
            part.select("p_type")
            .distinct()
            .select(
                "p_type",
                F.row_number()
                .over(Window.orderBy(F.asc("p_type")))
                .alias("tcode"),
            )
        )
        pcode = part.join(tdict, "p_type").select("p_partkey", "tcode")
    ot = (
        li.join(F.broadcast(pcode), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("tcode")).alias("ts"))
        .where(F.size("ts") >= 2)
    )
    pairs = ot.select("ts", F.posexplode("ts").alias("i", "code_a")).select(
        "code_a",
        F.explode(F.expr("slice(ts, i + 2, size(ts) - i - 1)")).alias(
            "code_b"
        ),
    )
    cnt = (
        pairs.groupBy("code_a", "code_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("code_a"), F.asc("code_b"))
        .limit(50)
    )
    if driver_dict:
        dec = F.create_map(
            *[x for t, i in zip(tvals, range(1, len(tvals) + 1))
              for x in (F.lit(i), F.lit(t))]
        )
        decoded = cnt.select(
            F.element_at(dec, F.col("code_a")).alias("type_a"),
            F.element_at(dec, F.col("code_b")).alias("type_b"),
            "n_orders",
        )
    else:
        da = tdict.select(
            F.col("tcode").alias("code_a"), F.col("p_type").alias("type_a")
        )
        db = tdict.select(
            F.col("tcode").alias("code_b"), F.col("p_type").alias("type_b")
        )
        decoded = (
            cnt.join(F.broadcast(da), "code_a")
            .join(F.broadcast(db), "code_b")
            .select("type_a", "type_b", "n_orders")
        )
    return decoded.orderBy(
        F.desc("n_orders"), F.asc("type_a"), F.asc("type_b")
    )


PART_TYPE_COOCCURRENCE_SQL = """
WITH ot AS (
  SELECT DISTINCT l_orderkey, p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT a.p_type AS type_a, b.p_type AS type_b, COUNT(*) AS n_orders
FROM ot a JOIN ot b
  ON a.l_orderkey = b.l_orderkey AND a.p_type < b.p_type
GROUP BY a.p_type, b.p_type
ORDER BY n_orders DESC, type_a ASC, type_b ASC
LIMIT 50
"""


RELATIONAL3_QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "part_type_cooccurrence": (
        part_type_cooccurrence,
        PART_TYPE_COOCCURRENCE_SQL,
    ),
    "customer_rfm_segments": (customer_rfm_segments, CUSTOMER_RFM_SQL),
    "order_cohort_setops": (order_cohort_setops, ORDER_COHORT_SETOPS_SQL),
    "events_grouping_sets": (events_grouping_sets, EVENTS_GROUPING_SETS_SQL),
    "q7_volume_shipping": (q7_volume_shipping, Q7_SQL),
    "q13_customer_distribution": (q13_customer_distribution, Q13_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "q16_part_supplier_counts": (q16_part_supplier_counts, Q16_SQL),
    "q17_small_quantity_revenue": (q17_small_quantity_revenue, Q17_SQL),
    "q19_disjunctive_revenue": (q19_disjunctive_revenue, Q19_SQL),
    "lineitem_quantiles_approx": (lineitem_quantiles_approx, None),
}
