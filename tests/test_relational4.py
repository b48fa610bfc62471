"""Oracle checks for relational batch 7 (adapted q9/q11/q12/q20/q21)
plus shape invariants the oracle comparison alone can't pin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.oracle_harness import assert_matches_oracle, duck_connection
from time_series_prediction_spark.plans.relational4 import (
    RELATIONAL4_QUERIES,
    q11_important_part_values,
    q20_dominant_part_suppliers,
    q21_last_shipper,
)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", sorted(n for n, (_, sql) in RELATIONAL4_QUERIES.items() if sql)
)
def test_relational4_matches_oracle(spark, sf_dir, duck, name):
    fn, sql = RELATIONAL4_QUERIES[name]
    assert_matches_oracle(fn(spark, sf_dir), duck, sql, name=name)


def test_q2_nonempty_and_min_per_part(spark, sf_dir):
    """Guard against a fixture-empty predicate (the round-3 p_type
    LIKE '%BRASS' filter matched nothing, so the oracle 'pass' was
    0 == 0): q2 must select rows, and every surviving row's cost must
    be the minimum among its part's survivors."""
    from collections import defaultdict

    from time_series_prediction_spark.plans.relational4 import (
        q2_min_cost_supplier,
    )

    rows = q2_min_cost_supplier(spark, sf_dir).collect()
    assert rows, "q2 predicate selected nothing on the fixture"
    by_part = defaultdict(list)
    for r in rows:
        by_part[r["p_partkey"]].append(r["min_cost"])
    for costs in by_part.values():
        assert all(c == costs[0] for c in costs)


def test_q11_values_exceed_share_threshold(spark, sf_dir):
    """The HAVING predicate restated independently: recompute every
    part's EUROPE-supplier revenue with plain groupBy and check the
    survivors are exactly the parts above 0.5% of the group total."""
    from time_series_prediction_spark.sources.io import read_table

    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    per = (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "EUROPE")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
                * (100 - F.round(F.col("l_discount") * 100).cast("long"))
            ).alias("v")
        )
        .collect()
    )
    total = sum(r["v"] for r in per)
    expect = {r["l_partkey"] for r in per if r["v"] * len(per) * 2 > total * 3}
    rows = q11_important_part_values(spark, sf_dir).collect()
    assert rows, "threshold filtered everything out"
    assert {r["p_partkey"] for r in rows} == expect


def test_q20_dominance_recomputed_groupwise(spark, sf_dir):
    """Dominated-part counts re-derived with a driver-side fold over
    the grouped (part, supplier) quantities must reproduce the
    window-plan result exactly (before the top-25 cut)."""
    from collections import Counter, defaultdict

    from time_series_prediction_spark.sources.io import read_table

    li = read_table(spark, sf_dir, "lineitem")
    per = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("q"))
        .collect()
    )
    by_part = defaultdict(list)
    for r in per:
        by_part[r["l_partkey"]].append((r["l_suppkey"], r["q"]))
    counts: Counter = Counter()
    for rows in by_part.values():
        qs = [q for _, q in rows]
        mx, tot, n = max(qs), sum(qs), len(qs)
        if qs.count(mx) != 1:
            continue
        supp, q = next((s, q) for s, q in rows if q == mx)
        if q * n > tot * 2:
            counts[supp] += 1
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    got = [
        (r["s_suppkey"], r["n_dominated"])
        for r in q20_dominant_part_suppliers(spark, sf_dir).collect()
    ]
    assert got == expect
    assert got, "dominance predicate selected nothing"


def test_q21_only_multi_supplier_orders_counted(spark, sf_dir):
    """numwait never exceeds the number of multi-supplier 'F' orders."""
    from time_series_prediction_spark.sources.io import read_table

    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    n_multi = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("ns"))
        .where(F.col("ns") >= 2)
        .count()
    )
    rows = q21_last_shipper(spark, sf_dir).collect()
    assert rows
    assert all(0 < r["numwait"] <= n_multi for r in rows)
    # ordered by numwait desc then suppkey asc
    key = [(-r["numwait"], r["s_suppkey"]) for r in rows]
    assert key == sorted(key)
