"""Declarative quality-audit operator: planted violations are counted
exactly, clean data reports zeros, and the audit stays one scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from time_series_prediction_spark.operators.quality_checks import (
    audit_columns,
    audit_reference,
    in_range,
    not_null,
    satisfies,
)
from time_series_prediction_spark.plans.warehouse_queries import (
    orders_quality_audit,
)


def _report(df):
    return {r.check_name: (r.n_checked, r.n_violations) for r in df.collect()}


def test_audit_counts_planted_violations(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "ok"),
            (2, -5.0, "ok"),     # range violation
            (None, 20.0, "ok"),  # null violation
            (4, 200.0, "bad"),   # range + rule violations
            (4, 30.0, None),     # duplicate id + NULL rule (counts as fail)
        ],
        "id int, price double, status string",
    )
    rep = _report(
        audit_columns(
            df,
            [
                not_null("id"),
                in_range("price", lo=0.0, hi=100.0),
                satisfies("status_ok", F.col("status") == "ok"),
            ],
            unique_cols=["id"],
        )
    )
    assert rep == {
        "id_not_null": (5, 1),
        "price_in_range": (5, 2),
        "status_ok": (5, 2),
        "id_unique": (5, 1),
    }


def test_audit_null_semantics(spark):
    """NULL never violates a range check; NULL always fails a
    satisfies rule — the two documented conventions."""
    df = spark.createDataFrame([(None,)], "v double")
    rep = _report(
        audit_columns(
            df,
            [in_range("v", lo=0.0), satisfies("v_pos", F.col("v") > 0)],
        )
    )
    assert rep == {"v_in_range": (1, 0), "v_pos": (1, 1)}


def test_audit_reference_counts_orphans(spark):
    child = spark.createDataFrame(
        [(1,), (1,), (2,), (9,), (None,)], "fk int"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    rep = _report(audit_reference(child, "fk", parent, "pk", "fk_check"))
    # 3 distinct non-null child keys, one (9) orphaned; NULLs are
    # completeness's job, not referential integrity's
    assert rep == {"fk_check": (3, 1)}


def test_audit_is_single_scan(spark):
    """However many checks: one aggregate over one scan, no join."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("a"), (F.col("id") % 3).alias("b")
    )
    audited = audit_columns(
        df,
        [not_null("a"), in_range("a", 0, 6), not_null("b"), in_range("b", 0, 2)],
        unique_cols=["id"],
    )
    plan = audited._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Scan") <= 1
    rep = _report(audited)
    assert all(v == 0 for (_, v) in rep.values())


def test_orders_audit_clean_fixture(spark, sf_dir):
    rep = _report(orders_quality_audit(spark, sf_dir))
    assert len(rep) == 9
    assert all(v == 0 for (_, v) in rep.values()), rep
    assert rep["o_orderkey_unique"][0] == rep["o_custkey_not_null"][0]


def test_audit_empty_checks_raises(spark):
    """An empty audit must fail loudly, not build stack(0, )."""
    import pytest

    df = spark.range(3)
    with pytest.raises(ValueError, match="at least one check"):
        audit_columns(df, [], unique_cols=[])
