"""Exact-accumulator correlation matrix: oracle parity, agreement
with Spark's built-in corr, and range sanity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.oracle_harness import assert_matches_oracle, duck_connection
from time_series_prediction_spark.plans.stats_queries import (
    LINEITEM_CORR_SQL,
    lineitem_correlation_matrix,
)
from time_series_prediction_spark.sources.io import read_table


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


def test_correlation_matches_oracle(spark, sf_dir, duck):
    assert_matches_oracle(
        lineitem_correlation_matrix(spark, sf_dir),
        duck,
        LINEITEM_CORR_SQL,
        name="lineitem_correlation_matrix",
    )


def test_correlation_agrees_with_builtin(spark, sf_dir):
    """The exact-integer route must agree with Spark's streaming
    co-moment corr to float tolerance (they differ only in
    accumulation order)."""
    got = {
        r["pair"]: r["corr"]
        for r in lineitem_correlation_matrix(spark, sf_dir).collect()
    }
    li = read_table(spark, sf_dir, "lineitem").selectExpr(
        "CAST(round(l_quantity) AS BIGINT) AS qty",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents",
        "CAST(round(l_discount * 100) AS BIGINT) AS disc_pct",
        "CAST(round(l_tax * 100) AS BIGINT) AS tax_pct",
    )
    for pair, r in got.items():
        a, b = pair.split("~")
        want = li.agg(F.corr(a, b)).first()[0]
        assert abs(r - want) < 1e-9, (pair, r, want)
        assert -1.0 <= r <= 1.0
