"""Batch-3 window/reshape queries vs DuckDB oracles."""

from __future__ import annotations

import pytest

from tests.oracle_harness import assert_matches_oracle, duck_connection
from time_series_prediction_spark.plans.window_queries import WINDOW_QUERIES


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(WINDOW_QUERIES))
def test_window_query_matches_oracle(spark, sf_dir, duck, name):
    fn, sql = WINDOW_QUERIES[name]
    assert sql is not None
    assert_matches_oracle(fn(spark, sf_dir), duck, sql, name=name)
