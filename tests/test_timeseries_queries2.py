"""Batch-2 time-series queries vs DuckDB oracles."""

from __future__ import annotations

import pytest

from tests.oracle_harness import assert_matches_oracle, duck_connection
from time_series_prediction_spark.plans.timeseries_queries2 import (
    TIMESERIES2_QUERIES,
)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(TIMESERIES2_QUERIES))
def test_timeseries2_query_matches_oracle(spark, sf_dir, duck, name):
    fn, sql = TIMESERIES2_QUERIES[name]
    if sql is None:  # rows-only (generator/statsmodels path)
        df = fn(spark, sf_dir)
        assert df.count() > 0
        return
    assert_matches_oracle(fn(spark, sf_dir), duck, sql, name=name)
