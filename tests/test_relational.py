"""Every relational query must hash-match its DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest

from tests.oracle_harness import assert_matches_oracle, duck_connection
from time_series_prediction_spark.plans.relational import RELATIONAL_QUERIES


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(RELATIONAL_QUERIES))
def test_relational_query_matches_oracle(spark, sf_dir, duck, name):
    fn, sql = RELATIONAL_QUERIES[name]
    df = fn(spark, sf_dir)
    assert sql is not None
    assert_matches_oracle(df, duck, sql, name=name)
