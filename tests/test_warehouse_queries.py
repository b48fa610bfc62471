"""Warehouse-pattern queries: oracle parity + structural invariants."""

from __future__ import annotations

import pytest

from tests.oracle_harness import assert_matches_oracle, duck_connection
from time_series_prediction_spark.plans.warehouse_queries import (
    WAREHOUSE_QUERIES,
    events_funnel,
    events_scd2_intervals,
)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", sorted(n for n, (_, sql) in WAREHOUSE_QUERIES.items() if sql)
)
def test_warehouse_matches_oracle(spark, sf_dir, duck, name):
    fn, sql = WAREHOUSE_QUERIES[name]
    assert_matches_oracle(fn(spark, sf_dir), duck, sql, name=name)


def test_scd2_intervals_tile_without_overlap(spark, sf_dir):
    """Per user: exactly one open interval, intervals chain exactly
    (valid_to == next valid_from), and consecutive intervals never
    share a type (repeats must collapse)."""
    rows = events_scd2_intervals(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: r["valid_from"])
        assert sum(1 for r in ivs if r["is_current"]) == 1, user
        assert ivs[-1]["valid_to"] is None
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"], user
            assert a["event_type"] != b["event_type"], user


def test_funnel_is_monotone(spark, sf_dir):
    r = events_funnel(spark, sf_dir).collect()[0]
    assert r["n_viewed"] >= r["n_clicked"] >= r["n_purchased"] >= 0
    assert 0.0 <= r["view_to_click"] <= 1.0
    assert 0.0 <= r["click_to_purchase"] <= 1.0
