"""User-journey analytics: oracle parity + structural invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.oracle_harness import assert_matches_oracle, duck_connection
from time_series_prediction_spark.plans.journey_queries import (
    JOURNEY_QUERIES,
    events_attribution_last_touch,
    events_transition_matrix,
)
from time_series_prediction_spark.sources.io import read_table


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", sorted(n for n, (_, sql) in JOURNEY_QUERIES.items() if sql)
)
def test_journey_matches_oracle(spark, sf_dir, duck, name):
    fn, sql = JOURNEY_QUERIES[name]
    assert_matches_oracle(fn(spark, sf_dir), duck, sql, name=name)


def test_transition_rows_are_a_stochastic_matrix(spark, sf_dir):
    """Each from_type's probabilities sum to 1 (exactly: the shares
    are count/total divisions of one common total), and total
    transition count equals events minus one per multi-event user."""
    rows = events_transition_matrix(spark, sf_dir).collect()
    by_from: dict[str, float] = {}
    for r in rows:
        assert 0.0 < r["p_transition"] <= 1.0
        by_from[r["from_type"]] = by_from.get(r["from_type"], 0.0) \
            + r["p_transition"]
    for k, s in by_from.items():
        assert abs(s - 1.0) < 1e-12, k
    ev = read_table(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n_transitions"] for r in rows) == n_events - n_users


def test_attribution_conserves_purchase_revenue(spark, sf_dir):
    """Attribution reallocates but never creates or drops revenue:
    channel totals sum to the exact purchase cents, and 'purchase'
    never credits itself as a channel."""
    rows = events_attribution_last_touch(spark, sf_dir).collect()
    assert all(r["channel"] != "purchase" for r in rows)
    ev = read_table(spark, sf_dir, "events").where("event_type = 'purchase'")
    truth = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CAST(round(value*100) AS BIGINT)")).alias("cents"),
    ).first()
    assert sum(r["n_purchases"] for r in rows) == truth["n"]
    assert sum(r["attributed_cents"] for r in rows) == truth["cents"]


def test_top_paths_counts_and_shares(spark, sf_dir):
    """Trigram accounting: total trigrams across the corpus equal
    sum(max(n_u − 2, 0)) over per-user event counts, the top-15 shares
    are count/total of that exact denominator, and the list really is
    ordered by (count desc, path asc)."""
    from time_series_prediction_spark.plans.journey_queries import (
        events_top_paths,
    )

    rows = events_top_paths(spark, sf_dir).collect()
    assert 0 < len(rows) <= 15
    per_user = (
        read_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    total_tri = sum(max(r["n"] - 2, 0) for r in per_user)
    for r in rows:
        assert r["path"].count(" > ") == 2
        assert r["path_share"] == r["n_paths"] / total_tri
    counts = [(-r["n_paths"], r["path"]) for r in rows]
    assert counts == sorted(counts)
