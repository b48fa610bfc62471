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


def test_holt_forecast_matches_numpy(spark, sf_dir):
    """The aggregate-fold Holt recurrence must match a NumPy reference
    implementation (classic init: l=x1, b=x2-x1, iterate from t=2)."""
    import numpy as np

    from time_series_prediction_spark.plans.timeseries_queries import (
        daily_series,
    )
    from time_series_prediction_spark.plans.timeseries_queries2 import (
        _ALPHA,
        _BETA,
        ts_holt_forecast,
    )

    got = {
        r["user_id"]: r
        for r in ts_holt_forecast(spark, sf_dir).collect()
    }
    pdf = daily_series(spark, sf_dir).toPandas()
    for uid, g in pdf.groupby("user_id"):
        xs = (g.sort_values("day")["cents"].to_numpy() / 100.0).astype(float)
        if len(xs) < 2:
            assert uid not in got
            continue
        l, b = xs[0], xs[1] - xs[0]
        for x in xs[1:]:
            l_new = _ALPHA * x + (1 - _ALPHA) * (l + b)
            b = _BETA * (l_new - l) + (1 - _BETA) * b
            l = l_new
        row = got[uid]
        assert row["n_days"] == len(xs)
        np.testing.assert_allclose(row["level"], round(l, 6), atol=1e-6)
        np.testing.assert_allclose(row["trend"], round(b, 6), atol=1e-6)
        np.testing.assert_allclose(row["yhat_1"], round(l + b, 6), atol=1e-6)
        np.testing.assert_allclose(
            row["yhat_30"], round(l + 30 * b, 6), atol=1e-6
        )


def test_cashflow_wide_summary_matches_oracle_exactly(spark, sf_dir):
    """Round-7 graduation: the flagship W1→W9→W10 pipeline must be
    BIT-exact against the generated DuckDB list-lambda oracle — same
    IEEE op sequence, same shortest-repr half-even rounding. Stricter
    than assert_matches_oracle (no float tolerance): the driver's
    t2 gate hashes values."""
    import numpy as np
    import pandas as pd

    from tests.oracle_harness import _normalize, duck_connection
    from time_series_prediction_spark.plans.flagship import (
        CASHFLOW_WIDE_SQL,
        cashflow_wide_summary,
    )

    con = duck_connection(sf_dir)
    got = _normalize(cashflow_wide_summary(spark, sf_dir).toPandas())
    want = _normalize(con.execute(CASHFLOW_WIDE_SQL).df())
    con.close()
    assert got.shape == want.shape
    assert got.shape[0] > 0
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        eq = (g == w) | (pd.isna(g) & pd.isna(w))
        assert np.all(eq), (c, got[~eq].head(), want[~eq].head())


def test_backtest_parameterization(spark, sf_dir):
    """Round-7 brief #6: the backtest is a parameterized grid sweep.
    Different grids produce per-cutoff rows for exactly their cutoffs;
    sMAPE terms are bounded by construction (<= 2e6 ppm per
    prediction); pinball90 penalizes under-forecast 9x over-forecast."""
    from time_series_prediction_spark.plans.timeseries_queries2 import (
        linear_backtest,
    )

    grid = ("2024-01-14", "2024-01-21")
    df = linear_backtest(
        spark, sf_dir, cutoffs=grid, horizon=3,
        losses=("mae", "smape", "pinball90"),
    )
    rows = {str(r.cutoff_day): r for r in df.collect()}
    assert set(rows) == set(grid)
    for r in rows.values():
        assert r.n_pred > 0
        assert 0 <= r.sum_smape_ppm <= 2_000_000 * r.n_pred
        assert r.sum_abs_err_mc >= 0
        assert r.sum_pinball90_mc >= 0
        # pinball at q=0.9 is bounded by 0.9x the MAE mass
        assert r.sum_pinball90_mc <= 0.9 * r.sum_abs_err_mc + r.n_pred


def test_theta_forecast_matches_numpy(spark, sf_dir):
    """The theta forecast must match an independent NumPy reference
    (plain SES loop + np.polyfit drift, nothing shared with either
    engine's expression text): forecast = SES level + 0.5·OLS-slope·h."""
    import numpy as np

    from time_series_prediction_spark.plans.timeseries_queries import (
        daily_series,
    )
    from time_series_prediction_spark.plans.timeseries_queries2 import (
        _ALPHA,
        ts_theta_forecast,
    )

    got = {
        r["user_id"]: r
        for r in ts_theta_forecast(spark, sf_dir).collect()
    }
    pdf = daily_series(spark, sf_dir).toPandas()
    for uid, g in pdf.groupby("user_id"):
        xs = (g.sort_values("day")["cents"].to_numpy() / 100.0).astype(float)
        if len(xs) < 2:
            assert uid not in got
            continue
        level = xs[0]
        for x in xs[1:]:
            level = _ALPHA * x + (1 - _ALPHA) * level
        slope = np.polyfit(np.arange(1, len(xs) + 1), xs, 1)[0]
        row = got[uid]
        assert row["n_days"] == len(xs)
        np.testing.assert_allclose(row["level"], level, atol=1e-6)
        np.testing.assert_allclose(row["drift"], 0.5 * slope, atol=1e-6)
        np.testing.assert_allclose(
            row["yhat_1"], level + 0.5 * slope, atol=1e-6
        )
        np.testing.assert_allclose(
            row["yhat_30"], level + 0.5 * slope * 30, atol=1e-6
        )
