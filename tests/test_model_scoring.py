"""End-to-end serve path: pre_process -> iterator-pandas_udf scoring ->
post_process -> R2, with stub models (TF not in this image)."""

from __future__ import annotations

import numpy as np
import pytest

from time_series_prediction_spark.model.scoring import (
    keras_cnn_factory,
    last_value_model_factory,
    score_dataframe,
    zero_model_factory,
)
from time_series_prediction_spark.plans.preprocess import (
    clean_series,
    post_processing,
    pre_processing,
    r2_metrics,
)
from time_series_prediction_spark.sources.generate import generate_series_frame


def test_full_serve_path_with_stub_model(spark):
    raw = generate_series_frame(spark, 30, seed=5)
    pre = pre_processing(clean_series(raw), "2020-03-31", serving=True)
    scored = score_dataframe(pre, zero_model_factory())
    post = post_processing(scored)
    rows = post.select("mean", "y_pred", "y_pred_rescaled").collect()
    assert all(len(r["y_pred"]) == 92 for r in rows)
    for r in rows:
        np.testing.assert_allclose(
            np.asarray(r["y_pred_rescaled"], dtype=float),
            np.full(92, r["mean"]),
            rtol=1e-5,
        )


def test_last_value_model_beats_zero_model_on_r2(spark):
    raw = generate_series_frame(spark, 60, seed=11)
    pre = pre_processing(clean_series(raw), "2020-03-31", serving=False)
    out = {}
    for name, factory in {
        "zero": zero_model_factory(),
        "last": last_value_model_factory(),
    }.items():
        scored = post_processing(score_dataframe(pre, factory))
        m = r2_metrics(scored, y_pred_col="y_pred_rescaled_retrended").first()
        out[name] = m["r2_3month"]
    # persistence forecast must explain more variance than the mean
    assert out["last"] > out["zero"]


def test_cashflow_scoring_pipeline_registry_shape(spark, sf_dir):
    """The registry e2e (S.1→S.3 + E.2 on the events fixture): one
    row, every series that passed cleaning scored, finite metrics,
    and run-to-run determinism."""
    import math

    from time_series_prediction_spark.plans.flagship import (
        cashflow_scoring_pipeline,
    )

    a = cashflow_scoring_pipeline(spark, sf_dir).collect()
    b = cashflow_scoring_pipeline(spark, sf_dir).collect()
    assert len(a) == 1
    row = a[0]
    assert row["n_series"] > 0
    assert math.isfinite(row["r2_horizon"]) and math.isfinite(row["r2_3day"])
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_scoring_pipeline_matches_oracle_exactly(spark, sf_dir):
    """Round-8 graduation: the FULL serving lifecycle — pandas_udf
    scoring stage included — must be BIT-exact against the generated
    DuckDB oracle (no float tolerance; the driver's t2 gate hashes
    values). Works because the last-value model does no arithmetic
    (float32 passthrough) and the cross-series R² mean is quantized
    to integer ppm before averaging (order-free sums)."""
    import numpy as np
    import pandas as pd

    from tests.oracle_harness import _normalize, duck_connection
    from time_series_prediction_spark.plans.flagship import (
        CASHFLOW_SCORING_SQL,
        cashflow_scoring_pipeline,
    )

    con = duck_connection(sf_dir)
    got = _normalize(cashflow_scoring_pipeline(spark, sf_dir).toPandas())
    want = _normalize(con.execute(CASHFLOW_SCORING_SQL).df())
    con.close()
    assert got.shape == want.shape
    assert got.shape[0] == 1
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        eq = (g == w) | (pd.isna(g) & pd.isna(w))
        assert np.all(eq), (c, got[c], want[c])


def test_keras_factory_raises_without_tf(spark):
    raw = generate_series_frame(spark, 5, seed=1)
    pre = pre_processing(clean_series(raw), "2020-03-31", serving=True)
    scored = score_dataframe(pre, keras_cnn_factory("/nonexistent"))
    with pytest.raises(Exception, match="tensorflow|NotImplementedError"):
        scored.select("y_pred").collect()
