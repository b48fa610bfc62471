"""Pure-NumPy 1-D CNN trainer (r13 VERDICT Next #3): analytic-gradient
correctness, seeded determinism, loss decrease on a learnable mapping,
save/load round-trip, and the full reference lifecycle —
train → register → score (iterator pandas_udf) → R² — in a TF-less
image. Reference topology: notebooks/utils.py:435-460; training loop:
notebooks/training_new_petastorm.py:282-303."""

from __future__ import annotations

import numpy as np
import pytest

from time_series_prediction_spark.model.numpy_cnn import (
    NumpyCNN1D,
    fit_numpy_cnn,
)


def _toy_data(n=64, x_days=20, y_days=4, seed=3):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, x_days))
    # learnable target: each horizon day = mean of the last 4 inputs
    # plus a per-day offset
    base = x[:, -4:].mean(axis=1, keepdims=True)
    y = base + np.arange(y_days) * 0.1
    return x, y


def test_gradient_matches_numeric():
    """Central-difference check of the analytic backprop on every
    parameter tensor (a handful of coordinates each) — the one test
    that catches a wrong conv/pool/dense gradient immediately."""
    x, y = _toy_data(n=8, x_days=12, y_days=3, seed=1)
    m = NumpyCNN1D(12, 3, filters=4, dense_units=6, seed=7)

    def loss() -> float:
        yhat, _ = m._forward(x)
        return float(np.abs(yhat - y).mean())

    # one analytic step's gradients, recovered from the Adam state
    # would be indirect — instead recompute them exactly as
    # train_batch does, by calling it on a COPY and diffing is messy;
    # simplest: re-derive via the private pieces
    yhat, (win, z, arg, flat, h_pre, h) = m._forward(x)
    b = x.shape[0]
    gy = np.sign(yhat - y) / (b * m.y_days)
    gW2 = h.T @ gy
    gh = (gy @ m.W2.T) * (h_pre > 0)
    gW1 = flat.T @ gh
    gflat = gh @ m.W1.T
    gpool = gflat.reshape(b, m.pool_len, m.filters)
    ga = np.zeros((b, m.pool_len, m.pool_size, m.filters))
    np.put_along_axis(ga, arg[:, :, None, :], gpool[:, :, None, :], 2)
    usable = m.pool_len * m.pool_size
    gz = np.zeros_like(z)
    gz[:, :usable, :] = ga.reshape(b, usable, m.filters)
    gz *= z > 0
    gWc = np.einsum("blk,blf->kf", win, gz)
    analytic = {"Wc": gWc, "W1": gW1, "W2": gW2,
                "bc": gz.sum(axis=(0, 1)), "b1": gh.sum(axis=0),
                "b2": gy.sum(axis=0)}

    rng = np.random.default_rng(0)
    eps = 1e-6
    for name, g in analytic.items():
        p = getattr(m, name)
        for _ in range(5):
            idx = tuple(rng.integers(0, s) for s in p.shape)
            old = p[idx]
            p[idx] = old + eps
            up = loss()
            p[idx] = old - eps
            dn = loss()
            p[idx] = old
            num = (up - dn) / (2 * eps)
            assert abs(num - g[idx]) <= 1e-6 + 1e-4 * abs(num), (
                name, idx, num, g[idx]
            )


def test_deterministic_and_loss_decreases():
    """Same seed + same data order → bit-identical weights and
    predictions; training on a learnable mapping cuts MAE by >50%."""
    x, y = _toy_data()
    batches = [(x[i:i + 16], y[i:i + 16]) for i in range(0, 64, 16)]

    m1 = NumpyCNN1D(20, 4, filters=8, dense_units=10, seed=42)
    hist1 = m1.fit(batches, epochs=40)
    m2 = NumpyCNN1D(20, 4, filters=8, dense_units=10, seed=42)
    hist2 = m2.fit(batches, epochs=40)
    assert hist1 == hist2  # float-for-float identical training run
    assert np.array_equal(m1.predict(x), m2.predict(x))
    assert hist1[-1] < 0.5 * hist1[0], hist1[:3] + hist1[-3:]
    # a different seed genuinely changes the run
    m3 = NumpyCNN1D(20, 4, filters=8, dense_units=10, seed=43)
    assert not np.array_equal(m1.predict(x), m3.predict(x))


def test_golden_predictions_pinned():
    """Hardcoded goldens from the r14 implementation: any silent
    change to init, forward, backprop, or Adam shifts these — the
    cross-round drift guard."""
    x, y = _toy_data()
    batches = [(x[i:i + 16], y[i:i + 16]) for i in range(0, 64, 16)]
    m = NumpyCNN1D(20, 4, filters=8, dense_units=10, seed=42)
    hist = m.fit(batches, epochs=5)
    np.testing.assert_allclose(
        hist,
        [0.8685782758, 0.7875268819, 0.7149877593,
         0.6546462185, 0.6085885303],
        rtol=0, atol=1e-9,
    )
    np.testing.assert_allclose(
        m.predict(x[:1])[0],
        [-0.14844452, 0.36217168, -0.16413069, -0.97290295],
        rtol=0, atol=1e-6,
    )


def test_save_load_roundtrip_and_3d_input(tmp_path):
    x, y = _toy_data(n=16)
    m = NumpyCNN1D(20, 4, filters=8, dense_units=10, seed=5)
    m.fit([(x, y)], epochs=3)
    p = str(tmp_path / "cnn.npz")
    m.save(p)
    m2 = NumpyCNN1D.load(p)
    got = m2.predict(x)
    assert np.array_equal(got, m.predict(x))
    # keras-shaped (B, T, 1) input accepted identically
    assert np.array_equal(m.predict(x[:, :, None]), got)


def test_full_lifecycle_train_register_score_r2(spark, tmp_path):
    """The reference lifecycle end-to-end WITHOUT tensorflow:
    pre_process → fit_numpy_cnn (training_batches feed) → save →
    file-backed registry → iterator-pandas_udf scoring → R² — the one
    stage (T.3) that previously could not run in this image."""
    from time_series_prediction_spark.model.registry import (
        LocalModelRegistry,
    )
    from time_series_prediction_spark.model.scoring import (
        cnn_factory,
        score_dataframe,
    )
    from time_series_prediction_spark.plans.preprocess import (
        clean_series,
        pre_processing,
        train_val_test_split,
    )
    from time_series_prediction_spark.sources.generate import (
        generate_series_frame,
    )

    from time_series_prediction_spark.plans.preprocess import (
        post_processing,
        r2_metrics,
    )

    raw = generate_series_frame(spark, 24, seed=11)
    pre = pre_processing(clean_series(raw), "2020-03-31", serving=False)
    train, val, _test = train_val_test_split(pre)
    model, hist = fit_numpy_cnn(
        train, val, epochs=2, batch_size=32, seed=1
    )
    assert len(hist["loss"]) == 2 and len(hist["val_loss"]) == 2
    assert all(np.isfinite(v) for v in hist["loss"] + hist["val_loss"])
    weights = str(tmp_path / "cashflow_cnn.npz")
    model.save(weights)

    reg = LocalModelRegistry(str(tmp_path / "registry"))
    mv = reg.register("cashflow-cnn", run_id="r14-test", source=weights)
    reg.transition("cashflow-cnn", mv.version, "Production")
    prod = reg.latest_version("cashflow-cnn", stage="Production")
    assert prod.source == weights

    # serve exactly like the reference: serving-shaped frame through
    # the iterator pandas_udf, then rescale/retrend and R²
    serve = pre_processing(clean_series(raw), "2020-03-31", serving=True)
    scored = score_dataframe(
        serve, cnn_factory(prod.source), x_col="X", out_col="y_pred"
    )
    rows = scored.select("X", "y_pred").limit(3).collect()
    assert rows
    for r in rows:
        assert len(r["y_pred"]) == 92
        # the UDF's prediction IS model.predict, bit-for-bit float32
        want = model.predict(
            np.asarray(r["X"], dtype=np.float32).reshape(1, -1)
        )[0]
        assert np.array_equal(
            np.asarray(r["y_pred"], dtype=np.float32), want
        )
    post = post_processing(scored)
    m = r2_metrics(
        post, y_pred_col="y_pred_rescaled_retrended"
    ).first()
    assert np.isfinite(m["r2_3month"]) and np.isfinite(m["r2_1month"])


def test_keras_preferred_when_path_is_keras(tmp_path):
    """cnn_factory routes .npz to the NumPy backend and anything else
    to keras — which stays import-gated in this image."""
    from time_series_prediction_spark.model.scoring import cnn_factory

    with pytest.raises(NotImplementedError, match="tensorflow"):
        cnn_factory(str(tmp_path / "model.keras"))()
