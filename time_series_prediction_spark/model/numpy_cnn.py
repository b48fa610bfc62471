"""Pure-NumPy 1-D CNN — the reference lifecycle's training stage (T.3)
without TensorFlow (r13 VERDICT Next #3).

Exact reference topology (``notebooks/utils.py:435-460``, trained at
``notebooks/training_new_petastorm.py:282-303``):

    Conv1D(filters=64, kernel_size=2, relu) → MaxPooling1D(2) →
    Flatten → Dense(50, relu) → Dense(N_days_y), MAE loss, Adam.

Forward pass + analytic backprop, Glorot-uniform init from a fixed
seed (fully deterministic given seed + data order), Adam with the
keras defaults (lr=1e-3, β1=.9, β2=.999, ε=1e-7). Keras remains the
PREFERRED backend wherever tensorflow imports (``train.fit_keras_cnn``
— same topology, import-gated); this trainer exists so the full
train → register → score → R² lifecycle runs end-to-end in a TF-less
image, fed by the same ``training_batches`` / ``partition_trainer_feed``
plumbing and scored through the same iterator pandas_udf.

Scale note: the reference trains ONE global model on the driver
(single-node Keras); this matches that shape — training data streams
through ``training_batches`` (bounded memory), weights are a few MB.
Distributed data-parallel averaging rides ``partition_trainer_feed``.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import numpy as np

_ADAM_LR = 1e-3
_ADAM_B1 = 0.9
_ADAM_B2 = 0.999
_ADAM_EPS = 1e-7


class NumpyCNN1D:
    """The reference 1-D CNN as explicit NumPy forward/backprop."""

    _PARAMS = ("Wc", "bc", "W1", "b1", "W2", "b2")

    def __init__(
        self,
        x_days: int,
        y_days: int,
        filters: int = 64,
        kernel_size: int = 2,
        pool_size: int = 2,
        dense_units: int = 50,
        seed: int = 0,
    ) -> None:
        if x_days < kernel_size:
            raise ValueError("x_days shorter than the conv kernel")
        self.x_days = int(x_days)
        self.y_days = int(y_days)
        self.filters = int(filters)
        self.kernel_size = int(kernel_size)
        self.pool_size = int(pool_size)
        self.dense_units = int(dense_units)
        self.conv_len = self.x_days - self.kernel_size + 1
        self.pool_len = self.conv_len // self.pool_size
        if self.pool_len < 1:
            raise ValueError("pooled length is zero — x_days too short")
        flat = self.pool_len * self.filters
        rng = np.random.default_rng(seed)

        def glorot(shape, fan_in, fan_out):
            lim = np.sqrt(6.0 / (fan_in + fan_out))
            return rng.uniform(-lim, lim, size=shape)

        # (k, F): one input channel, exactly keras Conv1D's kernel
        self.Wc = glorot(
            (self.kernel_size, self.filters),
            self.kernel_size, self.filters,
        )
        self.bc = np.zeros(self.filters)
        self.W1 = glorot((flat, self.dense_units), flat, self.dense_units)
        self.b1 = np.zeros(self.dense_units)
        self.W2 = glorot(
            (self.dense_units, self.y_days), self.dense_units, self.y_days
        )
        self.b2 = np.zeros(self.y_days)
        self._adam_t = 0
        self._adam_m = {
            p: np.zeros_like(getattr(self, p)) for p in self._PARAMS
        }
        self._adam_v = {
            p: np.zeros_like(getattr(self, p)) for p in self._PARAMS
        }

    # -- forward ---------------------------------------------------------
    def _forward(self, x: np.ndarray):
        """x (B, x_days) float64 → (yhat, cache for backprop)."""
        from numpy.lib.stride_tricks import sliding_window_view

        b = x.shape[0]
        win = sliding_window_view(x, self.kernel_size, axis=1)
        z = win @ self.Wc + self.bc  # (B, conv_len, F)
        a = np.maximum(z, 0.0)
        usable = self.pool_len * self.pool_size
        ap = a[:, :usable, :].reshape(
            b, self.pool_len, self.pool_size, self.filters
        )
        arg = ap.argmax(axis=2)  # (B, P, F) — for the pool backprop
        pooled = np.take_along_axis(
            ap, arg[:, :, None, :], axis=2
        )[:, :, 0, :]
        flat = pooled.reshape(b, -1)
        h_pre = flat @ self.W1 + self.b1
        h = np.maximum(h_pre, 0.0)
        yhat = h @ self.W2 + self.b2
        return yhat, (win, z, arg, flat, h_pre, h)

    def predict(self, x: np.ndarray) -> np.ndarray:
        """(B, x_days) or (B, x_days, 1) → (B, y_days) float32."""
        x = np.asarray(x, dtype=np.float64)
        if x.ndim == 3:
            x = x[:, :, 0]
        yhat, _ = self._forward(x)
        return yhat.astype(np.float32)

    # -- training --------------------------------------------------------
    def train_batch(self, x: np.ndarray, y: np.ndarray) -> float:
        """One Adam step on one batch; returns the batch's PRE-step
        MAE (keras's reported running loss uses pre-step values)."""
        x = np.asarray(x, dtype=np.float64)
        if x.ndim == 3:
            x = x[:, :, 0]
        y = np.asarray(y, dtype=np.float64)
        b = x.shape[0]
        yhat, (win, z, arg, flat, h_pre, h) = self._forward(x)
        resid = yhat - y
        loss = float(np.abs(resid).mean())
        # MAE gradient: mean over batch AND outputs
        gy = np.sign(resid) / (b * self.y_days)  # (B, H)
        gW2 = h.T @ gy
        gb2 = gy.sum(axis=0)
        gh = (gy @ self.W2.T) * (h_pre > 0)
        gW1 = flat.T @ gh
        gb1 = gh.sum(axis=0)
        gflat = gh @ self.W1.T
        gpool = gflat.reshape(b, self.pool_len, self.filters)
        # scatter through the max locations
        ga = np.zeros(
            (b, self.pool_len, self.pool_size, self.filters)
        )
        np.put_along_axis(
            ga, arg[:, :, None, :], gpool[:, :, None, :], axis=2
        )
        usable = self.pool_len * self.pool_size
        gz = np.zeros_like(z)
        gz[:, :usable, :] = ga.reshape(b, usable, self.filters)
        gz *= z > 0
        gWc = np.einsum("blk,blf->kf", win, gz)
        gbc = gz.sum(axis=(0, 1))
        self._adam_step(
            {"Wc": gWc, "bc": gbc, "W1": gW1, "b1": gb1,
             "W2": gW2, "b2": gb2}
        )
        return loss

    def _adam_step(self, grads: dict[str, np.ndarray]) -> None:
        self._adam_t += 1
        t = self._adam_t
        for p in self._PARAMS:
            g = grads[p]
            m = self._adam_m[p] = _ADAM_B1 * self._adam_m[p] + (
                1 - _ADAM_B1
            ) * g
            v = self._adam_v[p] = _ADAM_B2 * self._adam_v[p] + (
                1 - _ADAM_B2
            ) * (g * g)
            mhat = m / (1 - _ADAM_B1**t)
            vhat = v / (1 - _ADAM_B2**t)
            getattr(self, p)[...] -= (
                _ADAM_LR * mhat / (np.sqrt(vhat) + _ADAM_EPS)
            )

    def fit(
        self,
        batches: Iterable[tuple[np.ndarray, np.ndarray]] | callable,
        epochs: int = 1,
    ) -> list[float]:
        """``batches``: a zero-arg callable returning a fresh
        (X, y) batch iterator per epoch (a list works too). Returns
        the per-epoch mean batch loss."""
        history: list[float] = []
        for _ in range(int(epochs)):
            it: Iterator = batches() if callable(batches) else iter(
                list(batches)
            )
            losses = [self.train_batch(bx, by) for bx, by in it]
            if not losses:
                raise ValueError("empty training iterator")
            history.append(float(np.mean(losses)))
        return history

    # -- persistence (the registry stores this file) ----------------------
    def save(self, path: str) -> None:
        np.savez(
            path if path.endswith(".npz") else path + ".npz",
            dims=np.array(
                [
                    self.x_days, self.y_days, self.filters,
                    self.kernel_size, self.pool_size, self.dense_units,
                ]
            ),
            **{p: getattr(self, p) for p in self._PARAMS},
        )

    @classmethod
    def load(cls, path: str) -> "NumpyCNN1D":
        with np.load(
            path if path.endswith(".npz") else path + ".npz"
        ) as d:
            dims = d["dims"]
            model = cls(*[int(v) for v in dims])
            for p in cls._PARAMS:
                getattr(model, p)[...] = d[p]
        return model


def fit_numpy_cnn(
    train,
    val,
    model_conf: dict | None = None,
    x_days: int = 365,
    y_days: int = 92,
    epochs: int = 15,
    batch_size: int = 200,
    seed: int = 0,
) -> tuple[NumpyCNN1D, dict[str, list[float]]]:
    """``fit_keras_cnn``'s signature on the NumPy backend: train on
    DataFrame batches via ``training_batches`` (driver streams one
    partition at a time — the reference's own single-node topology),
    evaluate MAE on ``val`` after each epoch. Returns
    (model, {"loss": [...], "val_loss": [...]})."""
    from time_series_prediction_spark.model.train import (
        training_batches,
    )

    hp = (model_conf or {}).get("hyperParameters", {})
    model = NumpyCNN1D(
        x_days, y_days,
        filters=int(hp.get("filters", 64)),
        kernel_size=int(hp.get("kernel_size", 2)),
        pool_size=int(hp.get("pool_size", 2)),
        dense_units=int(hp.get("dense_units", 50)),
        seed=seed,
    )
    history: dict[str, list[float]] = {"loss": [], "val_loss": []}
    for _ in range(int(epochs)):
        history["loss"].extend(
            model.fit(lambda: training_batches(train, batch_size), 1)
        )
        v_abs = 0.0
        v_n = 0
        for bx, by in training_batches(val, batch_size):
            pred = model.predict(bx)
            v_abs += float(np.abs(pred - by).sum())
            v_n += by.size
        history["val_loss"].append(v_abs / max(v_n, 1))
    return model, history
