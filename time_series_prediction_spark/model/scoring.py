"""Distributed model scoring — the one place Python belongs.

Mirrors the reference's serving stage (``notebooks/scoring.py:317-325``:
a SCALAR pandas_udf that reloads the Keras model for EVERY Arrow batch
via ``model.predict(v.reshape(-1, 365, 1))``). Engine improvements:

* ITERATOR-form pandas_udf: the model loads ONCE per Python worker,
  then streams every Arrow batch of the partition through it — at the
  reference's 2.5M-series scale, per-batch model loading is the
  dominant cost in their design.
* model factory is pluggable: tests and this TF-less image use
  deterministic stub models (numpy); ``keras_cnn_factory`` wires a
  real Keras 1-D CNN when tensorflow is importable (same topology as
  reference ``notebooks/utils.py:435-460``: Conv1D(64,k=2) → MaxPool(2)
  → Flatten → Dense(50) → Dense(92), MAE/Adam).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

ModelFn = Callable[[np.ndarray], np.ndarray]
ModelFactory = Callable[[], ModelFn]


def zero_model_factory(horizon: int = 92) -> ModelFactory:
    """Predicts 0 (the scaled-space mean) for every day."""

    def make() -> ModelFn:
        return lambda x: np.zeros((x.shape[0], horizon), dtype=np.float32)

    return make


def last_value_model_factory(horizon: int = 92) -> ModelFactory:
    """Naive persistence baseline: repeat each series' last X value."""

    def make() -> ModelFn:
        def predict(x: np.ndarray) -> np.ndarray:
            last = x[:, -1:]
            return np.repeat(last, horizon, axis=1).astype(np.float32)

        return predict

    return make


def keras_cnn_factory(
    weights_path: str, x_days: int = 365, horizon: int = 92
) -> ModelFactory:  # pragma: no cover - TF not in this image
    """Load the reference-topology 1-D CNN from saved weights.
    Importable only where tensorflow exists; raises cleanly otherwise."""

    def make() -> ModelFn:
        try:
            import tensorflow as tf  # noqa: PLC0415
        except ImportError as exc:
            raise NotImplementedError(
                "keras scoring requires tensorflow, which is not installed "
                "in this environment; use a stub model factory"
            ) from exc
        model = tf.keras.models.load_model(weights_path)

        def predict(x: np.ndarray) -> np.ndarray:
            return model.predict(
                x.reshape(-1, x_days, 1), verbose=0
            ).reshape(-1, horizon)

        return predict

    return make


def numpy_cnn_factory(
    weights_path: str, x_days: int = 365, horizon: int = 92
) -> ModelFactory:
    """Load the reference-topology 1-D CNN trained by the pure-NumPy
    backend (``model/numpy_cnn.py`` — r13 VERDICT Next #3) from its
    ``.npz`` weights. Same ModelFn contract as ``keras_cnn_factory``;
    the model loads once per Python worker through the iterator
    pandas_udf, exactly like the keras path."""

    def make() -> ModelFn:
        from time_series_prediction_spark.model.numpy_cnn import (
            NumpyCNN1D,
        )

        model = NumpyCNN1D.load(weights_path)

        def predict(x: np.ndarray) -> np.ndarray:
            return model.predict(
                x.reshape(-1, x_days)
            ).reshape(-1, horizon)

        return predict

    return make


def cnn_factory(
    weights_path: str, x_days: int = 365, horizon: int = 92
) -> ModelFactory:
    """Backend dispatch for the reference CNN: keras when tensorflow
    imports (preferred — ``.keras``/SavedModel weights), else the
    NumPy trainer's ``.npz`` weights. The extension decides which
    artifact the path names; tensorflow's absence only blocks the
    keras artifact."""
    if weights_path.endswith(".npz"):
        return numpy_cnn_factory(weights_path, x_days, horizon)
    return keras_cnn_factory(weights_path, x_days, horizon)


def scoring_udf(factory: ModelFactory, horizon: int = 92) -> Column:
    """Iterator pandas_udf: model built once per worker, Arrow batches
    streamed through (reference reloads per batch — scoring.py:317)."""

    @pandas_udf("array<float>")
    def score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model = factory()  # once per python worker
        for x_series in batches:
            x = np.asarray(
                [np.asarray(v, dtype=np.float32) for v in x_series]
            )
            if len(x) == 0:
                yield pd.Series([], dtype=object)
                continue
            y = model(x)
            yield pd.Series(list(y.astype(np.float32)))

    return score


def score_dataframe(
    df: DataFrame,
    factory: ModelFactory,
    x_col: str = "X",
    out_col: str = "y_pred",
    horizon: int = 92,
) -> DataFrame:
    """S.2 serving stage: adds ``y_pred`` (array<float>[horizon])."""
    return df.withColumn(out_col, scoring_udf(factory, horizon)(F.col(x_col)))
