"""Training-feed scaffolding (reference T.3, TF-optional).

The reference feeds Keras through Petastorm: DataFrame → materialized
parquet cache → ``make_tf_dataset`` (reference
``notebooks/training_new_petastorm.py:241-303``). Petastorm is not in
this image; the engine provides the same contract two ways:

* ``training_batches`` — driver-side iterator of (X, y) numpy batches
  via ``toLocalIterator`` (bounded memory: one partition at a time).
  This is what a single-node trainer (the reference's setup: TF on the
  driver) actually needs.
* ``export_training_parquet`` — the Petastorm-style materialization:
  (X, y) written as parquet for any external data-loader (Petastorm's
  SparkDatasetConverter does exactly this under the hood).

``fit_keras_cnn`` wires the reference's 1-D CNN when tensorflow is
importable; otherwise raises NotImplementedError with the contract.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame


def export_training_parquet(train: DataFrame, path: str) -> None:
    """Materialize (X, y) batches for external data loaders
    (≈ petastorm SparkDatasetConverter's parquet cache)."""
    train.select("X", "y").write.mode("overwrite").parquet(path)


def training_batches(
    train: DataFrame, batch_size: int = 200
) -> Iterator[tuple[np.ndarray, np.ndarray]]:
    """Yield (X, y) numpy batches without collecting the dataset:
    partitions stream through the driver one at a time."""
    buf_x: list[np.ndarray] = []
    buf_y: list[np.ndarray] = []
    for row in train.select("X", "y").toLocalIterator(prefetchPartitions=True):
        buf_x.append(np.asarray(row["X"], dtype=np.float32))
        buf_y.append(np.asarray(row["y"], dtype=np.float32))
        if len(buf_x) == batch_size:
            yield np.stack(buf_x), np.stack(buf_y)
            buf_x, buf_y = [], []
    if buf_x:
        yield np.stack(buf_x), np.stack(buf_y)


def fit_keras_cnn(
    train: DataFrame,
    val: DataFrame,
    model_conf: dict,
    x_days: int = 365,
    y_days: int = 92,
    epochs: int = 15,
    batch_size: int = 200,
):  # pragma: no cover - TF not in this image
    """Train the reference-topology CNN (``notebooks/utils.py:435-460``):
    Conv1D(filters, kernel) → MaxPool → Flatten → Dense → Dense(y_days),
    compiled with the configured loss/Adam."""
    try:
        import tensorflow as tf  # noqa: PLC0415
    except ImportError as exc:
        raise NotImplementedError(
            "fit_keras_cnn requires tensorflow (not in this environment); "
            "use training_batches() to feed any external trainer"
        ) from exc

    hp = model_conf["hyperParameters"]
    inputs = tf.keras.layers.Input(shape=(x_days, 1), name="input")
    x = tf.keras.layers.Conv1D(
        filters=int(hp["filters"]),
        kernel_size=int(hp["kernel_size"]),
        activation=hp["activation"],
    )(inputs)
    x = tf.keras.layers.MaxPooling1D(pool_size=int(hp["pool_size"]))(x)
    x = tf.keras.layers.Flatten()(x)
    x = tf.keras.layers.Dense(int(hp["dense_units"]), activation=hp["activation"])(x)
    outputs = tf.keras.layers.Dense(y_days, name="output")(x)
    model = tf.keras.models.Model(inputs=inputs, outputs=outputs)
    model.compile(optimizer=tf.keras.optimizers.Adam(), loss=hp["loss"])

    def gen(df: DataFrame):
        def g():
            for bx, by in training_batches(df, batch_size):
                yield bx.reshape(-1, x_days, 1), by

        return g

    model.fit(
        tf.data.Dataset.from_generator(
            gen(train),
            output_signature=(
                tf.TensorSpec(shape=(None, x_days, 1), dtype=tf.float32),
                tf.TensorSpec(shape=(None, y_days), dtype=tf.float32),
            ),
        ),
        validation_data=tf.data.Dataset.from_generator(
            gen(val),
            output_signature=(
                tf.TensorSpec(shape=(None, x_days, 1), dtype=tf.float32),
                tf.TensorSpec(shape=(None, y_days), dtype=tf.float32),
            ),
        ),
        epochs=epochs,
    )
    return model
