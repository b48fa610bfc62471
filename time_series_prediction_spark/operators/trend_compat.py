"""statsmodels-compat trend via grouped-map applyInPandas.

SURVEY §7.3's fallback path: if the native expression recreation of
``seasonal_decompose(...).trend`` ever drifts from statsmodels on some
input class, this mode computes the trend with the numpy reference
implementation per series, Arrow-batched (grouped-map applyInPandas —
one pandas DataFrame per group of series rows).

It is also the engine's template for the grouped-map API in general
(per-group Python with a pandas frame in/out), complementing
mapInPandas (multimodal) and iterator pandas_udf (scoring).

The numpy trend here re-derives public statsmodels semantics —
convolution MA filter + npoints=1 min-norm edge extrapolation — the
same formulas the golden-test oracle uses (tests/oracle/numpy_reference).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def numpy_trend(x: np.ndarray, freq: int = 30) -> np.ndarray:
    """seasonal_decompose(x, 'additive', freq, extrapolate_trend=1).trend
    re-derived with numpy only (float64), rounded half-even to 3."""
    x = np.asarray(x, dtype=float)
    if freq % 2 == 0:
        filt = np.array([0.5] + [1.0] * (freq - 1) + [0.5]) / freq
    else:
        filt = np.ones(freq) / freq
    trim_head = int(np.ceil(len(filt) / 2.0) - 1)
    trim_tail = len(filt) - 1 - trim_head
    out = np.full(len(x), np.nan)
    out[trim_head : len(x) - trim_tail] = np.convolve(x, filt, mode="valid")

    front = trim_head
    back = len(x) - 1 - trim_tail
    # npoints=1 min-norm "fits" through (front, v) and (back-1, v)
    vf = out[front]
    out[:front] = np.arange(front) * (front * vf / (front**2 + 1)) + vf / (
        front**2 + 1
    )
    x0 = back - 1
    vb = out[back - 1]
    idx = np.arange(back + 1, len(x))
    out[back + 1 :] = idx * (x0 * vb / (x0**2 + 1)) + vb / (x0**2 + 1)
    return np.around(out, 3).astype(np.float32)


def trend_compat(
    df: DataFrame,
    value_col: str = "balance",
    out_col: str = "balance_trend_1MW",
    freq: int = 30,
) -> DataFrame:
    """Add the trend column via grouped-map applyInPandas (grouped by
    a hash bucket of rows so groups are balanced, not per-series tiny).
    """
    from pyspark.sql import functions as F

    out_fields = df.schema.fields + [
        next(
            iter(
                df.select(
                    F.col(value_col).alias(out_col)
                ).schema.fields
            )
        )
    ]
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in out_fields
    )

    def apply_trend(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.drop(columns=["_bucket"])
        pdf[out_col] = [
            numpy_trend(np.asarray(v, dtype=float), freq).tolist()
            for v in pdf[value_col]
        ]
        return pdf

    bucketed = df.withColumn("_bucket", F.spark_partition_id())
    return bucketed.groupBy("_bucket").applyInPandas(apply_trend, out_schema)
