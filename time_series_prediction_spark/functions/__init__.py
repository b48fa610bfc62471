"""Reusable Column-expression helpers — the engine's public function
surface, re-exported from the operator modules so users compose them
directly (``from time_series_prediction_spark.functions import trend``)
without knowing the internal layout.

Everything here is a pure Column expression (or a factory returning
one): JVM-side, codegen-friendly, usable inside any select/withColumn.
The deliberate Python exceptions (model scoring, LSH/IVF matmul,
multimodal decode) live in their operator modules, not here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# per-series array operators (reference W1-W11 semantics)
from time_series_prediction_spark.operators.timeseries import (  # noqa: F401
    detrend,
    extrapolate_trend,
    get_x,
    get_y,
    gradient,
    keep_ts,
    rescaling,
    retrend,
    scaling,
    series_mean,
    series_std,
    trajectory,
    trend,
)

# text / corpus functions
from time_series_prediction_spark.operators.text import (  # noqa: F401
    avg_token_len,
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    quality_score,
    stopword_count,
    token_count,
    tokens,
)

# similarity primitives
from time_series_prediction_spark.operators.similarity import (  # noqa: F401
    cosine_expr,
    lsh_bucket,
    quantize,
)

# dedup signatures
from time_series_prediction_spark.operators.dedup import (  # noqa: F401
    hamming64,
    simhash64,
)

# date-sequence source expression (reference S2)
from time_series_prediction_spark.sources.io import (  # noqa: F401
    date_sequence_col,
)


def cents(col: str | Column, scale: int = 100) -> Column:
    """Exact integer representation of a ≤2-decimal double column —
    the cross-engine determinism primitive (see plans/relational.py
    module doc): sum in bigint, divide once at the end."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * scale).cast("long")


def epoch_us(col: str | Column) -> Column:
    """Timestamp → exact integer epoch microseconds (range joins,
    cross-engine time predicates)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c)
