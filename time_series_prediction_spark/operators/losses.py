"""Shared forecast-loss registry: ONE definition per loss, consumed by
every evaluation surface — the rolling-origin backtest
(``plans/timeseries_queries2.linear_backtest``), the scoring
pipeline's distributed metric extraction
(``plans/flagship.cashflow_scoring_pipeline``), and the holdout
evaluation of the native forecast
(``plans/flagship.cashflow_holdout_eval``). The reference computes its
metrics driver-side after a ``toPandas`` (reference
``notebooks/utils.py:502-538``, ``notebooks/scoring.py:464-470``);
here every loss is a distributed aggregate.

Registry contract: each loss maps ``(a, f)`` — actual and forecast as
DOUBLE — to an INTEGER per-prediction contribution. Integer rounding
is what makes the cross-engine aggregate order-free (float sums would
differ by reduction order); the SQL fragment is VERBATIM-valid in both
Spark SQL and DuckDB, so one string defines the loss for the engine
AND the oracle. Units follow the inputs: cent-valued series yield
milli-cent sums, dollar-valued series milli-dollar sums.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# loss name -> (output column, SQL term over scalars a/f)
LOSSES: dict[str, tuple[str, str]] = {
    # milli-unit absolute error
    "mae": ("sum_abs_err_mc", "CAST(round(abs(a - f) * 1000) AS BIGINT)"),
    # symmetric MAPE in parts-per-million (0 when both sides are 0,
    # the standard convention)
    "smape": (
        "sum_smape_ppm",
        "CASE WHEN abs(a) + abs(f) = 0 THEN CAST(0 AS BIGINT) "
        "ELSE CAST(round(abs(a - f) / ((abs(a) + abs(f)) / 2) * 1000000) "
        "AS BIGINT) END",
    ),
    # milli-unit pinball (quantile) loss at q = 0.9 — the asymmetric
    # loss a P90 forecaster sweeps
    "pinball90": (
        "sum_pinball90_mc",
        "CAST(round((CASE WHEN a - f >= 0 THEN CAST(0.9 AS DOUBLE) * (a - f) "
        "ELSE CAST(0.1 AS DOUBLE) * (f - a) END) * 1000) AS BIGINT)",
    ),
}


def loss_sum_aggs(losses: tuple[str, ...]) -> list[Column]:
    """Aggregate columns summing each registered loss over rows that
    carry scalar ``a`` / ``f`` double columns (the backtest shape)."""
    out = []
    for loss in losses:
        col_name, term = LOSSES[loss]
        out.append(F.sum(F.expr(term)).alias(col_name))
    return out


def series_loss_expr(loss: str, y_true: str, y_pred: str) -> str:
    """Per-ROW loss sum over a zipped (actual, forecast) ARRAY pair —
    the wide-series shape the scoring/holdout pipelines evaluate.
    ``y_true``/``y_pred`` are SQL array expressions (any numeric
    element type; cast to double here); the fold is element-order
    sequential but every term is an exact integer, so the grand total
    a later ``sum`` produces is reduction-order-free."""
    _, term = LOSSES[loss]
    return (
        f"aggregate(zip_with(transform({y_true}, v -> CAST(v AS DOUBLE)), "
        f"transform({y_pred}, v -> CAST(v AS DOUBLE)), "
        f"(a, f) -> {term}), 0L, (acc, x) -> acc + x)"
    )


def series_loss_aggs(
    losses: tuple[str, ...], y_true: str, y_pred: str
) -> list[Column]:
    """Aggregate columns summing each registered loss over rows that
    carry (actual, forecast) array columns."""
    out = []
    for loss in losses:
        col_name, _ = LOSSES[loss]
        out.append(
            F.sum(F.expr(series_loss_expr(loss, y_true, y_pred)))
            .cast("long")
            .alias(col_name)
        )
    return out
