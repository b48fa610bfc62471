"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries are declared in ``time_series_prediction_spark.plans`` (each
Spark plan lives beside its oracle SQL so names and value determinism
stay aligned).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from time_series_prediction_spark.plans.relational import RELATIONAL_QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _all_queries() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    # imports intentionally NOT wrapped in try/except: a broken plans
    # module must fail loudly here, not silently shrink the declared
    # query surface
    from time_series_prediction_spark.plans.flagship import (
        CASHFLOW_HOLDOUT_SQL,
        CASHFLOW_SCORING_SQL,
        CASHFLOW_WIDE_SQL,
        cashflow_holdout_eval,
        cashflow_scoring_pipeline,
        cashflow_wide_summary,
    )
    from time_series_prediction_spark.plans.bucketed_queries import BUCKETED_QUERIES
    from time_series_prediction_spark.plans.ingest_queries import INGEST_QUERIES
    from time_series_prediction_spark.plans.layout_queries import LAYOUT_QUERIES
    from time_series_prediction_spark.plans.rangejoin_queries import RANGEJOIN_QUERIES
    from time_series_prediction_spark.plans.table_queries import TABLE_QUERIES
    from time_series_prediction_spark.plans.relational2 import RELATIONAL2_QUERIES
    from time_series_prediction_spark.plans.sketch_queries import SKETCH_QUERIES
    from time_series_prediction_spark.plans.semantic_queries import SEMANTIC_QUERIES
    from time_series_prediction_spark.plans.relational3 import RELATIONAL3_QUERIES
    from time_series_prediction_spark.plans.relational4 import RELATIONAL4_QUERIES
    from time_series_prediction_spark.plans.text_queries import TEXT_QUERIES
    from time_series_prediction_spark.plans.text_queries2 import TEXT2_QUERIES
    from time_series_prediction_spark.plans.text_queries3 import TEXT3_QUERIES
    from time_series_prediction_spark.plans.timeseries_queries import (
        TIMESERIES_QUERIES,
    )
    from time_series_prediction_spark.plans.timeseries_queries2 import (
        TIMESERIES2_QUERIES,
    )
    from time_series_prediction_spark.plans.journey_queries import (
        JOURNEY_QUERIES,
    )
    from time_series_prediction_spark.plans.stats_queries import (
        STATS_QUERIES,
    )
    from time_series_prediction_spark.plans.graph_queries import (
        GRAPH_QUERIES,
    )
    from time_series_prediction_spark.plans.warehouse_queries import (
        WAREHOUSE_QUERIES,
    )
    from time_series_prediction_spark.plans.window_queries import WINDOW_QUERIES

    registry: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}
    registry.update(RELATIONAL_QUERIES)
    registry.update(RELATIONAL2_QUERIES)
    registry.update(RELATIONAL3_QUERIES)
    registry.update(RELATIONAL4_QUERIES)
    registry.update(TIMESERIES_QUERIES)
    registry.update(TIMESERIES2_QUERIES)
    registry.update(TEXT_QUERIES)
    registry.update(TEXT2_QUERIES)
    registry.update(TEXT3_QUERIES)
    registry.update(WINDOW_QUERIES)
    registry.update(WAREHOUSE_QUERIES)
    registry.update(JOURNEY_QUERIES)
    registry.update(STATS_QUERIES)
    registry.update(GRAPH_QUERIES)
    registry.update(RANGEJOIN_QUERIES)
    registry.update(LAYOUT_QUERIES)
    registry.update(BUCKETED_QUERIES)
    registry.update(SEMANTIC_QUERIES)
    registry.update(INGEST_QUERIES)
    registry.update(TABLE_QUERIES)
    registry.update(SKETCH_QUERIES)
    # wide-array pipeline: oracle-backed via generated DuckDB
    # list-lambda SQL replicating the exact IEEE op sequence
    # (statsmodels-parity trend, sequential-fold extrapolation,
    # shortest-repr half-even rounding) — bit-exact at sf0.01/sf0.1;
    # the registry form projects the forecast array to scalar endpoints
    # (canonicalizers hash scalar cells only)
    registry["cashflow_wide_pipeline"] = (cashflow_wide_summary, CASHFLOW_WIDE_SQL)
    # S.1→S.3+E.2 scoring lifecycle (pre_process → pandas_udf scoring →
    # post_process → distributed R²): oracle-backed since round 8 —
    # the last-value model's pandas_udf stage is pure float32
    # passthrough, so the whole lifecycle (ppm-quantized R² included)
    # replays as DuckDB list algebra (CASHFLOW_SCORING_SQL)
    registry["cashflow_scoring_pipeline"] = (
        cashflow_scoring_pipeline,
        CASHFLOW_SCORING_SQL,
    )
    # holdout evaluation of the native forecast under the shared loss
    # registry (operators/losses.py) — training, forecasting, and all
    # three losses replay in DuckDB
    registry["cashflow_holdout_eval"] = (cashflow_holdout_eval, CASHFLOW_HOLDOUT_SQL)
    return registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's cashflow-forecast lifecycle (clean → trend →
    extrapolate → trajectory) on per-user daily series derived from
    the events fixture — all native expressions, one shuffle.
    """
    from time_series_prediction_spark.plans.flagship import cashflow_wide_pipeline

    return cashflow_wide_pipeline(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _) in _all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted for non-SQL-expressible
    ops (driver then records a weaker rows-only check)."""
    return {
        name: sql for name, (_, sql) in _all_queries().items() if sql is not None
    }
