"""Oracle-backed portable-sketch queries.

The sketch algebra lives in operators/sketch_portable.py; each query
here runs ONE generated SQL text in Spark (over a temp view of the
parquet table) while the driver runs the IDENTICAL text in DuckDB
(over its pre-registered view of the same parquet) — the strongest
form of the repo's oracle discipline: not merely "same answer", but
the same arithmetic, engine-portably deterministic by construction
(see the module docstring for the bit-exactness argument).

The engine-native twins keep their production roles and rows-only
checks: ``events_dau_sketch_rollup`` (datasketches ``hll_sketch_agg``
partials — serialized register blobs a warehouse would persist) and
``lineitem_quantiles_approx`` (Greenwald-Khanna, tighter error).
These portable queries pin the ALGORITHM family the driver could
never check there: hash → register fold → merge → bias-corrected
estimate, value-hash-verified end to end.

No counterpart in the reference repo (its cardinality/quantile needs
are pandas on collected frames); this is part of the engine's 100 TB
analytics surface. Plan shape at scale: both sketches reduce the
shuffle to fixed-size state — m registers (HLL) or ≤ ~600 histogram
cells (quantiles) per group — with map-side partial MAX/COUNT doing
the heavy fold before the exchange.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from time_series_prediction_spark.operators.sketch_portable import (
    portable_hll_daily_sql,
    portable_quantile_sql,
)
from time_series_prediction_spark.sources.io import read_table

QueryFn = Callable[[SparkSession, str], DataFrame]

# oracle texts read the driver's DuckDB views; the Spark texts read
# prefixed temp views (a bare "events" temp view would shadow any
# same-named catalog table for the rest of the session). Identical
# arithmetic either way — only the FROM identifier differs.
APPROX_DISTINCT_SQL = portable_hll_daily_sql("events")
DAU_ROLLUP_SQL = portable_hll_daily_sql("events", shard_mod=8)
QUANTILE_PORTABLE_SQL = portable_quantile_sql("lineitem")
_APPROX_DISTINCT_SPARK = portable_hll_daily_sql("_psk_events")
_DAU_ROLLUP_SPARK = portable_hll_daily_sql("_psk_events", shard_mod=8)
_QUANTILE_PORTABLE_SPARK = portable_quantile_sql("_psk_lineitem")


def approx_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily approximate distinct users via the portable HLL (m=256,
    mid-square double hash chain, linear-counting small-range branch).

    Replaces the round-7 ``approx_count_distinct`` implementation so
    the sketch graduates from rows-only to value-hash oracle-backed;
    Spark's engine-native aggregate remains a drop-in where
    cross-engine verifiability is not required (and is demonstrated by
    events_dau_sketch_rollup). Accuracy vs exact distinct is pinned at
    every fixture scale in tests/test_sketch_portable.py (≤ 2.2σ of
    the m=256 RSE on the fixtures' dense id space).

    Scale: one scan → map-side partial MAX into ≤ 256×days register
    cells → exchange of that fixed-size state only. The raw user ids
    never shuffle.
    """
    read_table(spark, sf_dir, "events").createOrReplaceTempView("_psk_events")
    return spark.sql(_APPROX_DISTINCT_SPARK)


def events_dau_portable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level mergeable-sketch fold: per-(day, user_id%8) HLL
    register partials, re-MAXed per day, then estimated — the
    incremental-maintenance pattern (persist tiny per-shard partials;
    a new batch folds its registers in without rescanning history;
    partials roll up to any coarser grain).

    MAX-of-MAX associativity makes the two-level fold bit-identical to
    approx_distinct_users_daily's flat fold — asserted in tests AND by
    this query's oracle (the same two-level SQL in DuckDB), so the
    merge's losslessness is value-hash-verified, not just bounded.
    """
    read_table(spark, sf_dir, "events").createOrReplaceTempView("_psk_events")
    return spark.sql(_DAU_ROLLUP_SPARK)


def lineitem_quantiles_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p25/p50/p75/p95 of l_extendedprice per returnflag from the
    portable log-linear histogram (base-2 octaves × 16 linear
    sub-buckets ⇒ ≤ 6.25% relative error, pinned vs exact percentiles
    in tests). Single scan → ≤ ~600-cell histogram per group →
    cumulative-count bucket lookup; the raw prices never shuffle or
    sort. Engine-native GK twin: lineitem_quantiles_approx."""
    read_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "_psk_lineitem"
    )
    return spark.sql(_QUANTILE_PORTABLE_SPARK)


SKETCH_QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "approx_distinct_users_daily": (
        approx_distinct_users_daily,
        APPROX_DISTINCT_SQL,
    ),
    "events_dau_portable_rollup": (events_dau_portable_rollup, DAU_ROLLUP_SQL),
    "lineitem_quantiles_portable": (
        lineitem_quantiles_portable,
        QUANTILE_PORTABLE_SQL,
    ),
}
