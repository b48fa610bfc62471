"""Column profiling + drift detection: the monitoring half of the
quality story (operators/quality_checks.py is the gating half).

``profile_columns`` computes per-column statistics — row count, null
count, exact distinct count, numeric min/max — for any number of
columns in ONE aggregate over ONE scan (the same compile-checks-into-
one-pass discipline as the audit: Spark rewrites the mixed distinct
aggregates into a single expand, still one scan). Optionally grouped
by a slice column, which is how drift comparisons get BOTH sides from
the same pass.

``drift_report`` joins two profile slices into per-column
before/after rows. All metrics are exact integers or exact data
values (never accumulated floats), so profiles — and therefore drift
reports — are bit-reproducible on any engine at any parallelism and
oracle-checkable.

At 100 TB: profiling a daily partition is one scan of that partition;
the reference profile is a tiny table joined by column name. Exact
``count(distinct)`` is the one knob to watch — for ultra-high-
cardinality columns swap in ``approx_count_distinct`` at the call
site (the report schema doesn't change; the oracle check does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    numeric_cols: list[str] = (),
    categorical_cols: list[str] = (),
    slice_col: str | None = None,
) -> DataFrame:
    """Long-form profile: one row per (slice, column) with
    (n, n_null, n_distinct, min_d, max_d); min/max are NULL for
    categorical columns. One aggregate, one scan, regardless of how
    many columns are profiled."""
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    names: list[str] = []
    for c in list(numeric_cols) + list(categorical_cols):
        is_num = c in numeric_cols
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"{c}__null")
        )
        aggs.append(F.countDistinct(c).cast("long").alias(f"{c}__dist"))
        if is_num:
            aggs.append(F.min(F.col(c).cast("double")).alias(f"{c}__min"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"{c}__max"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{c}__min"))
            aggs.append(F.lit(None).cast("double").alias(f"{c}__max"))
        names.append(c)
    grouped = df.groupBy(slice_col) if slice_col else df.groupBy()
    row = grouped.agg(*aggs)
    pairs = ", ".join(
        f"'{c}', {c}__null, {c}__dist, {c}__min, {c}__max" for c in names
    )
    stacked = row.select(
        *([slice_col] if slice_col else []),
        F.col("_n").alias("n"),
        F.expr(
            f"stack({len(names)}, {pairs}) AS "
            "(column, n_null, n_distinct, min_d, max_d)"
        ),
    )
    return stacked.select(
        *([slice_col] if slice_col else []),
        "column",
        "n",
        "n_null",
        "n_distinct",
        "min_d",
        "max_d",
    )


def drift_report(
    profile: DataFrame, slice_col: str, before: str, after: str
) -> DataFrame:
    """Per-column before/after comparison of two slices of a
    ``profile_columns(..., slice_col=...)`` result. Integer metric
    pairs only — ratio math is the caller's presentation concern."""
    a = profile.where(F.col(slice_col) == before).drop(slice_col)
    b = profile.where(F.col(slice_col) == after).drop(slice_col)
    sel = lambda side, suf: [  # noqa: E731
        F.col(f"{side}.{c}").alias(f"{c}_{suf}")
        for c in ("n", "n_null", "n_distinct", "min_d", "max_d")
    ]
    return (
        a.alias("a")
        .join(b.alias("b"), F.col("a.column") == F.col("b.column"), "full")
        .select(
            F.coalesce(F.col("a.column"), F.col("b.column")).alias("column"),
            *sel("a", "before"),
            *sel("b", "after"),
        )
    )
