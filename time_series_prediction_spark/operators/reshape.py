"""Wide ⇄ long reshaping for time series.

The reference stores one row per series with the whole daily series in
an ``array<float>`` column plus a shared ``array<date>`` axis
(reference ``src/demo/create_time_series.py:185-196``). That "wide"
layout is ideal for model I/O (one training example per row) but
hostile to Catalyst: every per-series transform becomes an opaque UDF.

The engine keeps BOTH layouts first-class:

* wide:  (series_id, transactiondate: array<date>, balance: array<float>, ...)
* long:  (series_id, ds: date, value: double) — one row per observation

Long form makes trend / gradient / slicing classic Window operators
(JVM-side, whole-stage-codegen'd); wide form feeds batch model scoring.

Scale note: ``posexplode`` multiplies rows by series length (487×) but
keeps them partition-local — no shuffle. The reverse direction groups
by series id: one shuffle, which AQE sizes. At 100 TB, partition the
long table by a date bucket so scans prune, and sort within series for
sort-merge-free window evaluation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def wide_to_long(
    df: DataFrame,
    id_col: str = "primaryaccountholder",
    date_col: str = "transactiondate",
    value_col: str = "balance",
    out_ds: str = "ds",
    out_value: str = "value",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Explode (id, array<date>, array<float>) → (id, ds, value, pos).

    Uses ``posexplode(arrays_zip(...))`` so date and value stay aligned
    by position; ``pos`` is retained for order-sensitive ops.
    """
    keep = [F.col(c) for c in (keep_cols or [])]
    zipped = F.arrays_zip(F.col(date_col), F.col(value_col))
    return df.select(
        F.col(id_col),
        *keep,
        F.posexplode(zipped).alias("pos", "_z"),
    ).select(
        F.col(id_col),
        *[F.col(c) for c in (keep_cols or [])],
        F.col("pos"),
        F.col(f"_z.{date_col}").alias(out_ds),
        F.col(f"_z.{value_col}").cast("double").alias(out_value),
    )


def long_to_wide(
    df: DataFrame,
    id_col: str = "primaryaccountholder",
    ds_col: str = "ds",
    value_col: str = "value",
    out_date: str = "transactiondate",
    out_value: str = "balance",
) -> DataFrame:
    """Collapse (id, ds, value) → one row per series with aligned arrays.

    ``array_sort`` on zipped structs restores date order without relying
    on input ordering — ``collect_list`` order is nondeterministic after
    shuffles, so sorting post-hoc is the only correct distributed
    approach (one shuffle on id, map-side partial aggregation applies).
    """
    return (
        df.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(ds_col).alias("ds"), F.col(value_col).alias("v")))
            ).alias("_pairs")
        )
        .select(
            F.col(id_col),
            F.col("_pairs.ds").alias(out_date),
            F.col("_pairs.v").cast("array<float>").alias(out_value),
        )
    )
