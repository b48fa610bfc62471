"""Exact-accumulator statistics queries: the Pearson correlation
matrix over lineitem's measures in ONE scan.

Built-in ``F.corr`` is the production path, but its streaming
co-moment accumulation is order-dependent in the last ulps, so a
DuckDB oracle can never hash-match it. This takes the registry's
exact-integer route instead: every measure is integerized (quantity,
cents, percent points), all five sufficient statistics per pair
(n, Σx, Σy, Σx², Σy², Σxy) are accumulated EXACTLY in DECIMAL(38,0)
(per-row products fit int64; the 600k-row sums exceed it, hence the
decimal accumulator — DuckDB's SUM over DECIMAL(38,0) is likewise
exact), and the final Pearson ratio is ONE fixed-shape double
expression over those exact sums — deterministic in both engines
(IEEE-754 correctly-rounded *, -, /, sqrt on identical operands).

Scale shape: a single whole-stage-codegen scan with map-side partial
aggregation into one 1-row state — at 100 TB this is one pass and one
1-row exchange; the stacked long-format output is driver-free. The
correlation of ALL pairs rides in the same pass (no per-pair rescan).

Beyond-reference scope: the reference computes no cross-measure
statistics (its R² is a per-model score, reference
``notebooks/utils.py:502-538``); this is engine-side EDA surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from time_series_prediction_spark.plans.text_queries import QueryFn
from time_series_prediction_spark.sources.io import read_table

_MEASURES = {
    "qty": "CAST(round(l_quantity) AS BIGINT)",
    "price_cents": "CAST(round(l_extendedprice * 100) AS BIGINT)",
    "disc_pct": "CAST(round(l_discount * 100) AS BIGINT)",
    "tax_pct": "CAST(round(l_tax * 100) AS BIGINT)",
}
_PAIRS = [
    ("qty", "price_cents"),
    ("qty", "disc_pct"),
    ("price_cents", "disc_pct"),
    ("disc_pct", "tax_pct"),
]


def _corr_expr(a: str, b: str) -> str:
    """Pearson r from exact decimal sufficient statistics — the SAME
    textual expression is used on both engines so every double op has
    identical operands in identical order."""
    n = "CAST(n AS DOUBLE)"
    return (
        f"({n} * CAST(sp_{a}_{b} AS DOUBLE)"
        f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
        f" / (sqrt({n} * CAST(ss_{a} AS DOUBLE)"
        f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
        f" * sqrt({n} * CAST(ss_{b} AS DOUBLE)"
        f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE)))"
    )


def lineitem_correlation_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """All-pairs Pearson correlations of lineitem's measures from one
    exact-accumulator scan, long format (pair, n, corr)."""
    li = read_table(spark, sf_dir, "lineitem").selectExpr(
        *[f"{e} AS {c}" for c, e in _MEASURES.items()]
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for c in _MEASURES:
        aggs.append(F.sum(F.col(c).cast("decimal(38,0)")).alias(f"s_{c}"))
        aggs.append(
            F.sum(F.expr(f"CAST({c} * {c} AS DECIMAL(38,0))"))
            .alias(f"ss_{c}")
        )
    for a, b in _PAIRS:
        aggs.append(
            F.sum(F.expr(f"CAST({a} * {b} AS DECIMAL(38,0))"))
            .alias(f"sp_{a}_{b}")
        )
    stats = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{a}~{b}', {_corr_expr(a, b)}" for a, b in _PAIRS
    )
    return stats.select(
        "n",
        F.expr(
            f"stack({len(_PAIRS)}, {stack_args}) AS (pair, corr)"
        ),
    ).select("pair", "n", "corr")


def _oracle_sql() -> str:
    meas = ",\n           ".join(
        f"{e} AS {c}" for c, e in _MEASURES.items()
    )
    sums = ["CAST(count(*) AS BIGINT) AS n"]
    for c in _MEASURES:
        sums.append(f"sum(CAST({c} AS DECIMAL(38,0))) AS s_{c}")
        sums.append(f"sum(CAST({c} * {c} AS DECIMAL(38,0))) AS ss_{c}")
    for a, b in _PAIRS:
        sums.append(f"sum(CAST({a} * {b} AS DECIMAL(38,0))) AS sp_{a}_{b}")
    sums_sql = ",\n           ".join(sums)
    selects = "\nUNION ALL\n".join(
        f"SELECT '{a}~{b}' AS pair, n, {_corr_expr(a, b)} AS corr FROM stats"
        for a, b in _PAIRS
    )
    return f"""
WITH base AS (
    SELECT {meas}
    FROM lineitem
),
stats AS (
    SELECT {sums_sql}
    FROM base
)
{selects}
"""


LINEITEM_CORR_SQL = _oracle_sql()


STATS_QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "lineitem_correlation_matrix": (
        lineitem_correlation_matrix,
        LINEITEM_CORR_SQL,
    ),
}
