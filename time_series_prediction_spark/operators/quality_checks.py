"""Declarative data-quality audit (deequ/dbt-test-style): a check
spec compiles into ONE conditional-aggregate pass per table plus one
anti-join per referential constraint — never a scan per check.

A 100 TB ingest runs validation before anything trains on the data;
the design constraint is that adding a check must not add a scan.
Three check families:

* column checks — completeness (null rate), range/predicate
  violations: each compiles to ``sum(CASE WHEN …)`` inside a single
  aggregate over one scan of the table, whole-stage-codegen'd.
* uniqueness — ``count(*) − count(distinct col)`` rides the same
  single pass (Spark rewrites the mixed distinct/non-distinct
  aggregate into a two-stage expand — still one scan).
* referential integrity — child-keys-without-parent via a distinct
  key anti-join (the distinct collapses the child side BEFORE the
  join, so the shuffle carries keys, not rows; the parent side is a
  key projection that broadcasts when small).

Each check yields (check_name, n_checked, n_violations) — integer
counts, exactly reproducible by any SQL engine, so audits are
oracle-checkable end-to-end.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ColumnCheck:
    """A per-row predicate audited over one scan. ``violation`` is a
    boolean Column expression that is True when the ROW FAILS."""

    name: str
    violation: Column


def not_null(col: str) -> ColumnCheck:
    return ColumnCheck(f"{col}_not_null", F.col(col).isNull())


def in_range(col: str, lo: float | None = None, hi: float | None = None) -> ColumnCheck:
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < F.lit(lo))
    if hi is not None:
        cond = cond | (F.col(col) > F.lit(hi))
    # a NULL never violates a range check (completeness is not_null's job)
    return ColumnCheck(f"{col}_in_range", F.coalesce(cond, F.lit(False)))


def satisfies(name: str, predicate: Column) -> ColumnCheck:
    """Row passes when ``predicate`` is True; NULL counts as failure
    (an unevaluable business rule is a violation, not a pass)."""
    return ColumnCheck(name, ~F.coalesce(predicate, F.lit(False)))


def audit_columns(
    df: DataFrame, checks: list[ColumnCheck], unique_cols: list[str] = ()
) -> DataFrame:
    """(check_name, n_checked, n_violations) for every check — ONE
    aggregate over ONE scan, however many checks are declared."""
    if not checks and not unique_cols:
        raise ValueError(
            "audit_columns needs at least one check or unique_col "
            "(an empty audit would build a malformed stack(0) expr)"
        )
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for c in checks:
        aggs.append(
            F.sum(F.when(c.violation, 1).otherwise(0)).cast("long").alias(c.name)
        )
    for col in unique_cols:
        aggs.append(
            (F.count(col) - F.countDistinct(col)).cast("long").alias(f"{col}_unique")
        )
    row = df.agg(*aggs)
    names = [c.name for c in checks] + [f"{col}_unique" for col in unique_cols]
    # unpivot the single aggregate row into the report shape
    pairs = ", ".join(f"'{n}', {n}" for n in names)
    return row.select(
        F.expr(f"stack({len(names)}, {pairs}) AS (check_name, n_violations)"),
        F.col("_n").alias("n_checked"),
    ).select("check_name", "n_checked", "n_violations")


def audit_reference(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str, name: str
) -> DataFrame:
    """Orphaned child keys: distinct child keys anti-joined against
    the parent key set. Reports (check_name, n_checked = distinct
    child keys, n_violations = orphans)."""
    ckeys = child.select(F.col(child_key).alias("_k")).where(
        F.col(child_key).isNotNull()
    ).distinct()
    pkeys = (
        parent.select(F.col(parent_key).alias("_k"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    # one left join + one aggregate: n_checked and the orphan count
    # come from the SAME pass, so the child is scanned exactly once
    # (an anti-join + separate count would scan it twice)
    return (
        ckeys.join(pkeys, "_k", "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_checked"),
            F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_violations"),
        )
        .select(F.lit(name).alias("check_name"), "n_checked", "n_violations")
    )
