"""Skew-aware aggregation: two-phase salted groupBy.

At 100 TB a handful of hot keys (a viral event_type, a mega-customer)
can make one reducer the whole job's critical path. AQE's skew-join
splitting handles joins; for AGGREGATIONS over hot keys the classic
fix is salting:

  phase 1: group by (key, salt) where salt = hash(row) % S —
           hot keys split across S reducers, partial aggregates
  phase 2: group by key over the S partials — tiny input

Correct for any algebraic aggregate (sum/count/min/max). The result
is bit-identical to the unsalted groupBy when the aggregate is an
exact integer domain (this engine's determinism contract), which is
what lets the DuckDB oracle check it: the salted plan must produce
EXACTLY the plain GROUP BY's answer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    key_cols: list[str],
    sum_col: Column,
    n_salts: int = 16,
    sum_alias: str = "total",
    count_alias: str = "n",
) -> DataFrame:
    """Two-phase sum/count over possibly-skewed keys.

    ``sum_col`` should be an exact-integer expression (e.g. cents) so
    the two-phase result is bit-identical to single-phase."""
    salted = df.withColumn(
        "_salt", (F.spark_partition_id() + F.monotonically_increasing_id()) % n_salts
    )
    phase1 = salted.groupBy(*key_cols, "_salt").agg(
        F.sum(sum_col).alias("_ps"), F.count(F.lit(1)).alias("_pc")
    )
    return phase1.groupBy(*key_cols).agg(
        F.sum("_ps").alias(sum_alias), F.sum("_pc").cast("bigint").alias(count_alias)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi join: the big/skewed ``left`` gets a salt in
    [0, n_salts); the smaller ``right`` is replicated n_salts× (explode
    of a literal sequence) so every (key, salt) pair still meets its
    match. A hot key's rows now spread over n_salts shuffle partitions
    instead of one straggler task.

    This is the manual form of AQE's skew-join splitting — kept
    explicit for engines/configs where AQE can't apply (e.g. the hot
    side feeds a window) and asserted bit-identical to the plain join
    in tests. The salt is derived deterministically from the left
    row's full content (xxhash64), but ANY salt assignment yields the
    same join result — determinism here only aids debugging.

    Cost model: replication multiplies the right side's shuffle volume
    by n_salts — use when |right| ≪ |left| but right is too big (or
    too skew-matched) to broadcast outright.

    ``how`` is restricted to left-preserving joins: with the right side
    replicated n_salts×, a right/full outer join would emit every
    UNMATCHED right row n_salts times, diverging from the plain join.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the replicated right "
            f"side duplicates unmatched right rows under right/full outer "
            f"joins; use one of {sorted(allowed)}"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    l_salted = left.withColumn("_salt", salt)
    r_salted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l_salted.join(r_salted, on + ["_salt"], how).drop("_salt")
