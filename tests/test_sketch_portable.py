"""Portable-sketch contracts: cross-engine bit-exactness (the oracle
discipline), estimator accuracy vs exact answers at the test scale,
merge losslessness, and plan shape."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.oracle_harness import assert_matches_oracle, duck_connection
from time_series_prediction_spark.operators.sketch_portable import (
    portable_hll_daily_sql,
    portable_quantile_sql,
)
from time_series_prediction_spark.plans.sketch_queries import (
    _HLL_M,
    SKETCH_QUERIES,
    approx_distinct_users_daily,
    events_dau_portable_rollup,
    lineitem_quantiles_portable,
)


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connection(sf_dir)


@pytest.mark.parametrize("name", sorted(SKETCH_QUERIES))
def test_matches_oracle(spark, sf_dir, duck, name):
    fn, sql = SKETCH_QUERIES[name]
    assert sql is not None
    assert_matches_oracle(fn(spark, sf_dir), duck, sql, name=name)


def test_hll_accuracy_vs_exact(spark, sf_dir):
    """Estimate well within the m=1024 error envelope of exact daily
    distincts, with an absolute floor for tiny days. The fixtures'
    per-day cardinalities sit in the LINEAR-COUNTING branch at this m
    (round 10 moved m 256→1024: the old m put sf0.1's ~1.3K DAU in
    raw-HLL's n/m≈5 bias hump, +8% mean bias)."""
    exact = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("dau"))
    )
    est = approx_distinct_users_daily(spark, sf_dir)
    bad = (
        exact.join(est, "day")
        .where(
            F.abs(F.col("approx_dau") - F.col("dau"))
            > F.col("dau") * 0.15 + 2
        )
        .count()
    )
    assert bad == 0


def test_hll_rollup_bit_identical_to_flat(spark, sf_dir):
    """MAX-of-MAX register folds are associative, so the two-level
    (day, shard) rollup must produce the IDENTICAL estimate — not
    merely a close one. This is the mergeable-sketch guarantee."""
    flat = approx_distinct_users_daily(spark, sf_dir).toPandas()
    roll = events_dau_portable_rollup(spark, sf_dir).toPandas()
    flat = flat.sort_values("day").reset_index(drop=True)
    roll = roll.sort_values("day").reset_index(drop=True)
    assert (flat["approx_dau"] == roll["approx_dau"]).all()
    assert (flat["n_reg"] == roll["n_reg"]).all()


def test_hll_spark_duckdb_bit_identical(spark, sf_dir):
    """Stronger than assert_matches_oracle's 1e-9 tolerance: the
    estimates must be bit-identical across engines — the module's
    whole determinism argument, checked end to end."""
    got = (
        approx_distinct_users_daily(spark, sf_dir)
        .toPandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    want = (
        con.execute(portable_hll_daily_sql("events", m=_HLL_M))
        .df()
        .sort_values("day")
        .reset_index(drop=True)
    )
    assert (
        got["approx_dau"].to_numpy() == want["approx_dau"].to_numpy()
    ).all()


def test_quantile_error_bound(spark, sf_dir):
    """Each reported quantile sits within one histogram bucket of the
    exact value: relative error ≤ 2^-4 = 6.25% by construction."""
    exact = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.95))"
            ).alias("qs")
        )
    )
    got = lineitem_quantiles_portable(spark, sf_dir)
    j = exact.join(got, "l_returnflag").collect()
    assert len(j) > 0
    for row in j:
        for i, c in enumerate(["p25", "p50", "p75", "p95"]):
            rel = abs(row[c] - row["qs"][i]) / row["qs"][i]
            assert rel <= 0.0625 + 1e-12, (row["l_returnflag"], c, rel)


def test_quantile_spark_duckdb_bit_identical(spark, sf_dir):
    got = (
        lineitem_quantiles_portable(spark, sf_dir)
        .toPandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    want = (
        con.execute(portable_quantile_sql("lineitem"))
        .df()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    for c in ["p25", "p50", "p75", "p95", "n"]:
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_hll_determinism_across_partitionings(spark, sf_dir):
    """The estimate is independent of physical partitioning (register
    sums are exact powers-of-two partial sums — order-free)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.repartition(13).createOrReplaceTempView("_psk_events")
    a = spark.sql(portable_hll_daily_sql("_psk_events")).toPandas()
    ev.repartition(2).createOrReplaceTempView("_psk_events")
    b = spark.sql(portable_hll_daily_sql("_psk_events")).toPandas()
    a = a.sort_values("day").reset_index(drop=True)
    b = b.sort_values("day").reset_index(drop=True)
    assert (a["approx_dau"] == b["approx_dau"]).all()


def test_incremental_registers_bounded_and_bit_identical(spark, sf_dir):
    """The steady-state contract: after streaming the fixture in 8
    arbitrary batches, (a) the persisted register state is ≤ m×days
    rows — independent of how much data streamed through; (b) the
    estimates from that state are BIT-identical to the flat recompute
    over raw events (MAX-fold associativity + deterministic
    estimator)."""
    import os

    from time_series_prediction_spark.plans.sketch_queries import (
        _registers_layout,
        approx_distinct_users_daily,
        events_dau_incremental,
    )

    path = _registers_layout(spark, sf_dir)
    state = spark.read.parquet(os.path.join(path, "state", "current"))
    days = state.select("day").distinct().count()
    assert state.count() <= _HLL_M * days
    inc = (
        events_dau_incremental(spark, sf_dir)
        .toPandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    flat = (
        approx_distinct_users_daily(spark, sf_dir)
        .toPandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    assert (inc["approx_dau"].to_numpy() == flat["approx_dau"].to_numpy()).all()
    assert (inc["n_reg"].to_numpy() == flat["n_reg"].to_numpy()).all()


def test_overlap_inclusion_exclusion_vs_exact(spark, sf_dir):
    """Pairwise overlap estimates land within combined HLL error of
    the exact distinct-intersection (3 estimates each within ~2σ of
    the m=1024 RSE ⇒ 20% + 3 absolute bounds them loosely), and the identity
    est(A)+est(B)−est(A∪B) is internally consistent: never above
    min(est A, est B) by more than rounding, since A∪B ⊇ A, B means
    est(A∪B) ≥ max register-wise."""
    from time_series_prediction_spark.plans.sketch_queries import (
        events_type_overlap_sketch,
    )

    got = events_type_overlap_sketch(spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "user_id"
    ).distinct()
    a, b = ev.alias("a"), ev.alias("b")
    exact = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.countDistinct("a.user_id").alias("exact_ov"))
    )
    rows = got.join(exact, ["type_a", "type_b"], "left").fillna(
        0, subset=["exact_ov"]
    ).collect()
    assert len(rows) > 0
    for r in rows:
        assert abs(r["overlap_est"] - r["exact_ov"]) <= (
            0.2 * r["exact_ov"] + 3
        ), (r["type_a"], r["type_b"], r["overlap_est"], r["exact_ov"])
        # union-dominance sanity: overlap cannot exceed either side
        assert r["overlap_est"] <= min(r["users_a"], r["users_b"]) + 1e-9


def test_plan_shape(spark, sf_dir):
    """Whole pipeline stays JVM-side: no Python stages, and the only
    exchanges are the register folds (hash partial-agg before them)."""
    for name, (fn, _) in sorted(SKETCH_QUERIES.items()):
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_cms_overestimates_and_is_tight_on_heavy_tokens(spark, sf_dir):
    """CMS one-sided error: n_cms ≥ n_exact always, with slack
    bounded by the classic 2N/w expectation (N = total tokens,
    w = 512) — heavy hitters are where CMS is designed to be tight."""
    from time_series_prediction_spark.operators.sketch_portable import (
        CMS_WIDTH,
    )
    from time_series_prediction_spark.plans.sketch_queries import (
        corpus_cms_heavy_hitters,
    )
    from time_series_prediction_spark.sources.io import read_table

    rows = corpus_cms_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) == 15
    n_total = (
        read_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("t"))
        .where("t <> ''")
        .count()
    )
    for r in rows:
        assert r["n_cms"] >= r["n_exact"], r["token"]
        assert r["n_cms"] - r["n_exact"] <= 4 * n_total / CMS_WIDTH, r


def test_native_sketch_twins_self_verify(spark, sf_dir):
    """r12 Next #5: the two rows-only NATIVE sketch queries carry
    their own cross-check against the oracle-backed portable twin as
    an output column — a silent native-sketch regression surfaces as
    a blown gap bound instead of hiding behind the rows-only driver
    check. Bounds: HLL native lgK=12 (RSE ~1.6%) vs portable m=1024
    (RSE ~3.3%) ⇒ gap well under 15%; native GK accuracy=10000
    (near-exact) vs portable log-linear histogram (relative error
    ≤ 2^-4, one-sided lower bounds) ⇒ gap under 8%."""
    from time_series_prediction_spark.plans.relational2 import (
        events_dau_sketch_rollup,
    )
    from time_series_prediction_spark.plans.relational3 import (
        lineitem_quantiles_approx,
    )

    dau = events_dau_sketch_rollup(spark, sf_dir)
    assert {"dau_est", "portable_est", "est_gap_frac"} <= set(
        dau.columns
    )
    rows = dau.collect()
    assert rows
    worst = max(r["est_gap_frac"] for r in rows)
    assert worst <= 0.15, f"HLL native/portable gap blew up: {worst}"

    qq = lineitem_quantiles_approx(spark, sf_dir)
    assert "max_gap_frac" in qq.columns
    rows = qq.collect()
    assert rows
    worst = max(r["max_gap_frac"] for r in rows)
    assert worst <= 0.08, f"quantile native/portable gap: {worst}"
