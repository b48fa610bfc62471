"""Materialized views: fingerprint-driven refresh, cache hits on
unchanged sources, invalidation on drift, name isolation."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from time_series_prediction_spark.operators.mview import refresh_if_stale


@pytest.fixture()
def source(spark, tmp_path):
    p = str(tmp_path / "src.parquet")
    spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("g")
    ).write.mode("overwrite").parquet(p)
    return p


def _builder(path):
    def build(spark):
        return (
            spark.read.parquet(path)
            .groupBy("g")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )

    return build


def test_build_once_then_cache_hit(spark, source, tmp_path):
    base = str(tmp_path / "views")
    df1, rebuilt1 = refresh_if_stale(
        spark, "by_g", _builder(source), [source], base=base
    )
    assert rebuilt1
    assert {r["g"]: r["n"] for r in df1.collect()} == {
        g: 20 for g in range(5)
    }
    df2, rebuilt2 = refresh_if_stale(
        spark, "by_g", _builder(source), [source], base=base
    )
    assert not rebuilt2
    assert sorted(map(tuple, df2.collect())) == sorted(
        map(tuple, df1.collect())
    )


def test_source_drift_invalidates_and_gc_reclaims(
    spark, source, tmp_path
):
    base = str(tmp_path / "views")
    refresh_if_stale(spark, "by_g", _builder(source), [source], base=base)
    time.sleep(1.1)  # mtime resolution
    spark.range(40).select(
        F.col("id").alias("k"), F.lit(7).alias("g")
    ).write.mode("overwrite").parquet(source)
    df, rebuilt = refresh_if_stale(
        spark, "by_g", _builder(source), [source], base=base,
        stale_grace_s=0,
    )
    assert rebuilt
    assert {r["g"]: r["n"] for r in df.collect()} == {7: 40}
    # exactly one generation of this view remains (grace disabled)
    gens = [d for d in os.listdir(base) if d.startswith("by_g_")]
    assert len(gens) == 1


def test_stale_grace_keeps_recent_generation(spark, source, tmp_path):
    """Default grace: a just-superseded generation survives the
    publish so cross-process readers mid-scan on it can finish; it is
    reclaimed only once its publish marker ages past the window."""
    base = str(tmp_path / "views")
    df0, _ = refresh_if_stale(
        spark, "by_g", _builder(source), [source], base=base
    )
    old_rows = sorted(map(tuple, df0.collect()))
    time.sleep(1.1)  # mtime resolution
    spark.range(40).select(
        F.col("id").alias("k"), F.lit(7).alias("g")
    ).write.mode("overwrite").parquet(source)
    df, rebuilt = refresh_if_stale(
        spark, "by_g", _builder(source), [source], base=base
    )  # default stale_grace_s
    assert rebuilt
    gens = [d for d in os.listdir(base) if d.startswith("by_g_")]
    assert len(gens) == 2  # old generation retained within grace
    # ... and the old generation is still fully scannable
    old_gen = next(
        d for d in gens
        if (tmp_path / "views" / d / "_IDENT").read_text()
        != "" and sorted(
            map(tuple, spark.read.parquet(
                str(tmp_path / "views" / d / "data")).collect())
        ) == old_rows
    )
    assert old_gen


def test_version_bump_invalidates(spark, source, tmp_path):
    base = str(tmp_path / "views")
    _, r1 = refresh_if_stale(
        spark, "v", _builder(source), [source], base=base, version="v1"
    )
    _, r2 = refresh_if_stale(
        spark, "v", _builder(source), [source], base=base, version="v2"
    )
    assert r1 and r2


def test_prefix_sharing_views_are_isolated(spark, source, tmp_path):
    base = str(tmp_path / "views")
    refresh_if_stale(spark, "gold", _builder(source), [source], base=base)
    refresh_if_stale(
        spark, "gold_daily", _builder(source), [source], base=base
    )
    # rebuilding "gold" must not reclaim "gold_daily"
    time.sleep(1.1)
    spark.range(10).select(
        F.col("id").alias("k"), F.lit(1).alias("g")
    ).write.mode("overwrite").parquet(source)
    refresh_if_stale(spark, "gold", _builder(source), [source], base=base)
    daily = [d for d in os.listdir(base) if d.startswith("gold_daily_")]
    assert len(daily) == 1


def test_missing_source_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        refresh_if_stale(
            spark, "x", lambda s: s.range(1),
            [str(tmp_path / "absent.parquet")],
            base=str(tmp_path / "views"),
        )


def test_concurrent_refresh_builds_once(spark, source, tmp_path):
    """Four threads race the same cold view: the build lock + publish
    protocol admit exactly one build; every caller gets the data."""
    import threading

    base = str(tmp_path / "views")
    builds = []
    lock = threading.Lock()

    def build(s):
        with lock:
            builds.append(1)
        return _builder(source)(s)

    results = {}

    def run(i):
        df, _ = refresh_if_stale(
            spark, "race", build, [source], base=base
        )
        results[i] = sorted(map(tuple, df.collect()))

    threads = [
        threading.Thread(target=run, args=(i,)) for i in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(builds) == 1
    assert len({str(v) for v in results.values()}) == 1


def test_publish_failure_without_winner_raises(spark, tmp_path, monkeypatch):
    """Round-9 ADVICE: a failed publish_dir with NO concurrent winner
    is a genuine rename failure (permissions, dead mount) — silently
    deleting the build and returning left callers to fail later on a
    missing target with the real cause destroyed. It must raise,
    naming both paths, and keep the build dir for inspection."""
    import pytest

    from time_series_prediction_spark.operators.mview import (
        ensure_artifact,
    )
    from time_series_prediction_spark.sources import fsops

    target = str(tmp_path / "views" / "artifact")

    def _build(tmp: str) -> None:
        os.makedirs(tmp, exist_ok=True)
        with open(os.path.join(tmp, "data.txt"), "w") as f:
            f.write("payload")

    monkeypatch.setattr(
        fsops.Fs, "publish_dir", lambda self, src, dst: False
    )
    with pytest.raises(RuntimeError, match="no .*winner"):
        ensure_artifact(spark, target, "ident-1", _build)
    # the build dir survives for inspection
    build_dirs = [
        n for n in os.listdir(tmp_path / "views")
        if n.startswith("artifact.build-")
    ]
    assert build_dirs, "build dir was destroyed with the evidence"
