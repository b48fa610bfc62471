"""Merge-on-read deletes (deletion vectors): metadata-cost commits
that rewrite NO files, dv-aware reads/time-travel/CDC, re-insert
semantics on merge, and compaction as the materialization point."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from time_series_prediction_spark.operators.cow import (
    delete_keys,
    delete_keys_dv,
    init_table,
    list_versions,
    merge_upsert,
    read_version,
    table_history,
    version_changes,
)
from time_series_prediction_spark.operators.manifest import prune_files
from time_series_prediction_spark.streaming.layout import (
    compact_layout,
    current_manifest,
    manifest_root,
    read_committed,
    vacuum_layout,
    version_dv,
)


def _mk(spark, path, n=100, n_files=4):
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    init_table(spark, path, df, key="k", n_files=n_files, keep_versions=10)


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _mk(spark, path)
    return path


def test_dv_delete_rewrites_no_files(spark, table):
    """A scattered key set (every 7th key — overlaps EVERY file)
    deletes at metadata cost: identical file set, rows hidden."""
    root = manifest_root(table)
    files0 = set(prune_files(current_manifest(spark, root), {}))
    keys = spark.range(100).where("id % 7 = 0").select(
        F.col("id").alias("k")
    )
    v1 = delete_keys_dv(spark, table, keys, key="k", keep_versions=10)
    files1 = set(prune_files(current_manifest(spark, root), {}))
    assert files0 == files1  # no rewrite at all
    got = read_committed(spark, table)
    assert got.count() == 100 - 15
    assert got.where("k % 7 = 0").count() == 0
    # the copy-on-write twin would have rewritten every file here
    hist = {r["version"]: r["n_dv_keys"]
            for r in table_history(spark, root).collect()}
    assert hist == {0: 0, v1: 15}


def test_dv_time_travel_and_cumulative_second_delete(spark, table):
    k1 = spark.createDataFrame([(3,), (50,)], "k long")
    v1 = delete_keys_dv(spark, table, k1, key="k", keep_versions=10)
    k2 = spark.createDataFrame([(51,)], "k long")
    v2 = delete_keys_dv(spark, table, k2, key="k", keep_versions=10)
    assert read_version(spark, table, 0).count() == 100
    assert read_version(spark, table, v1).count() == 98
    assert read_version(spark, table, v2).count() == 97
    dv = version_dv(spark, manifest_root(table), v2)
    assert sorted(r[0] for r in dv.collect()) == [3, 50, 51]


def test_dv_cdc_emits_only_newly_hidden_rows(spark, table):
    k1 = spark.createDataFrame([(3,), (50,)], "k long")
    v1 = delete_keys_dv(spark, table, k1, key="k", keep_versions=10)
    ch = version_changes(spark, table, 0, v1).collect()
    assert {r["_change"] for r in ch} == {"delete"}
    assert sorted(r["k"] for r in ch) == [3, 50]
    assert all(r["v"] == r["k"] * 3 for r in ch)
    k2 = spark.createDataFrame([(51,)], "k long")
    v2 = delete_keys_dv(spark, table, k2, key="k", keep_versions=10)
    ch2 = version_changes(spark, table, v1, v2).collect()
    assert [(r["k"], r["_change"]) for r in ch2] == [(51, "delete")]


def test_merge_after_dv_respects_and_undeletes(spark, table):
    """Rewrites must not resurrect tombstoned rows; upserting a
    tombstoned key clears its tombstone."""
    keys = spark.createDataFrame([(3,), (4,), (80,)], "k long")
    delete_keys_dv(spark, table, keys, key="k", keep_versions=10)
    updates = spark.createDataFrame([(4, -4)], "k long, v long")
    merge_upsert(spark, table, updates, key="k", keep_versions=10)
    got = {r["k"]: r["v"] for r in read_committed(spark, table).collect()}
    assert 3 not in got          # same file as k=4, must stay hidden
    assert got[4] == -4          # re-inserted
    assert 80 not in got         # untouched file, tombstone carried
    assert len(got) == 98


def test_cow_delete_after_dv_keeps_both(spark, table):
    keys = spark.createDataFrame([(10,)], "k long")
    delete_keys_dv(spark, table, keys, key="k", keep_versions=10)
    more = spark.createDataFrame([(11,)], "k long")
    delete_keys(spark, table, more, key="k", keep_versions=10)
    got = read_committed(spark, table)
    assert got.count() == 98
    assert got.where("k in (10, 11)").count() == 0


def test_compaction_materializes_dv(spark, table):
    keys = spark.range(100).where("id % 10 = 0").select(
        F.col("id").alias("k")
    )
    delete_keys_dv(spark, table, keys, key="k", keep_versions=10)
    before = sorted(
        (r["k"], r["v"]) for r in read_committed(spark, table).collect()
    )
    compact_layout(spark, table, ["k"], n_files=2)
    root = manifest_root(table)
    v = max(list_versions(spark, root))
    assert version_dv(spark, root, v) is None  # vector cleared
    after = sorted(
        (r["k"], r["v"]) for r in read_committed(spark, table).collect()
    )
    assert before == after
    # CDC across the materializing compaction cancels to empty
    assert version_changes(spark, table, v - 1, v).count() == 0
    # vacuum then erases the tombstoned bytes (GDPR point)
    vacuum_layout(spark, table, grace_s=0.0)
    assert read_committed(spark, table).count() == 90
