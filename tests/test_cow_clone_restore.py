"""RESTORE and SHALLOW CLONE (operators/cow.py): restore is a
metadata-only rollback that preserves history and keeps restored
files live under vacuum; clone copies manifests only, shares data
files, and copy-on-writes its own mutations without touching the
source table."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from time_series_prediction_spark.operators.cow import (
    clone_table,
    delete_keys,
    init_table,
    list_versions,
    merge_upsert,
    read_version,
    restore_table,
    table_history,
)
from time_series_prediction_spark.operators.manifest import prune_files
from time_series_prediction_spark.streaming.layout import (
    manifest_root,
    read_committed,
    vacuum_layout,
)


def _mk_table(spark, path, n=200, n_files=8, keep=10):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
    )
    init_table(spark, path, df, key="k", n_files=n_files,
               keep_versions=keep)
    return path


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def mutated(spark, tmp_path):
    """v0 init, v1 merge (+5 updates, +2 inserts), v2 delete (k%31)."""
    path = str(tmp_path / "tbl")
    _mk_table(spark, path)
    ups = spark.range(5).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("v")
    ).unionByName(
        spark.range(2).select(
            (F.col("id") + 1000).alias("k"),
            F.lit(-2).cast("long").alias("v"),
        )
    )
    merge_upsert(spark, path, ups, key="k", keep_versions=10)
    dels = spark.range(200).select(F.col("id").alias("k")).where("k % 31 = 0")
    delete_keys(spark, path, dels, key="k", keep_versions=10)
    return path


def test_restore_head_equals_target_version(spark, mutated):
    v1 = _rows(read_version(spark, mutated, 1))
    new_v = restore_table(spark, mutated, 1, keep_versions=10)
    assert new_v == 3
    assert _rows(read_committed(spark, mutated)) == v1


def test_restore_preserves_history(spark, mutated):
    v2 = _rows(read_committed(spark, mutated))
    restore_table(spark, mutated, 0, keep_versions=10)
    # rolled-back versions stay readable for audit until retention
    assert list_versions(spark, manifest_root(mutated)) == [0, 1, 2, 3]
    assert _rows(read_version(spark, mutated, 2)) == v2
    hist = {r["version"]: r["n_rows"]
            for r in table_history(spark, manifest_root(mutated)).collect()}
    assert hist[3] == hist[0] == 200


def test_restore_is_metadata_only(spark, mutated):
    root = manifest_root(mutated)
    before = set(prune_files(
        spark.read.parquet(os.path.join(root, "v1")), {}))
    restore_table(spark, mutated, 1, keep_versions=10)
    after = set(prune_files(
        spark.read.parquet(os.path.join(root, "v3")), {}))
    # the restored head references v1's files verbatim — no rewrite
    assert after == before


def test_restored_files_survive_vacuum(spark, mutated):
    restore_table(spark, mutated, 0, keep_versions=10)
    vacuum_layout(spark, mutated, grace_s=0.0)
    assert _rows(read_committed(spark, mutated)) == _rows(
        read_version(spark, mutated, 0)
    )


def test_restore_carries_dv(spark, tmp_path):
    from time_series_prediction_spark.operators.cow import delete_keys_dv

    path = _mk_table(spark, str(tmp_path / "dvt"))
    dels = spark.range(200).select(F.col("id").alias("k")).where("k % 7 = 0")
    delete_keys_dv(spark, path, dels, key="k", keep_versions=10)
    v1 = _rows(read_committed(spark, path))
    merge_upsert(
        spark, path,
        spark.range(3).select(F.col("id").alias("k"),
                              F.lit(99).cast("long").alias("v")),
        key="k", keep_versions=10,
    )
    restore_table(spark, path, 1, keep_versions=10)
    assert _rows(read_committed(spark, path)) == v1


def test_restore_missing_version_raises(spark, mutated):
    with pytest.raises(ValueError, match="not available"):
        restore_table(spark, mutated, 9, keep_versions=10)


def test_clone_shares_files_and_diverges_on_write(spark, mutated, tmp_path):
    clone_root = str(tmp_path / "clone_meta")
    clone_data = str(tmp_path / "clone_data")
    versions = clone_table(spark, mutated, clone_root)
    assert versions == [0, 1, 2]
    src_rows = _rows(read_committed(spark, mutated))
    assert _rows(read_committed(spark, clone_data, root=clone_root)) \
        == src_rows
    # clone time travel works off the shared files
    assert _rows(read_version(spark, clone_data, 0, root=clone_root)) \
        == _rows(read_version(spark, mutated, 0))
    # mutate the CLONE: source table must not move
    merge_upsert(
        spark, clone_data,
        spark.range(4).select(F.col("id").alias("k"),
                              F.lit(-9).cast("long").alias("v")),
        key="k", root=clone_root, keep_versions=10,
    )
    assert _rows(read_committed(spark, mutated)) == src_rows
    got = {r["k"]: r["v"] for r in
           read_committed(spark, clone_data, root=clone_root).collect()}
    assert all(got[k] == -9 for k in range(4) if k in got)
    # the clone's new generation landed in its OWN data dir
    man = spark.read.parquet(os.path.join(
        clone_root, f"v{max(list_versions(spark, clone_root))}"))
    files = prune_files(man, {})
    assert any(clone_data in f for f in files)
    assert any(mutated in f for f in files)  # untouched files shared


def test_clone_then_restore_clone(spark, mutated, tmp_path):
    clone_root = str(tmp_path / "cr_meta")
    clone_data = str(tmp_path / "cr_data")
    clone_table(spark, mutated, clone_root)
    restore_table(spark, clone_data, 1, root=clone_root, keep_versions=10)
    assert _rows(read_committed(spark, clone_data, root=clone_root)) \
        == _rows(read_version(spark, mutated, 1))


def test_forget_keys_purges_all_rows_of_nonunique_key(spark, tmp_path):
    """forget_keys tombstones EVERY row of the requested keys in one
    DV commit (no file rewritten), audits exact purge counts, and
    verifies absence against the new head; other keys untouched."""
    from time_series_prediction_spark.operators.cow import forget_keys

    path = str(tmp_path / "ftbl")
    # non-unique key: 40 groups × 5 rows
    df = spark.range(200).select(
        (F.col("id") % 40).alias("g"),
        F.col("id").alias("v"),
    )
    init_table(spark, path, df, key="g", n_files=4, keep_versions=10)
    victims = spark.createDataFrame([(7,), (13,), (39,)], "g long")
    v_new, audit = forget_keys(spark, path, victims, "g",
                               keep_versions=10)
    rows = {r["g"]: r for r in audit.collect()}
    assert set(rows) == {7, 13, 39}
    for g, r in rows.items():
        assert r["n_rows_purged"] == 5, r
        assert r["verified_absent"] is True
    live = read_committed(spark, path)
    assert live.where("g in (7, 13, 39)").count() == 0
    assert live.count() == 200 - 15
    # merge-on-read: the file set is untouched (metadata-only commit)
    root = manifest_root(path)
    f0 = set(prune_files(
        spark.read.parquet(os.path.join(root, "v0")), {}))
    f1 = set(prune_files(
        spark.read.parquet(os.path.join(root, f"v{v_new}")), {}))
    assert f0 == f1


def test_check_table_fsck(spark, mutated):
    """Healthy table: ok, superseded generations reported as
    unreferenced only after restore/vacuum churn; corrupting a
    referenced file flips ok=False with a precise error."""
    from time_series_prediction_spark.operators.cow import check_table
    from time_series_prediction_spark.sources.fsops import fs_for

    rep = check_table(spark, mutated)
    assert rep["ok"], rep["errors"]
    assert [v["version"] for v in rep["versions"]] == [0, 1, 2]
    assert all(v["n_missing"] == 0 for v in rep["versions"])
    # delete one referenced data file → fsck must name it
    man = spark.read.parquet(
        os.path.join(manifest_root(mutated), "v2")
    )
    victim = sorted(prune_files(man, {}))[0]
    fs_for(spark, mutated).delete(victim)
    rep2 = check_table(spark, mutated)
    assert not rep2["ok"]
    assert any(victim in e for e in rep2["errors"])


def test_forget_keys_reports_unknown_keys_as_absent(spark, tmp_path):
    """An erasure request for a key the table never held still gets an
    audit row: 0 purged, verified absent — the compliance answer."""
    from time_series_prediction_spark.operators.cow import forget_keys

    path = str(tmp_path / "utbl")
    df = spark.range(50).select(
        (F.col("id") % 10).alias("g"), F.col("id").alias("v")
    )
    init_table(spark, path, df, key="g", n_files=2, keep_versions=10)
    victims = spark.createDataFrame([(3,), (777,)], "g long")
    _, audit = forget_keys(spark, path, victims, "g", keep_versions=10)
    rows = {r["g"]: r for r in audit.collect()}
    assert set(rows) == {3, 777}
    assert rows[3]["n_rows_purged"] == 5
    assert rows[777]["n_rows_purged"] == 0
    assert rows[777]["verified_absent"] is True


def test_repair_table_reclaims_provably_safe_junk(spark, mutated):
    """fsck→repair: an orphaned (unreferenced, aged) generation dir
    and a partial DV sidecar are removed; a second run is a no-op;
    the table reads green throughout."""
    from time_series_prediction_spark.operators.cow import (
        check_table,
        repair_table,
    )
    from time_series_prediction_spark.sources.fsops import fs_for

    root = manifest_root(mutated)
    fs = fs_for(spark, mutated)
    truth = _rows(read_committed(spark, mutated))

    # plant an orphaned generation dir (a crashed writer's output no
    # manifest ever referenced)
    orphan = os.path.join(mutated, "merge-99-pdead-0")
    spark.range(5).write.mode("overwrite").parquet(orphan)
    # plant a partial DV sidecar (crash mid-write: no _SUCCESS)
    vmax = max(list_versions(spark, root))
    partial_dv = os.path.join(root, f"v{vmax}", "_dv")
    spark.range(3).select(F.col("id").alias("k")).write.mode(
        "overwrite"
    ).parquet(partial_dv)
    fs.delete(os.path.join(partial_dv, "_SUCCESS"))

    rep = check_table(spark, mutated)
    assert orphan in rep["unreferenced_dirs"]

    fixed = repair_table(spark, mutated, grace_s=0)
    assert orphan in fixed["removed_dirs"]
    assert partial_dv in fixed["removed_partial_dvs"]
    assert fixed["remaining_errors"] == []
    assert not fs.exists(orphan)
    assert not fs.exists(partial_dv)
    # table content untouched
    assert _rows(read_committed(spark, mutated)) == truth
    # idempotent
    again = repair_table(spark, mutated, grace_s=0)
    assert again["removed_dirs"] == []
    assert again["removed_partial_dvs"] == []


def test_repair_table_respects_grace_and_refuses_data_loss(
    spark, mutated
):
    """A RECENT unreferenced dir survives (in-flight commit window);
    a missing referenced file is reported, never 'repaired'."""
    from time_series_prediction_spark.operators.cow import repair_table
    from time_series_prediction_spark.sources.fsops import fs_for

    orphan = os.path.join(mutated, "merge-98-pdead-1")
    spark.range(5).write.mode("overwrite").parquet(orphan)
    fixed = repair_table(spark, mutated, grace_s=3600)
    assert orphan in fixed["kept_recent"]
    assert fs_for(spark, mutated).exists(orphan)

    # delete a referenced file: repair must leave the manifest alone
    # and surface the error
    man = spark.read.parquet(
        os.path.join(manifest_root(mutated), "v2")
    )
    victim = sorted(prune_files(man, {}))[0]
    fs_for(spark, mutated).delete(victim)
    fixed2 = repair_table(spark, mutated, grace_s=3600)
    assert any(victim in e for e in fixed2["remaining_errors"])
