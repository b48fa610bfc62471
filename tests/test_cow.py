"""Copy-on-write table mutations (operators/cow.py): MERGE upsert,
DELETE by key, time travel, and the version change feed — verified
for row-level results (vs pandas truth), file-level economy (only
overlapping files rewritten; unchanged files carried by reference and
never re-read by CDC), and commit-protocol consistency (every version
remains readable until retention)."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from time_series_prediction_spark.operators.cow import (
    delete_keys,
    init_table,
    list_versions,
    merge_upsert,
    read_version,
    version_changes,
)
from time_series_prediction_spark.operators.manifest import prune_files
from time_series_prediction_spark.streaming.layout import (
    current_manifest,
    manifest_root,
    read_committed,
)


def _mk_table(spark, path, n=200, n_files=8):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
        F.concat(F.lit("g"), (F.col("id") % 4).cast("string")).alias("g"),
    )
    gen = init_table(spark, path, df, key="k", n_files=n_files,
                     keep_versions=10)
    return gen


def _pdf(df):
    return (
        df.toPandas().sort_values(list(df.columns)).reset_index(drop=True)
    )


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _mk_table(spark, path)
    return path


def test_init_and_read_committed(spark, table):
    got = read_committed(spark, table)
    assert got.count() == 200
    assert set(got.columns) == {"k", "v", "g"}
    # key-clustered: files partition the key space
    man = current_manifest(spark, manifest_root(table))
    assert len(prune_files(man, {})) == 8


def test_merge_updates_and_inserts(spark, table):
    updates = spark.createDataFrame(
        [(5, 5555, "gX"), (42, 4242, "gX"), (1000, 1, "gNEW")],
        "k long, v long, g string",
    )
    merge_upsert(spark, table, updates, key="k", keep_versions=10)
    got = _pdf(read_committed(spark, table))
    base = pd.DataFrame(
        {"k": range(200), "v": [i * 10 for i in range(200)],
         "g": [f"g{i % 4}" for i in range(200)]}
    )
    base.loc[base.k == 5, ["v", "g"]] = [5555, "gX"]
    base.loc[base.k == 42, ["v", "g"]] = [4242, "gX"]
    want = pd.concat(
        [base, pd.DataFrame({"k": [1000], "v": [1], "g": ["gNEW"]})]
    ).sort_values(["k", "v", "g"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "v", "g"]], want)


def test_merge_rewrites_only_overlapping_files(spark, table):
    man0 = current_manifest(spark, manifest_root(table))
    files0 = set(prune_files(man0, {}))
    # keys 0..9 live in one key-range file of the 8
    updates = spark.createDataFrame(
        [(3, -1, "gX"), (7, -1, "gX")], "k long, v long, g string"
    )
    merge_upsert(spark, table, updates, key="k", keep_versions=10)
    man1 = current_manifest(spark, manifest_root(table))
    files1 = set(prune_files(man1, {}))
    carried = files0 & files1
    # at least 6 of the 8 base files must survive BY REFERENCE
    assert len(carried) >= 6
    rewritten_src = files0 - files1
    assert len(rewritten_src) <= 2


def test_merge_rejects_duplicate_update_keys(spark, table):
    updates = spark.createDataFrame(
        [(5, 1, "a"), (5, 2, "b")], "k long, v long, g string"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_upsert(spark, table, updates, key="k")


def test_delete_keys_and_noop_outside_domain(spark, table):
    keys = spark.createDataFrame(
        [(k,) for k in (0, 13, 199)], "k long"
    )
    v = delete_keys(spark, table, keys, key="k", keep_versions=10)
    got = read_committed(spark, table)
    assert got.count() == 197
    assert got.where(F.col("k").isin(0, 13, 199)).count() == 0
    # keys entirely outside every file's range: no rewrite, no commit
    far = spark.createDataFrame([(10_000,)], "k long")
    v2 = delete_keys(spark, table, far, key="k", keep_versions=10)
    assert v2 == v
    assert read_committed(spark, table).count() == 197


def test_delete_whole_file_publishes_no_empty_file(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _mk_table(spark, path, n=80, n_files=4)
    # wipe one full key-range file (0..19 with 4 equal files)
    keys = spark.range(25).select(F.col("id").alias("k"))
    delete_keys(spark, path, keys, key="k", keep_versions=10)
    man = current_manifest(spark, manifest_root(path))
    rows = man.groupBy("file").agg(F.max("n_rows").alias("n")).collect()
    assert all(r["n"] > 0 for r in rows)
    assert read_committed(spark, path).count() == 55


def test_time_travel_versions_stay_readable(spark, table):
    updates = spark.createDataFrame(
        [(5, -5, "gX")], "k long, v long, g string"
    )
    v1 = merge_upsert(spark, table, updates, key="k", keep_versions=10)
    keys = spark.createDataFrame([(6,), (7,)], "k long")
    v2 = delete_keys(spark, table, keys, key="k", keep_versions=10)
    assert list_versions(spark, manifest_root(table)) == [0, v1, v2]
    v0_df = _pdf(read_version(spark, table, 0))
    assert len(v0_df) == 200
    assert v0_df.loc[v0_df.k == 5, "v"].item() == 50  # pre-merge state
    v1_df = read_version(spark, table, v1)
    assert v1_df.count() == 200
    assert v1_df.where("k = 5").first()["v"] == -5
    assert v1_df.where("k in (6, 7)").count() == 2  # pre-delete
    assert read_version(spark, table, v2).count() == 198


def test_read_version_missing_raises(spark, table):
    with pytest.raises(ValueError, match="not available"):
        read_version(spark, table, 99)


def test_version_changes_merge_interval(spark, table):
    updates = spark.createDataFrame(
        [(5, 5555, "gX"), (1000, 1, "gNEW")], "k long, v long, g string"
    )
    v1 = merge_upsert(spark, table, updates, key="k", keep_versions=10)
    ch = _pdf(version_changes(spark, table, 0, v1))
    # unmodified rows that merely live in the rewritten file cancel
    ins = ch[ch._change == "insert"]
    dels = ch[ch._change == "delete"]
    assert sorted(ins.k.tolist()) == [5, 1000]
    assert dels.k.tolist() == [5]
    assert dels.v.item() == 50


def test_version_changes_delete_interval(spark, table):
    keys = spark.createDataFrame([(3,), (150,)], "k long")
    v1 = delete_keys(spark, table, keys, key="k", keep_versions=10)
    ch = _pdf(version_changes(spark, table, 0, v1))
    assert (ch._change == "delete").all()
    assert sorted(ch.k.tolist()) == [3, 150]


def test_version_changes_skips_unchanged_files(spark, table):
    """CDC must read ONLY the symmetric-difference files: the union of
    its scanned inputFiles is disjoint from the carried files."""
    updates = spark.createDataFrame(
        [(3, -1, "gX")], "k long, v long, g string"
    )
    v1 = merge_upsert(spark, table, updates, key="k", keep_versions=10)
    files0 = set(
        prune_files(
            spark.read.parquet(os.path.join(manifest_root(table), "v0")), {}
        )
    )
    files1 = set(
        prune_files(current_manifest(spark, manifest_root(table)), {})
    )
    carried = files0 & files1
    scanned = set(version_changes(spark, table, 0, v1).inputFiles())
    # inputFiles returns URIs; compare by basename to dodge scheme noise
    carried_names = {os.path.basename(f) for f in carried}
    scanned_names = {os.path.basename(f) for f in scanned}
    assert carried_names, "expected some files to be carried"
    assert not (carried_names & scanned_names)


def test_version_changes_identical_versions_raise(spark, table):
    far = spark.createDataFrame([(10_000,)], "k long")
    delete_keys(spark, table, far, key="k", keep_versions=10)  # no-op
    with pytest.raises(ValueError, match="identical file sets"):
        version_changes(spark, table, 0, 0)


def test_merge_into_stats_blind_files_is_conservative(spark, tmp_path):
    """A file with no usable key stats (all-null key chunk) must be
    treated as potentially overlapping and rewritten."""
    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(None, 1, "a"), (None, 2, "a")], "k long, v long, g string"
    )
    good = spark.range(10).select(
        F.col("id").alias("k"), F.lit(0).alias("v").cast("long"),
        F.lit("b").alias("g"),
    )
    # null keys break zorder ranking — land them as a plain append dir
    from time_series_prediction_spark.operators.manifest import (
        build_stats_manifest,
    )
    from time_series_prediction_spark.streaming.layout import (
        publish_manifest,
    )

    init_table(spark, path, good, key="k", n_files=2, keep_versions=10)
    nulls_dir = os.path.join(path, "nulls-0")
    df.coalesce(1).write.parquet(nulls_dir)
    root = manifest_root(path)
    man = current_manifest(spark, root).unionByName(
        build_stats_manifest(spark, nulls_dir, ["k"])
    )
    publish_manifest(man, root, 2, keep_versions=10)
    updates = spark.createDataFrame(
        [(99, -1, "z")], "k long, v long, g string"
    )
    merge_upsert(spark, path, updates, key="k", keep_versions=10)
    got = read_committed(spark, path)
    # null-key rows survive the merge (no update key equals null)
    assert got.where(F.col("k").isNull()).count() == 2
    assert got.count() == 13


def test_compaction_preserves_state_and_cdc_cancels(spark, table):
    """OPTIMIZE after mutations: same rows, fewer files, empty change
    feed across the compaction interval, and vacuum reclaims the
    superseded generations without touching the live ones."""
    from time_series_prediction_spark.operators.manifest import (
        list_parquet_files,
    )
    from time_series_prediction_spark.streaming.layout import (
        compact_layout,
        read_committed,
        vacuum_layout,
    )

    updates = spark.createDataFrame(
        [(5, -5, "gX"), (1000, 1, "gNEW")], "k long, v long, g string"
    )
    v1 = merge_upsert(spark, table, updates, key="k", keep_versions=10)
    before = _pdf(read_committed(spark, table))
    compact_layout(spark, table, ["k"], n_files=2)
    root = manifest_root(table)
    v2 = max(list_versions(spark, root))
    assert v2 > v1
    after = _pdf(read_committed(spark, table))
    pd.testing.assert_frame_equal(before, after)
    assert len(prune_files(current_manifest(spark, root), {})) == 2
    # CDC across a pure compaction: every row cancels
    assert version_changes(spark, table, v1, v2).count() == 0
    # pre-compaction snapshot still reads while its files survive
    assert read_version(spark, table, v1).count() == len(before)
    # vacuum must NOT reclaim generations a retained version still
    # references — v1 is retained for time travel and its files must
    # survive any grace window
    assert vacuum_layout(spark, table, grace_s=0.0) == []
    assert read_version(spark, table, v1).count() == len(before)
    # shrink retention to just the current version; the superseded
    # generations lose their last reference and vacuum reclaims them
    compact_layout(spark, table, ["k"], n_files=2, keep_versions=1)
    removed = vacuum_layout(spark, table, grace_s=0.0)
    assert removed, "unreferenced generations should be reclaimed"
    still = _pdf(read_committed(spark, table))
    pd.testing.assert_frame_equal(before, still)
    live = set(prune_files(current_manifest(spark, root), {}))
    assert live == set(list_parquet_files(table, spark))


def test_schema_evolving_merge(spark, table):
    """evolve_schema=True: updates add a column; untouched files stay
    unrewritten; merge-schema reads surface the column as null for
    pre-evolution rows; CDC across the boundary aligns schemas."""
    updates = spark.createDataFrame(
        [(3, -1, "gX", "eu"), (1000, 1, "gNEW", "us")],
        "k long, v long, g string, region string",
    )
    # default: schema drift is an error, not silent widening
    with pytest.raises(Exception, match="region|UNRESOLVED|resolve"):
        merge_upsert(spark, table, updates, key="k", keep_versions=10)
    v1 = merge_upsert(
        spark, table, updates, key="k", keep_versions=10,
        evolve_schema=True,
    )
    got = read_committed(spark, table, merge_schema=True)
    assert set(got.columns) == {"k", "v", "g", "region"}
    assert got.count() == 201
    assert got.where("region is not null").count() == 2
    assert got.where("k = 3").first()["region"] == "eu"
    # untouched base files carried by reference (keys 3,1000 touch at
    # most 1-2 of the 8 key-range files)
    root = manifest_root(table)
    v0_files = set(
        prune_files(spark.read.parquet(os.path.join(root, "v0")), {})
    )
    v1_files = set(prune_files(current_manifest(spark, root), {}))
    assert len(v0_files & v1_files) >= 6
    # CDC across the evolution boundary
    ch = _pdf(version_changes(spark, table, 0, v1))
    ins = ch[ch._change == "insert"]
    assert sorted(ins.k.tolist()) == [3, 1000]
    assert ins.region.notna().all()
    dels = ch[ch._change == "delete"]
    assert dels.k.tolist() == [3]
    assert dels.region.isna().all()
    # time travel to v0 keeps the ORIGINAL schema
    assert set(read_version(spark, table, 0).columns) == {"k", "v", "g"}


def test_apply_cdc_to_rollup_drops_zeroed_keys(spark):
    from time_series_prediction_spark.operators.incremental import (
        apply_cdc_to_rollup,
    )

    view = spark.createDataFrame(
        [("a", 2, 30), ("b", 1, 5)], "g string, n long, total long"
    )
    changes = spark.createDataFrame(
        [
            ("b", 5, "delete"),        # b drops to n=0 → disappears
            ("a", 7, "insert"),
            ("a", 10, "delete"),
            ("c", 4, "insert"),        # brand-new key
        ],
        "g string, v long, _change string",
    )
    got = {
        r["g"]: (r["n"], r["total"])
        for r in apply_cdc_to_rollup(view, changes, ["g"], "v").collect()
    }
    assert got == {"a": (2, 27), "c": (1, 4)}


def test_concurrent_merges_both_commit(spark, tmp_path):
    """Optimistic concurrency: two writers merging DISJOINT key bands
    race on the same version number; the CAS loser must rebase and
    commit on the next version — both updates land, the version
    history stays linear, and no generation dir is interleaved."""
    import threading

    path = str(tmp_path / "tbl")
    _mk_table(spark, path)
    u1 = spark.createDataFrame(
        [(5, -5, "t1"), (300, 1, "t1")], "k long, v long, g string"
    )
    u2 = spark.createDataFrame(
        [(150, -150, "t2"), (400, 2, "t2")], "k long, v long, g string"
    )
    errs = []

    def run(updates):
        try:
            merge_upsert(spark, path, updates, key="k", keep_versions=10)
        except Exception as e:  # noqa: BLE001 — surfaced below
            errs.append(e)

    t1 = threading.Thread(target=run, args=(u1,))
    t2 = threading.Thread(target=run, args=(u2,))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs
    root = manifest_root(path)
    assert list_versions(spark, root) == [0, 1, 2]
    got = {r["k"]: (r["v"], r["g"])
           for r in read_committed(spark, path).collect()}
    assert got[5] == (-5, "t1")
    assert got[150] == (-150, "t2")
    assert got[300] == (1, "t1")
    assert got[400] == (2, "t2")
    assert len(got) == 202


def test_crash_between_version_and_pointer_cannot_hide_commit(
    spark, tmp_path
):
    """The version dir IS the commit: even if the _LATEST pointer was
    never advanced (writer crashed right after the CAS rename),
    readers resolve the newest complete version."""
    from time_series_prediction_spark.sources.fsops import fs_for

    path = str(tmp_path / "tbl")
    _mk_table(spark, path, n=40, n_files=2)
    updates = spark.createDataFrame(
        [(3, -1, "x")], "k long, v long, g string"
    )
    v1 = merge_upsert(spark, path, updates, key="k", keep_versions=10)
    root = manifest_root(path)
    fs = fs_for(spark, root)
    # simulate the crash: regress the pointer to v0
    tmp = os.path.join(root, ".latest.tmp.test")
    fs.write_text(tmp, "v0")
    fs.replace_file(tmp, os.path.join(root, "_LATEST"))
    got = read_committed(spark, path)
    assert got.where("k = 3").first()["v"] == -1  # v1 still visible
    assert max(list_versions(spark, root)) == v1


def test_table_history_and_maintain(spark, table):
    from time_series_prediction_spark.operators.cow import (
        maintain_table,
        table_history,
    )

    updates = spark.createDataFrame(
        [(5, -5, "x")], "k long, v long, g string"
    )
    merge_upsert(spark, table, updates, key="k", keep_versions=10)
    root = manifest_root(table)
    hist = {
        r["version"]: (r["n_files"], r["n_rows"])
        for r in table_history(spark, root).collect()
    }
    assert hist[0] == (8, 200)
    assert hist[1][1] == 200  # update, no inserts
    # the rewrite generation replaces the touched file; a small
    # rewrite lands as ONE key-sorted file (the r10 fast path), so the
    # file count stays flat — the generation itself must be new
    assert hist[1][0] >= 8
    gen_dirs = [
        d for d in os.listdir(table) if d.startswith("merge-1-")
    ]
    assert gen_dirs, "merge must land its own rewrite generation"
    # below threshold: no compaction, vacuum keeps referenced dirs
    rep = maintain_table(spark, table, ["k"], max_files=100, grace_s=0.0)
    assert rep["compacted_to"] is None
    assert read_committed(spark, table).count() == 200
    # force the policy: compact + vacuum. keep_versions=1 so the
    # superseded generations lose their last manifest reference — a
    # longer retention would (correctly) protect them for time travel
    rep = maintain_table(
        spark, table, ["k"], max_files=4, target_files=2, grace_s=0.0,
        keep_versions=1,
    )
    assert rep["compacted_to"] is not None
    assert rep["vacuumed"], "superseded generations must be reclaimed"
    assert read_committed(spark, table).count() == 200
    man = current_manifest(spark, root)
    assert len(prune_files(man, {})) == 2


def test_empty_merge_is_a_noop_commit(spark, table):
    empty = spark.createDataFrame([], "k long, v long, g string")
    v = merge_upsert(spark, table, empty, key="k", keep_versions=10)
    assert v == 0
    assert list_versions(spark, manifest_root(table)) == [0]


def test_abandoned_staging_dirs_are_reclaimed(spark, tmp_path, monkeypatch):
    """A writer that crashed mid-commit leaves a hidden staging dir;
    the next successful commit garbage-collects it once it is older
    than the grace window (and never touches a fresh one)."""
    import time_series_prediction_spark.streaming.layout as layout
    from time_series_prediction_spark.sources.fsops import fs_for

    path = str(tmp_path / "tbl")
    _mk_table(spark, path, n=20, n_files=2)
    root = manifest_root(path)
    fs = fs_for(spark, root)
    stale = os.path.join(root, ".v9.build-999-1-0")
    fs.mkdirs(stale)
    fs.write_text(os.path.join(stale, "junk"), "x")
    monkeypatch.setattr(layout, "_STAGING_GC_AGE_S", 0.0)
    updates = spark.createDataFrame([(3, -1, "x")], "k long, v long, g string")
    merge_upsert(spark, path, updates, key="k", keep_versions=10)
    assert not fs.exists(stale)


def test_cow_metadata_resolves_without_spark_jobs(spark, table):
    """Round-9 VERDICT #4 (the CoW bench family drift): planning a
    committed read, a version read, or a DESCRIBE HISTORY must not
    burn Spark jobs on MANIFEST metadata — the manifests are
    metadata-sized and fold driver-side; only the actual data scan
    may schedule work."""
    from time_series_prediction_spark.operators.cow import (
        table_history,
    )

    sc = spark.sparkContext
    sc.setJobGroup("cow-metadata-jobs", "metadata job probe")
    try:
        df = read_committed(spark, table)             # plan only
        _ = read_version(spark, table, 0)             # plan only
        hist_df = table_history(spark, manifest_root(table))
    finally:
        jobs = sc.statusTracker().getJobIdsForGroup(
            "cow-metadata-jobs"
        )
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert len(jobs) == 0, (
        f"metadata resolution scheduled {len(jobs)} Spark jobs"
    )
    # the collects themselves (a local-relation action / the data
    # scan) still work and still see the right table
    hist = hist_df.collect()
    assert [r["version"] for r in hist] == [0]
    assert hist[0]["n_rows"] == 200
    assert df.count() == 200


def test_publish_manifest_spark_fallback_keeps_dv_rows(spark, tmp_path):
    """publish_manifest's Spark staging branch must MATERIALIZE a
    driver-resident ``dv_rows`` payload: callers that fall back to
    the Spark path (man_rows reset after a local-stats failure, or a
    non-local root) previously committed the version WITHOUT ``_dv``
    — silently dropping the cumulative deletion vector, so every
    tombstoned row resurrected on the next read (round-10 ADVICE,
    high)."""
    from time_series_prediction_spark.streaming.layout import (
        publish_manifest,
        version_dv,
    )

    root = str(tmp_path / "m")
    man = spark.createDataFrame(
        [("f1", "k", 10, 0.0, 9.0, False, None, None)],
        "file string, col string, n_rows long, vmin double, "
        "vmax double, has_nulls boolean, vmin_s string, vmax_s string",
    )
    publish_manifest(
        man, root, 0,
        man_rows=None,  # forces the Spark staging branch
        dv_rows=(["k"], [(1,), (2,)]),
    )
    dv = version_dv(spark, root, 0)
    assert dv is not None
    assert dv.columns == ["k"]
    assert sorted(r["k"] for r in dv.collect()) == [1, 2]
