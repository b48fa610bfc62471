"""Structured Streaming tests: drive the real incremental engine with
the fixture parquet as a file source and compare against batch truth."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from time_series_prediction_spark.plans.relational import events_hourly
from time_series_prediction_spark.streaming.events import (
    hourly_counts_stream,
    read_events_stream,
    run_to_memory_sink,
    run_to_parquet_sink,
    session_stream,
)


def test_hourly_stream_matches_batch_counts(spark, sf_dir):
    stream = hourly_counts_stream(read_events_stream(spark, sf_dir))
    q = run_to_memory_sink(stream, "hourly_out", output_mode="append")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql(
        "SELECT CAST(sum(n_events) AS BIGINT) AS n FROM hourly_out"
    ).first()["n"]
    want = (
        events_hourly(spark, sf_dir)
        .agg(F.sum("n_events").alias("n"))
        .first()["n"]
    )
    # append mode emits only watermark-closed windows; with a bounded
    # historical file source every window is eventually closed except
    # those within the final watermark — require >= 90% coverage and
    # no overcounting
    assert got is not None
    assert got <= want
    assert got >= int(want * 0.9), f"stream={got} batch={want}"


def test_events_stream_reads_legacy_nanos_fixture(spark, sf_dir, tmp_path):
    """read_events_stream must accept BOTH fixture encodings (the same
    compat surface as io.read_table): synthesize a rounds-1/2-style
    events.parquet with TIMESTAMP(NANOS)-as-bigint ts and stream it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base_us = 1_700_000_000_000_000
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(
                [base_us * 1000, (base_us + 60_000_000) * 1000,
                 (base_us + 120_000_000) * 1000],
                pa.int64(),
            ),
            "user_id": pa.array([10, 11, 10], pa.int64()),
            "event_type": pa.array(["view", "purchase", "view"]),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    stream = read_events_stream(spark, str(tmp_path))
    q = run_to_memory_sink(
        stream.select("event_id", "ts"), "legacy_events_out",
        output_mode="append",
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql(
        "SELECT event_id, unix_micros(ts) AS us FROM legacy_events_out "
        "ORDER BY event_id"
    ).collect()
    assert [r["event_id"] for r in rows] == [1, 2, 3]
    assert [r["us"] for r in rows] == [
        base_us, base_us + 60_000_000, base_us + 120_000_000
    ]


def test_session_stream_produces_sessions(spark, sf_dir):
    stream = session_stream(read_events_stream(spark, sf_dir))
    q = run_to_memory_sink(stream, "session_out", output_mode="append")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql(
        "SELECT count(*) AS n, min(n_events) AS mn FROM session_out"
    ).first()
    assert rows["n"] > 100
    assert rows["mn"] >= 1
    # session invariant: end >= start for every emitted session
    bad = spark.sql(
        "SELECT count(*) AS b FROM session_out WHERE session_end < session_start"
    ).first()["b"]
    assert bad == 0


def test_stateful_running_stats_matches_batch_fold(spark, sf_dir):
    """applyInPandasWithState custom operator: state carried ACROSS
    micro-batches must reproduce the exact per-user fold a batch
    computation gives. The events file is split in two by time and fed
    as separate micro-batches (maxFilesPerTrigger=1, oldest first), so
    a correct result REQUIRES cross-batch state — a per-batch
    recomputation would get n_events/ewma wrong."""
    import time as _time

    from time_series_prediction_spark.sources.io import read_table
    from time_series_prediction_spark.streaming.stateful import (
        user_running_stats_stream,
    )

    ev = read_table(spark, sf_dir, "events").where(F.col("user_id") < 40)
    split_ts = ev.agg(F.expr("percentile(CAST(ts AS DOUBLE), 0.5)")).first()[0]
    with tempfile.TemporaryDirectory() as d:
        src = f"{d}/src"
        raw = ev.select(
            "event_id", F.col("ts").cast("timestamp").alias("ts"),
            "user_id", "value",
        )
        raw.where(F.expr(f"CAST(ts AS DOUBLE) <= {split_ts}")).coalesce(
            1
        ).write.mode("append").parquet(src)
        _time.sleep(1.1)  # distinct mtimes: early file trips first
        raw.where(F.expr(f"CAST(ts AS DOUBLE) > {split_ts}")).coalesce(
            1
        ).write.mode("append").parquet(src)

        stream = (
            spark.readStream.schema(raw.schema)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .option("latestFirst", "false")
            .load(src)
        )
        q = run_to_memory_sink(
            user_running_stats_stream(stream), "state_out", output_mode="update"
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    # last update per user = final state
    got = {
        r["user_id"]: r
        for r in spark.sql(
            """SELECT * FROM (
                 SELECT *, row_number() OVER (PARTITION BY user_id
                          ORDER BY n_events DESC) AS rk FROM state_out
               ) WHERE rk = 1"""
        ).collect()
    }
    # driver-side oracle: same fold in (ts, event_id) order
    rows = sorted(
        raw.collect(), key=lambda r: (r["ts"], r["event_id"])
    )
    want: dict[int, list] = {}
    for r in rows:
        cents = int(round(r["value"] * 100))
        st = want.setdefault(r["user_id"], [0, 0, None])
        st[0] += 1
        st[1] += cents
        v = cents / 100.0
        st[2] = v if st[2] is None else 0.5 * v + 0.5 * st[2]
    assert set(got) == set(want)
    for uid, (n, total, ewma) in want.items():
        g = got[uid]
        assert g["n_events"] == n, uid
        assert g["total_cents"] == total, uid
        assert abs(g["ewma"] - ewma) < 1e-9, uid


def test_foreach_batch_parquet_sink(spark, sf_dir):
    with tempfile.TemporaryDirectory() as tmp:
        stream = hourly_counts_stream(read_events_stream(spark, sf_dir))
        q = run_to_parquet_sink(
            stream, f"{tmp}/out", checkpoint=f"{tmp}/ckpt"
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        back = spark.read.parquet(f"{tmp}/out")
        assert back.count() > 0
        assert set(back.columns) == {
            "hour",
            "event_type",
            "n_events",
            "total_value",
        }


def test_dedup_stream_suppresses_replays(spark, sf_dir):
    """Feed the events file TWICE (a replay) through the streaming
    dedup; output must contain each event_id at most once and cover
    every id (all replays land well inside the watermark horizon)."""
    from time_series_prediction_spark.sources.io import read_table
    from time_series_prediction_spark.streaming.events import dedup_stream

    ev = read_table(spark, sf_dir, "events")
    n_distinct = ev.select("event_id").distinct().count()
    with tempfile.TemporaryDirectory() as d:
        src = f"{d}/src"
        raw = spark.read.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
        raw.write.mode("append").parquet(src)
        raw.write.mode("append").parquet(src)  # the replay

        stream = (
            spark.readStream.schema(raw.schema)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")  # replay arrives in a later batch
            .load(src)
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        q = run_to_memory_sink(
            dedup_stream(stream), "dedup_out", output_mode="append"
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    out = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT event_id) AS nd FROM dedup_out"
    ).first()
    assert out["n"] == out["nd"], "a duplicate event_id got through"
    assert out["n"] == n_distinct


def test_stream_stream_join_matches_batch(spark, sf_dir):
    """Stream-stream attribution join == the same time-bounded join as
    batch (subset: append emission withholds rows still inside the
    final watermark; require >=90% coverage and no phantom pairs)."""
    from time_series_prediction_spark.sources.io import read_table
    from time_series_prediction_spark.streaming.events import (
        click_purchase_join_stream,
    )

    clicks = read_events_stream(spark, sf_dir).where(
        F.col("event_type") == "click"
    )
    purchases = read_events_stream(spark, sf_dir).where(
        F.col("event_type") == "purchase"
    )
    stream = click_purchase_join_stream(clicks, purchases)
    q = run_to_memory_sink(stream, "attrib_out", output_mode="append")
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    ev = read_table(spark, sf_dir, "events")
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    batch_pairs = {
        (r["click_id"], r["purchase_id"])
        for r in c.join(
            p,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr("interval 1 hour")
            ),
        ).collect()
    }
    got_pairs = {
        (r["click_id"], r["purchase_id"])
        for r in spark.sql(
            "SELECT click_id, purchase_id FROM attrib_out"
        ).collect()
    }
    assert got_pairs <= batch_pairs, "stream emitted a pair batch does not have"
    assert len(batch_pairs) == 0 or len(got_pairs) >= int(
        len(batch_pairs) * 0.9
    ), f"stream={len(got_pairs)} batch={len(batch_pairs)}"


def test_idempotent_epoch_sink_replay_safe(spark, sf_dir):
    """Epoch-keyed overwrite sink: output files land under
    epoch_id=N dirs and re-running the SAME checkpointed query over
    unchanged input produces no duplicate rows."""
    from time_series_prediction_spark.streaming.events import (
        run_idempotent_epoch_sink,
    )

    with tempfile.TemporaryDirectory() as tmp:
        def run_once():
            stream = hourly_counts_stream(read_events_stream(spark, sf_dir))
            q = run_idempotent_epoch_sink(
                stream, f"{tmp}/out", checkpoint=f"{tmp}/ckpt"
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()

        run_once()
        n1 = spark.read.parquet(f"{tmp}/out").count()
        assert n1 > 0
        run_once()  # restart from checkpoint: no new input, no new rows
        n2 = spark.read.parquet(f"{tmp}/out").count()
        assert n2 == n1


def test_stream_static_join_matches_batch(spark, sf_dir):
    """Stream-static enrichment == the same join+agg run as batch."""
    from time_series_prediction_spark.sources.io import read_table
    from time_series_prediction_spark.streaming.events import (
        enriched_counts_stream,
    )

    dim = (
        read_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .withColumn("cohort", F.col("user_id") % 5)
    )
    stream = enriched_counts_stream(read_events_stream(spark, sf_dir), dim)
    q = run_to_memory_sink(stream, "enriched_out", output_mode="append")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql(
        "SELECT CAST(sum(n_events) AS BIGINT) AS n FROM enriched_out"
    ).first()["n"]
    ev = read_table(spark, sf_dir, "events")
    want = ev.join(dim, "user_id").count()
    assert got is not None and got <= want
    assert got >= int(want * 0.9), f"stream={got} batch={want}"


def test_docs_ingest_dedup_stream_matches_batch(spark, sf_dir, tmp_path):
    """Streaming dedup-on-arrival == the batch incremental-dedup
    truth: exact corpus duplicates never reach the sink, near
    duplicates arrive flagged, and the verdict for every surviving
    doc matches the batch computation over the same arrival set."""
    from time_series_prediction_spark.plans.text_queries3 import (
        dedup_incremental_batch,
    )
    from time_series_prediction_spark.sources.io import read_table
    from time_series_prediction_spark.streaming.docs import (
        corpus_key_sets,
        ingest_dedup_stream,
        read_docs_stream,
    )

    docs = read_table(spark, sf_dir, "documents")
    is_batch = (F.col("doc_id") % 10) == 7
    corpus = docs.where(~is_batch)
    # identical arrival set to the batch query: organic batch docs +
    # planted verbatim copies + planted suffix mutations
    arrivals = (
        docs.where(is_batch)
        .unionByName(
            corpus.where((F.col("doc_id") % 20) == 0).select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"),
                "text",
                "lang",
                "source",
                "n_chars",
            )
        )
        .unionByName(
            corpus.where(
                ((F.col("doc_id") % 20) == 5)
                & (F.size(F.split("text", " ")) >= 5)
            ).select(
                (F.col("doc_id") + 2_000_000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" zz_mutation")).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
        .select("doc_id", "text", "lang", "source", "n_chars")
    )
    inbox = str(tmp_path / "inbox")
    arrivals.write.mode("overwrite").parquet(inbox)

    hashes, fps = corpus_key_sets(corpus)
    hashes, fps = hashes.cache(), fps.cache()
    out = ingest_dedup_stream(read_docs_stream(spark, inbox), hashes, fps)
    q = run_to_memory_sink(out, "docs_ingest_out", output_mode="append")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["doc_id"]: r["verdict"]
        for r in spark.sql("SELECT doc_id, verdict FROM docs_ingest_out").collect()
    }
    want_all = {
        r["doc_id"]: r["verdict"]
        for r in dedup_incremental_batch(spark, sf_dir).collect()
    }
    want = {d: v for d, v in want_all.items() if v != "exact_dup"}
    assert got == want
    # exact arrivals (planted verbatim copies) were dropped on arrival
    assert not any(1_000_000 <= d < 2_000_000 for d in got)
    # planted mutations arrived flagged
    assert all(
        got[d] == "near_dup" for d in got if d >= 2_000_000
    ) and any(d >= 2_000_000 for d in got)
    hashes.unpersist()
    fps.unpersist()


def test_streaming_zorder_ingest_builds_pruned_layout(spark, tmp_path):
    """The continuous lakehouse ingestion loop: a file stream lands
    micro-batch by micro-batch as z-ordered batch dirs with an
    incrementally maintained, atomically versioned stats manifest.
    After the stream drains: the committed manifest equals a full
    rebuild, range queries through it prune files yet match the full
    scan, every source row landed exactly once, and replaying a batch
    (same batch_id) changes nothing."""
    import os

    from time_series_prediction_spark.operators.manifest import (
        build_stats_manifest,
        list_parquet_files,
        prune_files,
        pruned_scan,
    )
    from time_series_prediction_spark.streaming.layout import (
        current_manifest,
        manifest_root,
        read_layout,
        zorder_ingest_sink,
    )

    src = str(tmp_path / "src")
    grid = spark.range(30_000).select(
        (F.col("id") % 100).alias("x"),
        (F.col("id") / 300).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    grid.repartition(3).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "tbl")
    stream = (
        spark.readStream.schema("x long, y long, payload long")
        .option("maxFilesPerTrigger", "1")  # force multiple batches
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(zorder_ingest_sink(out, ["x", "y"]))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    batch_dirs = [d for d in os.listdir(out) if d.startswith("batch-")]
    assert len(batch_dirs) >= 2, "expected multiple micro-batches"
    man = current_manifest(spark, manifest_root(out))
    assert man is not None
    rebuilt = build_stats_manifest(spark, out, ["x", "y"])
    assert sorted(map(tuple, man.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )
    # stats pruning engages and the pruned result matches the full scan
    preds = {"x": (10.0, 25.0)}
    kept = prune_files(man, preds)
    files = list_parquet_files(out, spark)
    assert 0 < len(kept) < len(files), (len(kept), len(files))
    got = (
        pruned_scan(spark, man, preds)
        .agg(F.count(F.lit(1)), F.sum("payload"))
        .first()
    )
    want = (
        read_layout(spark, out)
        .where(F.col("x").between(10, 25))
        .agg(F.count(F.lit(1)), F.sum("payload"))
        .first()
    )
    assert tuple(got) == tuple(want) and got[0] > 0
    # exactly-once landing across the whole stream
    assert read_layout(spark, out).count() == 30_000

    # replay: re-running a batch with the same batch_id overwrites its
    # own directory and republishes a consistent manifest — no dupes
    sink = zorder_ingest_sink(out, ["x", "y"])
    extra = grid.where(F.col("payload") < 1_000)
    sink(extra, 999)
    assert read_layout(spark, out).count() == 31_000
    sink(extra, 999)  # replay
    assert read_layout(spark, out).count() == 31_000
    man2 = current_manifest(spark, manifest_root(out))
    rebuilt2 = build_stats_manifest(spark, out, ["x", "y"])
    assert sorted(map(tuple, man2.collect())) == sorted(
        map(tuple, rebuilt2.collect())
    )


def test_streaming_layout_compact_vacuum_cycle(spark, tmp_path):
    """The full lakehouse maintenance cycle on a streamed layout:
    OPTIMIZE rewrites the accumulated per-batch generations into one
    z-ordered generation behind an atomic manifest flip (content
    identical, pruning intact), VACUUM reclaims superseded dirs after
    the retention window, and ingestion continues cleanly on the
    compacted table."""
    import os

    from time_series_prediction_spark.operators.manifest import (
        list_parquet_files,
        prune_files,
    )
    from time_series_prediction_spark.streaming.layout import (
        compact_layout,
        current_manifest,
        manifest_root,
        read_committed,
        read_layout,
        vacuum_layout,
        zorder_ingest_sink,
    )

    out = str(tmp_path / "tbl")
    grid = spark.range(24_000).select(
        (F.col("id") % 100).alias("x"),
        (F.col("id") / 300).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    sink = zorder_ingest_sink(out, ["x", "y"], n_files=3)
    for i in range(4):  # four small generations, as a stream would land
        sink(grid.where(F.col("payload") % 4 == i), i)
    before = sorted(
        map(tuple, read_committed(spark, out).collect())
    )
    assert len(before) == 24_000

    # keep_versions=1: retire the pre-compaction versions so their
    # batch generations lose their last manifest reference (vacuum
    # protects files referenced by ANY retained version)
    cdir = compact_layout(spark, out, ["x", "y"], n_files=4,
                          keep_versions=1)
    assert cdir is not None and os.path.isdir(cdir)
    # content is unchanged, committed reads now hit ONLY the new gen
    after = sorted(map(tuple, read_committed(spark, out).collect()))
    assert after == before
    man = current_manifest(spark, manifest_root(out))
    committed_files = set(prune_files(man, {}))
    assert committed_files == set(list_parquet_files(cdir, spark))
    # raw recursive scan would double-count until vacuum
    assert read_layout(spark, out).count() == 48_000
    # stats pruning works on the compacted generation
    kept = prune_files(man, {"x": (10.0, 25.0)})
    assert 0 < len(kept) < len(committed_files)

    # vacuum: grace keeps everything, then zero-grace reclaims
    assert vacuum_layout(spark, out) == []
    removed = vacuum_layout(spark, out, grace_s=0.0)
    assert len(removed) == 4 and all("batch-" in d for d in removed)
    assert read_layout(spark, out).count() == 24_000
    assert sorted(
        map(tuple, read_committed(spark, out).collect())
    ) == before

    # ingestion continues on the compacted table
    extra = grid.where(F.col("payload") < 500).withColumn(
        "payload", F.col("payload") + 1_000_000
    )
    sink(extra, 50)
    assert read_committed(spark, out).count() == 24_500


def test_zorder_sink_replay_with_unnormalized_path(spark, tmp_path):
    """Replay idempotence must survive an UNNORMALIZED data_path
    (here a ``/./`` segment — same physical dirs for the OS, but
    Hadoop's Path normalizes it away, so the manifest's resolved
    ``file`` values never textually start with the caller's string):
    the sink's drop-this-batch filter must normalize before the
    prefix match, or the overwritten batch's stale rows (pointing at
    vanished files) survive every replay."""
    from time_series_prediction_spark.operators.manifest import (
        build_stats_manifest,
    )
    from time_series_prediction_spark.streaming.layout import (
        current_manifest,
        manifest_root,
        read_layout,
        zorder_ingest_sink,
    )

    grid = spark.range(2_000).select(
        (F.col("id") % 40).alias("x"),
        (F.col("id") / 50).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    out = str(tmp_path) + "/./tbl_dot"
    sink = zorder_ingest_sink(out, ["x", "y"])
    sink(grid, 0)
    sink(grid, 1)
    sink(grid, 1)  # replay of batch 1 under the unnormalized path
    man = current_manifest(spark, manifest_root(out))
    rebuilt = build_stats_manifest(spark, out, ["x", "y"])
    assert sorted(map(tuple, man.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )
    assert read_layout(spark, out).count() == 4_000


def test_layout_commit_protocol_over_file_uri(spark, sf_dir, tmp_path):
    """Round-7 FS port: the versioned-manifest commit protocol must
    work when every path is a ``file:`` URI routed through the Hadoop
    FileSystem API (the HDFS-portability contract) — publish, pointer
    flip, version pruning, committed read."""
    import os

    from time_series_prediction_spark.sources.io import read_table
    from time_series_prediction_spark.streaming.layout import (
        current_manifest,
        manifest_root,
        publish_manifest,
        read_committed,
        zorder_ingest_sink,
    )

    out = "file:" + str(tmp_path / "t")
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    ).limit(200)
    sink = zorder_ingest_sink(out, ["user_id", "value"], n_files=2)
    sink(ev.where("event_id % 2 = 0"), 0)
    sink(ev.where("event_id % 2 = 1"), 1)
    root = manifest_root(out)
    man = current_manifest(spark, root)
    assert man is not None
    committed = read_committed(spark, out)
    assert committed.count() == ev.count()
    # a replayed batch must not duplicate rows in the committed view
    sink(ev.where("event_id % 2 = 1"), 1)
    assert read_committed(spark, out).count() == ev.count()
    # explicit publish + pointer flip over the file: URI
    v = publish_manifest(current_manifest(spark, root), root, 99)
    assert v.startswith("file:")
    assert current_manifest(spark, root) is not None


def test_fsops_publish_dir_race_semantics(spark, tmp_path):
    """publish_dir: first publisher wins; the loser's rename must NOT
    nest its build inside the winner's published dir (the Hadoop
    move-into-existing-dir trap)."""
    import os

    from time_series_prediction_spark.sources.fsops import fs_for

    fs = fs_for(spark, str(tmp_path))
    a = str(tmp_path / "x.build-1")
    b = str(tmp_path / "x.build-2")
    dst = str(tmp_path / "x")
    for d in (a, b):
        fs.mkdirs(d)
        fs.write_text(os.path.join(d, "_SUCCESS"), "")
    assert fs.publish_dir(a, dst) is True
    assert fs.publish_dir(b, dst) is False
    # winner's content intact, no nested stray, loser still discardable
    assert fs.exists(os.path.join(dst, "_SUCCESS"))
    assert fs.list_names(dst) == ["_SUCCESS"]
    fs.delete(b)
    assert not fs.exists(b)
