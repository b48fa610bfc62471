"""Streaming MERGE sink (streaming/upsert.py): a change stream folded
into the cow table micro-batch by micro-batch equals the batch truth;
replays are state-idempotent; last-writer-wins needs a unique
sequence."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from time_series_prediction_spark.streaming.layout import (
    manifest_root,
    read_committed,
)
from time_series_prediction_spark.streaming.upsert import (
    dedup_last_writer,
    merge_ingest_sink,
)


def _run_stream(spark, inbox, ck, sink, schema):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(inbox)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_change_stream_equals_batch_truth(spark, tmp_path):
    """Three change batches (bootstrap, update+insert, late churn)
    streamed through the sink must leave exactly the last-writer-wins
    state over the whole feed."""
    inbox = str(tmp_path / "inbox")
    data = str(tmp_path / "tbl")
    # batch files stream in lexicographic mtime order; seq is global
    b0 = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"),
        F.lit(0).cast("long").alias("seq"),
    )
    b1 = spark.createDataFrame(
        [(5, -5, 1), (200, 1, 1), (7, -7, 2), (7, -77, 3)],
        "k long, v long, seq long",
    )
    b2 = spark.createDataFrame(
        [(5, 500, 4), (201, 2, 4)], "k long, v long, seq long"
    )
    import glob
    import shutil
    import time

    os.makedirs(inbox)
    for i, b in enumerate([b0, b1, b2]):
        staged = str(tmp_path / f"stage{i}")
        b.coalesce(1).write.parquet(staged)
        part = glob.glob(os.path.join(staged, "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(inbox, f"b{i}.parquet"))
        time.sleep(0.05)  # distinct mtimes → deterministic file order
    sink = merge_ingest_sink(
        data, key="k", seq_col="seq", drop_seq=True, keep_versions=10
    )
    _run_stream(
        spark, inbox, str(tmp_path / "ck"), sink,
        "k long, v long, seq long",
    )
    got = {
        r["k"]: r["v"] for r in read_committed(spark, data).collect()
    }
    want = {i: i * 2 for i in range(100)}
    want.update({5: 500, 200: 1, 7: -77, 201: 2})
    assert got == want


def test_replayed_batch_is_state_idempotent(spark, tmp_path):
    data = str(tmp_path / "tbl")
    base = spark.range(50).select(
        F.col("id").alias("k"), F.lit(1).cast("long").alias("v")
    )
    updates = spark.createDataFrame(
        [(3, 99), (60, 99)], "k long, v long"
    )
    sink = merge_ingest_sink(data, key="k", keep_versions=10)
    sink(base, 0)
    sink(updates, 1)
    state1 = sorted(
        (r["k"], r["v"]) for r in read_committed(spark, data).collect()
    )
    sink(updates, 1)  # crash-replay of the same micro-batch
    state2 = sorted(
        (r["k"], r["v"]) for r in read_committed(spark, data).collect()
    )
    assert state1 == state2
    assert len(state2) == 51


def test_dedup_last_writer_requires_unique_seq(spark):
    df = spark.createDataFrame(
        [(1, 10, 5), (1, 20, 5)], "k long, v long, seq long"
    )
    with pytest.raises(ValueError, match="no deterministic last writer"):
        dedup_last_writer(df, "k", "seq")


def test_empty_batch_commits_nothing(spark, tmp_path):
    data = str(tmp_path / "tbl")
    sink = merge_ingest_sink(data, key="k")
    empty = spark.createDataFrame([], "k long, v long")
    sink(empty, 0)
    assert not os.path.exists(manifest_root(data))


def test_cdc_apply_sink_mixed_ops_equal_batch_truth(spark, tmp_path):
    """Updates, inserts, and deletes interleaved across micro-batches:
    the final table equals the last-writer state of the whole feed;
    deletes land as deletion-vector commits (no file rewrites for
    their half)."""
    from time_series_prediction_spark.streaming.upsert import (
        cdc_apply_sink,
    )

    data = str(tmp_path / "tbl")
    sink = cdc_apply_sink(data, key="k", seq_col="seq")
    b0 = spark.range(60).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v"),
        F.lit("U").alias("op"), F.lit(0).cast("long").alias("seq"),
    )
    # batch 1: update 5, delete 7 and 30, insert 100; key 9 is
    # updated then deleted within the batch — delete must win by seq
    b1 = spark.createDataFrame(
        [
            (5, -5, "U", 1),
            (7, 0, "D", 1),
            (30, 0, "D", 1),
            (100, 1, "U", 1),
            (9, 999, "U", 1),
            (9, 0, "D", 2),
        ],
        "k long, v long, op string, seq long",
    )
    # batch 2: re-insert a deleted key — tombstone must clear
    b2 = spark.createDataFrame(
        [(7, 77, "U", 3)], "k long, v long, op string, seq long"
    )
    for i, b in enumerate([b0, b1, b2]):
        sink(b, i)
    from time_series_prediction_spark.streaming.layout import (
        read_committed,
    )

    got = {r["k"]: r["v"] for r in read_committed(spark, data).collect()}
    want = {i: i * 2 for i in range(60)}
    want.update({5: -5, 100: 1, 7: 77})
    del want[30], want[9]
    assert got == want


def test_cdc_apply_sink_replay_is_state_idempotent(spark, tmp_path):
    from time_series_prediction_spark.streaming.upsert import (
        cdc_apply_sink,
    )
    from time_series_prediction_spark.streaming.layout import (
        read_committed,
    )

    data = str(tmp_path / "tbl")
    sink = cdc_apply_sink(data, key="k")
    b0 = spark.range(30).select(
        F.col("id").alias("k"), F.lit(1).cast("long").alias("v"),
        F.lit("U").alias("op"),
    )
    b1 = spark.createDataFrame(
        [(3, -3, "U"), (11, 0, "D")], "k long, v long, op string"
    )
    sink(b0, 0)
    sink(b1, 1)
    s1 = sorted((r["k"], r["v"]) for r in read_committed(spark, data).collect())
    sink(b1, 1)  # crash replay
    s2 = sorted((r["k"], r["v"]) for r in read_committed(spark, data).collect())
    assert s1 == s2
    assert len(s2) == 29


def test_cdc_apply_sink_string_keys(spark, tmp_path):
    """r8: the CDC loop on a STRING primary key — merges prune through
    the typed string stats, deletes land via a string-keyed deletion
    vector, and the final state equals the batch truth."""
    from time_series_prediction_spark.streaming.layout import (
        read_committed,
    )
    from time_series_prediction_spark.streaming.upsert import (
        cdc_apply_sink,
    )

    data = str(tmp_path / "tbl")
    sink = cdc_apply_sink(data, key="k")
    b0 = spark.range(80).select(
        F.concat(F.lit("u-"), F.lpad(F.col("id").cast("string"), 4, "0"))
        .alias("k"),
        F.col("id").alias("v"),
        F.lit("U").alias("op"),
    )
    b1 = spark.createDataFrame(
        [("u-0003", -3, "U"), ("u-0011", None, "D"), ("u-9999", 9, "U")],
        "k string, v long, op string",
    )
    sink(b0, 0)
    sink(b1, 1)
    got = {r["k"]: r["v"] for r in read_committed(spark, data).collect()}
    assert len(got) == 80  # 80 - 1 deleted + 1 inserted
    assert got["u-0003"] == -3
    assert "u-0011" not in got
    assert got["u-9999"] == 9
