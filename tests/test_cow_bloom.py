"""Bloom key index on copy-on-write tables: file-granular MERGE and
DELETE on a column the layout does NOT cluster.

The round-8 typed stats keep granularity when files own narrow key
ranges (key-clustered layouts). These tests pin the complementary
case — a table clustered by date and mutated by a uniform string id,
where every file's [min, max] spans the whole key space and the
stats-only rewrite set is the FULL table — and the mixed-state /
false-positive safety contracts."""

from __future__ import annotations

import hashlib
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from time_series_prediction_spark.operators.cow import (
    _BLOOM_IDX_DIR,
    _manifest_version,
    delete_keys,
    init_table,
    merge_upsert,
)
from time_series_prediction_spark.operators.manifest import prune_files
from time_series_prediction_spark.streaming.layout import (
    manifest_root,
    read_committed,
)


def _uuid_ish(i: int) -> str:
    return hashlib.md5(f"row-{i}".encode()).hexdigest()


def _mk_table(spark, path: str, bloom: bool, n: int = 400, **kw):
    rows = [(i % 8, _uuid_ish(i), i) for i in range(n)]
    df = spark.createDataFrame(rows, "d int, k string, v long")
    init_table(
        spark, path, df, key="d", stats_cols=["d", "k"], n_files=8,
        keep_versions=4,
        bloom_col="k" if bloom else None, **kw,
    )
    return df


def _files_at(spark, root: str, v: int) -> set[str]:
    return set(prune_files(_manifest_version(spark, root, v), {}))


@pytest.fixture()
def tmp_path():
    with tempfile.TemporaryDirectory() as d:
        import pathlib

        yield pathlib.Path(d)


def test_bloom_merge_rewrites_few_files_stats_rewrite_all(spark, tmp_path):
    keys = [_uuid_ish(i) for i in (5, 77, 301)]
    upd = spark.createDataFrame(
        [(99, k, -1) for k in keys], "d int, k string, v long"
    )

    pb = str(tmp_path / "with_bloom")
    _mk_table(spark, pb, bloom=True)
    rb = manifest_root(pb)
    merge_upsert(spark, pb, upd, key="k", stats_cols=["k"], keep_versions=4)
    removed_bloom = _files_at(spark, rb, 0) - _files_at(spark, rb, 1)

    ps = str(tmp_path / "stats_only")
    _mk_table(spark, ps, bloom=False)
    rs = manifest_root(ps)
    merge_upsert(spark, ps, upd, key="k", stats_cols=["k"], keep_versions=4)
    removed_stats = _files_at(spark, rs, 0) - _files_at(spark, rs, 1)

    # the layout clusters d, so every file spans the full k range:
    # stats-only rewrites the whole table, bloom only the key files
    assert len(removed_stats) == 8
    assert len(removed_bloom) <= 3, sorted(removed_bloom)

    for p in (pb, ps):
        got = {
            (r["k"], r["v"]) for r in read_committed(spark, p).collect()
        }
        want = {
            (_uuid_ish(i), i) for i in range(400)
            if _uuid_ish(i) not in set(keys)
        } | {(k, -1) for k in keys}
        assert got == want, p


def test_bloom_delete_prunes_and_is_exact(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _mk_table(spark, path, bloom=True)
    root = manifest_root(path)
    keys = [_uuid_ish(i) for i in (10, 250)]
    delete_keys(
        spark, path,
        spark.createDataFrame([(k,) for k in keys], "k string"),
        key="k", keep_versions=4,
    )
    removed = _files_at(spark, root, 0) - _files_at(spark, root, 1)
    assert len(removed) <= 2
    got = {r["k"] for r in read_committed(spark, path).collect()}
    assert got == {_uuid_ish(i) for i in range(400)} - set(keys)


def test_tiny_bloom_false_positives_cost_reads_not_rows(spark, tmp_path):
    """bits_per_row=1 forces a saturated, high-fp bloom: the rewrite
    set may grow back toward the stats set, but the merge result is
    still exact — false positives can only add files to the
    rewrite."""
    path = str(tmp_path / "tbl")
    _mk_table(spark, path, bloom=True, bloom_bits_per_row=1)
    upd = spark.createDataFrame(
        [(99, _uuid_ish(7), -7)], "d int, k string, v long"
    )
    merge_upsert(spark, path, upd, key="k", stats_cols=["k"], keep_versions=4)
    got = {(r["k"], r["v"]) for r in read_committed(spark, path).collect()}
    assert (_uuid_ish(7), -7) in got
    assert len(got) == 400


def test_unindexed_generation_stays_conservative(spark, tmp_path):
    """Mixed state: a generation whose sidecar is missing (pre-marker
    data, compaction output, foreign writer) must stay in the rewrite
    set — correctness never depends on the index existing."""
    path = str(tmp_path / "tbl")
    _mk_table(spark, path, bloom=True)
    root = manifest_root(path)
    # simulate a sidecar-less generation by removing the index dir
    gen_dirs = {
        os.path.dirname(f) for f in _files_at(spark, root, 0)
    }
    import shutil

    for d in gen_dirs:
        shutil.rmtree(os.path.join(d, _BLOOM_IDX_DIR))
    keys = [_uuid_ish(3)]
    upd = spark.createDataFrame(
        [(99, keys[0], -3)], "d int, k string, v long"
    )
    merge_upsert(spark, path, upd, key="k", stats_cols=["k"], keep_versions=4)
    removed = _files_at(spark, root, 0) - _files_at(spark, root, 1)
    assert len(removed) == 8  # blind → conservative full overlap set
    got = {(r["k"], r["v"]) for r in read_committed(spark, path).collect()}
    assert (keys[0], -3) in got and len(got) == 400


def test_second_merge_uses_fresh_generation_sidecar(spark, tmp_path):
    """Mutation generations build their own sidecars: a second merge
    touching only keys from the FIRST merge's rewrite generation
    rewrites only that generation's file(s)."""
    path = str(tmp_path / "tbl")
    _mk_table(spark, path, bloom=True)
    root = manifest_root(path)
    k = _uuid_ish(42)
    upd1 = spark.createDataFrame([(99, k, -1)], "d int, k string, v long")
    merge_upsert(spark, path, upd1, key="k", stats_cols=["k"],
                 n_files=1, keep_versions=4)
    upd2 = spark.createDataFrame([(99, k, -2)], "d int, k string, v long")
    merge_upsert(spark, path, upd2, key="k", stats_cols=["k"],
                 n_files=1, keep_versions=4)
    removed = _files_at(spark, root, 1) - _files_at(spark, root, 2)
    assert len(removed) == 1  # exactly the v1 merge generation's file
    row = read_committed(spark, path).where(F.col("k") == k).collect()
    assert [(r["k"], r["v"]) for r in row] == [(k, -2)]


def test_python_xxh64_positions_match_jvm(spark):
    """The driver-side probe's Python xxhash64 twin must be
    bit-identical to the JVM hash the index build uses — pinned over
    negatives, zero, boundary values, and both probe seeds/sizes."""
    from time_series_prediction_spark.operators.bloomindex import (
        _positions,
        _positions_py,
        _xxh64_long,
    )

    values = [0, 1, -1, 3, 47, 1100, 14990, 149990,
              2**62, -(2**62), 2**63 - 1, -(2**63)]
    for seed in (77, 78, 42):
        jvm = spark.createDataFrame(
            [(v,) for v in values], "_v long"
        ).select(
            F.xxhash64(F.col("_v"), F.lit(seed)).alias("h"),
            _positions(F.col("_v"), 1 << 17, seed).alias("ps"),
        ).collect()
        for v, row in zip(values, jvm):
            assert _xxh64_long(v, seed) == row["h"], (v, seed)
            assert _positions_py(v, 1 << 17, seed) == list(row["ps"]), v
