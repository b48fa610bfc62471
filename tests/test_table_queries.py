"""Copy-on-write registry queries: DuckDB-oracle parity plus the
structural claims the oracle cannot see — committed-scan file economy
and snapshot isolation across the cached three-commit build."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.oracle_harness import assert_matches_oracle, duck_connection
from time_series_prediction_spark.operators.manifest import prune_files
from time_series_prediction_spark.plans.table_queries import (
    TABLE_QUERIES,
    orders_cow_layout,
)
from time_series_prediction_spark.streaming.layout import (
    current_manifest,
    manifest_root,
    read_committed,
)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", sorted(n for n, (_, sql) in TABLE_QUERIES.items() if sql)
)
def test_cow_queries_match_oracle(spark, sf_dir, duck, name):
    fn, sql = TABLE_QUERIES[name]
    assert_matches_oracle(fn(spark, sf_dir), duck, sql, name=name)


def test_committed_scan_excludes_superseded_generations(spark, sf_dir):
    """After MERGE + DELETE, superseded files are still on disk
    (awaiting vacuum) — the committed read must reference a proper
    subset of what a raw recursive listing would double-count."""
    data = orders_cow_layout(spark, sf_dir)
    from time_series_prediction_spark.operators.manifest import (
        list_parquet_files,
    )

    on_disk = set(list_parquet_files(data, spark))
    committed = set(
        prune_files(current_manifest(spark, manifest_root(data)), {})
    )
    assert committed < on_disk  # strict: superseded generations exist
    # and the committed state has no duplicate keys
    df = read_committed(spark, data)
    assert (
        df.groupBy("o_orderkey").count().where("count > 1").count() == 0
    )


def test_cow_carried_files_shared_across_versions(spark, sf_dir):
    """Copy-on-write economy on the real fixture: the MERGE commit
    must carry most base files by reference (update keys are ~1/13 of
    a key-clustered table ⇒ some files, not all, overlap)."""
    data = orders_cow_layout(spark, sf_dir)
    root = manifest_root(data)
    v0 = set(prune_files(spark.read.parquet(os.path.join(root, "v0")), {}))
    v1 = set(prune_files(spark.read.parquet(os.path.join(root, "v1")), {}))
    assert v0 & v1, "merge rewrote every base file — pruning is dead"
    # base files live under base-0*; merge generation under merge-1*
    assert any("/merge-1-" in f for f in v1)


def test_cow_layout_cached_second_call_is_noop(spark, sf_dir):
    p1 = orders_cow_layout(spark, sf_dir)
    mtimes = {
        f: os.path.getmtime(f)
        for f in [os.path.join(p1, d) for d in os.listdir(p1)]
    }
    p2 = orders_cow_layout(spark, sf_dir)
    assert p1 == p2
    for f, t in mtimes.items():
        assert os.path.getmtime(f) == t


def test_streamed_merge_matches_oracle(spark, sf_dir, duck):
    from time_series_prediction_spark.plans.table_queries import (
        orders_upsert_ingest_scan,
        ORDERS_UPSERT_INGEST_SQL,
    )

    assert_matches_oracle(
        orders_upsert_ingest_scan(spark, sf_dir), duck,
        ORDERS_UPSERT_INGEST_SQL, name="orders_upsert_ingest_scan",
    )


def test_dv_scan_matches_oracle_and_rewrote_nothing(spark, sf_dir, duck):
    from time_series_prediction_spark.plans.table_queries import (
        ORDERS_DV_SCAN_SQL,
        orders_dv_layout,
        orders_dv_scan,
    )

    assert_matches_oracle(
        orders_dv_scan(spark, sf_dir), duck, ORDERS_DV_SCAN_SQL,
        name="orders_dv_scan",
    )
    data = orders_dv_layout(spark, sf_dir)
    root = manifest_root(data)
    v0 = set(prune_files(spark.read.parquet(os.path.join(root, "v0")), {}))
    v1 = set(prune_files(spark.read.parquet(os.path.join(root, "v1")), {}))
    assert v0 == v1, "DV delete must not rewrite any file"


def test_cdc_ingest_matches_oracle_and_deletes_were_dv(spark, sf_dir, duck):
    from time_series_prediction_spark.operators.cow import list_versions
    from time_series_prediction_spark.plans.table_queries import (
        ORDERS_CDC_INGEST_SQL,
        orders_cdc_ingest_scan,
        orders_cdc_stream_layout,
    )
    from time_series_prediction_spark.streaming.layout import version_dv

    assert_matches_oracle(
        orders_cdc_ingest_scan(spark, sf_dir), duck,
        ORDERS_CDC_INGEST_SQL, name="orders_cdc_ingest_scan",
    )
    data = orders_cdc_stream_layout(spark, sf_dir)
    root = manifest_root(data)
    last = max(list_versions(spark, root))
    dv = version_dv(spark, root, last)
    assert dv is not None and dv.count() > 0, (
        "the delete half of the feed must land as deletion vectors"
    )


def test_composite_clustered_merge_prunes_by_date_band(spark, sf_dir):
    """The (day, o_orderkey) Morton clustering must confine a
    30-day-band MERGE to the date-overlapping files: most of v0's 16
    files carry into v1 by reference, and the final state is correct
    (oracle-checked by the registry; here we pin the file economy)."""
    from time_series_prediction_spark.operators.cow import list_versions
    from time_series_prediction_spark.plans.table_queries import (
        orders_cow_composite_layout,
    )

    data = orders_cow_composite_layout(spark, sf_dir)
    root = manifest_root(data)
    versions = list_versions(spark, root)
    assert versions[:2] == [0, 1]
    f0 = set(prune_files(
        spark.read.parquet(os.path.join(root, "v0")), {}))
    f1 = set(prune_files(
        spark.read.parquet(os.path.join(root, "v1")), {}))
    carried = f0 & f1
    assert len(f0) == 16
    # a ~1.2% date band must not rewrite the whole plane. The exact
    # carried count depends on where repartitionByRange SAMPLED the
    # Morton boundaries when the cached layout was built (core count /
    # input split order of that session), so pin the order-of-
    # magnitude property — most files untouched — not one sampling's
    # outcome (observed 7-10 of 16 across build environments).
    assert len(carried) >= 6, (len(f0), len(carried))
