"""Property-based tests for the CoW table algebra: ANY mutation
sequence must keep every read surface consistent with a plain dict
model — current reads, per-version time travel, RESTORE to any point,
and clone isolation. Each example is several Spark jobs, so
max_examples stays small."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from time_series_prediction_spark.operators.cow import (
    delete_keys,
    delete_keys_dv,
    init_table,
    merge_upsert,
    read_version,
    restore_table,
)
from time_series_prediction_spark.streaming.layout import read_committed

_N = 60  # base table keys 0.._N-1; mutations may insert up to 79

_KEYS = st.lists(
    st.integers(min_value=0, max_value=79), min_size=1, max_size=8,
    unique=True,
)

_MUTATION = st.one_of(
    st.tuples(st.just("merge"), _KEYS,
              st.integers(min_value=-999, max_value=999)),
    st.tuples(st.just("delete"), _KEYS, st.just(0)),
    st.tuples(st.just("dv_delete"), _KEYS, st.just(0)),
)


def _rows(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


@settings(max_examples=5, deadline=None)
@given(st.lists(_MUTATION, min_size=2, max_size=4), st.data())
def test_any_mutation_sequence_reads_like_the_model(
    spark, tmp_path_factory, muts, data
):
    path = str(tmp_path_factory.mktemp("cowprop") / "tbl")
    base = spark.range(_N).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    from time_series_prediction_spark.operators.cow import list_versions
    from time_series_prediction_spark.streaming.layout import (
        manifest_root,
    )

    init_table(spark, path, base, key="k", n_files=4, keep_versions=20)
    model = {k: 3 * k for k in range(_N)}
    states = [dict(model)]  # states[v] == table contents at version v
    root = manifest_root(path)
    for op, keys, val in muts:
        before_v = max(list_versions(spark, root))
        if op == "merge":
            ups = spark.createDataFrame(
                [(k, val) for k in keys], "k long, v long"
            )
            merge_upsert(spark, path, ups, key="k", keep_versions=20)
            for k in keys:
                model[k] = val
        else:
            dels = spark.createDataFrame(
                [(k,) for k in keys], "k long"
            )
            fn = delete_keys if op == "delete" else delete_keys_dv
            fn(spark, path, dels, key="k", keep_versions=20)
            for k in keys:
                model.pop(k, None)
        # a DELETE whose keys miss every file's stats range is a
        # no-op and burns NO manifest version — the model records a
        # state only when a commit actually happened
        if max(list_versions(spark, root)) > before_v:
            states.append(dict(model))
        assert _rows(read_committed(spark, path)) == sorted(
            model.items()
        ), op
    # time travel: every recorded version still reads exactly
    for v, st_model in enumerate(states):
        assert _rows(read_version(spark, path, v)) == sorted(
            st_model.items()
        ), v
    # RESTORE to an arbitrary recorded version == that state
    target = data.draw(
        st.integers(min_value=0, max_value=len(states) - 1)
    )
    restore_table(spark, path, target, keep_versions=20)
    assert _rows(read_committed(spark, path)) == sorted(
        states[target].items()
    ), target
