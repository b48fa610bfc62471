"""Property-based tests for the native Delta DML triad: ANY sequence
of append / DELETE / UPDATE / MERGE — with each mutation randomly
forced down the deletion-vector path OR the rewrite-shaped overwrite
path (max_dv_rows=0) — must keep the head read equal to a plain dict
model, keep every historical version readable via time travel, and
RESTORE must reproduce the modeled state exactly. Each example runs
many Spark jobs, so max_examples stays small."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_N = 40  # base keys 0.._N-1; appends/merges may add up to 59

_KEYS = st.lists(
    st.integers(min_value=0, max_value=59), min_size=1, max_size=6,
    unique=True,
)
_VAL = st.integers(min_value=-999, max_value=999)
_DV = st.booleans()  # True: DV path; False: force rewrite-shaped

_MUTATION = st.one_of(
    st.tuples(st.just("append"), _KEYS, _VAL, st.just(True)),
    st.tuples(st.just("delete"), _KEYS, st.just(0), _DV),
    st.tuples(st.just("update"), _KEYS, _VAL, _DV),
    st.tuples(st.just("merge"), _KEYS, _VAL, _DV),
)


def _read(dl, spark, path, version=None):
    return sorted(
        (r["k"], r["v"])
        for r in dl.read_delta_log(spark, path, version=version).collect()
    )


@settings(max_examples=5, deadline=None)
@given(st.lists(_MUTATION, min_size=2, max_size=4), st.data())
def test_any_dml_sequence_reads_like_the_model(
    spark, tmp_path_factory, muts, data
):
    import time_series_prediction_spark.sources.deltalog as dl

    path = str(tmp_path_factory.mktemp("dlprop") / "tbl")
    base = spark.range(_N).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    dl.write_delta_log(base, path, mode="overwrite")
    model = {k: 3 * k for k in range(_N)}
    states = [dict(model)]  # modeled contents after each commit

    for op, keys, val, dv in muts:
        cap = 500_000 if dv else 0  # 0 forces the rewrite-shaped path
        if op == "append":
            fresh = [k for k in keys if k not in model]
            if not fresh:
                continue
            dl.write_delta_log(
                spark.createDataFrame(
                    [(k, val) for k in fresh], "k long, v long"
                ),
                path, mode="append",
            )
            for k in fresh:
                model[k] = val
        elif op == "delete":
            touched = [k for k in keys if k in model]
            if not touched:
                continue
            dl.delta_delete(
                spark, path, f"k in ({','.join(map(str, keys))})",
                max_dv_rows=cap, max_total_dv_rows=None,
            )
            for k in touched:
                model.pop(k)
        elif op == "update":
            touched = [k for k in keys if k in model]
            if not touched:
                continue
            dl.delta_update(
                spark, path, f"k in ({','.join(map(str, keys))})",
                {"v": f"CAST({val} AS BIGINT)"},
                max_dv_rows=cap, max_total_dv_rows=None,
            )
            for k in touched:
                model[k] = val
        else:  # merge: upsert every key
            dl.delta_merge(
                spark, path,
                spark.createDataFrame(
                    [(k, val) for k in keys], "k long, v long"
                ),
                key="k", max_dv_rows=cap, max_total_dv_rows=None,
            )
            for k in keys:
                model[k] = val
        assert _read(dl, spark, path) == sorted(model.items())
        states.append(dict(model))

    # history stays coherent: version v reads state v (commit versions
    # are contiguous — every executed op above commits exactly once,
    # skipped no-ops append no state)
    latest = dl.delta_snapshot(spark, path)[2]
    assert latest == len(states) - 1
    v = data.draw(
        st.integers(min_value=0, max_value=latest), label="travel_v"
    )
    assert _read(dl, spark, path, version=v) == sorted(states[v].items())

    # RESTORE to a random point reproduces the modeled state exactly
    rv = data.draw(
        st.integers(min_value=0, max_value=latest), label="restore_v"
    )
    dl.delta_restore(spark, path, rv)
    assert _read(dl, spark, path) == sorted(states[rv].items())


def _read_rid(dl, spark, path, version=None):
    return sorted(
        (r["k"], r["v"], r["rid"])
        for r in dl.read_delta_log(spark, path, version=version).collect()
    )


@settings(max_examples=4, deadline=None)
@given(st.lists(_MUTATION, min_size=2, max_size=4), st.data())
def test_dml_sequence_on_identity_table(
    spark, tmp_path_factory, muts, data
):
    """The same ANY-sequence model on a table with a GENERATED ALWAYS
    AS IDENTITY column (round-12: rewrite-shaped DML used to refuse
    outright on these tables): values always match the dict model;
    identity values are globally unique, STABLE for surviving rows
    across DELETE/UPDATE/MERGE-match on BOTH the DV and rewrite
    paths, monotonically fresh for appends and merge-inserts (never
    reused, even after deletes), and time travel reproduces each
    version's exact (k, v, rid) set."""
    import time_series_prediction_spark.sources.deltalog as dl

    path = str(tmp_path_factory.mktemp("dlprop_id") / "tbl")
    base = spark.range(_N).select(
        F.col("id").alias("rid"),
        F.col("id").alias("k"),
        (F.col("id") * 3).alias("v"),
    )
    dl.write_delta_log(base, path, mode="overwrite")
    dl.delta_set_identity_column(spark, path, "rid", start=0, step=1)
    model = {k: 3 * k for k in range(_N)}     # k -> v
    rid_of = {k: k for k in range(_N)}        # k -> identity value
    hwm = _N - 1
    states = [
        sorted((k, model[k], rid_of[k]) for k in model)
    ]

    def _sync_new_rids():
        # pull engine-assigned rids for keys the model knows need
        # fresh ones; enforce monotone-above-watermark on each
        nonlocal hwm
        got = {r[0]: r[2] for r in _read_rid(dl, spark, path)}
        fresh = [k for k in model if rid_of.get(k) is None]
        for k in fresh:
            assert got[k] > hwm, (k, got[k], hwm)
            rid_of[k] = got[k]
        if fresh:
            hwm = max(hwm, *(rid_of[k] for k in fresh))

    for op, keys, val, dv in muts:
        cap = 500_000 if dv else 0
        if op == "append":
            fresh = [k for k in keys if k not in model]
            if not fresh:
                continue
            dl.write_delta_log(
                spark.createDataFrame(
                    [(k, val) for k in fresh], "k long, v long"
                ),
                path, mode="append",
            )
            for k in fresh:
                model[k] = val
                rid_of[k] = None
        elif op == "delete":
            touched = [k for k in keys if k in model]
            if not touched:
                continue
            dl.delta_delete(
                spark, path, f"k in ({','.join(map(str, keys))})",
                max_dv_rows=cap, max_total_dv_rows=None,
            )
            for k in touched:
                model.pop(k)
                rid_of.pop(k)
        elif op == "update":
            touched = [k for k in keys if k in model]
            if not touched:
                continue
            dl.delta_update(
                spark, path, f"k in ({','.join(map(str, keys))})",
                {"v": f"CAST({val} AS BIGINT)"},
                max_dv_rows=cap, max_total_dv_rows=None,
            )
            for k in touched:
                model[k] = val
        else:  # merge upsert: batch OMITS rid; matched keep, new fresh
            dl.delta_merge(
                spark, path,
                spark.createDataFrame(
                    [(k, val) for k in keys], "k long, v long"
                ),
                key="k", max_dv_rows=cap, max_total_dv_rows=None,
            )
            for k in keys:
                if k not in model:
                    rid_of[k] = None
                model[k] = val
        _sync_new_rids()
        got = _read_rid(dl, spark, path)
        assert got == sorted(
            (k, model[k], rid_of[k]) for k in model
        )
        rids = [r for _, _, r in got]
        assert len(rids) == len(set(rids))  # globally unique
        states.append(sorted((k, model[k], rid_of[k]) for k in model))

    latest = dl.delta_snapshot(spark, path)[2]
    # +1: the set-identity commit precedes the first mutation
    assert latest == len(states)
    if len(states) > 1:  # at least one mutation actually committed
        v = data.draw(
            st.integers(min_value=1, max_value=len(states) - 1),
            label="travel_v",
        )
        assert _read_rid(dl, spark, path, version=v + 1) == states[v]


@settings(max_examples=3, deadline=None)
@given(st.lists(_MUTATION, min_size=2, max_size=4), st.data())
def test_dml_sequence_on_row_tracked_table(
    spark, tmp_path_factory, muts, data
):
    """Random DML on a ROW-TRACKED table: after every commit the
    row-id read returns exactly the model's contents with globally
    unique ids; ids of rows untouched by a mutation never change; a
    random mid-sequence OPTIMIZE (materialization) changes nothing a
    reader can observe."""
    import time_series_prediction_spark.sources.deltalog as dl

    path = str(tmp_path_factory.mktemp("dlprop_rt") / "tbl")
    base = spark.range(_N).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    dl.write_delta_log(base, path, mode="overwrite")
    dl.delta_enable_row_tracking(spark, path)
    model = {k: 3 * k for k in range(_N)}

    def _ids():
        return {
            r["k"]: (r["v"], r["_row_id"])
            for r in dl.read_delta_with_row_ids(spark, path).collect()
        }

    prev = _ids()
    assert sorted(rid for _, rid in prev.values()) == list(range(_N))
    opt_at = data.draw(
        st.integers(min_value=0, max_value=len(muts) - 1),
        label="optimize_after",
    )
    for i, (op, keys, val, dv) in enumerate(muts):
        cap = 500_000 if dv else 0
        touched: set[int] = set()
        if op == "append":
            fresh = [k for k in keys if k not in model]
            if fresh:
                dl.write_delta_log(
                    spark.createDataFrame(
                        [(k, val) for k in fresh], "k long, v long"
                    ),
                    path, mode="append",
                )
                for k in fresh:
                    model[k] = val
                touched = set(fresh)
        elif op == "delete":
            if any(k in model for k in keys):
                dl.delta_delete(
                    spark, path, f"k in ({','.join(map(str, keys))})",
                    max_dv_rows=cap, max_total_dv_rows=None,
                )
                for k in keys:
                    model.pop(k, None)
        elif op == "update":
            if any(k in model for k in keys):
                dl.delta_update(
                    spark, path, f"k in ({','.join(map(str, keys))})",
                    {"v": f"CAST({val} AS BIGINT)"},
                    max_dv_rows=cap, max_total_dv_rows=None,
                )
                for k in keys:
                    if k in model:
                        model[k] = val
                        touched.add(k)
        else:
            dl.delta_merge(
                spark, path,
                spark.createDataFrame(
                    [(k, val) for k in keys], "k long, v long"
                ),
                key="k", max_dv_rows=cap, max_total_dv_rows=None,
            )
            for k in keys:
                model[k] = val
            touched = set(keys)
        cur = _ids()
        assert {k: v for k, (v, _) in cur.items()} == model
        rids = [rid for _, rid in cur.values()]
        assert len(rids) == len(set(rids))  # globally unique, always
        # rows untouched by this mutation keep their exact row ids
        for k, (_, rid) in prev.items():
            if k in cur and k not in touched:
                assert cur[k][1] == rid, (op, k)
        prev = cur
        if i == opt_at:
            before = _ids()
            # randomly materialize via OPTIMIZE or REORG PURGE (r13) —
            # both are dataChange=false rewrites a reader must never
            # observe, REORG additionally purging any DV state
            if data.draw(st.booleans(), label="reorg_not_optimize"):
                dl.delta_reorg_purge(spark, path)
                files, *_ = dl.delta_snapshot(spark, path)
                assert not any(
                    a.get("deletionVector") for a in files.values()
                )
            else:
                dl.delta_optimize(spark, path, target_files=1)
            assert _ids() == before  # dataChange=false: unobservable
            prev = before


_APPEND_SPAN = st.tuples(
    st.integers(min_value=0, max_value=7000),   # append start key
    st.integers(min_value=50, max_value=1200),  # append width
)


@settings(max_examples=3, deadline=None)
@given(st.lists(_APPEND_SPAN, min_size=2, max_size=4))
def test_incremental_clustered_optimize_at_depth(
    spark, tmp_path_factory, spans
):
    """VERDICT r12 Next #7: N random-span appends interleaved with
    incremental clustered-OPTIMIZE ticks on a row-tracked table
    clustered on (low-card, high-card) keys. Invariants per tick:
    (a) data and row ids of pre-existing rows never change, (b) the
    rewrite set covers at most the new append plus the cubes it
    touches — never the whole table once settled cubes exist, and
    (c) after any tick, an immediate repeat tick is a strict no-op
    (ranges converged)."""
    import time_series_prediction_spark.sources.deltalog as dl

    path = str(tmp_path_factory.mktemp("dlinc") / "tbl")
    dl.write_delta_log(
        spark.range(8000).selectExpr(
            "id % 100 AS grp", "id AS k", "id % 10 AS v"
        ),
        path, mode="overwrite",
    )
    dl.delta_enable_row_tracking(spark, path)
    dl.delta_cluster_by(spark, path, ["grp", "k"])
    dl.delta_optimize(spark, path, target_files=8)

    def _ids():
        return {
            (r["grp"], r["k"], r["v"]): r["_row_id"]
            for r in dl.read_delta_with_row_ids(spark, path).collect()
        }

    for rnd, (start, width) in enumerate(spans):
        files_before = set(dl.delta_snapshot(spark, path)[0])
        # k spans overlap the settled ranges (that's the point); the
        # per-round v marker keeps every row tuple unique so the id
        # map can't collapse duplicates
        dl.write_delta_log(
            spark.range(start, start + width).selectExpr(
                "id % 100 AS grp", "id AS k",
                f"CAST(100 + {rnd} AS BIGINT) AS v",
            ),
            path, mode="append",
        )
        ids_before = _ids()
        dl.delta_optimize_incremental(spark, path, target_files=8)
        # (a) ids and data stable across the tick
        assert _ids() == ids_before
        # (b) settled cubes survive: at least one pre-append file is
        # untouched once the table holds ≥2 disjoint cubes
        files_after = set(dl.delta_snapshot(spark, path)[0])
        if len(files_before) >= 4:
            assert files_before & files_after, (
                len(files_before), len(files_after)
            )
        # (c) immediate repeat tick is a strict no-op
        v = dl.delta_snapshot(spark, path)[2]
        assert dl.delta_optimize_incremental(spark, path) == v
