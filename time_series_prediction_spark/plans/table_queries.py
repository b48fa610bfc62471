"""Copy-on-write table queries: MERGE / DELETE / time travel / CDC
(operators/cow.py) surfaced as oracle-backed registry queries.

The fixture table derives deterministically from ``orders`` so DuckDB
can reconstruct every state with plain SQL:

* **v0** — all orders, key-clustered on ``o_orderkey``, money held as
  integer cents (``round(o_totalprice*100)``) so no float ever enters
  a mutated column;
* **v1 (MERGE)** — every ``o_orderkey % 13 == 0`` row in the LOWEST
  TENTH of the key domain (``o_orderkey * 10 <= max(o_orderkey)`` —
  a realistic recent-partition touch, and the condition both engines
  can evaluate from a max-key scalar) is updated (+100000 cents,
  status → 'R'); every ``o_orderkey % 101 == 0`` row spawns an INSERT
  under key ``o_orderkey + 10^8`` with priority '6-NEW'. Confining
  updates to a key band is what makes the copy-on-write economy
  OBSERVABLE on the fixture: most base files carry into v1 by
  reference (asserted in tests), which scattered update keys would
  mask by overlapping every key-range file;
* **v2 (DELETE)** — every current key with ``key % 17 == 0`` is
  erased (hits both original and inserted key domains).

The queries then read (a) the final state, (b) the v0 snapshot via
time travel — proving mutations never disturbed history — and (c) the
v0→v1 change feed. The oracle never sees the table: it recomputes
each answer from raw ``orders`` with the same arithmetic, so the
comparison pins the whole write path — overlap-pruned file rewrites,
carried-by-reference stats, version retention, symmetric-difference
CDC.

Beyond-reference scope: the reference rebuilds whole tables per run
(reference ``src/demo/training.py:70-90``) and has no row-level
mutation, snapshot, or change-feed surface.

Built at most once per fixture content (same identity / build-lock /
atomic-publish cache protocol as ``plans/layout_queries.py``); the
three manifest versions' recorded file paths are re-prefixed to the
published location before the rename, keeping every snapshot readable
from the cache.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from time_series_prediction_spark.operators.cow import (
    delete_keys,
    init_table,
    merge_upsert,
    read_version,
    version_changes,
)
from time_series_prediction_spark.operators.manifest import (
    MANIFEST_FORMAT,
)
from time_series_prediction_spark.operators.mview import ensure_artifact
from time_series_prediction_spark.sources.fsops import fs_for
from time_series_prediction_spark.sources.io import read_table
from time_series_prediction_spark.streaming.layout import (
    manifest_root,
    read_committed,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

_SPEC = f"cow-orders|v4|13band10|101|17|8|{MANIFEST_FORMAT}"
_KEEP = 20
_INSERT_SHIFT = 100_000_000

# Layout-cache builds run through operators/mview.ensure_artifact —
# the engine's ONE build-once protocol (lock → _IDENT → tmp build →
# atomic publish), so there is a single implementation to test for
# races instead of one copy per plans module.


def _orders_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_custkey").cast("long").alias("o_custkey"),
        "o_orderstatus",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias(
            "price_cents"
        ),
        "o_orderpriority",
    )


def _merge_updates(base: DataFrame) -> DataFrame:
    mx = base.agg(F.max("o_orderkey")).first()[0]
    modified = base.where(
        f"o_orderkey % 13 = 0 AND o_orderkey * 10 <= {mx}"
    ).select(
        "o_orderkey",
        "o_custkey",
        F.lit("R").alias("o_orderstatus"),
        (F.col("price_cents") + F.lit(100_000)).alias("price_cents"),
        "o_orderpriority",
    )
    inserted = base.where("o_orderkey % 101 = 0").select(
        (F.col("o_orderkey") + F.lit(_INSERT_SHIFT)).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "price_cents",
        F.lit("6-NEW").alias("o_orderpriority"),
    )
    return modified.unionByName(inserted)


def _delete_key_set(base: DataFrame) -> DataFrame:
    original = base.select("o_orderkey").where("o_orderkey % 17 = 0")
    inserted = base.where("o_orderkey % 101 = 0").select(
        (F.col("o_orderkey") + F.lit(_INSERT_SHIFT)).alias("o_orderkey")
    ).where("o_orderkey % 17 = 0")
    return original.unionByName(inserted)


def _reprefix_manifests(
    spark: SparkSession, root: str, old_data: str, new_data: str
) -> None:
    """Rewrite every retained manifest version's ``file`` paths from
    the build location to the publish location. Versions are tiny
    (files × stats_cols rows) — METADATA work, so the rewrite runs on
    the driver through pyarrow when the cache root is a local path
    (the layout cache always is: ``tempfile.gettempdir()``). The old
    Spark-job-per-version implementation cost ~4 s PER VERSION in
    fixed job overhead (read+collect+coalesce(1).write against a
    few-KB file) and dominated every cow layout build — 16 s of the
    ``orders_cow_schema_evolution`` bench line was this loop. Sidecars
    (deletion vector, recorded schema — keys/JSON only, no paths)
    are untouched: only the manifest part files are replaced in
    place, so ``_dv``/``_schema.json``/``_SUCCESS`` survive as-is.
    Non-local roots fall back to the Spark rewrite."""
    if os.path.isdir(root):
        _reprefix_manifests_local(root, old_data, new_data)
        return
    fs = fs_for(spark, root)
    for name in fs.list_names(root):
        if not (name.startswith("v") and name[1:].isdigit()):
            continue
        vdir = os.path.join(root, name)
        mdf = spark.read.parquet(vdir)
        schema, rows = mdf.schema, mdf.collect()
        # sidecars must survive the in-place rewrite: collect them
        # BEFORE the overwrite wipes the version dir, restore after
        dv_rows = dv_schema = None
        dvdir = os.path.join(vdir, "_dv")
        if fs.exists(os.path.join(dvdir, "_SUCCESS")):
            dvdf = spark.read.parquet(dvdir)
            dv_rows, dv_schema = dvdf.collect(), dvdf.schema
        schema_txt = None
        spath = os.path.join(vdir, "_schema.json")
        if fs.exists(spath):
            schema_txt = fs.read_text(spath)
        names = [f.name for f in schema.fields]
        fixed = []
        for r in rows:
            d = r.asDict()
            if d["file"].startswith(old_data):
                d["file"] = new_data + d["file"][len(old_data):]
            fixed.append(tuple(d[n] for n in names))
        spark.createDataFrame(fixed, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(vdir)
        if dv_rows is not None:
            spark.createDataFrame(dv_rows, dv_schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(dvdir)
        if schema_txt is not None:
            fs.write_text(spath, schema_txt)


def _reprefix_manifests_local(
    root: str, old_data: str, new_data: str
) -> None:
    """Driver-side manifest re-prefix for local cache roots: read each
    version's parquet parts with pyarrow, swap the ``file`` prefix,
    atomically replace the parts with one rewritten file. Zero Spark
    jobs; Spark reads the result identically (same schema, one part
    file + the existing ``_SUCCESS``)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    for name in sorted(os.listdir(root)):
        if not (name.startswith("v") and name[1:].isdigit()):
            continue
        vdir = os.path.join(root, name)
        parts = sorted(
            f for f in os.listdir(vdir) if f.endswith(".parquet")
        )
        if not parts:
            continue
        tbl = pa.concat_tables(
            [pq.read_table(os.path.join(vdir, f)) for f in parts]
        )
        files = tbl.column("file")
        fixed = pc.if_else(
            pc.starts_with(files, old_data),
            pc.binary_join_element_wise(
                pa.scalar(new_data),
                pc.utf8_slice_codeunits(
                    files, len(old_data), 2**31 - 1
                ),
                "",
            ),
            files,
        )
        tbl = tbl.set_column(
            tbl.schema.get_field_index("file"), "file", fixed
        )
        out = os.path.join(vdir, "part-00000-reprefix.parquet")
        tmp = out + ".tmp"
        pq.write_table(tbl, tmp)
        for f in parts:
            if os.path.join(vdir, f) != out:
                os.remove(os.path.join(vdir, f))
        os.replace(tmp, out)


def orders_cow_layout(spark: SparkSession, sf_dir: str) -> str:
    """The three-commit cow table under the layout cache; returns the
    table's data dir. Build-locked per key, atomically published,
    keyed by the fixture's identity + the mutation spec."""
    src = os.path.join(sf_dir, "orders.parquet")
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    st = fs.status(src)
    if st is None:
        raise FileNotFoundError(src)
    ident = f"{fs.qualified(src)}|{st[0]}|{st[1]}|{_SPEC}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(root, f"orders_cow_{key}")
    def _build(tmp: str) -> None:
        data = os.path.join(tmp, "data")
        base = _orders_state(spark, sf_dir)
        init_table(
            spark, data, base, key="o_orderkey", n_files=8,
            keep_versions=_KEEP,
        )
        merge_upsert(
            spark, data, _merge_updates(base), key="o_orderkey",
            keep_versions=_KEEP,
        )
        delete_keys(
            spark, data, _delete_key_set(base), key="o_orderkey",
            keep_versions=_KEEP,
        )
        from time_series_prediction_spark.operators.manifest import (
            _resolve_base,
        )

        _reprefix_manifests(
            spark, manifest_root(data), _resolve_base(data, spark),
            os.path.join(path, "data"),
        )

    ensure_artifact(spark, path, ident, _build)
    return os.path.join(path, "data")


def orders_cow_current_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final state after MERGE + DELETE, read through the committed
    manifest (never a raw recursive scan — superseded generations are
    still on disk awaiting vacuum)."""
    data = orders_cow_layout(spark, sf_dir)
    return (
        read_committed(spark, data)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price_cents").cast("long").alias("total_cents"),
        )
    )


ORDERS_COW_CURRENT_SQL = f"""
WITH mx AS (SELECT max(o_orderkey) AS mk FROM orders),
state AS (
    SELECT o_orderkey AS k, o_orderpriority AS prio,
           CAST(round(o_totalprice * 100) AS BIGINT)
             + CASE WHEN o_orderkey % 13 = 0
                     AND o_orderkey * 10 <= (SELECT mk FROM mx)
                    THEN 100000 ELSE 0 END AS cents
    FROM orders
    UNION ALL
    SELECT o_orderkey + {_INSERT_SHIFT}, '6-NEW',
           CAST(round(o_totalprice * 100) AS BIGINT)
    FROM orders WHERE o_orderkey % 101 = 0
)
SELECT prio AS o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS total_cents
FROM state
WHERE k % 17 <> 0
GROUP BY prio
"""


def orders_cow_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``VERSION AS OF 0`` after both mutations committed: the
    original snapshot must still read exactly — the proof that
    copy-on-write never disturbs history."""
    data = orders_cow_layout(spark, sf_dir)
    return (
        read_version(spark, data, 0)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price_cents").cast("long").alias("total_cents"),
        )
    )


ORDERS_COW_TIME_TRAVEL_SQL = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
GROUP BY o_orderstatus
"""


def orders_cow_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change feed across the MERGE commit (v0 → v1): updated rows
    surface as delete(old state) + insert(new state), inserted rows
    as pure inserts; unmodified rows — even ones living in rewritten
    files — cancel out."""
    from time_series_prediction_spark.operators.mview import (
        refresh_if_stale,
    )

    data = orders_cow_layout(spark, sf_dir)

    def _build(s: SparkSession) -> DataFrame:
        return (
            version_changes(s, data, 0, 1)
            .groupBy(
                F.col("_change").alias("change_type"), "o_orderpriority"
            )
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("price_cents").cast("long").alias("total_cents"),
            )
        )

    # same materialization discipline as orders_cow_feed: the diff
    # replays only when the source table advances (_LATEST moves)
    df, _ = refresh_if_stale(
        spark, "orders_cow_changes", _build,
        [os.path.join(manifest_root(data), "_LATEST")],
    )
    return df


ORDERS_COW_CHANGES_SQL = f"""
WITH mx AS (SELECT max(o_orderkey) AS mk FROM orders),
ins AS (
    SELECT o_orderpriority,
           CAST(round(o_totalprice * 100) AS BIGINT) + 100000 AS cents
    FROM orders
    WHERE o_orderkey % 13 = 0
      AND o_orderkey * 10 <= (SELECT mk FROM mx)
    UNION ALL
    SELECT '6-NEW', CAST(round(o_totalprice * 100) AS BIGINT)
    FROM orders WHERE o_orderkey % 101 = 0
)
SELECT 'insert' AS change_type, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(cents) AS BIGINT) AS total_cents
FROM ins GROUP BY o_orderpriority
UNION ALL
SELECT 'delete' AS change_type, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
WHERE o_orderkey % 13 = 0
  AND o_orderkey * 10 <= (SELECT mk FROM mx)
GROUP BY o_orderpriority
"""


def orders_upsert_stream_layout(spark: SparkSession, sf_dir: str) -> str:
    """The MERGE state reached through the STREAMING path: the table
    bootstraps from base orders, then the same change set arrives as
    three micro-batches through ``merge_ingest_sink`` (each a
    file-granular cow commit). Because the change set is key-unique,
    sequential disjoint merges compose to the one-shot merge — so the
    batch oracle pins the streaming loop exactly."""
    from time_series_prediction_spark.streaming.upsert import (
        merge_ingest_sink,
    )

    src = os.path.join(sf_dir, "orders.parquet")
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    st = fs.status(src)
    if st is None:
        raise FileNotFoundError(src)
    ident = f"{fs.qualified(src)}|{st[0]}|{st[1]}|stream-{_SPEC}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(root, f"orders_cowstream_{key}")
    def _build(tmp: str) -> None:
        data = os.path.join(tmp, "data")
        base = _orders_state(spark, sf_dir)
        init_table(
            spark, data, base, key="o_orderkey", n_files=8,
            keep_versions=_KEEP,
        )
        updates = _merge_updates(base)
        inbox = os.path.join(tmp, "_inbox")
        updates.repartition(3).write.mode("overwrite").parquet(inbox)
        sink = merge_ingest_sink(
            data, key="o_orderkey", n_files=4, keep_versions=_KEEP
        )
        stream = (
            spark.readStream.schema(updates.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(inbox)
        )
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(tmp, "_ck"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        from time_series_prediction_spark.operators.manifest import (
            _resolve_base,
        )

        _reprefix_manifests(
            spark, manifest_root(data), _resolve_base(data, spark),
            os.path.join(path, "data"),
        )

    ensure_artifact(spark, path, ident, _build)
    return os.path.join(path, "data")


def orders_upsert_ingest_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final state of the streamed-merge table — identical to the
    one-shot MERGE, however the change feed happened to micro-batch."""
    data = orders_upsert_stream_layout(spark, sf_dir)
    return (
        read_committed(spark, data)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price_cents").cast("long").alias("total_cents"),
        )
    )


ORDERS_UPSERT_INGEST_SQL = f"""
WITH mx AS (SELECT max(o_orderkey) AS mk FROM orders),
state AS (
    SELECT CASE WHEN o_orderkey % 13 = 0
                 AND o_orderkey * 10 <= (SELECT mk FROM mx)
                THEN 'R' ELSE o_orderstatus END AS st,
           CAST(round(o_totalprice * 100) AS BIGINT)
             + CASE WHEN o_orderkey % 13 = 0
                     AND o_orderkey * 10 <= (SELECT mk FROM mx)
                    THEN 100000 ELSE 0 END AS cents
    FROM orders
    UNION ALL
    SELECT 'N', CAST(round(o_totalprice * 100) AS BIGINT)
    FROM orders WHERE o_orderkey % 101 = 0
)
SELECT st AS o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS total_cents
FROM state
GROUP BY st
"""


def orders_cow_view_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental materialized-view maintenance: a per-priority
    rollup built ONCE over the v0 snapshot, then kept current by
    folding the commits' change feeds (v0→v1 merge, v1→v2 delete)
    through ``apply_cdc_to_rollup`` — history is never re-read. The
    two feeds fold as ONE concatenated feed: per-key state is a plain
    sum of signed contributions, so fold(fold(view,c1),c2) ==
    fold(view, c1 ∪ c2) exactly (the intermediate ``n != 0`` filter
    only ever drops keys whose additive state is all-zero). The
    oracle recomputes the final state from scratch, so the comparison
    pins fold(commits) == full recompute exactly."""
    from time_series_prediction_spark.operators.incremental import (
        apply_cdc_to_rollup,
    )

    data = orders_cow_layout(spark, sf_dir)
    view = (
        read_version(spark, data, 0)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("price_cents").cast("bigint").alias("total"),
        )
    )
    feed = version_changes(spark, data, 0, 1).unionByName(
        version_changes(spark, data, 1, 2)
    )
    view = apply_cdc_to_rollup(
        view, feed, ["o_orderpriority"], "price_cents"
    )
    return view.select(
        "o_orderpriority",
        F.col("n").alias("n_orders"),
        F.col("total").alias("total_cents"),
    )


def orders_cow_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE HISTORY off the manifest versions — metadata only, no
    data file opened. Row counts per version are fully determined by
    the mutation spec, so the oracle recomputes them from raw orders:
    v0 = all orders, v1 = +inserted, v2 = after the key%17 purge."""
    from time_series_prediction_spark.operators.cow import table_history

    data = orders_cow_layout(spark, sf_dir)
    return table_history(spark, manifest_root(data)).select(
        "version", "n_rows"
    )


ORDERS_COW_HISTORY_SQL = f"""
WITH mx AS (SELECT max(o_orderkey) AS mk FROM orders),
n0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders),
nins AS (
    SELECT CAST(count(*) AS BIGINT) AS n
    FROM orders WHERE o_orderkey % 101 = 0
),
nfinal AS (
    SELECT CAST(count(*) AS BIGINT) AS n FROM (
        SELECT o_orderkey AS k FROM orders
        UNION ALL
        SELECT o_orderkey + {_INSERT_SHIFT} FROM orders
        WHERE o_orderkey % 101 = 0
    ) WHERE k % 17 <> 0
)
SELECT CAST(0 AS BIGINT) AS version, (SELECT n FROM n0) AS n_rows
UNION ALL
SELECT 1, (SELECT n FROM n0) + (SELECT n FROM nins)
UNION ALL
SELECT 2, (SELECT n FROM nfinal)
"""


def orders_cow_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-commit change feed a downstream consumer replays:
    per-version insert/delete row counts across both mutation
    commits. The oracle derives every count from the mutation spec
    over raw orders — v1 emits the merge's before/after rows, v2
    emits exactly the purged rows (its rewrite's surviving rows
    cancel)."""
    from time_series_prediction_spark.operators.cow import changes_feed
    from time_series_prediction_spark.operators.mview import (
        refresh_if_stale,
    )

    data = orders_cow_layout(spark, sf_dir)

    # materialized like the SCD2 dimension: a change-feed consumer
    # reads the feed many times per table advance, so the fold is an
    # mview invalidated by the source's _LATEST pointer — repeat reads
    # are metadata-cost, and the fingerprint re-replays on any commit
    def _build(s: SparkSession) -> DataFrame:
        return (
            changes_feed(s, data, 0, 2)
            .groupBy(
                F.col("_version").alias("version"),
                F.col("_change").alias("change_type"),
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        )

    df, _ = refresh_if_stale(
        spark, "orders_cow_feed", _build,
        [os.path.join(manifest_root(data), "_LATEST")],
    )
    return df


ORDERS_COW_FEED_SQL = f"""
WITH mx AS (SELECT max(o_orderkey) AS mk FROM orders),
nmod AS (
    SELECT CAST(count(*) AS BIGINT) AS n FROM orders
    WHERE o_orderkey % 13 = 0
      AND o_orderkey * 10 <= (SELECT mk FROM mx)
),
nins AS (
    SELECT CAST(count(*) AS BIGINT) AS n
    FROM orders WHERE o_orderkey % 101 = 0
),
npurged AS (
    SELECT CAST(count(*) AS BIGINT) AS n FROM (
        SELECT o_orderkey AS k FROM orders
        UNION ALL
        SELECT o_orderkey + {_INSERT_SHIFT} FROM orders
        WHERE o_orderkey % 101 = 0
    ) WHERE k % 17 = 0
)
SELECT CAST(1 AS BIGINT) AS version, 'insert' AS change_type,
       (SELECT n FROM nmod) + (SELECT n FROM nins) AS n_rows
UNION ALL
SELECT 1, 'delete', (SELECT n FROM nmod)
UNION ALL
SELECT 2, 'delete', (SELECT n FROM npurged)
"""


_STR_SPEC = f"cowstr-orders|v1|31band10|8|{MANIFEST_FORMAT}"


def orders_cow_string_layout(spark: SparkSession, sf_dir: str) -> str:
    """A cow table keyed by a STRING primary key (the UUID-shaped
    ``'K' || lpad(o_orderkey, 12, '0')`` — zero-padded so string
    order == numeric order and DuckDB reproduces every state), with
    one MERGE confined to the lowest tenth of the key space. The
    typed vmin_s/vmax_s manifest stats are what keep this merge
    file-granular (a double-only manifest would be stats-blind on
    every file and rewrite the whole table); the carried-by-reference
    economy is asserted in tests, the row-level result here by the
    oracle. Cached per fixture content."""
    src = os.path.join(sf_dir, "orders.parquet")
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    st = fs.status(src)
    if st is None:
        raise FileNotFoundError(src)
    ident = f"{fs.qualified(src)}|{st[0]}|{st[1]}|{_STR_SPEC}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(root, f"orders_cowstr_{key}")
    def _build(tmp: str) -> None:
        data = os.path.join(tmp, "data")
        base = _orders_state(spark, sf_dir).select(
            F.concat(
                F.lit("K"),
                F.lpad(F.col("o_orderkey").cast("string"), 12, "0"),
            ).alias("o_key"),
            "o_orderstatus",
            "price_cents",
            "o_orderpriority",
            "o_orderkey",
        )
        init_table(
            spark, data, base, key="o_key", n_files=8,
            keep_versions=_KEEP,
        )
        mx = base.agg(F.max("o_orderkey")).first()[0]
        updates = base.where(
            f"o_orderkey % 31 = 0 AND o_orderkey * 10 <= {mx}"
        ).select(
            "o_key",
            F.lit("S").alias("o_orderstatus"),
            (F.col("price_cents") + F.lit(55_555)).alias("price_cents"),
            "o_orderpriority",
            "o_orderkey",
        )
        merge_upsert(
            spark, data, updates, key="o_key", keep_versions=_KEEP
        )
        from time_series_prediction_spark.operators.manifest import (
            _resolve_base,
        )

        _reprefix_manifests(
            spark, manifest_root(data), _resolve_base(data, spark),
            os.path.join(path, "data"),
        )

    ensure_artifact(spark, path, ident, _build)
    return os.path.join(path, "data")


def orders_cow_string_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final state of the string-keyed cow table after the banded
    MERGE — grouped by status so the oracle pins every mutated cent.
    The min/max key bounds additionally pin that the STRING key
    column itself survived the rewrite path byte-exactly."""
    data = orders_cow_string_layout(spark, sf_dir)
    return (
        read_committed(spark, data)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price_cents").cast("long").alias("total_cents"),
            F.min("o_key").alias("min_key"),
            F.max("o_key").alias("max_key"),
        )
    )


ORDERS_COW_STRING_SQL = """
WITH mx AS (SELECT max(o_orderkey) AS mk FROM orders),
state AS (
    SELECT 'K' || lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS o_key,
           CASE WHEN o_orderkey % 31 = 0
                 AND o_orderkey * 10 <= (SELECT mk FROM mx)
                THEN 'S' ELSE o_orderstatus END AS st,
           CAST(round(o_totalprice * 100) AS BIGINT)
             + CASE WHEN o_orderkey % 31 = 0
                     AND o_orderkey * 10 <= (SELECT mk FROM mx)
                    THEN 55555 ELSE 0 END AS cents
    FROM orders
)
SELECT st AS o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       min(o_key) AS min_key,
       max(o_key) AS max_key
FROM state
GROUP BY st
"""


_DV_SPEC = f"dv-orders|v1|23|8|{MANIFEST_FORMAT}"


def orders_dv_layout(spark: SparkSession, sf_dir: str) -> str:
    """Orders table with a merge-on-read DELETE of every 23rd key —
    the deletion-vector commit carries the file set unchanged (a
    scattered key set that copy-on-write would answer by rewriting
    every file). Cached per fixture content."""
    from time_series_prediction_spark.operators.cow import delete_keys_dv

    src = os.path.join(sf_dir, "orders.parquet")
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    st = fs.status(src)
    if st is None:
        raise FileNotFoundError(src)
    ident = f"{fs.qualified(src)}|{st[0]}|{st[1]}|{_DV_SPEC}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(root, f"orders_dv_{key}")
    def _build(tmp: str) -> None:
        data = os.path.join(tmp, "data")
        base = _orders_state(spark, sf_dir)
        init_table(
            spark, data, base, key="o_orderkey", n_files=8,
            keep_versions=_KEEP,
        )
        dead = base.select("o_orderkey").where("o_orderkey % 23 = 0")
        delete_keys_dv(
            spark, data, dead, key="o_orderkey", keep_versions=_KEEP
        )
        from time_series_prediction_spark.operators.manifest import (
            _resolve_base,
        )

        _reprefix_manifests(
            spark, manifest_root(data), _resolve_base(data, spark),
            os.path.join(path, "data"),
        )

    ensure_artifact(spark, path, ident, _build)
    return os.path.join(path, "data")


def orders_dv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read through the deletion vector: the scattered %23 delete is
    metadata-only (file set unchanged — asserted in tests), and the
    dv-aware committed read must equal the oracle's plain WHERE over
    raw orders."""
    data = orders_dv_layout(spark, sf_dir)
    return (
        read_committed(spark, data)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price_cents").cast("long").alias("total_cents"),
        )
    )


ORDERS_DV_SCAN_SQL = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
WHERE o_orderkey % 23 <> 0
GROUP BY o_orderstatus
"""


_CDC_SPEC = f"cdc-orders|v1|13|19|8|{MANIFEST_FORMAT}"


def orders_cdc_stream_layout(spark: SparkSession, sf_dir: str) -> str:
    """A FULL change stream (updates + deletes) applied micro-batch by
    micro-batch through ``cdc_apply_sink``: every %13 key is updated
    (+100000 cents, status 'R'), every %19-but-not-%13 key deleted —
    the delete halves land as deletion-vector commits (no rewrite).
    Key sets are disjoint, so the final state is independent of how
    the feed batches. Cached per fixture content."""
    from time_series_prediction_spark.streaming.upsert import (
        cdc_apply_sink,
    )

    src = os.path.join(sf_dir, "orders.parquet")
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    st = fs.status(src)
    if st is None:
        raise FileNotFoundError(src)
    ident = f"{fs.qualified(src)}|{st[0]}|{st[1]}|{_CDC_SPEC}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(root, f"orders_cdc_{key}")
    def _build(tmp: str) -> None:
        data = os.path.join(tmp, "data")
        base = _orders_state(spark, sf_dir)
        init_table(
            spark, data, base, key="o_orderkey", n_files=8,
            keep_versions=_KEEP,
        )
        ups = base.where("o_orderkey % 13 = 0").select(
            "o_orderkey",
            "o_custkey",
            F.lit("R").alias("o_orderstatus"),
            (F.col("price_cents") + F.lit(100_000)).alias("price_cents"),
            "o_orderpriority",
            F.lit("U").alias("op"),
        )
        dels = base.where(
            "o_orderkey % 19 = 0 AND o_orderkey % 13 <> 0"
        ).select(
            "o_orderkey",
            F.lit(None).cast("long").alias("o_custkey"),
            F.lit(None).cast("string").alias("o_orderstatus"),
            F.lit(None).cast("long").alias("price_cents"),
            F.lit(None).cast("string").alias("o_orderpriority"),
            F.lit("D").alias("op"),
        )
        feed = ups.unionByName(dels)
        inbox = os.path.join(tmp, "_inbox")
        feed.repartition(3).write.mode("overwrite").parquet(inbox)
        sink = cdc_apply_sink(
            data, key="o_orderkey", n_files=4, keep_versions=_KEEP
        )
        stream = (
            spark.readStream.schema(feed.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(inbox)
        )
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", os.path.join(tmp, "_ck"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        from time_series_prediction_spark.operators.manifest import (
            _resolve_base,
        )

        _reprefix_manifests(
            spark, manifest_root(data), _resolve_base(data, spark),
            os.path.join(path, "data"),
        )

    ensure_artifact(spark, path, ident, _build)
    return os.path.join(path, "data")


def orders_cdc_ingest_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final state after the full mixed-op change stream — must equal
    the batch truth however the feed happened to micro-batch, with
    deletes visible only through the deletion vectors."""
    data = orders_cdc_stream_layout(spark, sf_dir)
    return (
        read_committed(spark, data)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price_cents").cast("long").alias("total_cents"),
        )
    )


ORDERS_CDC_INGEST_SQL = """
WITH state AS (
    SELECT o_orderkey AS k,
           CASE WHEN o_orderkey % 13 = 0 THEN 'R'
                ELSE o_orderstatus END AS st,
           CAST(round(o_totalprice * 100) AS BIGINT)
             + CASE WHEN o_orderkey % 13 = 0 THEN 100000 ELSE 0 END AS cents
    FROM orders
)
SELECT st AS o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS total_cents
FROM state
WHERE NOT (k % 19 = 0 AND k % 13 <> 0)
GROUP BY st
"""


_DELTA_DV_SPEC = "delta-orders-dv|v1|29|del-19band|native-dv"


def orders_delta_dv_layout(spark: SparkSession, sf_dir: str) -> str:
    """Native-log Delta table taking TWO protocol deletion-vector
    DELETEs (``sources/deltalog.delta_delete``): %29 keys everywhere,
    then a partition-predicate delete on one status. No data file is
    rewritten — the deletes live as roaring-bitmap sidecars referenced
    by the re-committed adds (protocol v3 upgrade), and the
    spec-pinned reader anti-joins row positions. Cached per fixture
    content."""
    from time_series_prediction_spark.sources.deltalog import (
        delta_delete,
        write_delta_log,
    )

    src = os.path.join(sf_dir, "orders.parquet")
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    st = fs.status(src)
    if st is None:
        raise FileNotFoundError(src)
    ident = f"{fs.qualified(src)}|{st[0]}|{st[1]}|{_DELTA_DV_SPEC}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(root, f"orders_deltadv_{key}")

    def _build(tmp: str) -> None:
        data = os.path.join(tmp, "data")
        base = _orders_state(spark, sf_dir)
        write_delta_log(
            base, data, mode="overwrite",
            partition_cols=["o_orderstatus"],
        )
        delta_delete(spark, data, "o_orderkey % 29 = 0")
        # partition-column predicate: 'P' rows in the %19 key band
        delta_delete(
            spark, data,
            "o_orderstatus = 'P' AND o_orderkey % 19 = 0",
        )

    ensure_artifact(spark, path, ident, _build)
    return os.path.join(path, "data")


def orders_delta_dv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan through the deletion vectors: the two DV deletes must
    equal the oracle's plain WHERE over raw orders — no rewrite
    happened, only bitmap sidecars."""
    from time_series_prediction_spark.sources.io import read_delta

    data = orders_delta_dv_layout(spark, sf_dir)
    return (
        read_delta(spark, data)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price_cents").cast("long").alias("total_cents"),
        )
    )


ORDERS_DELTA_DV_SQL = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
WHERE o_orderkey % 29 <> 0
  AND NOT (o_orderstatus = 'P' AND o_orderkey % 19 = 0)
GROUP BY o_orderstatus
"""


def orders_delta_cdf_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed over the native Delta log
    (``sources/deltalog.delta_changes_feed`` — round-10): the typed
    change rows between the initial write (v0) and the head, across
    the two deletion-vector DELETEs. Snapshot algebra emits each
    deleted row ONCE (the second delete's DV growth excludes rows the
    first already killed), all typed 'delete' — there are no inserts
    in the window. Shares ``orders_delta_dv_layout`` with
    ``orders_delta_dv_scan`` (fixture amortization); the oracle
    recomputes the union of the two delete predicates over raw
    orders."""
    from time_series_prediction_spark.sources.deltalog import (
        delta_changes_feed,
    )

    data = orders_delta_dv_layout(spark, sf_dir)
    feed, _v = delta_changes_feed(spark, data, 0)
    return (
        feed.groupBy(
            F.col("_change_type").alias("change_type"), "o_orderstatus"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("price_cents").cast("long").alias("total_cents"),
        )
    )


def orders_delta_pyds_cdf_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Change-data-feed through the PYTHON data source (r14 —
    ``spark.read.format('tspdelta').option('readChangeFeed','true')``):
    the SAME DV layout and window as ``orders_delta_cdf_scan``, so
    the two paths share one oracle — the DS reader's snapshot-algebra
    diff (``delta_datasource._cdf_partitions``) must emit exactly the
    rows ``deltalog.delta_changes_feed`` emits: each DV-killed row
    once, typed 'delete', no inserts in the window."""
    from time_series_prediction_spark.sources.delta_datasource import (
        register_tspdelta,
    )

    data = orders_delta_dv_layout(spark, sf_dir)
    register_tspdelta(spark)
    return (
        spark.read.format("tspdelta")
        .option("readChangeFeed", "true")
        .option("startingVersion", "0").load(data)
        .groupBy(
            F.col("_change_type").alias("change_type"), "o_orderstatus"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("price_cents").cast("long").alias("total_cents"),
        )
    )


ORDERS_DELTA_CDF_SQL = """
SELECT 'delete' AS change_type,
       o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
WHERE o_orderkey % 29 = 0
   OR (o_orderstatus = 'P' AND o_orderkey % 19 = 0)
GROUP BY o_orderstatus
"""


_DELTA_STATS_SPEC = "delta-orders-stats|v1|range8|prune"
_PRUNE_LO, _PRUNE_HI = 100_000, 300_000


def orders_delta_pruned_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Protocol data skipping (``add.stats`` min/max, recorded at
    commit time from footer metadata): a key-range query over a
    range-clustered native Delta table plans a scan over ONLY the
    files whose stats admit the range (``read_delta_pruned``) — the
    log-level counterpart of the CoW manifest pruning. The exact
    WHERE applies on top; the oracle recomputes over raw orders."""
    from time_series_prediction_spark.sources.deltalog import (
        read_delta_pruned,
        write_delta_log,
    )

    src = os.path.join(sf_dir, "orders.parquet")
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    st = fs.status(src)
    if st is None:
        raise FileNotFoundError(src)
    ident = f"{fs.qualified(src)}|{st[0]}|{st[1]}|{_DELTA_STATS_SPEC}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(root, f"orders_deltastats_{key}")

    def _build(tmp: str) -> None:
        data = os.path.join(tmp, "data")
        write_delta_log(
            _orders_state(spark, sf_dir).repartitionByRange(
                8, "o_orderkey"
            ),
            data, mode="overwrite",
        )

    ensure_artifact(spark, path, ident, _build)
    data = os.path.join(path, "data")
    pruned = read_delta_pruned(
        spark, data, {"o_orderkey": (_PRUNE_LO, _PRUNE_HI)}
    )
    return (
        pruned.where(
            f"o_orderkey BETWEEN {_PRUNE_LO} AND {_PRUNE_HI}"
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price_cents").cast("long").alias("total_cents"),
        )
    )


ORDERS_DELTA_PRUNED_SQL = f"""
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
WHERE o_orderkey BETWEEN {_PRUNE_LO} AND {_PRUNE_HI}
GROUP BY o_orderstatus
"""


def orders_delta_clone_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shallow clone of the DV-bearing Delta table
    (``sources/deltalog.delta_clone`` — metadata-only, zero bytes
    copied), diverged by one more DELETE in the clone (%31 keys): the
    clone must serve the source's two DV deletes PLUS its own, while
    ``orders_delta_dv_scan`` keeps reading the untouched source from
    the same shared fixture."""
    from time_series_prediction_spark.sources.deltalog import (
        delta_clone,
        delta_delete,
    )
    from time_series_prediction_spark.sources.io import read_delta

    src_data = orders_delta_dv_layout(spark, sf_dir)
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    ident = f"{src_data}|clone-v1|del-31"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(root, f"orders_deltaclone_{key}")

    def _build(tmp: str) -> None:
        data = os.path.join(tmp, "data")
        fs.mkdirs(tmp)
        delta_clone(spark, src_data, data)
        delta_delete(spark, data, "o_orderkey % 31 = 0")

    ensure_artifact(spark, path, ident, _build)
    return (
        read_delta(spark, os.path.join(path, "data"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price_cents").cast("long").alias("total_cents"),
        )
    )


ORDERS_DELTA_CLONE_SQL = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
WHERE o_orderkey % 29 <> 0
  AND NOT (o_orderstatus = 'P' AND o_orderkey % 19 = 0)
  AND o_orderkey % 31 <> 0
GROUP BY o_orderstatus
"""


_DELTA_MERGE_SPEC = "delta-orders-merge|v1|23bump|101shift|restore0"
_MERGE_SHIFT = 100_000_000


def orders_delta_merge_layout(spark: SparkSession, sf_dir: str) -> str:
    """Native-log Delta table exercising MERGE + RESTORE
    (``sources/deltalog.delta_merge`` / ``delta_restore``): v0 = the
    orders state, v1 = ONE merge commit (updates bump %23 keys'
    price by 77777 cents — hidden by deletion vectors; inserts append
    %101 keys shifted past the key domain), v2 = RESTORE back to v0.
    One fixture serves BOTH registry queries: the merge scan reads
    VERSION AS OF 1, the restore scan reads the head (fixture
    amortization, the round-10 pattern)."""
    from time_series_prediction_spark.sources.deltalog import (
        delta_merge,
        delta_restore,
        write_delta_log,
    )

    src = os.path.join(sf_dir, "orders.parquet")
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    st = fs.status(src)
    if st is None:
        raise FileNotFoundError(src)
    ident = f"{fs.qualified(src)}|{st[0]}|{st[1]}|{_DELTA_MERGE_SPEC}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(root, f"orders_deltamerge_{key}")

    def _build(tmp: str) -> None:
        data = os.path.join(tmp, "data")
        base = _orders_state(spark, sf_dir)
        write_delta_log(
            base, data, mode="overwrite",
            partition_cols=["o_orderstatus"],
        )
        upd = base.where("o_orderkey % 23 = 0").withColumn(
            "price_cents", F.expr("price_cents + 77777")
        )
        ins = base.where("o_orderkey % 101 = 0").withColumn(
            "o_orderkey", F.expr(f"o_orderkey + {_MERGE_SHIFT}")
        )
        delta_merge(
            spark, data, upd.unionByName(ins), key="o_orderkey"
        )
        delta_restore(spark, data, 0)

    ensure_artifact(spark, path, ident, _build)
    return os.path.join(path, "data")


def orders_delta_merge_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The post-MERGE snapshot via VERSION AS OF: updated rows carry
    the bumped cents exactly once (their old positions are
    deletion-vector-hidden, not rewritten), inserts appear, untouched
    rows survive; the key checksum pins row identity, not just
    counts."""
    from time_series_prediction_spark.sources.io import read_delta

    data = orders_delta_merge_layout(spark, sf_dir)
    return (
        read_delta(spark, data, version=1)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price_cents").cast("long").alias("total_cents"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )
    )


ORDERS_DELTA_MERGE_SQL = f"""
WITH base AS (
  SELECT o_orderkey AS k, o_orderstatus AS st,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
merged AS (
  SELECT k, st,
         CASE WHEN k % 23 = 0 THEN cents + 77777 ELSE cents END AS cents
  FROM base
  UNION ALL
  SELECT k + {_MERGE_SHIFT}, st, cents FROM base WHERE k % 101 = 0
)
SELECT st AS o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST(sum(k) AS BIGINT) AS key_sum
FROM merged
GROUP BY st
"""


def orders_delta_restore_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The RESTOREd head equals v0 exactly — the merge's DV hides and
    inserted files roll back in one commit while v1 stays readable
    (``orders_delta_merge_scan`` reads it from the same fixture)."""
    from time_series_prediction_spark.sources.io import read_delta

    data = orders_delta_merge_layout(spark, sf_dir)
    return (
        read_delta(spark, data)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price_cents").cast("long").alias("total_cents"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )
    )


ORDERS_DELTA_RESTORE_SQL = """
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum
FROM orders
GROUP BY o_orderstatus
"""


_DELTA_UPDATE_SPEC = "delta-orders-update|v1|13bump|37status"


def orders_delta_update_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Native-log Delta UPDATE (``sources/deltalog.delta_update`` —
    the DML triad's third leg beside DELETE and MERGE): v1 bumps %13
    keys' price by 11111 cents via deletion vectors + re-inserted
    images, v2 moves %37 keys to o_orderstatus 'X' — a PARTITION
    COLUMN update, so those rows migrate partition directories inside
    one commit. The head scan must show each updated row exactly once
    with both effects composed (%481 keys took both updates); the key
    checksum pins row identity."""
    from time_series_prediction_spark.sources.deltalog import (
        delta_update,
        write_delta_log,
    )
    from time_series_prediction_spark.sources.io import read_delta

    src = os.path.join(sf_dir, "orders.parquet")
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    st = fs.status(src)
    if st is None:
        raise FileNotFoundError(src)
    ident = f"{fs.qualified(src)}|{st[0]}|{st[1]}|{_DELTA_UPDATE_SPEC}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(root, f"orders_deltaupdate_{key}")

    def _build(tmp: str) -> None:
        data = os.path.join(tmp, "data")
        write_delta_log(
            _orders_state(spark, sf_dir), data, mode="overwrite",
            partition_cols=["o_orderstatus"],
        )
        delta_update(
            spark, data, "o_orderkey % 13 = 0",
            {"price_cents": "price_cents + 11111"},
        )
        delta_update(
            spark, data, "o_orderkey % 37 = 0",
            {"o_orderstatus": "'X'"},
        )

    ensure_artifact(spark, path, ident, _build)
    return (
        read_delta(spark, os.path.join(path, "data"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price_cents").cast("long").alias("total_cents"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )
    )


ORDERS_DELTA_UPDATE_SQL = """
WITH base AS (
  SELECT o_orderkey AS k, o_orderstatus AS st,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
upd AS (
  SELECT k,
         CASE WHEN k % 37 = 0 THEN 'X' ELSE st END AS st,
         CASE WHEN k % 13 = 0 THEN cents + 11111 ELSE cents END AS cents
  FROM base
)
SELECT st AS o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST(sum(k) AS BIGINT) AS key_sum
FROM upd
GROUP BY st
"""


_DELTA_ROWID_SPEC = "delta-orders-rowid|v1|3split|7del|optimize"


def orders_delta_rowid_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Protocol ROW TRACKING end to end
    (``sources/deltalog.delta_enable_row_tracking`` /
    ``read_delta_with_row_ids``): a table built from three
    key-sorted single-file commits (%3 split of the orders keys) gets
    row tracking enabled (backfill), a DV DELETE (%7 keys — survivors
    keep their ids), an OPTIMIZE (ids must survive the dataChange=
    false rewrite via the materialized columns), and a post-OPTIMIZE
    append (fresh ids above the advanced high-water mark). Because
    every commit lands ONE sorted file, the fresh-row-id arithmetic
    (baseRowId + row_index) is exactly reproducible relationally —
    the oracle derives every (key, row id, creating commit) from
    row_number() over the same key order."""
    from time_series_prediction_spark.sources.deltalog import (
        delta_delete,
        delta_enable_row_tracking,
        delta_optimize,
        read_delta_with_row_ids,
        write_delta_log,
    )

    src = os.path.join(sf_dir, "orders.parquet")
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    st = fs.status(src)
    if st is None:
        raise FileNotFoundError(src)
    ident = f"{fs.qualified(src)}|{st[0]}|{st[1]}|{_DELTA_ROWID_SPEC}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(root, f"orders_deltarowid_{key}")

    def _one_file(df: DataFrame) -> DataFrame:
        # one partition, key-sorted: file row order == key order, so
        # row ids are a pure function of the key sequence
        return df.repartition(1).sortWithinPartitions("o_orderkey")

    def _build(tmp: str) -> None:
        data = os.path.join(tmp, "data")
        base = _orders_state(spark, sf_dir).select(
            "o_orderkey", "price_cents"
        )
        write_delta_log(                                    # v0
            _one_file(base.where("o_orderkey % 3 = 0")),
            data, mode="overwrite",
        )
        delta_enable_row_tracking(spark, data)              # v1
        write_delta_log(                                    # v2
            _one_file(base.where("o_orderkey % 3 = 1")),
            data, mode="append",
        )
        delta_delete(spark, data, "o_orderkey % 7 = 0")     # v3
        # the oracle's id arithmetic hard-codes the DV-path DELETE
        # shape (survivors keep ids; watermark advances only at
        # OPTIMIZE) — fail the BUILD loudly if a scale change ever
        # pushes the %7 delete past max_dv_rows into a rewrite that
        # re-ids survivors, instead of letting the oracle drift
        import json as _json

        dfs = fs_for(spark, data)
        v3 = _json.loads(
            "["
            + ",".join(
                dfs.read_text(
                    os.path.join(
                        data, "_delta_log", f"{3:020d}.json"
                    )
                ).splitlines()
            )
            + "]"
        )
        v3_adds = [a["add"] for a in v3 if a.get("add")]
        if not v3_adds or any(
            a.get("deletionVector") is None for a in v3_adds
        ):
            raise AssertionError(
                "orders_delta_rowid_scan fixture: the %7 DELETE did "
                "not take the DV path (v3 adds lack deletionVector) "
                "— the oracle's row-id arithmetic would diverge"
            )
        delta_optimize(spark, data, target_files=1)         # v4
        write_delta_log(                                    # v5
            _one_file(base.where("o_orderkey % 3 = 2")),
            data, mode="append",
        )

    ensure_artifact(spark, path, ident, _build)
    return read_delta_with_row_ids(
        spark, os.path.join(path, "data")
    ).select(
        "o_orderkey",
        F.col("_row_id").cast("long").alias("row_id"),
        F.col("_row_commit_version").cast("long").alias(
            "row_commit_version"
        ),
    )


ORDERS_DELTA_ROWID_SQL = """
WITH base AS (SELECT o_orderkey AS k FROM orders),
g0 AS (
  SELECT k, row_number() OVER (ORDER BY k) - 1 AS r
  FROM base WHERE k % 3 = 0
),
g1 AS (
  SELECT k, row_number() OVER (ORDER BY k) - 1 AS r
  FROM base WHERE k % 3 = 1
),
g2 AS (
  SELECT k, row_number() OVER (ORDER BY k) - 1 AS r
  FROM base WHERE k % 3 = 2
),
n AS (
  SELECT (SELECT count(*) FROM g0) AS n0,
         (SELECT count(*) FROM g1) AS n1
),
-- backfill (commit 1) ids g0 by key order; the append (commit 2)
-- continues above it
first2 AS (
  SELECT k, r AS rid, 1 AS rcv FROM g0
  UNION ALL
  SELECT k, (SELECT n0 FROM n) + r, 2 FROM g1
),
-- the DV delete hides %7 keys; OPTIMIZE materializes the survivors'
-- ids verbatim but still advances the watermark by the compacted
-- file's row count
kept AS (SELECT * FROM first2 WHERE k % 7 != 0),
s AS (SELECT count(*) AS ns FROM kept)
SELECT k AS o_orderkey, CAST(rid AS BIGINT) AS row_id,
       CAST(rcv AS BIGINT) AS row_commit_version
FROM kept
UNION ALL
SELECT k,
       CAST((SELECT n0 + n1 FROM n) + (SELECT ns FROM s) + r AS BIGINT),
       CAST(5 AS BIGINT)
FROM g2
"""


_DELTA_CLUSTER_SPEC = "delta-orders-cluster|v1|4interleave|opt8"


def orders_delta_clustered_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Liquid clustering end to end
    (``sources/deltalog.delta_cluster_by`` + the clustered OPTIMIZE):
    four interleaved appends leave every file spanning the whole key
    range (stats prune nothing), CLUSTER BY o_orderkey records the
    delta.clustering domain, and a plain OPTIMIZE — no explicit
    zorder — re-clusters along it; the query then range-scans a 10%
    key slice through ``read_delta_pruned``, which after clustering
    touches a strict subset of files (pinned in
    test_liquid_clustering_metadata_and_optimize; the ORACLE checks
    values — stats skipping is a plan optimization, so the result
    must equal the plain relational filter)."""
    from time_series_prediction_spark.sources.deltalog import (
        delta_cluster_by,
        delta_optimize,
        read_delta_pruned,
        write_delta_log,
    )

    src = os.path.join(sf_dir, "orders.parquet")
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    st = fs.status(src)
    if st is None:
        raise FileNotFoundError(src)
    ident = f"{fs.qualified(src)}|{st[0]}|{st[1]}|{_DELTA_CLUSTER_SPEC}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(root, f"orders_deltacluster_{key}")

    def _build(tmp: str) -> None:
        data = os.path.join(tmp, "data")
        base = _orders_state(spark, sf_dir).select(
            "o_orderkey", "o_custkey", "price_cents"
        )
        for i in range(4):  # interleave: every file spans all keys
            write_delta_log(
                base.where(f"o_orderkey % 4 = {i}"), data,
                mode="overwrite" if i == 0 else "append",
            )
        delta_cluster_by(spark, data, ["o_orderkey"])
        delta_optimize(spark, data, target_files=8)

    ensure_artifact(spark, path, ident, _build)
    hi = 600_000  # sf-independent slice: orders keys start at 1
    pruned = read_delta_pruned(
        spark, os.path.join(path, "data"), {"o_orderkey": (1, hi)}
    )
    return (
        pruned.where(F.col("o_orderkey") <= hi)
        .groupBy((F.col("o_orderkey") % 10).alias("key_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price_cents").cast("long").alias("total_cents"),
            F.sum("o_custkey").cast("long").alias("cust_sum"),
        )
    )


ORDERS_DELTA_CLUSTERED_SQL = """
SELECT o_orderkey % 10 AS key_bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(sum(o_custkey) AS BIGINT) AS cust_sum
FROM orders
WHERE o_orderkey <= 600000
GROUP BY o_orderkey % 10
"""


_DELTA_ALTER_SPEC = "delta-orders-alter|v1|map|rename|dropadd"


def orders_delta_alter_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The ALTER TABLE column surface end to end
    (``delta_enable_column_mapping`` / ``delta_rename_column`` /
    ``delta_drop_column`` / ``delta_add_column`` — all
    metadata-only): the orders table gains column mapping, renames
    price_cents → cents (old files keep reading through the mapping),
    DROPS o_orderpriority (bytes stay in the files, projected away),
    re-ADDS a column under the SAME logical name (fresh physical name
    — the dropped values may never resurrect, so it reads all-null
    over old files), and appends a batch that fills it. The oracle is
    the straight relational statement of those semantics."""
    from time_series_prediction_spark.sources.deltalog import (
        delta_add_column,
        delta_drop_column,
        delta_enable_column_mapping,
        delta_rename_column,
        write_delta_log,
    )
    from time_series_prediction_spark.sources.io import read_delta

    src = os.path.join(sf_dir, "orders.parquet")
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    st = fs.status(src)
    if st is None:
        raise FileNotFoundError(src)
    ident = f"{fs.qualified(src)}|{st[0]}|{st[1]}|{_DELTA_ALTER_SPEC}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(root, f"orders_deltaalter_{key}")

    def _build(tmp: str) -> None:
        data = os.path.join(tmp, "data")
        base = _orders_state(spark, sf_dir).select(
            "o_orderkey", "price_cents", "o_orderpriority"
        )
        write_delta_log(base, data, mode="overwrite")
        delta_enable_column_mapping(spark, data)
        delta_rename_column(spark, data, "price_cents", "cents")
        delta_drop_column(spark, data, "o_orderpriority")
        delta_add_column(spark, data, "o_orderpriority", "string")
        write_delta_log(
            spark.createDataFrame(
                [(900000001, 1_00, "9-RESTATED"),
                 (900000002, 2_00, "9-RESTATED")],
                "o_orderkey long, cents long, o_orderpriority string",
            ),
            data, mode="append",
        )

    ensure_artifact(spark, path, ident, _build)
    return (
        read_delta(spark, os.path.join(path, "data"))
        .groupBy(
            F.coalesce(F.col("o_orderpriority"), F.lit("<dropped>"))
            .alias("priority"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("total_cents"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )
    )


def orders_delta_pyds_mapped_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Column-mapped tables through the PYTHON data source (r14 —
    ``delta_datasource._resolution_plan``): the SAME fully-ALTERed
    layout as ``orders_delta_alter_scan`` (mapping + rename + drop +
    same-name re-add + post-ALTER append), scanned via
    ``format('tspdelta')`` — each logical column resolves by parquet
    field id, then physical name, then partitionValues, exactly the
    JVM reader's precedence, so the two paths share one oracle. The
    re-added column reads all-null over pre-drop files (dropped
    values can never resurrect)."""
    from time_series_prediction_spark.sources.delta_datasource import (
        register_tspdelta,
    )

    # build (or reuse) the alter layout through its own query's path
    orders_delta_alter_scan(spark, sf_dir)
    src = os.path.join(sf_dir, "orders.parquet")
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    st = fs.status(src)
    ident = f"{fs.qualified(src)}|{st[0]}|{st[1]}|{_DELTA_ALTER_SPEC}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    data = os.path.join(root, f"orders_deltaalter_{key}", "data")
    register_tspdelta(spark)
    return (
        spark.read.format("tspdelta").load(data)
        .groupBy(
            F.coalesce(F.col("o_orderpriority"), F.lit("<dropped>"))
            .alias("priority"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("total_cents"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )
    )


ORDERS_DELTA_ALTER_SQL = """
WITH cur AS (
  -- the drop + same-name re-add nulls the column over old files
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(NULL AS VARCHAR) AS prio
  FROM orders
  UNION ALL
  SELECT 900000001, 100, '9-RESTATED'
  UNION ALL
  SELECT 900000002, 200, '9-RESTATED'
)
SELECT coalesce(prio, '<dropped>') AS priority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST(sum(k) AS BIGINT) AS key_sum
FROM cur
GROUP BY coalesce(prio, '<dropped>')
"""


_DELTA_REORG_SPEC = "delta-orders-reorg|v1|mapdrop|11dvdel|purge"


def orders_delta_reorg_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``REORG TABLE ... APPLY (PURGE)`` end to end
    (``sources/deltalog.delta_reorg_purge``): a row-tracked,
    column-mapped orders table DROPs o_orderpriority (metadata-only —
    the bytes stay in every pre-drop file), takes a DV DELETE (%11
    keys), appends a clean post-drop batch, then REORGs. The build
    asserts the PHYSICAL contract loudly — afterwards no live parquet
    footer carries the dropped physical column, no deletion vector
    survives, and the clean post-drop file kept its exact path —
    while the returned result is the table's logical content, which
    the oracle states relationally (drop = column gone, DV delete =
    rows gone, append = rows present)."""
    import pyarrow.parquet as _pq

    from time_series_prediction_spark.sources.deltalog import (
        delta_delete,
        delta_drop_column,
        delta_enable_column_mapping,
        delta_enable_row_tracking,
        delta_reorg_purge,
        delta_snapshot,
        write_delta_log,
    )
    from time_series_prediction_spark.sources.io import read_delta

    src = os.path.join(sf_dir, "orders.parquet")
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    st = fs.status(src)
    if st is None:
        raise FileNotFoundError(src)
    ident = f"{fs.qualified(src)}|{st[0]}|{st[1]}|{_DELTA_REORG_SPEC}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(root, f"orders_deltareorg_{key}")

    def _build(tmp: str) -> None:
        data = os.path.join(tmp, "data")
        base = _orders_state(spark, sf_dir).select(
            "o_orderkey", "price_cents", "o_orderpriority"
        )
        write_delta_log(base, data, mode="overwrite")
        delta_enable_row_tracking(spark, data)
        delta_enable_column_mapping(spark, data)
        delta_drop_column(spark, data, "o_orderpriority")
        delta_delete(spark, data, "o_orderkey % 11 = 0")
        write_delta_log(  # clean post-drop file: must survive REORG
            spark.createDataFrame(
                [(900000001, 1_00), (900000002, 2_00)],
                "o_orderkey long, price_cents long",
            ),
            data, mode="append",
        )
        files_pre, *_ = delta_snapshot(spark, data)
        clean_pre = {
            rel
            for rel, add in files_pre.items()
            if not add.get("deletionVector")
            and "o_orderpriority"
            not in _pq.ParquetFile(
                os.path.join(data, rel)
            ).schema_arrow.names
        }
        delta_reorg_purge(spark, data)
        files_post, *_ = delta_snapshot(spark, data)
        leftover = {
            rel
            for rel in files_post
            if any(
                n.split(".", 1)[0] == "o_orderpriority"
                for n in _pq.ParquetFile(
                    os.path.join(data, rel)
                ).schema_arrow.names
            )
        }
        if leftover:
            raise AssertionError(
                "REORG PURGE left dropped-column bytes in "
                f"{sorted(leftover)}"
            )
        if any(a.get("deletionVector") for a in files_post.values()):
            raise AssertionError("REORG PURGE left a deletion vector")
        if not clean_pre <= set(files_post):
            raise AssertionError(
                "REORG PURGE rewrote clean files it should have kept"
            )

    ensure_artifact(spark, path, ident, _build)
    return (
        read_delta(spark, os.path.join(path, "data"))
        .groupBy((F.col("o_orderkey") % 7).cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price_cents").cast("long").alias("total_cents"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )
    )


ORDERS_DELTA_REORG_SQL = """
WITH cur AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
  WHERE o_orderkey % 11 <> 0
  UNION ALL
  SELECT 900000001, 100
  UNION ALL
  SELECT 900000002, 200
)
SELECT CAST(k % 7 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST(sum(k) AS BIGINT) AS key_sum
FROM cur
GROUP BY k % 7
"""


_DELTA_CDC_SPEC = "delta-orders-cdc|v1|13bump|29del|41ins"
_CDC_INS_SHIFT = 200_000_000


def orders_delta_change_feed_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The PROTOCOL change-data feed (``delta_read_cdc`` over cdc
    files recorded by the DML writers — not the snapshot-algebra
    reconstruction ``orders_delta_cdf_scan`` checks): a CDF-enabled
    table takes one UPDATE (%13 keys' price + 33333), one DELETE
    (%29 keys), and one MERGE (updating %7 keys' price to a flat
    1000000 and inserting %41 keys shifted out of the key domain);
    the feed is rolled up per (change type, commit) with exact counts
    and cents — every pre/post image, delete, and insert accounted.

    Oracle: the same three change sets derived relationally from the
    orders source (each DML's matched set is a pure predicate over
    the base state, applied in commit order)."""
    from time_series_prediction_spark.sources.deltalog import (
        delta_delete,
        delta_merge,
        delta_read_cdc,
        delta_set_table_property,
        delta_update,
        write_delta_log,
    )

    src = os.path.join(sf_dir, "orders.parquet")
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    st = fs.status(src)
    if st is None:
        raise FileNotFoundError(src)
    ident = f"{fs.qualified(src)}|{st[0]}|{st[1]}|{_DELTA_CDC_SPEC}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(root, f"orders_deltacdc_{key}")

    def _build(tmp: str) -> None:
        data = os.path.join(tmp, "data")
        base = _orders_state(spark, sf_dir)
        write_delta_log(base, data, mode="overwrite")
        delta_set_table_property(
            spark, data, "delta.enableChangeDataFeed", "true"
        )
        delta_update(
            spark, data, "o_orderkey % 13 = 0",
            {"price_cents": "price_cents + 33333"},
        )
        delta_delete(spark, data, "o_orderkey % 29 = 0")
        upd = base.where("o_orderkey % 7 = 0").withColumn(
            "price_cents", F.expr("CAST(1000000 AS BIGINT)")
        )
        ins = base.where("o_orderkey % 41 = 0").withColumn(
            "o_orderkey", F.expr(f"o_orderkey + {_CDC_INS_SHIFT}")
        )
        delta_merge(spark, data, upd.unionByName(ins), key="o_orderkey")

    ensure_artifact(spark, path, ident, _build)
    feed, _latest = delta_read_cdc(spark, os.path.join(path, "data"), 1)
    return feed.groupBy(
        F.col("_change_type").alias("change_type"),
        F.col("_commit_version").alias("commit_version"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("price_cents").cast("long").alias("total_cents"),
        F.sum("o_orderkey").cast("long").alias("key_sum"),
    )


# commit 2 = UPDATE, 3 = DELETE, 4 = MERGE (0 write, 1 set property).
# The delete's matched set excludes nothing from the update (DVs hide
# nothing yet for %29 rows); the merge's matched %7 set EXCLUDES rows
# already deleted (%29) and sees the %13 bump where both divide.
ORDERS_DELTA_CDC_FEED_SQL = f"""
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
after_upd AS (
  SELECT k,
         CASE WHEN k % 13 = 0 THEN cents + 33333 ELSE cents END AS cents
  FROM base
),
changes AS (
  SELECT 'update_preimage' AS change_type, CAST(2 AS BIGINT) AS commit_version,
         k, cents FROM base WHERE k % 13 = 0
  UNION ALL
  SELECT 'update_postimage', 2, k, cents + 33333
  FROM base WHERE k % 13 = 0
  UNION ALL
  SELECT 'delete', 3, k, cents FROM after_upd WHERE k % 29 = 0
  UNION ALL
  SELECT 'update_preimage', 4, k, cents
  FROM after_upd WHERE k % 7 = 0 AND k % 29 <> 0
  UNION ALL
  SELECT 'update_postimage', 4, k, 1000000
  FROM after_upd WHERE k % 7 = 0 AND k % 29 <> 0
  UNION ALL
  SELECT 'insert', 4, k + {_CDC_INS_SHIFT}, cents
  FROM base WHERE k % 41 = 0
  UNION ALL
  -- merge keys whose rows were deleted in commit 3 match nothing
  -- live, so the upsert RE-INSERTS them at the merge price
  SELECT 'insert', 4, k, 1000000
  FROM base WHERE k % 7 = 0 AND k % 29 = 0
)
SELECT change_type, commit_version,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST(sum(k) AS BIGINT) AS key_sum
FROM changes
GROUP BY change_type, commit_version
"""


_DELTA_SPEC = "delta-orders|v1|3|101|native-log"


def orders_delta_layout(spark: SparkSession, sf_dir: str) -> str:
    """A NATIVE-log Delta table (sources/deltalog.py — protocol-1
    ``_delta_log``, no delta jars): v0 = all orders, v1 = OVERWRITE
    keeping only keys with ``o_orderkey % 3 != 0`` (the overwritten
    generation stays on disk, hidden by the log), v2 = APPEND of the
    %101 keys shifted into a fresh key range. Reading this correctly
    REQUIRES honoring the log — a raw parquet scan of the directory
    would double-count all three generations. Cached per fixture."""
    from time_series_prediction_spark.sources.deltalog import (
        write_delta_log,
    )

    src = os.path.join(sf_dir, "orders.parquet")
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    st = fs.status(src)
    if st is None:
        raise FileNotFoundError(src)
    ident = f"{fs.qualified(src)}|{st[0]}|{st[1]}|{_DELTA_SPEC}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(root, f"orders_delta_{key}")
    def _build(tmp: str) -> None:
        data = os.path.join(tmp, "data")
        base = _orders_state(spark, sf_dir)
        write_delta_log(base, data, mode="overwrite")
        write_delta_log(
            base.where("o_orderkey % 3 != 0"), data, mode="overwrite"
        )
        write_delta_log(
            base.where("o_orderkey % 101 = 0").withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(_INSERT_SHIFT)
            ),
            data,
            mode="append",
        )

    ensure_artifact(spark, path, ident, _build)
    return os.path.join(path, "data")


def orders_delta_log_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot scan through the native Delta log after
    overwrite + append: the oracle recomputes the same state from raw
    orders, so the comparison pins the log semantics (tombstoned
    generations excluded, appended files included) — the exact
    behavior the pre-r8 parquet fallback got wrong."""
    from time_series_prediction_spark.sources.io import read_delta

    data = orders_delta_layout(spark, sf_dir)
    return (
        read_delta(spark, data)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price_cents").cast("long").alias("total_cents"),
        )
    )


ORDERS_DELTA_LOG_SQL = f"""
WITH state AS (
    SELECT o_orderstatus AS st,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders WHERE o_orderkey % 3 <> 0
    UNION ALL
    SELECT o_orderstatus, CAST(round(o_totalprice * 100) AS BIGINT)
    FROM orders WHERE o_orderkey % 101 = 0
)
SELECT st AS o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS total_cents
FROM state
GROUP BY st
"""


_DELTA_STREAM_SPEC = "delta-events-stream|v1|3batch|replay"


def events_delta_stream_layout(spark: SparkSession, sf_dir: str) -> str:
    """Events streamed micro-batch by micro-batch into a NATIVE-log
    Delta table through the txn-idempotent sink — with one batch
    deliberately REPLAYED (the crash-recovery path Structured
    Streaming takes): the committed table must still equal the batch
    union, proving the protocol's (appId, version) tokens dedupe the
    replay. Cached per fixture content."""
    from time_series_prediction_spark.sources.deltalog import (
        delta_stream_sink,
    )

    src = os.path.join(sf_dir, "events.parquet")
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    st = fs.status(src)
    if st is None:
        raise FileNotFoundError(src)
    ident = f"{fs.qualified(src)}|{st[0]}|{st[1]}|{_DELTA_STREAM_SPEC}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(root, f"events_delta_{key}")
    def _build(tmp: str) -> None:
        data = os.path.join(tmp, "data")
        ev = read_table(spark, sf_dir, "events").select(
            "event_id",
            "user_id",
            "event_type",
            F.expr("CAST(round(value * 100) AS BIGINT)").alias(
                "value_cents"
            ),
        )
        sink = delta_stream_sink(data, app_id="tsps-events")
        batches = [
            ev.where(F.col("event_id") % 3 == i) for i in range(3)
        ]
        sink(batches[0], 0)
        sink(batches[1], 1)
        sink(batches[1], 1)  # crash replay — must be deduped via txn
        sink(batches[2], 2)

    ensure_artifact(spark, path, ident, _build)
    return os.path.join(path, "data")


def events_delta_stream_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan of the streamed native-Delta events table: must equal the
    plain batch aggregate over raw events however the feed batched —
    and despite the replayed micro-batch in the build."""
    from time_series_prediction_spark.sources.io import read_delta

    data = events_delta_stream_layout(spark, sf_dir)
    return (
        read_delta(spark, data)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("value_cents").cast("long").alias("total_cents"),
        )
    )


EVENTS_DELTA_STREAM_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM events
GROUP BY event_type
"""


_DELTA_TAIL_SPEC = "delta-events-tail|v2|4polls|fold|optimize|vacuum"


def events_delta_tail_layout(spark: SparkSession, sf_dir: str) -> str:
    """A consumer TAILING a native Delta table as it grows: four
    append batches land in the table, and after each the consumer
    polls ``delta_changes_since`` from its checkpointed version and
    folds the delivered rows into an accumulator. The accumulator's
    aggregate equals the raw truth ONLY if every appended row was
    delivered exactly once across the polls — the streaming-source
    contract. An idle poll (no new commits) must deliver nothing.
    Cached per fixture content."""
    from time_series_prediction_spark.sources.deltalog import (
        delta_changes_since,
        write_delta_log,
    )

    src = os.path.join(sf_dir, "events.parquet")
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    st = fs.status(src)
    if st is None:
        raise FileNotFoundError(src)
    ident = f"{fs.qualified(src)}|{st[0]}|{st[1]}|{_DELTA_TAIL_SPEC}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(root, f"events_dtail_{key}")

    def _build(tmp: str) -> None:
        from time_series_prediction_spark.sources.deltalog import (
            delta_optimize,
            delta_vacuum,
        )

        data = os.path.join(tmp, "data")
        acc = os.path.join(tmp, "acc")
        ev = read_table(spark, sf_dir, "events").select(
            "event_id",
            "user_id",
            "event_type",
            F.expr("CAST(round(value * 100) AS BIGINT)").alias(
                "value_cents"
            ),
        )
        last_v = -1
        for i in range(4):
            write_delta_log(
                ev.where(F.col("event_id") % 4 == i), data,
                mode="append" if i else "overwrite",
            )
            delivered, last_v = delta_changes_since(spark, data, last_v)
            assert delivered is not None, f"poll {i} delivered nothing"
            delivered.write.mode("append").parquet(acc)
            # idle re-poll: nothing new may be delivered
            again, again_v = delta_changes_since(spark, data, last_v)
            assert again is None and again_v == last_v
        # maintenance pass (round-10): compact the 4 append
        # generations (dataChange=false — the checkpointed tail polls
        # straight through it) and reclaim the superseded bytes;
        # events_delta_table_scan then proves the optimized+vacuumed
        # table still answers exactly
        opt_v = delta_optimize(spark, data, target_files=2)
        again, again_v = delta_changes_since(spark, data, last_v)
        assert again is None and again_v == opt_v, (
            "a pure compaction must deliver nothing to the tail"
        )
        delta_vacuum(spark, data, retention_ms=0)

    ensure_artifact(spark, path, ident, _build)
    return path


def events_delta_tail_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over the tail-fold accumulator: equality with the
    raw-events oracle proves exactly-once delivery across the four
    polls (a duplicate or a miss shifts the counts)."""
    path = events_delta_tail_layout(spark, sf_dir)
    return (
        spark.read.parquet(os.path.join(path, "acc"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("value_cents").cast("long").alias("total_cents"),
        )
    )


def events_delta_table_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan the streamed Delta table AFTER ``delta_optimize`` (the 4
    append generations bin-packed, dataChange=false) and
    ``delta_vacuum`` (superseded files reclaimed) — equality with the
    raw-events oracle proves the round-10 maintenance loop preserves
    the table exactly. Shares ``events_delta_tail_layout`` with
    ``events_delta_tail_scan`` (one fixture, two oracle-checked
    surfaces: the tail fold and the maintained table)."""
    from time_series_prediction_spark.sources.io import read_delta

    path = events_delta_tail_layout(spark, sf_dir)
    return (
        read_delta(spark, os.path.join(path, "data"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("value_cents").cast("long").alias("total_cents"),
        )
    )


EVENTS_DELTA_TAIL_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM events
GROUP BY event_type
"""


_DELTA_BOUNDED_TAIL_SPEC = "delta-events-btail|v1|4commit-backlog|v1f6"


def events_delta_bounded_tail_layout(
    spark: SparkSession, sf_dir: str
) -> str:
    """A consumer draining a pre-existing 4-commit BACKLOG under rate
    bounding (r13: ``delta_changes_since(max_versions_per_batch=1)``
    — the maxFilesPerTrigger discipline): all four commits land
    FIRST, then the consumer polls one-commit batches into an
    accumulator. The build asserts the drain took one poll per commit
    (never the whole backlog at once) and that a file-capped drain
    (max_files_per_batch) also completes with guaranteed progress;
    the accumulator equals raw truth only if the bounded batches
    delivered every row exactly once."""
    from time_series_prediction_spark.sources.deltalog import (
        delta_changes_since,
        write_delta_log,
    )

    src = os.path.join(sf_dir, "events.parquet")
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    st = fs.status(src)
    if st is None:
        raise FileNotFoundError(src)
    ident = f"{fs.qualified(src)}|{st[0]}|{st[1]}|{_DELTA_BOUNDED_TAIL_SPEC}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(root, f"events_dbtail_{key}")

    def _build(tmp: str) -> None:
        data = os.path.join(tmp, "data")
        acc = os.path.join(tmp, "acc")
        ev = read_table(spark, sf_dir, "events").select(
            "event_id",
            "user_id",
            "event_type",
            F.expr("CAST(round(value * 100) AS BIGINT)").alias(
                "value_cents"
            ),
        )
        for i in range(4):  # the backlog lands BEFORE any poll
            write_delta_log(
                ev.where(F.col("event_id") % 4 == i), data,
                mode="append" if i else "overwrite",
            )
        last_v, polls = -1, 0
        while True:
            delivered, nv = delta_changes_since(
                spark, data, last_v, max_versions_per_batch=1
            )
            if nv == last_v:
                break
            assert nv == last_v + 1, "bounded poll consumed >1 commit"
            assert delivered is not None
            delivered.write.mode("append").parquet(acc)
            last_v, polls = nv, polls + 1
        assert polls == 4, f"backlog drained in {polls} polls, not 4"
        # file-capped drain cross-check: same union, bounded windows,
        # guaranteed progress even when one commit exceeds the cap
        n_total = 0
        last_v = -1
        while True:
            d, nv = delta_changes_since(
                spark, data, last_v, max_files_per_batch=6
            )
            if nv == last_v:
                break
            assert nv > last_v
            if d is not None:
                n_total += d.count()
            last_v = nv
        want = spark.read.parquet(acc).count()
        assert n_total == want, (n_total, want)

    ensure_artifact(spark, path, ident, _build)
    return path


def events_delta_bounded_tail_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Aggregate over the rate-bounded drain's accumulator: equality
    with the raw-events oracle proves the bounded one-commit batches
    delivered the whole backlog exactly once (a duplicate or a miss
    shifts the counts)."""
    path = events_delta_bounded_tail_layout(spark, sf_dir)
    return (
        spark.read.parquet(os.path.join(path, "acc"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("value_cents").cast("long").alias("total_cents"),
        )
    )


_DELTA_PYDS_STREAM_SPEC = "delta-events-pyds-stream|v1|4commits|mv1"


def events_delta_pyds_stream_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The Python Data Source STREAMING path end to end
    (``spark.readStream.format('tspdelta')`` →
    ``writeStream.format('tspdelta')``): events lands as a 4-commit
    native Delta backlog; a bounded stream (maxVersionsPerBatch=1)
    drains it through Spark's own microbatch engine into a SECOND
    native-log table via the DS sink (txn-token exactly-once). The
    build asserts the drain took ≥4 data microbatches and the sink
    recorded the txn watermark; the result aggregates the SINK table
    — equal to the raw-events oracle only if every bounded batch
    delivered and landed exactly once."""
    from time_series_prediction_spark.sources.delta_datasource import (
        register_tspdelta,
    )
    from time_series_prediction_spark.sources.deltalog import (
        delta_snapshot,
        write_delta_log,
    )
    from time_series_prediction_spark.sources.io import read_delta

    src = os.path.join(sf_dir, "events.parquet")
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    st = fs.status(src)
    if st is None:
        raise FileNotFoundError(src)
    ident = f"{fs.qualified(src)}|{st[0]}|{st[1]}|{_DELTA_PYDS_STREAM_SPEC}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(root, f"events_pydstream_{key}")

    def _build(tmp: str) -> None:
        register_tspdelta(spark)
        data = os.path.join(tmp, "data")
        sink = os.path.join(tmp, "sink")
        ev = read_table(spark, sf_dir, "events").select(
            "event_id",
            "event_type",
            F.expr("CAST(round(value * 100) AS BIGINT)").alias(
                "value_cents"
            ),
        )
        for i in range(4):  # the backlog lands before the stream
            write_delta_log(
                ev.where(F.col("event_id") % 4 == i), data,
                mode="append" if i else "overwrite",
            )
        q = (
            spark.readStream.format("tspdelta")
            .option("maxVersionsPerBatch", "1").load(data)
            .writeStream.format("tspdelta")
            .option("checkpointLocation", os.path.join(tmp, "ck"))
            .start(sink)
        )
        q.processAllAvailable()
        q.stop()
        n_data_batches = len(
            [p for p in q.recentProgress if p["numInputRows"] > 0]
        )
        if n_data_batches < 4:
            raise AssertionError(
                f"bounded drain took {n_data_batches} data batches, "
                "expected one per backlog commit (>=4)"
            )
        _f, _m, _v, txns, _p = delta_snapshot(spark, sink)
        if txns.get("tspdelta-sink", -1) < 3:
            raise AssertionError(
                f"sink txn watermark {txns} never reached batch 3"
            )

    ensure_artifact(spark, path, ident, _build)
    return (
        read_delta(spark, os.path.join(path, "sink"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("value_cents").cast("long").alias("total_cents"),
        )
    )


_DELTA_CONVERT_SPEC = "delta-orders-convert|v1|hive-part|19dvdel|append"


def _orders_convert_layout(spark: SparkSession, sf_dir: str) -> str:
    """Shared fixture for the CONVERT family: orders as plain
    Hive-partitioned parquet → in-place CONVERT TO DELTA → DV DELETE
    (%19) → append. Build asserts zero data movement and v0 time
    travel. Returns the table's data dir."""
    from time_series_prediction_spark.sources.deltalog import (
        delta_convert_to_delta,
        delta_delete,
        read_delta_log,
        write_delta_log,
    )

    src = os.path.join(sf_dir, "orders.parquet")
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    st = fs.status(src)
    if st is None:
        raise FileNotFoundError(src)
    ident = f"{fs.qualified(src)}|{st[0]}|{st[1]}|{_DELTA_CONVERT_SPEC}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(root, f"orders_deltaconv_{key}")

    def _build(tmp: str) -> None:
        data = os.path.join(tmp, "data")
        base = _orders_state(spark, sf_dir).select(
            "o_orderkey",
            (F.col("o_orderkey") % 4).cast("long").alias("bucket"),
            "price_cents",
        )
        base.write.partitionBy("bucket").parquet(data)

        def _files() -> set[str]:
            out = set()
            for r, _d, names in os.walk(data):
                if "_delta_log" in r:
                    continue
                out.update(
                    os.path.join(r, n)
                    for n in names
                    if n.endswith(".parquet") and not n.startswith(".")
                )
            return out

        pre = _files()
        n_pre = base.count()
        delta_convert_to_delta(spark, data)
        if _files() != pre:
            raise AssertionError("CONVERT moved or rewrote data files")
        delta_delete(spark, data, "o_orderkey % 19 = 0")
        write_delta_log(
            spark.createDataFrame(
                [(900000001, 1, 1_00), (900000002, 2, 2_00)],
                "o_orderkey long, bucket long, price_cents long",
            ),
            data, mode="append", partition_cols=["bucket"],
        )
        if read_delta_log(spark, data, version=0).count() != n_pre:
            raise AssertionError("v0 (pre-conversion) state drifted")

    ensure_artifact(spark, path, ident, _build)
    return os.path.join(path, "data")


def orders_delta_convert_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``CONVERT TO DELTA`` end to end
    (``sources/deltalog.delta_convert_to_delta``): orders lands as a
    PLAIN Hive-partitioned parquet directory (partitioned by
    o_orderkey % 4), converts in place — the build asserts zero data
    movement (identical file set before/after) — then lives a Delta
    life: a DV DELETE (%19 keys) and an append. The oracle states the
    final logical content relationally; time travel to v0 still
    serves the pre-conversion state (asserted in the build)."""
    from time_series_prediction_spark.sources.io import read_delta

    data = _orders_convert_layout(spark, sf_dir)
    return (
        read_delta(spark, data)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price_cents").cast("long").alias("total_cents"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )
    )


def orders_delta_pyds_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The PySpark-4 PYTHON DATA SOURCE read path
    (``sources/delta_datasource.TspDeltaDataSource`` —
    ``spark.read.format('tspdelta')``): the same converted DV-bearing
    table as ``orders_delta_convert_scan``, scanned through Spark's
    own format API (log replay in the data-source worker with
    pyarrow, per-file executor partitions, DV masks, typed partition
    columns, arrow-batch handoff). Same oracle as the JVM-side read —
    the two paths must agree bit-for-bit."""
    from time_series_prediction_spark.sources.delta_datasource import (
        register_tspdelta,
    )

    data = _orders_convert_layout(spark, sf_dir)
    register_tspdelta(spark)
    return (
        spark.read.format("tspdelta").load(data)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price_cents").cast("long").alias("total_cents"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )
    )


def orders_delta_pyds_timetravel_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """VERSION AS OF through the Python DS (r14 —
    ``.option('versionAsOf', 0)``): the converted table's v0 is the
    PRE-DML state (CONVERT referenced every original file verbatim;
    the DV DELETE and append came later), so the pinned replay must
    serve the untouched original content — the oracle states it
    straight off raw orders. Shares ``_orders_convert_layout``."""
    from time_series_prediction_spark.sources.delta_datasource import (
        register_tspdelta,
    )

    data = _orders_convert_layout(spark, sf_dir)
    register_tspdelta(spark)
    return (
        spark.read.format("tspdelta")
        .option("versionAsOf", "0").load(data)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price_cents").cast("long").alias("total_cents"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )
    )


ORDERS_DELTA_PYDS_TT_SQL = """
SELECT CAST(o_orderkey % 4 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum
FROM orders
GROUP BY o_orderkey % 4
"""


ORDERS_DELTA_CONVERT_SQL = """
WITH cur AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
  WHERE o_orderkey % 19 <> 0
  UNION ALL
  SELECT 900000001, 100
  UNION ALL
  SELECT 900000002, 200
)
SELECT CAST(k % 4 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST(sum(k) AS BIGINT) AS key_sum
FROM cur
GROUP BY k % 4
"""


def orders_delta_pyds_pruned_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The Python Data Source's LOAD-TIME pruning path (r13 VERDICT
    Next #1, ``delta_datasource._parse_prune``): the converted
    DV-bearing table read through ``format('tspdelta')`` with
    ``.option('prune', 'bucket = 1 AND o_orderkey < 900000000')`` —
    the Hive partition value skips 3 of 4 bucket directories at
    ``partitions()`` time and the stats range skips the post-convert
    append file, so the scan opens only bucket-1's original files.
    Pruning is an I/O hint with partition-pruning semantics, so the
    matching ``.where()`` stays on (rows of surviving files all
    flow); because each option set is a DISTINCT DSv2 relation, the
    pruned scan can never be reused by sibling unpruned plans — the
    measured Spark 4.1.2 pushFilters hazard does not apply."""
    from time_series_prediction_spark.sources.delta_datasource import (
        register_tspdelta,
    )

    data = _orders_convert_layout(spark, sf_dir)
    register_tspdelta(spark)
    return (
        spark.read.format("tspdelta")
        .option("prune", "bucket = 1 AND o_orderkey < 900000000")
        .load(data)
        .where("bucket = 1 AND o_orderkey < 900000000")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price_cents").cast("long").alias("total_cents"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )
    )


ORDERS_DELTA_PYDS_PRUNED_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum
FROM orders
WHERE o_orderkey % 19 <> 0
  AND o_orderkey % 4 = 1
  AND o_orderkey < 900000000
"""


_DELTA_INCR_SPEC = "delta-orders-incr|v1|cluster-bucket-key|2ticks"


def orders_delta_incremental_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Liquid clustering's INCREMENTAL maintenance loop end to end
    (r13 ``delta_optimize_incremental`` with the multi-column overlap
    test + ZCube exemption): a row-tracked table clustered on
    (bucket, o_orderkey) — a LOW-CARDINALITY leading key, the exact
    case where leading-key-only overlap degenerates to rewrite-all —
    takes a full OPTIMIZE, then two narrow key-range appends, each
    followed by an incremental tick. The build asserts the O(batch)
    contract loudly: settled files survive every tick, a repeat tick
    is a strict no-op, and row ids stay unique throughout. The result
    is the table's logical per-bucket rollup, stated relationally by
    the oracle."""
    from time_series_prediction_spark.sources.deltalog import (
        delta_cluster_by,
        delta_enable_row_tracking,
        delta_optimize,
        delta_optimize_incremental,
        delta_snapshot,
        read_delta_with_row_ids,
        write_delta_log,
    )
    from time_series_prediction_spark.sources.io import read_delta

    src = os.path.join(sf_dir, "orders.parquet")
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    st = fs.status(src)
    if st is None:
        raise FileNotFoundError(src)
    ident = f"{fs.qualified(src)}|{st[0]}|{st[1]}|{_DELTA_INCR_SPEC}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(root, f"orders_deltaincr_{key}")

    def _build(tmp: str) -> None:
        data = os.path.join(tmp, "data")
        base = _orders_state(spark, sf_dir).select(
            "o_orderkey",
            (F.col("o_orderkey") % 5).cast("long").alias("bucket"),
            "price_cents",
        )
        mk = base.agg(F.max("o_orderkey")).first()[0]
        write_delta_log(
            base.where("o_orderkey % 2 = 0"), data, mode="overwrite"
        )
        delta_enable_row_tracking(spark, data)
        delta_cluster_by(spark, data, ["bucket", "o_orderkey"])
        delta_optimize(spark, data, target_files=6)
        appends = [
            f"o_orderkey % 2 = 1 AND o_orderkey * 10 <= {mk}",
            f"o_orderkey % 2 = 1 AND o_orderkey * 10 > {mk} * 9",
        ]
        for pred in appends:
            files_before = set(delta_snapshot(spark, data)[0])
            write_delta_log(base.where(pred), data, mode="append")
            delta_optimize_incremental(spark, data, target_files=6)
            files_after, _m, v, _t, _p = delta_snapshot(spark, data)
            if not (files_before & set(files_after)):
                raise AssertionError(
                    "incremental tick rewrote every settled file — "
                    "the O(batch) contract is broken"
                )
            if delta_optimize_incremental(spark, data) != v:
                raise AssertionError(
                    "repeat incremental tick was not a no-op"
                )
        ids = [
            r["_row_id"]
            for r in read_delta_with_row_ids(spark, data)
            .select("_row_id").collect()
        ]
        if len(ids) != len(set(ids)):
            raise AssertionError("row ids not unique after ticks")

    ensure_artifact(spark, path, ident, _build)
    return (
        read_delta(spark, os.path.join(path, "data"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price_cents").cast("long").alias("total_cents"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )
    )


ORDERS_DELTA_INCR_SQL = """
WITH mx AS (SELECT max(o_orderkey) AS mk FROM orders),
cur AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
  WHERE o_orderkey % 2 = 0
     OR (o_orderkey % 2 = 1
         AND (o_orderkey * 10 <= (SELECT mk FROM mx)
              OR o_orderkey * 10 > (SELECT mk FROM mx) * 9))
)
SELECT CAST(k % 5 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST(sum(k) AS BIGINT) AS key_sum
FROM cur
GROUP BY k % 5
"""


_DELTA_PYDS_CONS_SPEC = "delta-orders-pyds-cons|v1|check+generated"


def orders_delta_pyds_constrained_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The Python-DS sink writing into an INVARIANT-BEARING table
    (r13 VERDICT Next #6, ``delta_datasource._enforce_batch``): a
    table with a CHECK constraint (price_cents >= 0) and a generated
    column (bucket = o_orderkey % 4) takes DS appends — the sink
    enforces the constraint and materializes the omitted generated
    column EXECUTOR-side per arrow batch (DuckDB over the task's
    batch, the same per-row cost shape as the JVM writer's
    enforcement scan). The build also asserts a violating batch
    refuses with the constraint named and lands nothing. The oracle
    states the final logical content relationally."""
    from time_series_prediction_spark.sources.delta_datasource import (
        register_tspdelta,
    )
    from time_series_prediction_spark.sources.deltalog import (
        delta_add_constraint,
        delta_set_generated_column,
        read_delta_log,
        write_delta_log,
    )
    from time_series_prediction_spark.sources.io import read_delta

    src = os.path.join(sf_dir, "orders.parquet")
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    st = fs.status(src)
    if st is None:
        raise FileNotFoundError(src)
    ident = (
        f"{fs.qualified(src)}|{st[0]}|{st[1]}|{_DELTA_PYDS_CONS_SPEC}"
    )
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(root, f"orders_pydscons_{key}")

    def _build(tmp: str) -> None:
        data = os.path.join(tmp, "data")
        register_tspdelta(spark)
        base = _orders_state(spark, sf_dir).select(
            "o_orderkey",
            "price_cents",
            (F.col("o_orderkey") % 4).cast("long").alias("bucket"),
        )
        write_delta_log(
            base.where("o_orderkey % 2 = 0"), data, mode="overwrite"
        )
        delta_add_constraint(spark, data, "price_pos",
                             "price_cents >= 0")
        delta_set_generated_column(
            spark, data, "bucket", "CAST(o_orderkey % 4 AS BIGINT)"
        )
        # DS append WITHOUT the generated column: materialized per
        # batch, constraint checked per batch
        base.where("o_orderkey % 2 = 1").drop("bucket").write.format(
            "tspdelta"
        ).mode("append").save(data)
        n = read_delta_log(spark, data).count()
        # a violating batch must refuse and land nothing
        try:
            spark.sql(
                "SELECT CAST(999999999 AS LONG) AS o_orderkey, "
                "CAST(-1 AS LONG) AS price_cents"
            ).write.format("tspdelta").mode("append").save(data)
            raise AssertionError(
                "DS sink accepted a CHECK-violating batch"
            )
        except AssertionError:
            raise
        except Exception:
            pass  # the refusal — expected
        if read_delta_log(spark, data).count() != n:
            raise AssertionError("violating batch landed rows")

    ensure_artifact(spark, path, ident, _build)
    return (
        read_delta(spark, os.path.join(path, "data"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price_cents").cast("long").alias("total_cents"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )
    )


ORDERS_DELTA_PYDS_CONS_SQL = """
SELECT CAST(o_orderkey % 4 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum
FROM orders
GROUP BY o_orderkey % 4
"""


_DELTA_PYDS_PART_SPEC = "delta-orders-pyds-part|v1|partitionBy5"


def orders_delta_pyds_partitioned_sink_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The Python-DS sink's PARTITIONED write path (r14 —
    ``delta_datasource._TspDeltaWriter.write``'s per-partition split):
    a new table created with ``.option('partitionBy', 'bucket')``
    through ``df.write.format('tspdelta')``, appended once more
    through the same sink — each task stages one file per partition
    tuple under the Hive rel path, partition values live in the path
    + add.partitionValues (never in the file's bytes), exactly the
    layout delta-spark writes. Read back through the JVM-side native
    reader; the oracle states the logical content relationally."""
    from time_series_prediction_spark.sources.delta_datasource import (
        register_tspdelta,
    )
    from time_series_prediction_spark.sources.io import read_delta

    src = os.path.join(sf_dir, "orders.parquet")
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    st = fs.status(src)
    if st is None:
        raise FileNotFoundError(src)
    ident = (
        f"{fs.qualified(src)}|{st[0]}|{st[1]}|{_DELTA_PYDS_PART_SPEC}"
    )
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(root, f"orders_pydspart_{key}")

    def _build(tmp: str) -> None:
        import pyarrow.parquet as pq

        from time_series_prediction_spark.sources.deltalog import (
            delta_snapshot,
        )

        data = os.path.join(tmp, "data")
        register_tspdelta(spark)
        base = _orders_state(spark, sf_dir).select(
            (F.col("o_orderkey") % 5).cast("long").alias("bucket"),
            "o_orderkey",
            "price_cents",
        )
        base.where("o_orderkey % 2 = 0").write.format(
            "tspdelta"
        ).option("partitionBy", "bucket").mode("append").save(data)
        base.where("o_orderkey % 2 = 1").write.format(
            "tspdelta"
        ).mode("append").save(data)
        files, meta, _v, _t, _p = delta_snapshot(spark, data)
        if meta["partitionColumns"] != ["bucket"]:
            raise AssertionError("partition layout not recorded")
        for rel in files:
            if not rel.startswith("bucket="):
                raise AssertionError(f"file outside partition dir: {rel}")
            names = pq.ParquetFile(
                os.path.join(data, rel)
            ).schema_arrow.names
            if "bucket" in names:
                raise AssertionError(
                    "partition column bytes landed in the data file"
                )

    ensure_artifact(spark, path, ident, _build)
    return (
        read_delta(spark, os.path.join(path, "data"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price_cents").cast("long").alias("total_cents"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )
    )


ORDERS_DELTA_PYDS_PART_SQL = """
SELECT CAST(o_orderkey % 5 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum
FROM orders
GROUP BY o_orderkey % 5
"""


_DELTA_PYDS_RT_SPEC = "delta-orders-pyds-rt|v1|hwm-append"


def orders_delta_pyds_rowtracked_sink_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The Python-DS sink appending to a ROW-TRACKED table (r14 —
    ``delta_datasource._attach_row_tracking_local``): fresh
    baseRowIds allocated SparkSession-free from the
    ``delta.rowTracking`` high-water-mark domain, committed
    atomically with the adds. The build asserts the invariants the
    oracle can't see — pre-existing rows keep their exact ids after
    the sink append, all ids unique, every live add carries a base —
    while the returned result is the table's logical content, stated
    relationally."""
    from time_series_prediction_spark.sources.delta_datasource import (
        register_tspdelta,
    )
    from time_series_prediction_spark.sources.deltalog import (
        delta_enable_row_tracking,
        read_delta_with_row_ids,
        write_delta_log,
    )
    from time_series_prediction_spark.sources.io import read_delta

    src = os.path.join(sf_dir, "orders.parquet")
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    st = fs.status(src)
    if st is None:
        raise FileNotFoundError(src)
    ident = f"{fs.qualified(src)}|{st[0]}|{st[1]}|{_DELTA_PYDS_RT_SPEC}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(root, f"orders_pydsrt_{key}")

    def _build(tmp: str) -> None:
        data = os.path.join(tmp, "data")
        register_tspdelta(spark)
        base = _orders_state(spark, sf_dir).select(
            "o_orderkey", "price_cents"
        )
        write_delta_log(
            base.where("o_orderkey % 2 = 0"), data, mode="overwrite"
        )
        delta_enable_row_tracking(spark, data)
        before = {
            r["o_orderkey"]: r["_row_id"]
            for r in read_delta_with_row_ids(spark, data).collect()
        }
        base.where("o_orderkey % 2 = 1").write.format(
            "tspdelta"
        ).mode("append").save(data)
        rows = read_delta_with_row_ids(spark, data).collect()
        after = {r["o_orderkey"]: r["_row_id"] for r in rows}
        for k, rid in before.items():
            if after[k] != rid:
                raise AssertionError(
                    "sink append disturbed an existing row id"
                )
        ids = [r["_row_id"] for r in rows]
        if len(ids) != len(set(ids)):
            raise AssertionError("duplicate row ids after DS append")

    ensure_artifact(spark, path, ident, _build)
    return (
        read_delta(spark, os.path.join(path, "data"))
        .groupBy(
            (F.col("o_orderkey") % 2).cast("long").alias("parity")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price_cents").cast("long").alias("total_cents"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )
    )


ORDERS_DELTA_PYDS_RT_SQL = """
SELECT CAST(o_orderkey % 2 AS BIGINT) AS parity,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum
FROM orders
GROUP BY o_orderkey % 2
"""


_DELTA_PART_INCR_SPEC = "delta-orders-part-incr|v1|part3-cluster-key"


def orders_delta_partitioned_incremental_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PER-PARTITION incremental OPTIMIZE (r13 VERDICT Next #2): a
    Hive-partitioned row-tracked table — the exact shape CONVERT TO
    DELTA leaves behind — clustered on o_orderkey, full-OPTIMIZEd,
    then appended into ONE partition at a time with an incremental
    tick after each. The build asserts the per-partition O(batch)
    contract loudly: every settled file in the UNTOUCHED partitions
    survives with its exact path (the old behavior routed partitioned
    tables to a full rewrite), a repeat tick is a strict no-op, and
    row ids stay unique. The oracle states the final logical content
    relationally."""
    from time_series_prediction_spark.sources.deltalog import (
        delta_cluster_by,
        delta_enable_row_tracking,
        delta_optimize,
        delta_optimize_incremental,
        delta_snapshot,
        read_delta_with_row_ids,
        write_delta_log,
    )
    from time_series_prediction_spark.sources.io import read_delta

    src = os.path.join(sf_dir, "orders.parquet")
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    st = fs.status(src)
    if st is None:
        raise FileNotFoundError(src)
    ident = (
        f"{fs.qualified(src)}|{st[0]}|{st[1]}|{_DELTA_PART_INCR_SPEC}"
    )
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(root, f"orders_deltapincr_{key}")

    def _build(tmp: str) -> None:
        data = os.path.join(tmp, "data")
        base = _orders_state(spark, sf_dir).select(
            (F.col("o_orderkey") % 3).cast("long").alias("pbucket"),
            "o_orderkey",
            "price_cents",
        )
        mk = base.agg(F.max("o_orderkey")).first()[0]
        write_delta_log(
            base.where("o_orderkey % 2 = 0"), data,
            mode="overwrite", partition_cols=["pbucket"],
        )
        delta_enable_row_tracking(spark, data)
        delta_cluster_by(spark, data, ["o_orderkey"])
        delta_optimize(spark, data, target_files=4)
        # one append per tick, each into a SINGLE partition
        appends = [
            (1, f"o_orderkey % 2 = 1 AND o_orderkey % 3 = 1 "
                f"AND o_orderkey * 10 <= {mk}"),
            (2, f"o_orderkey % 2 = 1 AND o_orderkey % 3 = 2 "
                f"AND o_orderkey * 10 > {mk} * 9"),
        ]
        for pb, pred in appends:
            pre = set(delta_snapshot(spark, data)[0])
            other = {
                r for r in pre if not r.startswith(f"pbucket={pb}/")
            }
            write_delta_log(
                base.where(pred), data, mode="append",
                partition_cols=["pbucket"],
            )
            delta_optimize_incremental(spark, data, target_files=4)
            files_after, _m, v, _t, _p = delta_snapshot(spark, data)
            if not other <= set(files_after):
                raise AssertionError(
                    "incremental tick rewrote settled files in an "
                    "UNTOUCHED partition — the per-partition O(batch) "
                    "contract is broken"
                )
            if delta_optimize_incremental(spark, data) != v:
                raise AssertionError(
                    "repeat incremental tick was not a no-op"
                )
        ids = [
            r["_row_id"]
            for r in read_delta_with_row_ids(spark, data)
            .select("_row_id").collect()
        ]
        if len(ids) != len(set(ids)):
            raise AssertionError("row ids not unique after ticks")

    ensure_artifact(spark, path, ident, _build)
    return (
        read_delta(spark, os.path.join(path, "data"))
        .groupBy("pbucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price_cents").cast("long").alias("total_cents"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
        )
    )


ORDERS_DELTA_PART_INCR_SQL = """
WITH mx AS (SELECT max(o_orderkey) AS mk FROM orders),
cur AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
  WHERE o_orderkey % 2 = 0
     OR (o_orderkey % 2 = 1 AND o_orderkey % 3 = 1
         AND o_orderkey * 10 <= (SELECT mk FROM mx))
     OR (o_orderkey % 2 = 1 AND o_orderkey % 3 = 2
         AND o_orderkey * 10 > (SELECT mk FROM mx) * 9)
)
SELECT CAST(k % 3 AS BIGINT) AS pbucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST(sum(k) AS BIGINT) AS key_sum
FROM cur
GROUP BY k % 3
"""


_CLONE_SPEC = "cow-clone|v1|restore-to-1"


def orders_cow_restored_layout(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str]:
    """SHALLOW CLONE of the cached three-commit cow table, then
    RESTORE the clone to v1 — both metadata-only (clone copies the
    tiny manifest versions and references the source's data files in
    place; restore commits v3 whose manifest is v1's verbatim). The
    source layout is content-keyed and never vacuumed, so the Delta
    shallow-clone caveat (source vacuum orphaning shared files)
    cannot bite here. Cached under the same build-lock /
    atomic-publish protocol as every layout; no path re-prefixing is
    needed because the clone's manifests only ever reference the
    SOURCE's (stable, content-keyed) file paths. Returns
    (data_dir, manifest_root) of the clone."""
    from time_series_prediction_spark.operators.cow import (
        clone_table,
        restore_table,
    )

    src_data = orders_cow_layout(spark, sf_dir)
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    ident = f"{fs.qualified(src_data)}|{_CLONE_SPEC}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(root, f"orders_cow_clone_{key}")
    def _build(tmp: str) -> None:
        meta_tmp = os.path.join(tmp, "meta")
        clone_table(spark, src_data, meta_tmp)
        restore_table(
            spark, os.path.join(tmp, "data"), 1, root=meta_tmp,
            keep_versions=_KEEP,
        )

    ensure_artifact(spark, path, ident, _build)
    return os.path.join(path, "data"), os.path.join(path, "meta")


def orders_cow_restore_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current state of the restored clone == the v1 snapshot (merge
    applied, the v2 purge rolled back) — proving RESTORE moved the
    head without rewriting a file and without touching the source
    table. The oracle recomputes the v1 state from raw orders."""
    data, meta = orders_cow_restored_layout(spark, sf_dir)
    return (
        read_committed(spark, data, root=meta)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price_cents").cast("long").alias("total_cents"),
        )
    )


ORDERS_COW_RESTORE_SQL = f"""
WITH mx AS (SELECT max(o_orderkey) AS mk FROM orders),
state AS (
    SELECT o_orderpriority AS prio,
           CAST(round(o_totalprice * 100) AS BIGINT)
             + CASE WHEN o_orderkey % 13 = 0
                     AND o_orderkey * 10 <= (SELECT mk FROM mx)
                    THEN 100000 ELSE 0 END AS cents
    FROM orders
    UNION ALL
    SELECT '6-NEW', CAST(round(o_totalprice * 100) AS BIGINT)
    FROM orders WHERE o_orderkey % 101 = 0
)
SELECT prio AS o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS total_cents
FROM state
GROUP BY prio
"""


def orders_cow_restore_history(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DESCRIBE HISTORY of the restored clone: four versions — the
    three cloned commits plus the restore head, whose row count must
    equal v1's exactly (restore re-references v1's files; nothing is
    rewritten). Metadata only; the oracle recomputes every count from
    the mutation spec over raw orders."""
    from time_series_prediction_spark.operators.cow import table_history

    _, meta = orders_cow_restored_layout(spark, sf_dir)
    return table_history(spark, meta).select("version", "n_rows")


ORDERS_COW_RESTORE_HISTORY_SQL = f"""
WITH n0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders),
nins AS (
    SELECT CAST(count(*) AS BIGINT) AS n
    FROM orders WHERE o_orderkey % 101 = 0
),
nfinal AS (
    SELECT CAST(count(*) AS BIGINT) AS n FROM (
        SELECT o_orderkey AS k FROM orders
        UNION ALL
        SELECT o_orderkey + {_INSERT_SHIFT} FROM orders
        WHERE o_orderkey % 101 = 0
    ) WHERE k % 17 <> 0
)
SELECT CAST(0 AS BIGINT) AS version, (SELECT n FROM n0) AS n_rows
UNION ALL
SELECT 1, (SELECT n FROM n0) + (SELECT n FROM nins)
UNION ALL
SELECT 2, (SELECT n FROM nfinal)
UNION ALL
SELECT 3, (SELECT n FROM n0) + (SELECT n FROM nins)
"""


_EVO_SPEC = "cow-clone|evo-v1|97|777|backfill"


def orders_cow_evolved_layout(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str]:
    """SHALLOW CLONE of the cached cow table + a SCHEMA-EVOLVING
    MERGE on the clone: every current key ≡ 0 (mod 97) is updated
    (+777 cents) and gains a NEW ``channel`` column — pre-evolution
    files stay carried by reference and surface the column as null
    under a merge-schema read. Cached like every layout; the merge's
    new generation lands in the clone's own data dir (re-prefixed to
    the published location before the rename)."""
    from time_series_prediction_spark.operators.cow import clone_table
    from time_series_prediction_spark.operators.manifest import (
        _resolve_base,
    )

    src_data = orders_cow_layout(spark, sf_dir)
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    ident = f"{fs.qualified(src_data)}|{_EVO_SPEC}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(root, f"orders_cow_evo_{key}")
    def _build(tmp: str) -> None:
        meta_tmp = os.path.join(tmp, "meta")
        data_tmp = os.path.join(tmp, "data")
        clone_table(spark, src_data, meta_tmp)
        cur = read_committed(spark, data_tmp, root=meta_tmp)
        ups = cur.where("o_orderkey % 97 = 0").select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            (F.col("price_cents") + F.lit(777)).alias("price_cents"),
            "o_orderpriority",
            F.lit("backfill").alias("channel"),
        )
        merge_upsert(
            spark, data_tmp, ups, key="o_orderkey", root=meta_tmp,
            keep_versions=_KEEP, evolve_schema=True,
        )
        _reprefix_manifests(
            spark, meta_tmp, _resolve_base(data_tmp, spark),
            os.path.join(path, "data"),
        )

    ensure_artifact(spark, path, ident, _build)
    return os.path.join(path, "data"), os.path.join(path, "meta")


def orders_cow_schema_evolution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Merge-schema read of the evolved clone: updated rows carry the
    new ``channel`` column, pre-evolution files read it as null
    ('legacy') without having been rewritten. The oracle recomputes
    the evolved state from raw orders with the same arithmetic."""
    data, meta = orders_cow_evolved_layout(spark, sf_dir)
    return (
        read_committed(spark, data, root=meta, merge_schema=True)
        .groupBy(
            F.coalesce(F.col("channel"), F.lit("legacy")).alias("channel")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price_cents").cast("long").alias("total_cents"),
        )
    )


def orders_cow_evolution_history(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DESCRIBE HISTORY of the evolved clone: the three cloned
    commits plus the schema-evolving merge head, whose row count must
    equal v2's exactly (the merge updates existing keys, inserting
    none). Shares ``orders_cow_evolved_layout`` with
    ``orders_cow_schema_evolution`` so the one-time clone+merge build
    amortizes across both registry entries. Metadata only; the oracle
    recomputes every count from the mutation spec over raw orders."""
    from time_series_prediction_spark.operators.cow import table_history

    _, meta = orders_cow_evolved_layout(spark, sf_dir)
    return table_history(spark, meta).select("version", "n_rows")


ORDERS_COW_EVOLUTION_HISTORY_SQL = f"""
WITH n0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders),
nins AS (
    SELECT CAST(count(*) AS BIGINT) AS n
    FROM orders WHERE o_orderkey % 101 = 0
),
nfinal AS (
    SELECT CAST(count(*) AS BIGINT) AS n FROM (
        SELECT o_orderkey AS k FROM orders
        UNION ALL
        SELECT o_orderkey + {_INSERT_SHIFT} FROM orders
        WHERE o_orderkey % 101 = 0
    ) WHERE k % 17 <> 0
)
SELECT CAST(0 AS BIGINT) AS version, (SELECT n FROM n0) AS n_rows
UNION ALL
SELECT 1, (SELECT n FROM n0) + (SELECT n FROM nins)
UNION ALL
SELECT 2, (SELECT n FROM nfinal)
UNION ALL
SELECT 3, (SELECT n FROM nfinal)
"""


ORDERS_COW_EVOLUTION_SQL = f"""
WITH mx AS (SELECT max(o_orderkey) AS mk FROM orders),
state AS (
    SELECT o_orderkey AS k,
           CAST(round(o_totalprice * 100) AS BIGINT)
             + CASE WHEN o_orderkey % 13 = 0
                     AND o_orderkey * 10 <= (SELECT mk FROM mx)
                    THEN 100000 ELSE 0 END AS cents
    FROM orders
    UNION ALL
    SELECT o_orderkey + {_INSERT_SHIFT},
           CAST(round(o_totalprice * 100) AS BIGINT)
    FROM orders WHERE o_orderkey % 101 = 0
)
SELECT CASE WHEN k % 97 = 0 THEN 'backfill' ELSE 'legacy' END AS channel,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents + CASE WHEN k % 97 = 0 THEN 777 ELSE 0 END)
            AS BIGINT) AS total_cents
FROM state
WHERE k % 17 <> 0
GROUP BY 1
"""


_FORGET_SPEC = "cow-forget|v1|user%29|dv"


def events_forget_layout(spark: SparkSession, sf_dir: str) -> str:
    """Right-to-erasure fixture: the events stream landed as a CoW
    table clustered by ``user_id``, then every user ≡ 0 (mod 29)
    forgotten via ``operators/cow.forget_keys`` (one deletion-vector
    commit, non-unique key). The per-user erasure audit — rows purged
    from the pinned pre-delete snapshot, absence re-verified against
    the new head — is stored beside the table, exactly what a
    compliance log retains. Cached per fixture content."""
    from time_series_prediction_spark.operators.cow import (
        forget_keys,
        init_table,
    )

    src = os.path.join(sf_dir, "events.parquet")
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    st = fs.status(src)
    if st is None:
        raise FileNotFoundError(src)
    ident = f"{fs.qualified(src)}|{st[0]}|{st[1]}|{_FORGET_SPEC}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(root, f"events_forget_{key}")
    def _build(tmp: str) -> None:
        data = os.path.join(tmp, "data")
        ev = read_table(spark, sf_dir, "events").select(
            "event_id",
            "user_id",
            "event_type",
            F.expr("CAST(round(value * 100) AS BIGINT)").alias(
                "cents"
            ),
        )
        init_table(
            spark, data, ev, key="user_id", n_files=8,
            keep_versions=_KEEP,
        )
        victims = ev.select("user_id").where(
            "user_id % 29 = 0"
        ).distinct()
        _, audit = forget_keys(
            spark, data, victims, "user_id", keep_versions=_KEEP,
        )
        audit.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(tmp, "audit")
        )
        from time_series_prediction_spark.operators.manifest import (
            _resolve_base,
        )

        _reprefix_manifests(
            spark, manifest_root(data), _resolve_base(data, spark),
            os.path.join(path, "data"),
        )

    ensure_artifact(spark, path, ident, _build)
    return path


def events_forget_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stored erasure audit: per forgotten user, how many event
    rows were tombstoned and that none remain visible. The oracle
    recomputes the purge counts from raw events; ``verified_absent``
    must be uniformly true — it re-checked the post-delete head."""
    path = events_forget_layout(spark, sf_dir)
    return spark.read.parquet(os.path.join(path, "audit")).select(
        F.col("user_id").cast("long").alias("user_id"),
        "n_rows_purged",
        "verified_absent",
    )


EVENTS_FORGET_AUDIT_SQL = """
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(count(*) AS BIGINT) AS n_rows_purged,
       true AS verified_absent
FROM events
WHERE user_id % 29 = 0
GROUP BY user_id
"""


_COMP_SPEC = "cow-composite|v1|day+key|1247-1276|7|555"
_COMP_EPOCH = "1995-01-01"
_COMP_D0, _COMP_D1 = 1247, 1276  # 1998-06-01 .. 1998-06-30


def orders_cow_composite_layout(spark: SparkSession, sf_dir: str) -> str:
    """CoW table clustered on the COMPOSITE key (day, o_orderkey) —
    the Morton interleave gives every file a small rectangle of the
    (date, key) plane — then a MERGE confined to one 30-day band
    (~1.2% of the date domain). Per-column typed stats prune the
    rewrite set to the date-overlapping files only; the carried-file
    economy is pinned in tests/test_table_queries.py. Cached per
    fixture content."""
    from time_series_prediction_spark.operators.manifest import (
        _resolve_base,
    )

    src = os.path.join(sf_dir, "orders.parquet")
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    st = fs.status(src)
    if st is None:
        raise FileNotFoundError(src)
    ident = f"{fs.qualified(src)}|{st[0]}|{st[1]}|{_COMP_SPEC}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(root, f"orders_cow_comp_{key}")
    def _build(tmp: str) -> None:
        data = os.path.join(tmp, "data")
        base = read_table(spark, sf_dir, "orders").select(
            F.expr(
                f"datediff(CAST(o_orderdate AS DATE),"
                f" DATE '{_COMP_EPOCH}')"
            ).cast("long").alias("day"),
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            "o_orderstatus",
            F.expr(
                "CAST(round(o_totalprice * 100) AS BIGINT)"
            ).alias("price_cents"),
            "o_orderpriority",
        )
        init_table(
            spark, data, base, key=["day", "o_orderkey"],
            n_files=16, keep_versions=_KEEP,
        )
        ups = base.where(
            f"day BETWEEN {_COMP_D0} AND {_COMP_D1}"
            " AND o_orderkey % 7 = 0"
        ).select(
            "day",
            "o_orderkey",
            F.lit("C").alias("o_orderstatus"),
            (F.col("price_cents") + F.lit(555)).alias("price_cents"),
            "o_orderpriority",
        )
        merge_upsert(
            spark, data, ups, key=["day", "o_orderkey"],
            keep_versions=_KEEP,
        )
        _reprefix_manifests(
            spark, manifest_root(data), _resolve_base(data, spark),
            os.path.join(path, "data"),
        )

    ensure_artifact(spark, path, ident, _build)
    return os.path.join(path, "data")


def orders_cow_composite_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Final state of the composite-clustered table after the
    date-banded MERGE; the oracle recomputes it from raw orders with
    the same band arithmetic."""
    data = orders_cow_composite_layout(spark, sf_dir)
    return (
        read_committed(spark, data)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price_cents").cast("long").alias("total_cents"),
        )
    )


ORDERS_COW_COMPOSITE_SQL = f"""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)
            + CASE WHEN (CAST(o_orderdate AS DATE)
                         - DATE '{_COMP_EPOCH}')
                        BETWEEN {_COMP_D0} AND {_COMP_D1}
                    AND o_orderkey % 7 = 0
                   THEN 555 ELSE 0 END) AS BIGINT) AS total_cents
FROM orders
GROUP BY o_orderpriority
"""


_COMP_DV_SPEC = "cow-composite-dv|v1|del5x10d|undel10x5d|99"
_COMP_DVD = 9  # delete band: D0 .. D0+9
_COMP_UND = 4  # un-delete band: D0 .. D0+4


def orders_cow_composite_dv_layout(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str]:
    """Clone of the composite-clustered table + a TUPLE deletion-vector
    delete (10-day band × keys ≡ 0 mod 5 — metadata-only commit, file
    set carried) + a same-composite-key MERGE that un-deletes a subset
    (5-day band × keys ≡ 0 mod 10, re-upserted with +99 cents and
    status 'U'). The round-8 gap this exercises: (date, key)-clustered
    tables taking streaming deletes AND merges with no compaction
    between — the DV holds tuples, the merge un-deletes exactly the
    upserted tuples. Cached like every layout."""
    from time_series_prediction_spark.operators.cow import (
        clone_table,
        delete_keys_dv,
    )
    from time_series_prediction_spark.operators.manifest import (
        _resolve_base,
    )

    src_data = orders_cow_composite_layout(spark, sf_dir)
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    ident = f"{fs.qualified(src_data)}|{_COMP_DV_SPEC}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(root, f"orders_cow_compdv_{key}")
    def _build(tmp: str) -> None:
        meta_tmp = os.path.join(tmp, "meta")
        data_tmp = os.path.join(tmp, "data")
        clone_table(spark, src_data, meta_tmp)
        cur = read_committed(spark, data_tmp, root=meta_tmp)
        dels = cur.where(
            f"day BETWEEN {_COMP_D0} AND {_COMP_D0 + _COMP_DVD}"
            " AND o_orderkey % 5 = 0"
        ).select("day", "o_orderkey")
        delete_keys_dv(
            spark, data_tmp, dels, key=["day", "o_orderkey"],
            root=meta_tmp, keep_versions=_KEEP,
        )
        undel = (
            read_table(spark, sf_dir, "orders")
            .select(
                F.expr(
                    f"datediff(CAST(o_orderdate AS DATE),"
                    f" DATE '{_COMP_EPOCH}')"
                ).cast("long").alias("day"),
                F.col("o_orderkey").cast("long").alias("o_orderkey"),
                F.lit("U").alias("o_orderstatus"),
                (
                    F.expr(
                        "CAST(round(o_totalprice * 100) AS BIGINT)"
                    ) + F.lit(99)
                ).alias("price_cents"),
                "o_orderpriority",
            )
            .where(
                f"day BETWEEN {_COMP_D0} AND {_COMP_D0 + _COMP_UND}"
                " AND o_orderkey % 10 = 0"
            )
        )
        merge_upsert(
            spark, data_tmp, undel, key=["day", "o_orderkey"],
            root=meta_tmp, keep_versions=_KEEP,
        )
        _reprefix_manifests(
            spark, meta_tmp, _resolve_base(data_tmp, spark),
            os.path.join(path, "data"),
        )

    ensure_artifact(spark, path, ident, _build)
    return os.path.join(path, "data"), os.path.join(path, "meta")


def orders_cow_composite_dv_scan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Final state of the composite table after tuple-DV delete +
    un-deleting merge (no compaction in between): counts and exact
    cents by status. The oracle recomputes the visible set from raw
    orders with the same band arithmetic."""
    data, meta = orders_cow_composite_dv_layout(spark, sf_dir)
    return (
        read_committed(spark, data, root=meta)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("price_cents").cast("long").alias("total_cents"),
        )
    )


ORDERS_COW_COMPOSITE_DV_SQL = f"""
WITH state AS (
    SELECT (CAST(o_orderdate AS DATE) - DATE '{_COMP_EPOCH}') AS day,
           o_orderkey AS k,
           CASE WHEN (CAST(o_orderdate AS DATE) - DATE '{_COMP_EPOCH}')
                     BETWEEN {_COMP_D0} AND {_COMP_D1}
                 AND o_orderkey % 7 = 0
                THEN 'C' ELSE o_orderstatus END AS status,
           CAST(round(o_totalprice * 100) AS BIGINT)
             + CASE WHEN (CAST(o_orderdate AS DATE)
                          - DATE '{_COMP_EPOCH}')
                         BETWEEN {_COMP_D0} AND {_COMP_D1}
                     AND o_orderkey % 7 = 0
                    THEN 555 ELSE 0 END AS cents
    FROM orders
),
visible AS (
    SELECT day, k, status, cents FROM state
    WHERE NOT (day BETWEEN {_COMP_D0} AND {_COMP_D0 + _COMP_DVD}
               AND k % 5 = 0)
    UNION ALL
    SELECT day, k, 'U',
           CAST(round(o_totalprice * 100) AS BIGINT) + 99
    FROM orders,
         LATERAL (SELECT (CAST(o_orderdate AS DATE)
                          - DATE '{_COMP_EPOCH}') AS day,
                         o_orderkey AS k)
    WHERE day BETWEEN {_COMP_D0} AND {_COMP_D0 + _COMP_UND}
      AND k % 10 = 0
)
SELECT status AS o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS total_cents
FROM visible
GROUP BY status
"""


def orders_cow_composite_dv_history(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DESCRIBE HISTORY of the composite tuple-DV table: the cloned
    head (v0/v1, physical rows = raw orders), the tuple-DV delete
    (v2 — metadata-only: physical rows UNCHANGED, DV keys +ndel), and
    the un-deleting merge (v3 — rewrites the band files, materializing
    their deletions: physical rows = n0 − ndel + nund, DV shrinks to
    ndel − nund). Shares ``orders_cow_composite_dv_layout`` with
    ``orders_cow_composite_dv_scan`` so the one-time clone+DV+merge
    build amortizes across both registry entries (round-9 VERDICT #1,
    the same treatment that fixed the evolved layout). Metadata only —
    no data file is opened; the oracle recomputes every count from the
    mutation spec over raw orders."""
    from time_series_prediction_spark.operators.cow import table_history

    _data, meta = orders_cow_composite_dv_layout(spark, sf_dir)
    return table_history(spark, meta).select(
        "version", "n_rows", "n_dv_keys"
    )


ORDERS_COW_COMPOSITE_DV_HISTORY_SQL = f"""
WITH n0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders),
ndel AS (
    SELECT CAST(count(*) AS BIGINT) AS n FROM orders
    WHERE (CAST(o_orderdate AS DATE) - DATE '{_COMP_EPOCH}')
          BETWEEN {_COMP_D0} AND {_COMP_D0 + _COMP_DVD}
      AND o_orderkey % 5 = 0
),
nund AS (
    SELECT CAST(count(*) AS BIGINT) AS n FROM orders
    WHERE (CAST(o_orderdate AS DATE) - DATE '{_COMP_EPOCH}')
          BETWEEN {_COMP_D0} AND {_COMP_D0 + _COMP_UND}
      AND o_orderkey % 10 = 0
)
SELECT CAST(0 AS BIGINT) AS version, (SELECT n FROM n0) AS n_rows,
       CAST(0 AS BIGINT) AS n_dv_keys
UNION ALL
SELECT 1, (SELECT n FROM n0), 0
UNION ALL
SELECT 2, (SELECT n FROM n0), (SELECT n FROM ndel)
UNION ALL
-- the un-deleting merge commits only when its band matches rows
-- (at tiny scales the band can be empty — no v3 then)
SELECT 3,
       (SELECT n FROM n0) - (SELECT n FROM ndel)
           + (SELECT n FROM nund),
       (SELECT n FROM ndel) - (SELECT n FROM nund)
WHERE (SELECT n FROM nund) > 0
"""


def orders_cdc_scd2_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC → SCD2 dimension: the cow table's change feed folded into
    type-2 validity intervals — (key, attributes, v_from, v_to) where
    an insert opens an interval and the key's next delete closes it —
    the standard way a warehouse derives a history dimension from a
    change stream instead of re-snapshotting the source. v0 rows seed
    the fold as version-0 inserts; pairing is the i-th-open ↔ i-th
    close rank join (intervals of one key never overlap).

    The oracle never sees the feed: it regenerates every interval
    directly from the mutation spec over raw orders (v0 intervals
    close at 1 if updated / 2 if purged; v1 intervals — updates and
    inserts — close at 2 if purged), so the comparison pins the CDC
    path AND the fold. Output: interval counts, distinct keys, and
    exact cents by currency status."""
    from time_series_prediction_spark.operators.cow import changes_feed

    from time_series_prediction_spark.operators.mview import (
        refresh_if_stale,
    )

    data = orders_cow_layout(spark, sf_dir)

    def _build(s: SparkSession) -> DataFrame:
        from pyspark.sql.window import Window

        v0 = (
            read_version(s, data, 0)
            .withColumn("_version", F.lit(0).cast("long"))
            .withColumn("_change", F.lit("insert"))
        )
        feed = changes_feed(s, data, 0, 2).select(*v0.columns)
        ev = v0.unionByName(feed)
        w = Window.partitionBy("o_orderkey").orderBy("_version")
        opens = ev.where(F.col("_change") == "insert").withColumn(
            "_rn", F.row_number().over(w)
        )
        closes = (
            ev.where(F.col("_change") == "delete")
            .withColumn("_rn", F.row_number().over(w))
            .select(
                "o_orderkey",
                "_rn",
                F.col("_version").alias("v_to"),
            )
        )
        return opens.join(
            closes, ["o_orderkey", "_rn"], "left"
        ).select(
            "o_orderkey",
            "price_cents",
            F.col("_version").alias("v_from"),
            "v_to",
        )

    # the dimension is a MATERIALIZED artifact (operators/mview.py):
    # built once per table state, invalidated by the manifest's
    # _LATEST pointer — a new commit on the source re-derives the
    # dimension, an unchanged table serves the parquet back
    dim, _ = refresh_if_stale(
        spark,
        "orders_scd2_dim",
        _build,
        [os.path.join(manifest_root(data), "_LATEST")],
    )
    return dim.groupBy(
        F.col("v_to").isNull().alias("is_current")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.countDistinct("o_orderkey").cast("long").alias("n_keys"),
        F.sum("price_cents").cast("long").alias("total_cents"),
    )


ORDERS_CDC_SCD2_SQL = f"""
WITH mx AS (SELECT max(o_orderkey) AS mk FROM orders),
base AS (
    SELECT o_orderkey AS k,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           (o_orderkey % 13 = 0
            AND o_orderkey * 10 <= (SELECT mk FROM mx)) AS upd
    FROM orders
),
intervals AS (
    SELECT k, cents,
           CASE WHEN upd THEN 1
                WHEN k % 17 = 0 THEN 2 END AS vt
    FROM base
    UNION ALL
    SELECT k, cents + 100000,
           CASE WHEN k % 17 = 0 THEN 2 END
    FROM base WHERE upd
    UNION ALL
    SELECT k + {_INSERT_SHIFT}, cents,
           CASE WHEN (k + {_INSERT_SHIFT}) % 17 = 0 THEN 2 END
    FROM base WHERE k % 101 = 0
)
SELECT vt IS NULL AS is_current,
       CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(count(DISTINCT k) AS BIGINT) AS n_keys,
       CAST(sum(cents) AS BIGINT) AS total_cents
FROM intervals
GROUP BY vt IS NULL
"""


TABLE_QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "orders_cdc_scd2_dim": (
        orders_cdc_scd2_dim,
        ORDERS_CDC_SCD2_SQL,
    ),
    "orders_cow_composite_scan": (
        orders_cow_composite_scan,
        ORDERS_COW_COMPOSITE_SQL,
    ),
    "orders_cow_composite_dv_scan": (
        orders_cow_composite_dv_scan,
        ORDERS_COW_COMPOSITE_DV_SQL,
    ),
    "orders_cow_composite_dv_history": (
        orders_cow_composite_dv_history,
        ORDERS_COW_COMPOSITE_DV_HISTORY_SQL,
    ),
    "events_forget_audit": (
        events_forget_audit,
        EVENTS_FORGET_AUDIT_SQL,
    ),
    "orders_cow_schema_evolution": (
        orders_cow_schema_evolution,
        ORDERS_COW_EVOLUTION_SQL,
    ),
    "orders_cow_evolution_history": (
        orders_cow_evolution_history,
        ORDERS_COW_EVOLUTION_HISTORY_SQL,
    ),
    "orders_cow_restore_scan": (
        orders_cow_restore_scan,
        ORDERS_COW_RESTORE_SQL,
    ),
    "orders_cow_restore_history": (
        orders_cow_restore_history,
        ORDERS_COW_RESTORE_HISTORY_SQL,
    ),
    "events_delta_stream_scan": (
        events_delta_stream_scan,
        EVENTS_DELTA_STREAM_SQL,
    ),
    "orders_delta_log_scan": (
        orders_delta_log_scan,
        ORDERS_DELTA_LOG_SQL,
    ),
    "orders_delta_dv_scan": (
        orders_delta_dv_scan,
        ORDERS_DELTA_DV_SQL,
    ),
    "orders_delta_update_scan": (
        orders_delta_update_scan,
        ORDERS_DELTA_UPDATE_SQL,
    ),
    "orders_delta_change_feed_scan": (
        orders_delta_change_feed_scan,
        ORDERS_DELTA_CDC_FEED_SQL,
    ),
    "orders_delta_rowid_scan": (
        orders_delta_rowid_scan,
        ORDERS_DELTA_ROWID_SQL,
    ),
    "orders_delta_clustered_scan": (
        orders_delta_clustered_scan,
        ORDERS_DELTA_CLUSTERED_SQL,
    ),
    "orders_delta_alter_scan": (
        orders_delta_alter_scan,
        ORDERS_DELTA_ALTER_SQL,
    ),
    "orders_delta_reorg_scan": (
        orders_delta_reorg_scan,
        ORDERS_DELTA_REORG_SQL,
    ),
    "orders_delta_incremental_scan": (
        orders_delta_incremental_scan,
        ORDERS_DELTA_INCR_SQL,
    ),
    "orders_delta_partitioned_incremental_scan": (
        orders_delta_partitioned_incremental_scan,
        ORDERS_DELTA_PART_INCR_SQL,
    ),
    "orders_delta_convert_scan": (
        orders_delta_convert_scan,
        ORDERS_DELTA_CONVERT_SQL,
    ),
    "orders_delta_pyds_scan": (
        orders_delta_pyds_scan,
        ORDERS_DELTA_CONVERT_SQL,
    ),
    "orders_delta_pyds_pruned_scan": (
        orders_delta_pyds_pruned_scan,
        ORDERS_DELTA_PYDS_PRUNED_SQL,
    ),
    "orders_delta_pyds_constrained_scan": (
        orders_delta_pyds_constrained_scan,
        ORDERS_DELTA_PYDS_CONS_SQL,
    ),
    "orders_delta_pyds_partitioned_sink_scan": (
        orders_delta_pyds_partitioned_sink_scan,
        ORDERS_DELTA_PYDS_PART_SQL,
    ),
    "orders_delta_pyds_mapped_scan": (
        orders_delta_pyds_mapped_scan,
        ORDERS_DELTA_ALTER_SQL,
    ),
    "orders_delta_pyds_rowtracked_sink_scan": (
        orders_delta_pyds_rowtracked_sink_scan,
        ORDERS_DELTA_PYDS_RT_SQL,
    ),
    "orders_delta_pyds_cdf_scan": (
        orders_delta_pyds_cdf_scan,
        ORDERS_DELTA_CDF_SQL,
    ),
    "orders_delta_pyds_timetravel_scan": (
        orders_delta_pyds_timetravel_scan,
        ORDERS_DELTA_PYDS_TT_SQL,
    ),
    "events_delta_bounded_tail_scan": (
        events_delta_bounded_tail_scan,
        EVENTS_DELTA_TAIL_SQL,
    ),
    "events_delta_pyds_stream_scan": (
        events_delta_pyds_stream_scan,
        EVENTS_DELTA_TAIL_SQL,
    ),
    "orders_delta_merge_scan": (
        orders_delta_merge_scan,
        ORDERS_DELTA_MERGE_SQL,
    ),
    "orders_delta_clone_scan": (
        orders_delta_clone_scan,
        ORDERS_DELTA_CLONE_SQL,
    ),
    "orders_delta_pruned_scan": (
        orders_delta_pruned_scan,
        ORDERS_DELTA_PRUNED_SQL,
    ),
    "orders_delta_restore_scan": (
        orders_delta_restore_scan,
        ORDERS_DELTA_RESTORE_SQL,
    ),
    "orders_delta_cdf_scan": (
        orders_delta_cdf_scan,
        ORDERS_DELTA_CDF_SQL,
    ),
    "events_delta_tail_scan": (
        events_delta_tail_scan,
        EVENTS_DELTA_TAIL_SQL,
    ),
    "events_delta_table_scan": (
        events_delta_table_scan,
        EVENTS_DELTA_TAIL_SQL,
    ),
    "orders_cdc_ingest_scan": (
        orders_cdc_ingest_scan,
        ORDERS_CDC_INGEST_SQL,
    ),
    "orders_dv_scan": (
        orders_dv_scan,
        ORDERS_DV_SCAN_SQL,
    ),
    "orders_cow_string_scan": (
        orders_cow_string_scan,
        ORDERS_COW_STRING_SQL,
    ),
    "orders_cow_feed": (
        orders_cow_feed,
        ORDERS_COW_FEED_SQL,
    ),
    "orders_cow_history": (
        orders_cow_history,
        ORDERS_COW_HISTORY_SQL,
    ),
    "orders_cow_view_maintenance": (
        orders_cow_view_maintenance,
        ORDERS_COW_CURRENT_SQL,  # incremental fold == full recompute
    ),
    "orders_upsert_ingest_scan": (
        orders_upsert_ingest_scan,
        ORDERS_UPSERT_INGEST_SQL,
    ),
    "orders_cow_current_scan": (
        orders_cow_current_scan,
        ORDERS_COW_CURRENT_SQL,
    ),
    "orders_cow_time_travel": (
        orders_cow_time_travel,
        ORDERS_COW_TIME_TRAVEL_SQL,
    ),
    "orders_cow_changes": (
        orders_cow_changes,
        ORDERS_COW_CHANGES_SQL,
    ),
}
