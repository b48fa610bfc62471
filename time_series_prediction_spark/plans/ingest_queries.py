"""Audited-ingestion registry query: the streaming quarantine-split
gate (streaming/audit.py) exercised end-to-end under the driver's
oracle, the way layout_queries does for z-ordered ingestion.

The documents fixture streams through ``audited_ingest_sink`` one
inbox file per micro-batch; the landing zone then answers a per-lang
aggregate. Because the sink splits at ROW level (not batch level),
the landed set is exactly "rows passing every declared check"
regardless of how the stream happened to batch — so DuckDB's oracle
is the same checks as a WHERE clause over the raw table, and the
comparison pins the whole loop: check compilation, quarantine split,
per-batch landing, replay-idempotent layout, recursive read-back.

Built at most once per fixture content (same identity/cache protocol
as the streamed z-layout)."""

from __future__ import annotations

import hashlib
import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from time_series_prediction_spark.operators.manifest import (
    MANIFEST_FORMAT,
)
from time_series_prediction_spark.sources.io import read_table

QueryFn = Callable[[SparkSession, str], DataFrame]

# the quality contract: rejects real fixture rows (zh docs, extreme
# lengths), so the quarantine path is exercised with live data
_MIN_CHARS, _MAX_CHARS = 60, 500
_KNOWN_LANGS = ("en", "es", "de", "fr")
_SPEC = f"v1|{_MIN_CHARS}|{_MAX_CHARS}|{','.join(_KNOWN_LANGS)}"

# Layout builds run through operators/mview.ensure_artifact — the
# engine's ONE build-once protocol (per-target lock → _IDENT → tmp
# build → atomic publish); two threads building the same layout
# serialize there instead of interleaving the stream's
# inbox/checkpoint writes.
from time_series_prediction_spark.operators.mview import ensure_artifact


def _checks():
    from time_series_prediction_spark.operators.quality_checks import (
        in_range,
        not_null,
        satisfies,
    )

    return [
        not_null("text"),
        in_range("n_chars", lo=float(_MIN_CHARS), hi=float(_MAX_CHARS)),
        satisfies("lang_known", F.col("lang").isin(*_KNOWN_LANGS)),
    ]


def docs_audited_landing(spark: SparkSession, sf_dir: str) -> str:
    """Documents landed through the streaming quarantine gate; built
    once per fixture content under the shared temp cache."""
    from time_series_prediction_spark.streaming.audit import (
        audited_ingest_sink,
    )

    from time_series_prediction_spark.sources.fsops import fs_for

    src = os.path.join(sf_dir, "documents.parquet")
    fs = fs_for(spark, tempfile.gettempdir())
    st = fs.status(src)
    if st is None:
        raise FileNotFoundError(src)
    ident = f"{fs.qualified(src)}|{st[0]}|{st[1]}|{_SPEC}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(tempfile.gettempdir(), "tsp_layouts", f"docs_q_{key}")
    def _build(tmp: str) -> None:
        docs = read_table(spark, sf_dir, "documents")
        inbox = os.path.join(tmp, "_inbox")
        docs.repartition(3).write.mode("overwrite").parquet(inbox)
        data = os.path.join(tmp, "data")
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(inbox)
        )
        q = (
            stream.writeStream.foreachBatch(
                audited_ingest_sink(data, _checks())
            )
            .option("checkpointLocation", os.path.join(tmp, "_ck"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    ensure_artifact(spark, path, ident, _build)
    return path


def docs_quarantine_ingest_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    layout = docs_audited_landing(spark, sf_dir)
    landed = (
        spark.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.parquet")
        .parquet(os.path.join(layout, "data"))
    )
    return landed.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )


DOCS_QUARANTINE_SQL = f"""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE text IS NOT NULL
  AND NOT coalesce(n_chars < {_MIN_CHARS} OR n_chars > {_MAX_CHARS}, FALSE)
  AND coalesce(lang IN ({", ".join(f"'{lang}'" for lang in _KNOWN_LANGS)}), FALSE)
GROUP BY lang
"""


# --------------------------------------------------------------------------
# composed validate → WAP → z-append landing (round 7, brief #5)
# --------------------------------------------------------------------------

_LH_SPEC = (
    f"lh1|{_MIN_CHARS}|{_MAX_CHARS}|{','.join(_KNOWN_LANGS)}"
    f"|{MANIFEST_FORMAT}"
)
_LH_PRED = {"n_chars": (100.0, 400.0)}


def docs_lakehouse_landing(spark: SparkSession, sf_dir: str) -> str:
    """Documents landed through the COMPOSED sink
    (``streaming/pipeline.lakehouse_ingest_sink``): row-level
    quarantine + batch-level WAP uniqueness gate + z-append with
    versioned manifest commits, one ``foreachBatch`` body. Built once
    per fixture content under the shared temp cache (same protocol as
    the other streamed landings)."""
    from time_series_prediction_spark.sources.fsops import fs_for
    from time_series_prediction_spark.streaming.pipeline import (
        lakehouse_ingest_sink,
    )

    src = os.path.join(sf_dir, "documents.parquet")
    fs = fs_for(spark, tempfile.gettempdir())
    st = fs.status(src)
    if st is None:
        raise FileNotFoundError(src)
    ident = f"{fs.qualified(src)}|{st[0]}|{st[1]}|{_LH_SPEC}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(tempfile.gettempdir(), "tsp_layouts", f"docs_lh_{key}")
    def _build(tmp: str) -> None:
        docs = read_table(spark, sf_dir, "documents")
        inbox = os.path.join(tmp, "_inbox")
        docs.repartition(3).write.mode("overwrite").parquet(inbox)
        data = os.path.join(tmp, "data")
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(inbox)
        )
        q = (
            stream.writeStream.foreachBatch(
                lakehouse_ingest_sink(
                    data,
                    row_checks=_checks(),
                    zcols=["n_chars"],
                    unique_cols=["doc_id"],
                    n_files=2,
                )
            )
            .option("checkpointLocation", os.path.join(tmp, "_ck"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        # re-point the streamed manifest at the published prefix (the
        # events_streamed_layout protocol — versions are tiny)
        from time_series_prediction_spark.streaming.layout import (
            current_manifest,
            manifest_root,
            publish_manifest,
        )

        mroot = manifest_root(data)
        man = current_manifest(spark, mroot)
        assert man is not None, "composed sink published no manifest"
        final_data = os.path.join(path, "data")
        fixed = man.withColumn(
            "file",
            F.concat(
                F.lit(final_data), F.expr(f"substr(file, {len(data) + 1})")
            ),
        )
        last = max(
            int(d[1:]) for d in fs.list_names(mroot) if d.startswith("v")
        )
        publish_manifest(fixed, mroot, last + 1)

    ensure_artifact(spark, path, ident, _build)
    return path


def docs_lakehouse_ingest_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range aggregate answered through the composed landing: the
    committed manifest version prunes the z-layout to the n_chars
    range, the exact predicate re-applies, and the per-lang rollup
    must equal the oracle's plain filtered aggregate over the raw
    table — the composed sink only changed HOW the rows landed."""
    from time_series_prediction_spark.operators.manifest import pruned_scan
    from time_series_prediction_spark.streaming.layout import (
        current_manifest,
        manifest_root,
    )

    layout = docs_lakehouse_landing(spark, sf_dir)
    data = os.path.join(layout, "data")
    man = current_manifest(spark, manifest_root(data))
    assert man is not None
    lo, hi = _LH_PRED["n_chars"]
    df = pruned_scan(spark, man, _LH_PRED).where(
        (F.col("n_chars") >= lo) & (F.col("n_chars") <= hi)
    )
    return df.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )


DOCS_LAKEHOUSE_SQL = f"""
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE text IS NOT NULL
  AND NOT coalesce(n_chars < {_MIN_CHARS} OR n_chars > {_MAX_CHARS}, FALSE)
  AND coalesce(lang IN ({", ".join(f"'{lang}'" for lang in _KNOWN_LANGS)}), FALSE)
  AND n_chars BETWEEN 100 AND 400
GROUP BY lang
"""


_MEDALLION_SPEC = "medallion|v1|dup37|value>=0.5"


def events_medallion_landing(spark: SparkSession, sf_dir: str) -> str:
    """Bronze→silver medallion fixture: the events stream — with a
    deterministic duplicate slice injected (every event_id ≡ 0
    (mod 37) arrives twice) — runs through ``medallion_sink``: raw
    rows land exactly-once in a native-Delta bronze log, quality-
    gated deduplicated rows MERGE into the silver CoW table. Cached
    per fixture content; bronze's delta log stores relative paths
    and silver's manifests are re-prefixed, so the published landing
    reads from its final location."""
    from time_series_prediction_spark.operators.manifest import (
        _resolve_base,
    )
    from time_series_prediction_spark.streaming.layout import (
        manifest_root,
    )
    from time_series_prediction_spark.sources.fsops import fs_for
    from time_series_prediction_spark.streaming.pipeline import (
        medallion_sink,
    )

    src = os.path.join(sf_dir, "events.parquet")
    root = os.path.join(tempfile.gettempdir(), "tsp_layouts")
    fs = fs_for(spark, root)
    st = fs.status(src)
    if st is None:
        raise FileNotFoundError(src)
    ident = f"{fs.qualified(src)}|{st[0]}|{st[1]}|{_MEDALLION_SPEC}"
    key = hashlib.md5(ident.encode()).hexdigest()[:16]
    path = os.path.join(root, f"events_medallion_{key}")
    def _build(tmp: str) -> None:
        ev = read_table(spark, sf_dir, "events").select(
            "event_id",
            "user_id",
            "event_type",
            F.col("value"),
            F.expr("CAST(round(value * 100) AS BIGINT)").alias(
                "cents"
            ),
        )
        feed = ev.unionByName(ev.where("event_id % 37 = 0"))
        inbox = os.path.join(tmp, "_inbox")
        feed.repartition(3).write.mode("overwrite").parquet(inbox)
        bronze = os.path.join(tmp, "bronze")
        silver = os.path.join(tmp, "silver")
        stream = (
            spark.readStream.schema(feed.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(inbox)
        )
        q = (
            stream.writeStream.foreachBatch(
                medallion_sink(
                    bronze, silver, app_id="medallion-fixture",
                    key="event_id", quality_pred="value >= 0.5",
                    keep_versions=20,
                )
            )
            .option(
                "checkpointLocation", os.path.join(tmp, "_ck")
            )
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        _reprefix = __import__(
            "time_series_prediction_spark.plans.table_queries",
            fromlist=["_reprefix_manifests"],
        )._reprefix_manifests
        _reprefix(
            spark, manifest_root(silver),
            _resolve_base(silver, spark),
            os.path.join(path, "silver"),
        )

    ensure_artifact(spark, path, ident, _build)
    return path


def events_medallion_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold readout over the medallion's silver layer: per-type
    counts and exact cents. The oracle recomputes from raw events
    with only the quality predicate — the injected duplicates MUST
    have collapsed (in-batch dedup + cross-batch MERGE), so equality
    pins the whole bronze→silver discipline."""
    from time_series_prediction_spark.streaming.layout import (
        read_committed,
    )

    path = events_medallion_landing(spark, sf_dir)
    silver = os.path.join(path, "silver")
    return (
        read_committed(spark, silver)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("total_cents"),
        )
    )


EVENTS_MEDALLION_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM events
WHERE value >= 0.5
GROUP BY event_type
"""


def events_gold_mview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gold daily rollup served through a fingerprint-invalidated
    materialized view (operators/mview.py): first call builds and
    publishes, every later call is a metadata staleness check + a
    parquet read — the refresh primitive a scheduler wraps. The
    oracle recomputes the rollup from raw events, so the cache path
    can never drift from the source query."""
    from time_series_prediction_spark.operators.mview import (
        refresh_if_stale,
    )

    src = os.path.join(sf_dir, "events.parquet")

    def build(s: SparkSession) -> DataFrame:
        return (
            read_table(s, sf_dir, "events")
            .groupBy(
                F.to_date("ts").alias("day"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_events"),
                F.sum(
                    F.expr("CAST(round(value * 100) AS BIGINT)")
                ).cast("long").alias("total_cents"),
            )
        )

    df, _ = refresh_if_stale(
        spark, "events_gold_daily", build, [src]
    )
    return df


EVENTS_GOLD_MVIEW_SQL = """
SELECT CAST(ts AS DATE) AS day, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM events
GROUP BY CAST(ts AS DATE), event_type
"""


INGEST_QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "events_gold_mview": (
        events_gold_mview,
        EVENTS_GOLD_MVIEW_SQL,
    ),
    "events_medallion_scan": (
        events_medallion_scan,
        EVENTS_MEDALLION_SQL,
    ),
    "docs_quarantine_ingest_scan": (
        docs_quarantine_ingest_scan,
        DOCS_QUARANTINE_SQL,
    ),
    "docs_lakehouse_ingest_scan": (
        docs_lakehouse_ingest_scan,
        DOCS_LAKEHOUSE_SQL,
    ),
}
