"""Streaming document ingestion with dedup-on-arrival.

The reference has no streaming surface (SURVEY §2.9); this extends the
engine's continuous-ingestion tier to the corpus tables: the streaming
twin of ``plans.text_queries3.dedup_incremental_batch``. New documents
arrive as a file stream; each micro-batch is deduplicated against the
EXISTING corpus before it lands:

* exact duplicates (md5 already in the corpus) are dropped on arrival
  via a stream-static left-anti join;
* near duplicates (blocking fingerprint already in the corpus) are
  kept but flagged ``near_dup`` so downstream curation can route them
  to the full near-dup pipeline;
* everything else is ``novel``.

Intra-stream replays (the same new doc delivered twice) compose with
``events.dedup_stream``'s ``dropDuplicatesWithinWatermark`` pattern —
state bounded by the watermark, not corpus size.

100 TB shape: the static side is the corpus KEY SET (md5/fingerprint
only — two narrow columns), not the corpus; broadcast when it fits,
or leave unhinted and let each micro-batch shuffle-join against it.
The anti-join and the flag join are both equi-joins; per-batch cost is
proportional to the batch, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from time_series_prediction_spark.operators import text

DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def read_docs_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over a directory of document parquet files
    (file streams need an explicit schema; new files appearing under
    ``path`` become micro-batches)."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "*.parquet")
        .load(path)
    )


def corpus_key_sets(corpus: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The two static key sets an ingest stream dedups against: the
    corpus's distinct md5 hashes and distinct blocking fingerprints.
    Recompute (or incrementally maintain) these when the corpus
    changes; the stream re-reads static sources per micro-batch only
    where the source supports it, so materialize them."""
    hashes = corpus.select(F.md5("text").alias("h")).distinct()
    fps = corpus.select(text.fingerprint().alias("fp")).distinct()
    return hashes, fps


def ingest_dedup_stream(
    new_docs: DataFrame,
    corpus_hashes: DataFrame,
    corpus_fps: DataFrame,
    broadcast_keys: bool = True,
) -> DataFrame:
    """Dedup-on-arrival: drop exact corpus duplicates, flag fingerprint
    near-duplicates, pass novel docs through — per micro-batch,
    stateless (corpus state lives in the static key sets)."""
    maybe_bcast = F.broadcast if broadcast_keys else (lambda df: df)
    keyed = new_docs.select(
        "doc_id",
        "lang",
        F.md5("text").alias("h"),
        text.fingerprint().alias("fp"),
    )
    fresh = keyed.join(maybe_bcast(corpus_hashes), "h", "left_anti")
    flagged = fresh.join(
        maybe_bcast(corpus_fps.withColumn("fp_hit", F.lit(True))),
        "fp",
        "left",
    )
    return flagged.select(
        "doc_id",
        "lang",
        F.when(F.col("fp_hit"), F.lit("near_dup"))
        .otherwise(F.lit("novel"))
        .alias("verdict"),
    )
