"""Round-5 corpus-maintenance queries: incremental ingestion dedup and
cross-source overlap analysis.

Beyond-reference scope (the reference has no text/corpus processing;
its data surface is the cashflow tables — ``src/demo/training.py``).
These are the operations a production training-data pipeline runs
every ingestion cycle:

- ``dedup_incremental_batch``: dedup a NEWLY ARRIVED batch against the
  existing corpus without re-deduplicating the corpus itself — the
  steady-state form of dedup at 100 TB, where re-clustering the full
  corpus per ingest is unaffordable. Two-tier verdict per new doc:
  ``exact_dup`` (md5 hit in the corpus), ``near_dup`` (prefix
  fingerprint hit only), else ``novel``. The fixture's texts are all
  distinct (no organic exact copies), so the batch unions in
  deterministic planted arrivals — verbatim copies (exact tier) and
  suffix-mutated copies (near tier) — the same planted-positive
  technique ``dedup_ngram_jaccard`` uses; the oracle plants
  identically and must agree on every verdict.
- ``corpus_source_overlap``: for every pair of sources, how many
  distinct blocking fingerprints they share — the provenance matrix
  that predicts which source pairs will generate near-dup candidate
  pairs (fingerprints ARE the blocking keys) before you pick a dedup
  priority order.
- ``corpus_leakage_safe_split``: train/val/test assignment hashed per
  dedup group (blocking fingerprint), so near-duplicates can never
  straddle splits — the doc-level-split eval-leakage bug, prevented
  structurally.
- ``corpus_dup_substring_spans``: cross-document duplicated-substring
  coverage (Lee et al. 2022 exact substring dedup): maximal ≥K-token
  runs appearing in ≥2 docs, found via shingle frequency + per-doc
  interval merge — window math, no re-explosion, no UDF.

100 TB shape: both are distinct-then-equi-join plans. The corpus key
sets (md5 / fingerprint) are narrow ``distinct`` shuffles (map-side
combined); the batch side joins them with ordinary shuffled
equi-joins — no cross product, no driver-side state. When the batch
is small relative to the corpus (the usual case), AQE broadcasts the
batch side automatically; the left joins against deduplicated key
sets cannot duplicate rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from time_series_prediction_spark.operators import text
from time_series_prediction_spark.plans.text_queries import QueryFn
from time_series_prediction_spark.sources.io import read_table

# deterministic "newly arrived batch": every doc_id ≡ 7 (mod 10) plus
# planted arrivals derived from corpus docs (ids offset so they can't
# collide with organic ids).
_BATCH_MOD, _BATCH_REM = 10, 7
_EXACT_OFF, _NEAR_OFF = 1_000_000, 2_000_000


def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-new-doc dedup verdict against the existing corpus:
    ``exact_dup`` if md5(text) already appears in the corpus,
    ``near_dup`` if only the first-5-token fingerprint does,
    ``novel`` otherwise. Precedence exact > near. Planted arrivals:
    every corpus doc with doc_id ≡ 0 (mod 20) re-arrives verbatim
    (exact tier), every doc_id ≡ 5 (mod 20) re-arrives with a suffix
    token appended — fingerprint preserved, md5 changed (near tier)."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    is_batch = (F.col("doc_id") % _BATCH_MOD) == _BATCH_REM
    corpus = docs.where(~is_batch)
    exact_arrivals = corpus.where((F.col("doc_id") % 20) == 0).select(
        (F.col("doc_id") + _EXACT_OFF).alias("doc_id"), "lang", "text"
    )
    # the suffix mutation preserves the first-5-token fingerprint only
    # when the doc has at least 5 tokens — shorter docs would plant as
    # 'novel', so they are excluded from the near tier (both engines)
    near_arrivals = corpus.where(
        ((F.col("doc_id") % 20) == 5)
        & (F.size(F.split("text", " ")) >= 5)
    ).select(
        (F.col("doc_id") + _NEAR_OFF).alias("doc_id"),
        "lang",
        F.concat(F.col("text"), F.lit(" zz_mutation")).alias("text"),
    )
    batch = (
        docs.where(is_batch)
        .unionByName(exact_arrivals)
        .unionByName(near_arrivals)
        .select(
            "doc_id",
            "lang",
            F.md5("text").alias("h"),
            text.fingerprint().alias("fp"),
        )
    )
    corpus_h = corpus.select(F.md5("text").alias("h")).distinct().withColumn(
        "exact_hit", F.lit(True)
    )
    corpus_fp = (
        corpus.select(text.fingerprint().alias("fp"))
        .distinct()
        .withColumn("fp_hit", F.lit(True))
    )
    return (
        batch.join(corpus_h, "h", "left")
        .join(corpus_fp, "fp", "left")
        .select(
            "doc_id",
            "lang",
            F.when(F.col("exact_hit"), F.lit("exact_dup"))
            .when(F.col("fp_hit"), F.lit("near_dup"))
            .otherwise(F.lit("novel"))
            .alias("verdict"),
        )
    )


DEDUP_INCREMENTAL_SQL = f"""
WITH corpus_docs AS (
  SELECT doc_id, lang, text FROM documents
  WHERE doc_id % {_BATCH_MOD} <> {_BATCH_REM}
),
batch AS (
  SELECT doc_id, lang, text FROM documents
  WHERE doc_id % {_BATCH_MOD} = {_BATCH_REM}
  UNION ALL
  SELECT doc_id + {_EXACT_OFF}, lang, text FROM corpus_docs
  WHERE doc_id % 20 = 0
  UNION ALL
  SELECT doc_id + {_NEAR_OFF}, lang, text || ' zz_mutation'
  FROM corpus_docs
  WHERE doc_id % 20 = 5 AND len(string_split(text, ' ')) >= 5
),
keyed AS (
  SELECT doc_id, lang,
         md5(text) AS h,
         md5(array_to_string(string_split(text, ' ')[1:5], ' ')) AS fp
  FROM batch
),
corpus AS (
  SELECT md5(text) AS h,
         md5(array_to_string(string_split(text, ' ')[1:5], ' ')) AS fp
  FROM corpus_docs
)
SELECT k.doc_id, k.lang,
       CASE WHEN k.h  IN (SELECT h  FROM corpus) THEN 'exact_dup'
            WHEN k.fp IN (SELECT fp FROM corpus) THEN 'near_dup'
            ELSE 'novel' END AS verdict
FROM keyed k
"""


def corpus_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct shared blocking fingerprints per (source_a < source_b)
    pair, plus each pair's Jaccard overlap of distinct-fingerprint
    sets — which feeds will generate near-dup candidates against each
    other, and how strongly."""
    docs = read_table(spark, sf_dir, "documents")
    sh = docs.select("source", text.fingerprint().alias("fp")).distinct()
    sizes = sh.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_fps")
    )
    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
    )
    return (
        shared.join(
            sizes.withColumnRenamed("source", "source_a").withColumnRenamed(
                "n_fps", "n_a"
            ),
            "source_a",
        )
        .join(
            sizes.withColumnRenamed("source", "source_b").withColumnRenamed(
                "n_fps", "n_b"
            ),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "shared_fps",
            F.round(
                F.col("shared_fps")
                / (F.col("n_a") + F.col("n_b") - F.col("shared_fps")),
                6,
            ).alias("jaccard"),
        )
    )


CORPUS_SOURCE_OVERLAP_SQL = """
WITH sh AS (
  SELECT DISTINCT source,
         md5(array_to_string(string_split(text, ' ')[1:5], ' ')) AS fp
  FROM documents
),
sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n_fps
          FROM sh GROUP BY source),
shared AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS shared_fps
  FROM sh a JOIN sh b ON a.fp = b.fp AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT s.source_a, s.source_b, s.shared_fps,
       round(s.shared_fps
             / (na.n_fps + nb.n_fps - s.shared_fps), 6) AS jaccard
FROM shared s
JOIN sizes na ON na.source = s.source_a
JOIN sizes nb ON nb.source = s.source_b
"""


def corpus_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: the split is assigned per
    DEDUP GROUP (blocking fingerprint), not per document, so near
    duplicates can never straddle splits — the classic eval-leakage
    bug in training pipelines that split at the document level. The
    assignment byte is the first two md5 hex digits of the
    fingerprint (engine-identical): < 204 train (~80%), < 230 val
    (~10%), else test (~10%).

    100 TB shape: one narrow projection + one groupBy(split) — the
    split column is a pure expression over the fingerprint, no join
    and no extra shuffle beyond the 3-row aggregate."""
    docs = read_table(spark, sf_dir, "documents")
    hexd = "0123456789abcdef"
    byte = (
        f"(instr('{hexd}', substr(md5(fp), 1, 1)) - 1) * 16 "
        f"+ instr('{hexd}', substr(md5(fp), 2, 1)) - 1"
    )
    return (
        docs.select(
            "doc_id",
            "n_chars",
            text.fingerprint().alias("fp"),
        )
        .withColumn(
            "split",
            F.expr(
                f"CASE WHEN ({byte}) < 204 THEN 'train' "
                f"WHEN ({byte}) < 230 THEN 'val' ELSE 'test' END"
            ),
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("fp").cast("long").alias("n_groups"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )


CORPUS_LEAKAGE_SAFE_SPLIT_SQL = """
WITH keyed AS (
  SELECT doc_id, n_chars,
         md5(array_to_string(string_split(text, ' ')[1:5], ' ')) AS fp
  FROM documents
),
assigned AS (
  SELECT doc_id, n_chars, fp,
         (strpos('0123456789abcdef', substr(md5(fp), 1, 1)) - 1) * 16
         + strpos('0123456789abcdef', substr(md5(fp), 2, 1)) - 1 AS b
  FROM keyed
)
SELECT CASE WHEN b < 204 THEN 'train'
            WHEN b < 230 THEN 'val' ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT fp) AS BIGINT) AS n_groups,
       CAST(sum(n_chars) AS BIGINT) AS n_chars
FROM assigned
GROUP BY 1
"""


_SPAN_K = 8  # tokens per shingle = the minimum duplicated-run length


def merged_span_stats(starts: DataFrame, k: int) -> DataFrame:
    """Gaps-and-islands interval merge: ``starts`` holds (doc_id, p)
    interval starts, each covering [p, p + k); returns per-doc
    (n_spans, dup_tokens) for the MERGED maximal spans (overlapping or
    adjacent intervals coalesce). A running max of interval ends over
    the sorted starts marks island boundaries — pure window math, no
    re-explosion of covered positions, one shuffle on doc_id."""
    w = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        starts.withColumn("prev_end", F.max(F.col("p") + k).over(w))
        .withColumn(
            "is_new",
            F.when(
                F.col("prev_end").isNull() | (F.col("p") > F.col("prev_end")),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "island",
            F.sum("is_new").over(
                Window.partitionBy("doc_id")
                .orderBy("p")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("doc_id", "island")
        .agg((F.max("p") + k - F.min("p")).alias("covered"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum("covered").cast("long").alias("dup_tokens"),
        )
    )


def corpus_dup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-substring spans, the data-curation
    operation behind exact substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): find
    every maximal token run of length ≥ K that also appears in some
    OTHER document, and report per-doc duplicated-token coverage.

    Plan (all native expressions, no UDF):
    1. explode each doc into K-token shingle starts (md5 shingle key,
       engine-identical);
    2. one groupBy(h) keeps shingles seen in ≥ 2 docs — map-side
       combined, the only corpus-wide shuffle;
    3. left-semi join marks each doc's duplicated start positions;
    4. gaps-and-islands over (doc, position): a running max of
       interval ends splits the sorted starts into maximal merged
       spans — window math, no re-explosion of covered positions;
    5. per-doc aggregate, left-joined back so span-free docs report
       zeros (stable row count = corpus size).

    100 TB shape: the shingle table is |tokens| narrow rows; frequency
    filter + semi join are hash-partitioned equi ops; the island pass
    shuffles once on doc_id. Nothing quadratic, nothing driver-side.
    Skew: a boilerplate shingle shared by millions of docs makes its
    hash a hot key in the semi join — the session enables AQE skew-join
    splitting (session.py), which subdivides that partition at runtime;
    no salting needed because the join is existence-only."""
    docs = read_table(spark, sf_dir, "documents")
    return dup_substring_spans_frame(docs, _SPAN_K)


def dup_substring_spans_frame(docs: DataFrame, k: int) -> DataFrame:
    """The span pipeline over an arbitrary (doc_id, text) frame — the
    registry query binds it to the documents fixture; tests feed it
    planted corpora (e.g. a boilerplate header shared by every doc, the
    hot-key case the AQE skew-join note above describes)."""
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    sh = toks.where(F.size("t") >= k).select(
        "doc_id",
        F.explode(F.expr(f"sequence(0, size(t) - {k})")).alias("p"),
        F.col("t"),
    ).select(
        "doc_id",
        "p",
        F.expr(f"md5(array_join(slice(t, p + 1, {k}), ' '))").alias("h"),
    )
    dup_h = (
        sh.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("h")
    )
    starts = sh.join(dup_h, "h", "left_semi")
    islands = merged_span_stats(starts, k)
    return (
        toks.select("doc_id", F.size("t").cast("long").alias("n_tokens"))
        .join(islands, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("dup_tokens", F.lit(0))
            .cast("long")
            .alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens"), 6
            ).alias("dup_frac"),
        )
    )


CORPUS_DUP_SUBSTRING_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
sh AS (
  SELECT doc_id, p - 1 AS p,
         md5(array_to_string(t[p:p + {_SPAN_K} - 1], ' ')) AS h
  FROM toks, unnest(range(1, len(t) - {_SPAN_K} + 2)) AS u(p)
),
dup_h AS (
  SELECT h FROM sh GROUP BY h HAVING count(DISTINCT doc_id) >= 2
),
starts AS (
  SELECT s.doc_id, s.p FROM sh s WHERE s.h IN (SELECT h FROM dup_h)
),
marked AS (
  SELECT doc_id, p,
         max(p + {_SPAN_K}) OVER (
           PARTITION BY doc_id ORDER BY p
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM starts
),
islands AS (
  SELECT doc_id, p,
         sum(CASE WHEN prev_end IS NULL OR p > prev_end THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY p
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM marked
),
per_island AS (
  SELECT doc_id, island, max(p) + {_SPAN_K} - min(p) AS covered
  FROM islands GROUP BY doc_id, island
),
per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         CAST(sum(covered) AS BIGINT) AS dup_tokens
  FROM per_island GROUP BY doc_id
)
SELECT d.doc_id, CAST(len(d.t) AS BIGINT) AS n_tokens,
       CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       round(coalesce(p.dup_tokens, 0) / CAST(len(d.t) AS DOUBLE), 6)
         AS dup_frac
FROM toks d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""


def doc_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality scoring: each document's mean
    token surprisal −log p(token) under the corpus's own unigram
    distribution — the perplexity-style filter every training-data
    pipeline runs (high surprisal ⇒ rare-token noise, low ⇒
    boilerplate), here the KenLM-shaped scoring with n=1.

    Oracle-exactness: ln(N/c) is the engine-portable staged series
    (operators/sketch_portable.py:portable_ln_stage_cols — identical
    double ops in both engines), and each token's surprisal is
    quantized to integer NANO-NATS before the per-doc sum, so the
    aggregation is order-free exact integers and the final mean is
    one fixed-shape double division. Returns the top-20 most
    surprising docs (deterministic doc_id tie-break).

    Scale shape: token explode → count shuffle (the vocabulary
    aggregate every corpus stat already pays) → hash join back →
    per-doc integer rollup; no Python, no driver collect, no
    transcendental library calls."""
    from time_series_prediction_spark.operators.sketch_portable import (
        portable_ln_stage_cols,
    )

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).where(F.col("token") != "")
    counts = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    # n_total == Σ c exactly (every occurrence counted once), so the
    # global total regroups the vocabulary aggregate instead of paying
    # a third scan+tokenize pass over documents (guide §2.4).
    tot = counts.agg(F.sum("c").cast("long").alias("n_total"))
    j = (
        toks.join(counts, "token")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "x", F.expr("CAST(n_total AS DOUBLE) / CAST(c AS DOUBLE)")
        )
    )
    for name, expr in portable_ln_stage_cols():
        j = j.withColumn(name, F.expr(expr))
    per_doc = (
        j.withColumn(
            "surp", F.expr("CAST(round(lnx * 1.0e9) AS BIGINT)")
        )
        .groupBy("doc_id")
        .agg(
            F.sum("surp").cast("long").alias("s"),
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
        )
    )
    return (
        per_doc.select(
            "doc_id",
            "n_tokens",
            F.expr(
                "CAST(s AS DOUBLE) / CAST(n_tokens AS DOUBLE) / 1.0e9"
            ).alias("avg_surprisal"),
        )
        .orderBy(F.desc("avg_surprisal"), F.asc("doc_id"))
        .limit(20)
    )


def _unigram_surprisal_sql() -> str:
    from time_series_prediction_spark.operators.sketch_portable import (
        portable_ln_stage_cols,
    )

    stages = portable_ln_stage_cols()
    ctes, carried, prev = [], ["doc_id", "x"], "s0"
    for i, (name, expr) in enumerate(stages):
        cols = ", ".join(carried)
        ctes.append(
            f"s{i + 1} AS (SELECT {cols}, {expr} AS {name} FROM {prev})"
        )
        carried.append(name)
        prev = f"s{i + 1}"
    chain = ",\n".join(ctes)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), t AS (
  SELECT doc_id, token FROM toks WHERE token <> ''
), counts AS (
  SELECT token, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY token
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_total FROM t
), s0 AS (
  SELECT t.doc_id,
         CAST((SELECT n_total FROM tot) AS DOUBLE)
           / CAST(c.c AS DOUBLE) AS x
  FROM t JOIN counts c ON c.token = t.token
),
{chain},
perdoc AS (
  SELECT doc_id,
         CAST(sum(CAST(round(lnx * 1.0e9) AS BIGINT)) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n_tokens
  FROM {prev} GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       CAST(s AS DOUBLE) / CAST(n_tokens AS DOUBLE) / 1.0e9
         AS avg_surprisal
FROM perdoc
ORDER BY avg_surprisal DESC, doc_id ASC
LIMIT 20
"""


DOC_UNIGRAM_SURPRISAL_SQL = _unigram_surprisal_sql()


def doc_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top TF-IDF terms: per (doc, token) score
    tf · ln(N_docs / df) with the engine-portable staged ln, top-25
    rows overall (score desc, doc_id, token tie-breaks) — the keyword
    extraction / salient-term surface of a corpus engine.

    Oracle-exactness: tf and df are exact integers, the idf ln is the
    shared staged series, and the score is ONE double multiply — both
    engines rank bit-identical doubles with total tie-breaks.

    Scale shape: two token aggregates (per-doc tf, per-token df) and
    one hash join back — the same shuffles every vocabulary statistic
    pays; top-k is a TakeOrdered, never a full sort materialized."""
    from time_series_prediction_spark.operators.sketch_portable import (
        portable_ln_stage_cols,
    )

    from time_series_prediction_spark.operators.materialize import (
        materialize,
    )

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).where(F.col("token") != "")
    # tf feeds both the df regroup and the score join: pin it once
    # (deferred) instead of re-tokenizing the corpus per consumer
    # (guide §2.4)
    tf = materialize(
        toks.groupBy("doc_id", "token").agg(
            F.count(F.lit(1)).cast("long").alias("tf")
        ),
        eager=False,
    )
    df_t = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    n_docs = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    j = (
        tf.join(df_t, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "x", F.expr("CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)")
        )
    )
    for name, expr in portable_ln_stage_cols():
        j = j.withColumn(name, F.expr(expr))
    return (
        j.select(
            "doc_id",
            "token",
            "tf",
            F.expr("CAST(tf AS DOUBLE) * lnx").alias("tfidf"),
        )
        .orderBy(F.desc("tfidf"), F.asc("doc_id"), F.asc("token"))
        .limit(25)
    )


def _tfidf_sql() -> str:
    from time_series_prediction_spark.operators.sketch_portable import (
        portable_ln_stage_cols,
    )

    stages = portable_ln_stage_cols()
    ctes, carried, prev = [], ["doc_id", "token", "tf", "x"], "s0"
    for i, (name, expr) in enumerate(stages):
        cols = ", ".join(carried)
        ctes.append(
            f"s{i + 1} AS (SELECT {cols}, {expr} AS {name} FROM {prev})"
        )
        carried.append(name)
        prev = f"s{i + 1}"
    chain = ",\n".join(ctes)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), t AS (
  SELECT doc_id, token FROM toks WHERE token <> ''
), tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM t GROUP BY doc_id, token
), dft AS (
  SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token
), nd AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
), s0 AS (
  SELECT tf.doc_id, tf.token, tf.tf,
         CAST((SELECT n_docs FROM nd) AS DOUBLE)
           / CAST(dft.df AS DOUBLE) AS x
  FROM tf JOIN dft ON dft.token = tf.token
),
{chain}
SELECT doc_id, token, tf, CAST(tf AS DOUBLE) * lnx AS tfidf
FROM {prev}
ORDER BY tfidf DESC, doc_id ASC, token ASC
LIMIT 25
"""


DOC_TFIDF_SQL = _tfidf_sql()


# BM25 retrieval: fixed query-term panel (all present in the synthetic
# vocabulary at every SF) and the standard Okapi constants.
_BM25_TERMS = ("hash", "join", "scan", "merge")
_BM25_K1PLUS1 = "2.2e0"   # k1 + 1,  k1 = 1.2
_BM25_K1 = "1.2e0"
_BM25_1MB = "0.25e0"      # 1 - b,   b = 0.75
_BM25_B = "0.75e0"


def _bm25_contrib(i: int) -> str:
    """Okapi BM25 per-term weight, nano-quantized to an exact BIGINT —
    IDENTICAL expression text in Spark SQL and DuckDB (every double op
    sees the same operands in the same order; the final per-doc score
    is a sum of exact integers, so accumulation order cannot perturb
    it — the doc_unigram_surprisal discipline)."""
    tf = f"CAST(tf_{i} AS DOUBLE)"
    return (
        f"CAST(round(idf_{i} * (({tf} * {_BM25_K1PLUS1}) / "
        f"({tf} + {_BM25_K1} * ({_BM25_1MB} + {_BM25_B} * "
        f"(CAST(dl AS DOUBLE) / avgdl)))) * 1.0e9) AS BIGINT)"
    )


def doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 retrieval: rank every document against a fixed
    query-term panel (k1=1.2, b=0.75, idf = ln(1 + (N−df+0.5)/(df+0.5)))
    and return the top 20 — the classic lexical-retrieval scorer
    (the ranking side of a search engine, complementing
    ``doc_tfidf_topterms``'s keyword-extraction side).

    Oracle-exactness: tf / dl / df / N are exact integers computed by
    in-row array folds; idf is the engine-portable staged ln on an
    identically-constructed double; each per-term weight is mirrored
    term by term and nano-quantized to a BIGINT before the 4-term sum,
    so the final score is derived from an exact integer in both
    engines and the (score desc, doc_id) order is total.

    Scale shape: tf and dl come from in-row ``filter(split(...))``
    folds — the corpus pass is PURE MAP, no tokenize-explode shuffle
    at all. The only aggregate is the 1-row corpus-stats reduce
    (map-side partial), idf math runs on a |terms|-row relation that
    broadcasts back, and top-k is a TakeOrdered. At 100 TB this is a
    single scan + a metadata-sized broadcast — the cheapest possible
    BM25 shape for a fixed query."""
    from time_series_prediction_spark.operators.sketch_portable import (
        portable_ln_stage_cols,
    )

    from time_series_prediction_spark.operators.materialize import (
        materialize,
    )

    docs = read_table(spark, sf_dir, "documents")
    n_t = len(_BM25_TERMS)
    per_doc = docs.select(
        "doc_id",
        F.expr(
            "CAST(size(filter(split(text, ' '), t -> t != '')) AS BIGINT)"
        ).alias("dl"),
        *[
            F.expr(
                f"CAST(size(filter(split(text, ' '), t -> t = '{t}'))"
                " AS BIGINT)"
            ).alias(f"tf_{i}")
            for i, t in enumerate(_BM25_TERMS)
        ],
    )
    # (doc_id, dl, tf_*) is a narrow integer relation feeding both the
    # corpus-stats reduce and the scoring scan: pin it once so the
    # tokenize folds run a single corpus pass (guide §2.4); the idf
    # broadcast build materializes the deferred checkpoint
    per_doc = materialize(per_doc, eager=False)
    stats = per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0))
            .cast("long")
            .alias(f"df_{i}")
            for i in range(n_t)
        ],
    )
    terms = stats.select(
        "n_docs",
        "sum_dl",
        F.posexplode(
            F.array(*[F.col(f"df_{i}") for i in range(n_t)])
        ).alias("ti", "df"),
    ).withColumn(
        "x",
        F.expr(
            "(CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5e0)"
            " / (CAST(df AS DOUBLE) + 0.5e0) + 1.0e0"
        ),
    )
    for name, expr in portable_ln_stage_cols():
        terms = terms.withColumn(name, F.expr(expr))
    idf = (
        terms.groupBy("n_docs", "sum_dl")
        .agg(
            *[
                F.max(F.when(F.col("ti") == i, F.col("lnx"))).alias(
                    f"idf_{i}"
                )
                for i in range(n_t)
            ]
        )
        .withColumn(
            "avgdl",
            F.expr("CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)"),
        )
        .drop("n_docs", "sum_dl")
    )
    hit = " + ".join(
        f"(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END)" for i in range(n_t)
    )
    score_q = " + ".join(_bm25_contrib(i) for i in range(n_t))
    return (
        per_doc.crossJoin(F.broadcast(idf))
        .select(
            "doc_id",
            "dl",
            F.expr(f"CAST({hit} AS BIGINT)").alias("n_terms_hit"),
            F.expr(f"CAST({score_q} AS DOUBLE) / 1.0e9").alias("bm25"),
        )
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(20)
    )


def _bm25_sql() -> str:
    from time_series_prediction_spark.operators.sketch_portable import (
        portable_ln_stage_cols,
    )

    n_t = len(_BM25_TERMS)
    tf_cols = ",\n         ".join(
        f"CAST(len(list_filter(string_split(text, ' '), t -> t = '{t}'))"
        f" AS BIGINT) AS tf_{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df_cols = ",\n         ".join(
        f"CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS df_{i}"
        for i in range(n_t)
    )
    term_rows = "\n  UNION ALL ".join(
        f"SELECT n_docs, sum_dl, {i} AS ti, df_{i} AS df FROM stats"
        for i in range(n_t)
    )
    stages = portable_ln_stage_cols()
    ctes, carried, prev = [], ["n_docs", "sum_dl", "ti", "df", "x"], "s0"
    for i, (name, expr) in enumerate(stages):
        cols = ", ".join(carried)
        ctes.append(
            f"s{i + 1} AS (SELECT {cols}, {expr} AS {name} FROM {prev})"
        )
        carried.append(name)
        prev = f"s{i + 1}"
    chain = ",\n".join(ctes)
    idf_cols = ",\n         ".join(
        f"max(CASE WHEN ti = {i} THEN lnx END) AS idf_{i}"
        for i in range(n_t)
    )
    hit = " + ".join(
        f"(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END)" for i in range(n_t)
    )
    score_q = " + ".join(_bm25_contrib(i) for i in range(n_t))
    return f"""
WITH per_doc AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
           AS BIGINT) AS dl,
         {tf_cols}
  FROM documents
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS sum_dl,
         {df_cols}
  FROM per_doc
),
s0 AS (
  SELECT *,
         (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5e0)
           / (CAST(df AS DOUBLE) + 0.5e0) + 1.0e0 AS x
  FROM ({term_rows})
),
{chain},
idf AS (
  SELECT {idf_cols},
         CAST(max(sum_dl) AS DOUBLE) / CAST(max(n_docs) AS DOUBLE)
           AS avgdl
  FROM {prev}
)
SELECT doc_id, dl,
       CAST({hit} AS BIGINT) AS n_terms_hit,
       CAST({score_q} AS DOUBLE) / 1.0e9 AS bm25
FROM per_doc CROSS JOIN idf
ORDER BY bm25 DESC, doc_id ASC
LIMIT 20
"""


DOC_BM25_SQL = _bm25_sql()


TEXT3_QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "doc_bm25_topk": (
        doc_bm25_topk,
        DOC_BM25_SQL,
    ),
    "doc_unigram_surprisal": (
        doc_unigram_surprisal,
        DOC_UNIGRAM_SURPRISAL_SQL,
    ),
    "doc_tfidf_topterms": (
        doc_tfidf_topterms,
        DOC_TFIDF_SQL,
    ),
    "dedup_incremental_batch": (
        dedup_incremental_batch,
        DEDUP_INCREMENTAL_SQL,
    ),
    "corpus_source_overlap": (
        corpus_source_overlap,
        CORPUS_SOURCE_OVERLAP_SQL,
    ),
    "corpus_leakage_safe_split": (
        corpus_leakage_safe_split,
        CORPUS_LEAKAGE_SAFE_SPLIT_SQL,
    ),
    "corpus_dup_substring_spans": (
        corpus_dup_substring_spans,
        CORPUS_DUP_SUBSTRING_SQL,
    ),
}
