"""Corpus-curation queries, part 2: repetition-based quality filters,
token-budget corpus selection, mixture weights, and n-gram statistics —
the selection/mixing stages of an LLM training-data pipeline that sit
between per-doc scoring (text_queries.doc_text_stats) and packing
(doc_packing_stats).

All four are oracle-backed. Determinism: ratios are single IEEE double
divisions of exact integers (bit-identical across engines); the only
non-linear function used is sqrt (correctly rounded per IEEE-754, so
also engine-identical) — pow() with an arbitrary exponent is
deliberately avoided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from time_series_prediction_spark.plans.text_queries import QueryFn
from time_series_prediction_spark.sources.io import read_table

# ---------------------------------------------------------------------------
# repetition / quality filtering (Gopher-style rules)
# ---------------------------------------------------------------------------


def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals: token count, distinct-token
    count, type-token ratio, and the most-frequent-token share (the
    Gopher rule family: high top-token share ⇒ boilerplate/spam).

    Shape: explode → two groupBys, both keyed by doc_id — partial
    aggregation (map-side combine) keeps the shuffle at one row per
    (doc, distinct token) then one per doc; no windows, no skew beyond
    document length itself.
    """
    docs = read_table(spark, sf_dir, "documents")
    freq = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
        )
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        freq.groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            F.max("c").cast("bigint").alias("top_count"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            (F.col("n_distinct").cast("double") / F.col("n_tokens")).alias(
                "type_token_ratio"
            ),
            (F.col("top_count").cast("double") / F.col("n_tokens")).alias(
                "top_token_share"
            ),
            (
                F.col("top_count").cast("double") / F.col("n_tokens") > 0.1
            ).alias("repetitive"),
        )
    )


DOC_REPETITION_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), freq AS (
  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT)   AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(count(*) AS DOUBLE) / sum(c) AS type_token_ratio,
       CAST(max(c) AS DOUBLE) / sum(c)   AS top_token_share,
       (CAST(max(c) AS DOUBLE) / sum(c)) > 0.1 AS repetitive
FROM freq
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# token-budget corpus selection
# ---------------------------------------------------------------------------


def doc_token_budget_sample(
    spark: SparkSession, sf_dir: str, budget_chars: int = 100_000
) -> DataFrame:
    """Budget-constrained selection: per language, take documents in
    (n_chars DESC, doc_id) priority order until the cumulative
    character budget is exhausted — the 'fill the training mix to N
    tokens per language' step.

    Implementation: one cumulative-sum window per language. NOTE the
    scale shape: a running sum serializes each language into one
    ordered partition — fine for O(100) languages × bounded docs/lang,
    but at 100 TB per-language, switch to the threshold form: compute
    the priority-score cutoff whose prefix hits the budget via
    distributed quantile sketch, then filter score >= cutoff (one scan,
    no per-lang ordering)."""
    docs = read_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.select(
            "doc_id",
            "lang",
            "n_chars",
            F.sum("n_chars").over(w).cast("bigint").alias("cum_chars"),
        )
        .where(F.col("cum_chars") <= budget_chars)
    )


DOC_TOKEN_BUDGET_SQL = """
SELECT doc_id, lang, n_chars, cum_chars
FROM (
  SELECT doc_id, lang, n_chars,
         CAST(sum(n_chars) OVER (
           PARTITION BY lang ORDER BY n_chars DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cum_chars
  FROM documents
)
WHERE cum_chars <= 100000
"""


# ---------------------------------------------------------------------------
# mixture weights (temperature-scaled language sampling)
# ---------------------------------------------------------------------------


def corpus_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled sampling weights per language: raw share
    p_l = chars_l / Σchars, reweighted w_l = sqrt(p_l) / Σ sqrt(p) —
    the α=0.5 temperature mix that upsamples low-resource languages
    (multilingual-LM standard). sqrt keeps the math engine-exact.

    Tiny aggregate (one row per language) joined back via a broadcast
    of the 1-row total — no full-data second pass."""
    from time_series_prediction_spark.operators.materialize import materialize

    docs = read_table(spark, sf_dir, "documents")
    # feeds its own total AND the output select: pin so the corpus
    # scan runs once (same double-use shape as relational4.q11)
    per_lang = materialize(
        docs.groupBy("lang").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
    )
    tot = per_lang.agg(
        F.sum("n_chars").alias("_tot_chars"),
        F.sum(F.sqrt(F.col("n_chars").cast("double"))).alias("_tot_sqrt"),
    )
    return (
        per_lang.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            "n_chars",
            (F.col("n_chars").cast("double") / F.col("_tot_chars")).alias(
                "raw_share"
            ),
            (
                F.sqrt(F.col("n_chars").cast("double")) / F.col("_tot_sqrt")
            ).alias("temp_weight"),
        )
    )


CORPUS_MIXTURE_SQL = """
WITH per_lang AS (
  SELECT lang,
         CAST(count(*) AS BIGINT)     AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS n_chars
  FROM documents GROUP BY lang
), tot AS (
  SELECT CAST(sum(n_chars) AS DOUBLE) AS tot_chars,
         sum(sqrt(CAST(n_chars AS DOUBLE))) AS tot_sqrt
  FROM per_lang
)
SELECT lang, n_docs, n_chars,
       CAST(n_chars AS DOUBLE) / tot_chars       AS raw_share,
       sqrt(CAST(n_chars AS DOUBLE)) / tot_sqrt  AS temp_weight
FROM per_lang, tot
"""


# ---------------------------------------------------------------------------
# corpus n-gram statistics
# ---------------------------------------------------------------------------


def corpus_bigram_topk(
    spark: SparkSession, sf_dir: str, k: int = 20
) -> DataFrame:
    """Top-k word bigrams across the corpus (n-gram LM statistics /
    contamination probes). Bigrams are formed inside the array domain
    (transform over an index sequence — no window, no per-token
    shuffle): each document emits its n−1 bigrams, then one
    combiner-friendly count + deterministic top-k
    (count DESC, bigram ASC)."""
    docs = read_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    bigrams = F.expr(
        "transform(sequence(0, size(_toks) - 2), "
        "i -> concat(_toks[i], ' ', _toks[i + 1]))"
    )
    return (
        docs.select(toks.alias("_toks"))
        .where(F.size("_toks") >= 2)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(k)
    )


CORPUS_BIGRAM_SQL = """
WITH toks AS (
  SELECT string_split(text, ' ') AS t FROM documents
), bg AS (
  SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1]))
           AS bigram
  FROM toks WHERE len(t) >= 2
)
SELECT bigram, CAST(count(*) AS BIGINT) AS n
FROM bg GROUP BY bigram
ORDER BY n DESC, bigram ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# PII redaction (scrubbing stage of a training-data pipeline)
# ---------------------------------------------------------------------------

# Character classes only — Java regex (Spark) and RE2 (DuckDB) agree on
# these exactly; no lookarounds/backrefs (RE2 lacks them).
_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]+"
_NUM_RE = "[0-9][0-9][0-9]+"  # runs of 3+ digits (ids, phones, SSNs)


def doc_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: replace emails with <EMAIL> and 3+-digit runs
    with <NUM>, reporting per-doc redaction counts + the redacted-text
    md5 (scalar proof the rewrite is byte-identical across engines).

    The fixture corpus is clean word salad, so deterministic positives
    are injected first (every 3rd doc gains a contact line derived from
    doc_id) — the redactor then has real matches, and the oracle must
    agree on every count and every redacted byte. Pure per-row
    ``regexp_replace``/``regexp_count`` column expressions: no shuffle,
    embarrassingly parallel at any corpus size."""
    docs = read_table(spark, sf_dir, "documents")
    injected = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or call 555123"),
            F.col("doc_id").cast("string"),
        ),
    ).otherwise(F.col("text"))
    redacted = F.regexp_replace(
        F.regexp_replace(injected, _EMAIL_RE, "<EMAIL>"), _NUM_RE, "<NUM>"
    )
    return docs.select(
        "doc_id",
        "lang",
        F.regexp_count(injected, F.lit(_EMAIL_RE))
        .cast("bigint")
        .alias("n_emails"),
        F.regexp_count(
            F.regexp_replace(injected, _EMAIL_RE, "<EMAIL>"), F.lit(_NUM_RE)
        )
        .cast("bigint")
        .alias("n_numbers"),
        F.md5(redacted).alias("redacted_md5"),
        F.length(redacted).cast("bigint").alias("n_chars_redacted"),
    )


DOC_PII_SQL = f"""
WITH injected AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id % 3 = 0
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@mail.example.com or call 555123'
                   || CAST(doc_id AS VARCHAR)
              ELSE text END AS t
  FROM documents
), red AS (
  SELECT doc_id, lang, t,
         regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g') AS t1
  FROM injected
)
SELECT doc_id, lang,
       CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t1, '{_NUM_RE}')) AS BIGINT) AS n_numbers,
       md5(regexp_replace(t1, '{_NUM_RE}', '<NUM>', 'g')) AS redacted_md5,
       CAST(length(regexp_replace(t1, '{_NUM_RE}', '<NUM>', 'g')) AS BIGINT)
         AS n_chars_redacted
FROM red
"""


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

_DECON_N = 5  # 5-gram overlap — the standard decontamination unit


def corpus_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any word
    5-gram with a held-out benchmark set (every 25th doc, which is
    EXCLUDED from the training side). The fixture corpus is random
    word salad (no organic overlap), so deterministic positives are
    injected: every 10th training doc gets one benchmark doc's leading
    5 words appended — a planted leak the scan must find with exact
    counts.

    Scale shape: explode both sides to (shingle-hash, doc) and
    equi-join on the hash — the same bounded-bucket pipeline as
    MinHash-LSH, never all-pairs; at 100 TB the benchmark side is tiny
    and broadcastable."""
    from time_series_prediction_spark.operators.dedup import word_shingles
    from time_series_prediction_spark.operators.materialize import materialize

    docs = read_table(spark, sf_dir, "documents")
    # the benchmark subset feeds three consumers (leak source, its own
    # count, the shingle side): pin it once instead of re-scanning the
    # corpus per consumer; the n_bench count right below materializes
    # the deferred checkpoint (one job, not two)
    bench = materialize(
        docs.where(F.col("doc_id") % 25 == 0).select("doc_id", "text"),
        eager=False,
    )
    leak_src = bench.select(
        (F.col("doc_id") / 25).cast("bigint").alias("_k"),
        F.expr("array_join(slice(split(text, ' '), 1, 5), ' ')").alias("_leak"),
    )
    n_bench = bench.count()
    train = (
        docs.where(F.col("doc_id") % 25 != 0)
        .withColumn("_k", (F.col("doc_id") % F.lit(max(n_bench, 1))).cast("bigint"))
        .join(F.broadcast(leak_src), "_k", "left")
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 10 == 0,
                F.concat(F.col("text"), F.lit(" "), F.col("_leak")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    # r14 (guide §2.4): the equi-join runs on the raw shingle strings —
    # md5 on both sides selected exactly the same pairs (the oracle's
    # md5 keys are injective on this key space) while hashing the full
    # train explosion; and ``word_shingles`` is already per-doc
    # distinct, so the old ``b_sh.distinct()`` was a no-op shuffle
    t_sh = train.select(
        "doc_id",
        F.explode(word_shingles("text", _DECON_N)).alias("shingle"),
    )
    b_sh = bench.select(
        F.col("doc_id").alias("bench_id"),
        F.explode(word_shingles("text", _DECON_N)).alias("shingle"),
    )
    return (
        t_sh.join(F.broadcast(b_sh), "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shared_shingles"),
            F.countDistinct("bench_id").cast("bigint").alias("n_bench_docs_hit"),
        )
    )


# DuckDB twin: same injection (k = doc_id % n_bench indexes the
# benchmark docs ordered by doc_id), same 5-gram shingles, same
# hash-join. n_bench is data-dependent → computed inside the CTE.
CORPUS_DECON_SQL = f"""
WITH bench AS (
  SELECT doc_id, text,
         CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS k
  FROM documents WHERE doc_id % 25 = 0
), leak AS (
  SELECT CAST(doc_id / 25 AS BIGINT) AS k,
         array_to_string(string_split(text, ' ')[1:5], ' ') AS leak
  FROM documents WHERE doc_id % 25 = 0
), train AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 10 = 0 THEN d.text || ' ' || l.leak
              ELSE d.text END AS text
  FROM documents d
  LEFT JOIN leak l
    ON l.k = d.doc_id % (SELECT greatest(count(*), 1) FROM bench)
  WHERE d.doc_id % 25 != 0
), t_sh AS (
  SELECT doc_id, md5(s) AS h FROM (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
             range(1, len(string_split(text, ' ')) - {_DECON_N - 2}),
             i -> string_split(text, ' ')[i] || ' ' ||
                  string_split(text, ' ')[i + 1] || ' ' ||
                  string_split(text, ' ')[i + 2] || ' ' ||
                  string_split(text, ' ')[i + 3] || ' ' ||
                  string_split(text, ' ')[i + 4]))) AS s
    FROM train
  )
), b_sh AS (
  SELECT DISTINCT bench_id, h FROM (
    SELECT doc_id AS bench_id, md5(unnest(list_distinct(list_transform(
             range(1, len(string_split(text, ' ')) - {_DECON_N - 2}),
             i -> string_split(text, ' ')[i] || ' ' ||
                  string_split(text, ' ')[i + 1] || ' ' ||
                  string_split(text, ' ')[i + 2] || ' ' ||
                  string_split(text, ' ')[i + 3] || ' ' ||
                  string_split(text, ' ')[i + 4])))) AS h
    FROM bench
  )
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_shared_shingles,
       CAST(count(DISTINCT b.bench_id) AS BIGINT) AS n_bench_docs_hit
FROM t_sh t JOIN b_sh b ON t.h = b.h
GROUP BY t.doc_id
"""


def _gopher_flags(docs: DataFrame, keep_cols: list[str]) -> DataFrame:
    """The five Gopher rule-failure flags (f_wc/f_mwl/f_stop/f_single/
    f_rep) as exact-integer per-row expressions, plus ``keep_cols``
    passed through — shared by the audit query and the end-to-end
    curation funnel so both apply the identical predicate."""
    from time_series_prediction_spark.operators.text import STOPWORDS

    stop_arr = ", ".join(f"'{w}'" for w in STOPWORDS)
    toks = "filter(split(text, ' '), t -> t <> '')"
    d = docs.select(
        *keep_cols,
        F.expr(f"size({toks})").alias("_n"),
        F.expr(
            f"aggregate({toks}, 0L, (a, t) -> a + length(t))"
        ).alias("_sum_wl"),
        F.expr(f"size(filter({toks}, t -> length(t) = 1))").alias("_n_single"),
        F.expr(
            f"array_max(transform(array_distinct({toks}), "
            f"d -> size(filter({toks}, t -> t = d))))"
        ).alias("_max_rep"),
        F.expr(
            f"size(filter(array({stop_arr}), s -> array_contains({toks}, s)))"
        ).alias("_n_stop"),
    )
    return d.select(
        *keep_cols,
        ((F.col("_n") < 20) | (F.col("_n") > 2000)).alias("f_wc"),
        (
            (F.col("_sum_wl") < 3 * F.col("_n"))
            | (F.col("_sum_wl") > 10 * F.col("_n"))
        ).alias("f_mwl"),
        (F.col("_n_stop") < 2).alias("f_stop"),
        (F.col("_n_single") * 10 > F.col("_n")).alias("f_single"),
        (F.col("_max_rep") * 5 > F.col("_n")).alias("f_rep"),
    )


def doc_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality filtering, reported as per-rule
    failure counts by language (the go/no-go audit a curation run
    emits before dropping documents). Five rules, all exact-integer
    comparisons so both engines agree bit-for-bit:

      word_count     20 <= n_words <= 2000
      mean_word_len  3 <= mean <= 10     (as 3·n <= sum_len <= 10·n)
      stopwords      >= 2 distinct stopwords present
      singletons     <= 10% single-character words (10·n_single <= n)
      repetition     top word <= 20% of words   (5·max_rep <= n)

    Scale shape: every signal is a per-row array expression over the
    token list — narrow stage, no explode, no shuffle until the final
    per-language count aggregate (25 rows). The repetition signal is
    O(distinct·n) per document, bounded by document length, not by
    corpus size — on 100 TB this is scan-rate work."""
    fails = _gopher_flags(read_table(spark, sf_dir, "documents"), ["lang"])
    agg = [
        F.sum(F.col(c).cast("long")).cast("long").alias(out)
        for c, out in [
            ("f_wc", "fail_word_count"),
            ("f_mwl", "fail_mean_word_len"),
            ("f_stop", "fail_stopword"),
            ("f_single", "fail_singleton"),
            ("f_rep", "fail_repetition"),
        ]
    ]
    kept = (
        ~F.col("f_wc")
        & ~F.col("f_mwl")
        & ~F.col("f_stop")
        & ~F.col("f_single")
        & ~F.col("f_rep")
    )
    return fails.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        *agg,
        F.sum(kept.cast("long")).cast("long").alias("n_kept"),
    )


def _gopher_sql() -> str:
    from time_series_prediction_spark.operators.text import STOPWORDS

    stop_arr = ", ".join(f"'{w}'" for w in STOPWORDS)
    toks = "list_filter(string_split(text, ' '), t -> t <> '')"
    return f"""
WITH d AS (
  SELECT lang,
         len({toks}) AS _n,
         list_sum(list_transform({toks}, t -> length(t))) AS _sum_wl,
         len(list_filter({toks}, t -> length(t) = 1)) AS _n_single,
         list_max(list_transform(list_distinct({toks}),
                  d -> len(list_filter({toks}, t -> t = d)))) AS _max_rep,
         len(list_filter([{stop_arr}],
                  s -> list_contains({toks}, s))) AS _n_stop
  FROM documents
), f AS (
  SELECT lang,
         (_n < 20 OR _n > 2000)                          AS f_wc,
         (_sum_wl < 3 * _n OR _sum_wl > 10 * _n)         AS f_mwl,
         (_n_stop < 2)                                   AS f_stop,
         (_n_single * 10 > _n)                           AS f_single,
         (_max_rep * 5 > _n)                             AS f_rep
  FROM d
)
SELECT lang,
       CAST(count(*) AS BIGINT)                AS n_docs,
       CAST(sum(CASE WHEN f_wc     THEN 1 ELSE 0 END) AS BIGINT) AS fail_word_count,
       CAST(sum(CASE WHEN f_mwl    THEN 1 ELSE 0 END) AS BIGINT) AS fail_mean_word_len,
       CAST(sum(CASE WHEN f_stop   THEN 1 ELSE 0 END) AS BIGINT) AS fail_stopword,
       CAST(sum(CASE WHEN f_single THEN 1 ELSE 0 END) AS BIGINT) AS fail_singleton,
       CAST(sum(CASE WHEN f_rep    THEN 1 ELSE 0 END) AS BIGINT) AS fail_repetition,
       CAST(sum(CASE WHEN NOT (f_wc OR f_mwl OR f_stop OR f_single OR f_rep)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM f
GROUP BY lang
"""


DOC_QUALITY_GOPHER_SQL = _gopher_sql()


N_SHARDS = 32


def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + sharding manifest — the write
    stage of a training-data pipeline (shuffle the corpus, split into
    N fixed-size-ish shards, emit per-shard stats for the trainer's
    data loader).

    Shard = first two md5 hex digits of the doc id, mod N_SHARDS: a
    pure per-row expression, so sharding is a narrow map — NO global
    sort or row_number (a global rank is the classic anti-scale
    shuffle-writer mistake; hash sharding gives the same statistical
    shuffle with zero coordination). md5 is bit-identical on every
    engine, which makes the manifest oracle-checkable. Within-shard
    read order is (md5, doc_id) — also engine-independent.

    Output: one row per shard with doc count, char sum, distinct
    langs, and the first document in shard order (pins the intra-shard
    ordering in the oracle comparison; md5 keys are unique per doc_id
    so min_by needs no tiebreak)."""
    docs = read_table(spark, sf_dir, "documents")
    hexd = "0123456789abcdef"
    shard = F.expr(
        f"CAST(((instr('{hexd}', substr(md5(CAST(doc_id AS STRING)), 1, 1)) - 1) * 16 "
        f"+ instr('{hexd}', substr(md5(CAST(doc_id AS STRING)), 2, 1)) - 1) "
        f"% {N_SHARDS} AS BIGINT)"
    )
    d = docs.select(
        shard.alias("shard"),
        F.expr("md5(CAST(doc_id AS STRING))").alias("h"),
        "doc_id",
        "n_chars",
        "lang",
    )
    return (
        d.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.count_distinct("lang").cast("long").alias("n_langs"),
            F.min_by("doc_id", "h").alias("first_doc_id"),
        )
        .orderBy("shard")
    )


CORPUS_SHUFFLE_SHARDS_SQL = f"""
WITH d AS (
  SELECT ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
          + strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
         % {N_SHARDS} AS shard,
         md5(CAST(doc_id AS VARCHAR)) AS h,
         doc_id, n_chars, lang
  FROM documents
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       min_by(doc_id, h) AS first_doc_id
FROM d
GROUP BY shard
ORDER BY shard
"""


HH_SUPPORT_DEN = 200  # heavy hitter = token count * 200 > total tokens


def corpus_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter vocabulary terms (count > 0.5% of all tokens) via
    sketch-accelerated candidate generation + exact verification.

    ``freqItems`` (Karp-Papadimitriou-Shenker) finds candidates in ONE
    narrow pass with NO shuffle and guarantees no false negatives
    above the support threshold; the exact pass then counts only the
    ≤1/support candidate tokens (broadcast isin filter), so the result
    is EXACTLY the true heavy-hitter set — sketch speed, exact answer,
    hence a full DuckDB oracle. The naive plan shuffles the entire
    vocabulary; this shuffles ≤200 candidate tokens. The candidate
    list crosses the driver but is bounded at 1/support items by the
    algorithm (same bounded-collect justification as IVF centroids).

    TWO corpus scans total: freqItems, then ONE fused aggregation that
    counts each candidate AND the grand token total together (every
    non-candidate token collapses into a sentinel group, so the total
    is just sum(n) over ≤1/support+1 grouped rows — no separate
    count() pass)."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("token")
    ).where(F.col("token") != "")
    support = 1.0 / HH_SUPPORT_DEN
    cands = toks.freqItems(["token"], support=support).collect()[0][0]
    # "" is safe as the non-candidate sentinel: empty tokens are
    # filtered out of `toks` above
    grouped = toks.groupBy(
        F.when(F.col("token").isin(list(cands)), F.col("token"))
        .otherwise(F.lit(""))
        .alias("token")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    wtot = Window.partitionBy()
    return (
        grouped.withColumn("_total", F.sum("n").over(wtot))
        .where(
            (F.col("token") != "")
            & (F.col("n") * HH_SUPPORT_DEN > F.col("_total"))
        )
        .select(
            "token",
            "n",
            (F.col("n").cast("double") / F.col("_total").cast("double")).alias(
                "share"
            ),
        )
        .orderBy(F.desc("n"), F.asc("token"))
    )


CORPUS_HEAVY_HITTERS_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
), t AS (
  SELECT token FROM toks WHERE token <> ''
), tot AS (
  SELECT count(*) AS n_total FROM t
)
SELECT token, CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) AS DOUBLE) / (SELECT n_total FROM tot) AS share
FROM t
GROUP BY token
HAVING count(*) * {HH_SUPPORT_DEN} > (SELECT n_total FROM tot)
ORDER BY n DESC, token ASC
"""


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment near-dup detection (the RefinedWeb-style complement
    of Jaccard): a short document living INSIDE a longer one scores
    low Jaccard (union is large) but high CONTAINMENT
    |A∩B| / min(|A|,|B|) over word-3-gram shingles. The corpus has no
    organic containments, so the query unions in deterministic
    fragments (doc_id + 2000000, the first 60% of each doc's words,
    prefix preserved) — real positives the operator must find with
    exact scores. Blocking key = (lang, md5 of the leading-token
    prefix), width from ``dedup.prefix_blocking_plan`` (5 at every
    fixture scale, matching the static oracle; adaptive beyond —
    the SimHash precedent). Candidate pairs form an equi-join, never
    a cross product; the shingled frame is pinned once (two join
    sides, one scan). The 60% fragment keeps >= 6 leading words at
    the fixture's 10-word minimum, so every planted pair shares the
    5-token fingerprint.

    Scale: identical shape to dedup_ngram_jaccard — the standard
    blocked-pair pipeline, shuffle keyed on the block."""
    from time_series_prediction_spark.operators import dedup
    from time_series_prediction_spark.operators.materialize import (
        materialize,
    )

    from time_series_prediction_spark.plans.text_queries import (
        _FP_TOKENS,
        _documents_count,
    )

    assert dedup.prefix_blocking_plan(_documents_count(spark, sf_dir)) == _FP_TOKENS
    docs = read_table(spark, sf_dir, "documents")
    # r14 (guide §2.4): base + fragment come out of ONE corpus scan via
    # an in-row explode of two token structs — the old unionAll scanned
    # and re-tokenized documents twice. The fragment's token array is
    # slice(tokens, 1, k), exactly split(array_join(slice(...), ' '))
    # since tokens cannot contain the delimiter.
    frag_k = (
        "greatest(CAST(floor(size(split(text, ' ')) * 0.6) AS INT), 3)"
    )
    both = docs.select(
        F.explode(
            F.expr(
                "array("
                "named_struct('doc_id', doc_id, 'lang', lang,"
                " 'toks', split(text, ' ')),"
                "named_struct('doc_id', doc_id + CAST(2000000 AS BIGINT),"
                " 'lang', lang,"
                f" 'toks', slice(split(text, ' '), 1, {frag_k})))"
            )
        ).alias("r")
    ).select("r.doc_id", "r.lang", "r.toks")
    sh = both.select(
        "doc_id",
        "lang",
        F.expr(
            f"md5(array_join(slice(toks, 1, {_FP_TOKENS}), ' '))"
        ).alias("fp"),
        dedup.word_shingles_of_tokens("toks", 3).alias("shingles"),
    )
    sh = materialize(sh)
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.expr("size(array_intersect(a.shingles, b.shingles))")
    sa = F.expr("size(a.shingles)")
    sb = F.expr("size(b.shingles)")
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where(F.least(sa, sb) > 0)
        .select(
            F.when(sa <= sb, F.col("a.doc_id"))
            .otherwise(F.col("b.doc_id"))
            .alias("contained_id"),
            F.when(sa <= sb, F.col("b.doc_id"))
            .otherwise(F.col("a.doc_id"))
            .alias("container_id"),
            (
                inter.cast("double") / F.least(sa, sb).cast("double")
            ).alias("containment"),
        )
        .where(F.col("containment") >= 0.9)
    )


# NOTE: DuckDB slices are 1-based inclusive; [1:k] keeps the first k
# tokens, matching Spark's slice(arr, 1, k).
DEDUP_CONTAINMENT_SQL = """
WITH both_docs AS (
  SELECT doc_id, lang, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, lang,
         array_to_string(
           string_split(text, ' ')[1:greatest(
             CAST(floor(len(string_split(text, ' ')) * 0.6) AS INT), 3)],
           ' ') AS text
  FROM documents
), sh AS (
  SELECT doc_id, lang,
         md5(array_to_string(string_split(text, ' ')[1:5], ' ')) AS fp,
         list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
           i -> string_split(text, ' ')[i] || ' ' ||
                string_split(text, ' ')[i + 1] || ' ' ||
                string_split(text, ' ')[i + 2])) AS shingles
  FROM both_docs
)
SELECT * FROM (
  SELECT CASE WHEN len(a.shingles) <= len(b.shingles)
              THEN a.doc_id ELSE b.doc_id END AS contained_id,
         CASE WHEN len(a.shingles) <= len(b.shingles)
              THEN b.doc_id ELSE a.doc_id END AS container_id,
         CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
           / CAST(least(len(a.shingles), len(b.shingles)) AS DOUBLE)
           AS containment
  FROM sh a JOIN sh b
    ON a.lang = b.lang AND a.fp = b.fp AND a.doc_id < b.doc_id
  WHERE least(len(a.shingles), len(b.shingles)) > 0
) WHERE containment >= 0.9
"""


_TEMP_SEED = 42
_TEMP_BUDGET_FRAC = 2  # keep ~N/2 docs total


def corpus_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based (τ=0.5) multilingual mixture sampling — the
    XLM-R-style rebalancing step: per-language sampling weight
    ∝ share^τ, i.e. low-resource languages are upsampled relative to
    their share. Keep rate_l = min(1, T·w_l / (W·n_l)) with
    w_l = floor(sqrt(n_l)·10⁶), W = Σw_l, T = N/2 — every step is
    integer arithmetic or a single correctly-rounded IEEE op, so both
    engines derive BIT-IDENTICAL rates; the per-doc keep decision is
    the deterministic md5-threshold rule (rate·2³² as 8 hex digits),
    making the whole query oracle-checkable. One tiny lang-level agg
    (broadcast back), no extra shuffle over the docs."""
    docs = read_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    # NB: Spark resolves column names case-insensitively — helper
    # names must differ by more than case.
    w = F.expr("CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000) AS BIGINT)")
    wtot = Window.partitionBy()
    rates = (
        counts.withColumn("_wl", w)
        .withColumn("_wsum", F.sum("_wl").over(wtot))
        .withColumn(
            "_budget",
            F.expr(f"CAST(sum(n) OVER () div {_TEMP_BUDGET_FRAC} AS BIGINT)"),
        )
        .select(
            "lang",
            "n",
            # Operands cast to DOUBLE BEFORE multiplying: at the
            # large-corpus regime (n_l ~ 1e10 → w_l ~ 1e11) a BIGINT
            # product _budget*_wl exceeds 2^63. The rate only needs a
            # correctly-rounded ratio, not exact integer products.
            F.expr(
                "(CAST(_budget AS DOUBLE) * CAST(_wl AS DOUBLE))"
                " / (CAST(_wsum AS DOUBLE) * CAST(n AS DOUBLE))"
            ).alias("rate"),
        )
    )
    u = F.substring(
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit(f":temp{_TEMP_SEED}"))
        ),
        1,
        8,
    )
    thr = F.expr(
        "format_string('%08x', CAST(floor(least(rate, 1.0D) * 4294967296D) AS BIGINT))"
    )
    kept = (
        docs.join(F.broadcast(rates), "lang")
        .where((F.col("rate") >= 1.0) | (u < thr))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sampled"))
    )
    return rates.join(kept, "lang", "left").select(
        "lang",
        F.col("n").cast("long").alias("n_docs"),
        F.round("rate", 9).alias("rate"),
        F.coalesce("n_sampled", F.lit(0)).cast("long").alias("n_sampled"),
    )


CORPUS_TEMPERATURE_SQL = f"""
WITH counts AS (
  SELECT lang, count(*) AS n FROM documents GROUP BY lang
), rates AS (
  SELECT lang, n,
         (CAST((SELECT CAST(sum(n) AS BIGINT) // {_TEMP_BUDGET_FRAC} FROM counts) AS DOUBLE)
              * CAST(CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS DOUBLE))
         / (CAST((SELECT sum(CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000) AS BIGINT))
                 FROM counts) AS DOUBLE) * CAST(n AS DOUBLE)) AS rate
  FROM counts
), kept AS (
  SELECT d.lang, CAST(count(*) AS BIGINT) AS n_sampled
  FROM documents d JOIN rates r ON d.lang = r.lang
  WHERE r.rate >= 1.0
     OR substring(md5(CAST(d.doc_id AS VARCHAR) || ':temp{_TEMP_SEED}'), 1, 8)
        < printf('%08x', CAST(floor(least(r.rate, 1.0) * 4294967296) AS BIGINT))
  GROUP BY d.lang
)
SELECT r.lang, CAST(r.n AS BIGINT) AS n_docs,
       round(r.rate, 9) AS rate,
       CAST(coalesce(k.n_sampled, 0) AS BIGINT) AS n_sampled
FROM rates r LEFT JOIN kept k ON r.lang = k.lang
"""


def corpus_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation pipeline as ONE query — raw corpus → Gopher
    quality gate → exact dedup → benchmark decontamination — reported
    as a per-language funnel (n_raw / n_quality / n_unique / n_clean /
    chars_clean). Every stage is SQL-expressible, so the END-TO-END
    composition is oracle-checked, not just each stage alone.

    Deterministic positives, no extra fixtures: every 20th doc is
    planted again under doc_id + 3000000 (an exact duplicate the
    dedup stage must drop — unless its source is in the benchmark
    holdout doc_id % 25 == 0, in which case the copy is NOT a dup of
    anything in-corpus, survives dedup, and must be caught by the
    decontamination stage instead, sharing every 5-gram with its
    benchmark source). The stages interlock: quality drops rule
    failures, dedup keeps the min doc_id per md5(text) among quality
    survivors, decontamination drops canonical docs sharing any word
    5-gram with the holdout.

    Scale shape: one corpus pass for flags, one md5-keyed window for
    dedup, one shingle equi-join against the broadcast benchmark side
    (never all-pairs), two small per-lang aggregates."""
    from time_series_prediction_spark.operators.dedup import word_shingles

    docs = read_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 25 == 0)
    dups = docs.where(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 3000000).alias("doc_id"), "lang", "text", "n_chars"
    )
    corpus = (
        docs.where(F.col("doc_id") % 25 != 0)
        .select("doc_id", "lang", "text", "n_chars")
        .unionByName(dups)
    )
    flags = _gopher_flags(corpus, ["doc_id", "lang", "n_chars", "text"])
    kept = ~(
        F.col("f_wc")
        | F.col("f_mwl")
        | F.col("f_stop")
        | F.col("f_single")
        | F.col("f_rep")
    )
    w = Window.partitionBy("_m").orderBy("doc_id")
    q = (
        flags.where(kept)
        .withColumn("_m", F.md5("text"))
        .withColumn("_rn", F.row_number().over(w))
    )
    t_sh = (
        q.where(F.col("_rn") == 1)
        .select(
            "doc_id", F.explode(word_shingles("text", _DECON_N)).alias("s")
        )
        .select("doc_id", F.md5("s").alias("h"))
    )
    b_sh = (
        bench.select(F.explode(word_shingles("text", _DECON_N)).alias("s"))
        .select(F.md5("s").alias("h"))
        .distinct()
    )
    hits = (
        t_sh.join(F.broadcast(b_sh), "h")
        .select("doc_id")
        .distinct()
        .withColumn("_hit", F.lit(True))
    )
    canon = F.col("_rn") == 1
    clean = canon & F.col("_hit").isNull()
    per_stage = (
        q.join(F.broadcast(hits), "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_quality"),
            F.sum(canon.cast("long")).cast("long").alias("n_unique"),
            F.sum(clean.cast("long")).cast("long").alias("n_clean"),
            F.coalesce(
                F.sum(F.when(clean, F.col("n_chars"))), F.lit(0)
            ).cast("long").alias("chars_clean"),
        )
    )
    raw = corpus.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_raw")
    )
    return raw.join(per_stage, "lang", "left").select(
        "lang",
        "n_raw",
        F.coalesce("n_quality", F.lit(0)).cast("long").alias("n_quality"),
        F.coalesce("n_unique", F.lit(0)).cast("long").alias("n_unique"),
        F.coalesce("n_clean", F.lit(0)).cast("long").alias("n_clean"),
        F.coalesce("chars_clean", F.lit(0)).cast("long").alias("chars_clean"),
    )


def _funnel_sql() -> str:
    from time_series_prediction_spark.operators.text import STOPWORDS

    stop_arr = ", ".join(f"'{w}'" for w in STOPWORDS)
    toks = "list_filter(string_split(text, ' '), t -> t <> '')"
    shingle5 = f"""list_distinct(list_transform(
             range(1, len(string_split(text, ' ')) - {_DECON_N - 2}),
             i -> string_split(text, ' ')[i] || ' ' ||
                  string_split(text, ' ')[i + 1] || ' ' ||
                  string_split(text, ' ')[i + 2] || ' ' ||
                  string_split(text, ' ')[i + 3] || ' ' ||
                  string_split(text, ' ')[i + 4]))"""
    return f"""
WITH corpus AS (
  SELECT doc_id, lang, text, n_chars FROM documents WHERE doc_id % 25 != 0
  UNION ALL
  SELECT doc_id + 3000000 AS doc_id, lang, text, n_chars
  FROM documents WHERE doc_id % 20 = 0
), sig AS (
  SELECT doc_id, lang, n_chars, text,
         len({toks}) AS _n,
         list_sum(list_transform({toks}, t -> length(t))) AS _sum_wl,
         len(list_filter({toks}, t -> length(t) = 1)) AS _n_single,
         list_max(list_transform(list_distinct({toks}),
                  d -> len(list_filter({toks}, t -> t = d)))) AS _max_rep,
         len(list_filter([{stop_arr}],
                  s -> list_contains({toks}, s))) AS _n_stop
  FROM corpus
), q AS (
  SELECT doc_id, lang, n_chars, text,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM sig
  WHERE NOT ((_n < 20 OR _n > 2000)
          OR (_sum_wl < 3 * _n OR _sum_wl > 10 * _n)
          OR (_n_stop < 2)
          OR (_n_single * 10 > _n)
          OR (_max_rep * 5 > _n))
), b_sh AS (
  SELECT DISTINCT md5(s) AS h
  FROM (SELECT unnest({shingle5}) AS s
        FROM documents WHERE doc_id % 25 = 0)
), hits AS (
  SELECT DISTINCT doc_id
  FROM (SELECT doc_id, md5(unnest({shingle5})) AS h FROM q WHERE rn = 1) t
  JOIN b_sh USING (h)
), agg AS (
  SELECT q.lang,
         CAST(count(*) AS BIGINT) AS n_quality,
         CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
         CAST(sum(CASE WHEN rn = 1 AND h.doc_id IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_clean,
         CAST(coalesce(sum(CASE WHEN rn = 1 AND h.doc_id IS NULL
                                THEN q.n_chars END), 0) AS BIGINT)
           AS chars_clean
  FROM q LEFT JOIN hits h ON q.doc_id = h.doc_id
  GROUP BY q.lang
)
SELECT r.lang, CAST(r.n_raw AS BIGINT) AS n_raw,
       CAST(coalesce(a.n_quality, 0) AS BIGINT) AS n_quality,
       CAST(coalesce(a.n_unique, 0) AS BIGINT) AS n_unique,
       CAST(coalesce(a.n_clean, 0) AS BIGINT) AS n_clean,
       CAST(coalesce(a.chars_clean, 0) AS BIGINT) AS chars_clean
FROM (SELECT lang, count(*) AS n_raw FROM corpus GROUP BY lang) r
LEFT JOIN agg a ON r.lang = a.lang
"""


CORPUS_FUNNEL_SQL = _funnel_sql()


TEXT2_QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "corpus_curation_funnel": (corpus_curation_funnel, CORPUS_FUNNEL_SQL),
    "dedup_containment": (dedup_containment, DEDUP_CONTAINMENT_SQL),
    "corpus_temperature_sample": (
        corpus_temperature_sample,
        CORPUS_TEMPERATURE_SQL,
    ),
    "corpus_heavy_hitters": (corpus_heavy_hitters, CORPUS_HEAVY_HITTERS_SQL),
    "doc_quality_gopher": (doc_quality_gopher, DOC_QUALITY_GOPHER_SQL),
    "corpus_shuffle_shards": (corpus_shuffle_shards, CORPUS_SHUFFLE_SHARDS_SQL),
    "corpus_decontamination": (corpus_decontamination, CORPUS_DECON_SQL),
    "doc_pii_redact": (doc_pii_redact, DOC_PII_SQL),
    "doc_repetition_stats": (doc_repetition_stats, DOC_REPETITION_SQL),
    "doc_token_budget_sample": (doc_token_budget_sample, DOC_TOKEN_BUDGET_SQL),
    "corpus_mixture_weights": (corpus_mixture_weights, CORPUS_MIXTURE_SQL),
    "corpus_bigram_topk": (corpus_bigram_topk, CORPUS_BIGRAM_SQL),
}
