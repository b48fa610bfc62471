"""Round-5 corpus-maintenance queries: oracle parity + semantic
invariants for incremental batch dedup and source-overlap analysis."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.oracle_harness import assert_matches_oracle, duck_connection
from time_series_prediction_spark.plans.text_queries3 import (
    TEXT3_QUERIES,
    dedup_incremental_batch,
    corpus_source_overlap,
)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", sorted(n for n, (_, sql) in TEXT3_QUERIES.items() if sql)
)
def test_text3_matches_oracle(spark, sf_dir, duck, name):
    fn, sql = TEXT3_QUERIES[name]
    assert_matches_oracle(fn(spark, sf_dir), duck, sql, name=name)


def test_incremental_batch_verdict_tiers(spark, sf_dir):
    """Every planted verbatim arrival must be exact_dup, every planted
    suffix-mutated arrival must be near_dup (fingerprint preserved, md5
    changed), and all three tiers must be non-empty — the query can't
    go green with a dead tier."""
    out = dedup_incremental_batch(spark, sf_dir).cache()
    by_verdict = {
        r["verdict"]: r["n"]
        for r in out.groupBy("verdict").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(by_verdict) == {"exact_dup", "near_dup", "novel"}, by_verdict
    planted_exact = out.where(
        F.col("doc_id").between(1_000_000, 1_999_999)
    )
    assert (
        planted_exact.where(F.col("verdict") != "exact_dup").count() == 0
        and planted_exact.count() > 0
    )
    planted_near = out.where(F.col("doc_id") >= 2_000_000)
    assert (
        planted_near.where(F.col("verdict") != "near_dup").count() == 0
        and planted_near.count() > 0
    )
    out.unpersist()


def test_source_overlap_is_symmetric_upper_triangle(spark, sf_dir):
    """Pairs are emitted once with source_a < source_b, jaccard is in
    (0, 1], and shared_fps never exceeds either side's fingerprint
    count."""
    from time_series_prediction_spark.operators import text
    from time_series_prediction_spark.sources.io import read_table

    rows = corpus_source_overlap(spark, sf_dir).collect()
    assert rows, "fixture should have cross-source fingerprint overlap"
    sizes = {
        r["source"]: r["n"]
        for r in read_table(spark, sf_dir, "documents")
        .select("source", text.fingerprint().alias("fp"))
        .distinct()
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert 0 < r["jaccard"] <= 1
        assert 0 < r["shared_fps"] <= min(
            sizes[r["source_a"]], sizes[r["source_b"]]
        )


def test_leakage_safe_split_never_splits_a_group(spark, sf_dir):
    """Structural guarantee made visible: every fingerprint group
    lands in exactly one split; a naive doc-id-level split on the
    same corpus DOES scatter at least one group across splits (the
    bug this query exists to prevent); and the three splits cover
    all docs."""
    from time_series_prediction_spark.operators import text
    from time_series_prediction_spark.plans.text_queries3 import (
        corpus_leakage_safe_split,
    )
    from time_series_prediction_spark.sources.io import read_table

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", text.fingerprint().alias("fp")
    )
    hexd = "0123456789abcdef"

    def byte_of(col):
        return (
            f"(instr('{hexd}', substr(md5({col}), 1, 1)) - 1) * 16 "
            f"+ instr('{hexd}', substr(md5({col}), 2, 1)) - 1"
        )

    group_split = docs.withColumn(
        "split", F.expr(f"CASE WHEN ({byte_of('fp')}) < 204 THEN 't' "
                        f"WHEN ({byte_of('fp')}) < 230 THEN 'v' ELSE 'e' END")
    )
    assert (
        group_split.groupBy("fp")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
        == 0
    )
    naive = docs.withColumn(
        "split",
        F.expr(
            f"CASE WHEN ({byte_of('CAST(doc_id AS STRING)')}) < 204 "
            f"THEN 't' WHEN ({byte_of('CAST(doc_id AS STRING)')}) < 230 "
            f"THEN 'v' ELSE 'e' END"
        ),
    )
    leaked = (
        naive.groupBy("fp")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert leaked > 0, (
        "fixture has multi-doc fingerprint groups; a doc-level split "
        "must scatter at least one"
    )
    totals = corpus_leakage_safe_split(spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in totals) == read_table(
        spark, sf_dir, "documents"
    ).count()


def test_dup_substring_spans_invariants(spark, sf_dir):
    """Interval-merge sanity: coverage never exceeds the doc, every
    merged span covers at least K tokens (so dup_tokens >= K * n_spans),
    duplication takes two — if any doc has a span, at least one other
    doc must too — and span-free docs still report a zero row."""
    from time_series_prediction_spark.plans.text_queries3 import (
        _SPAN_K,
        corpus_dup_substring_spans,
    )
    from time_series_prediction_spark.sources.io import read_table

    out = corpus_dup_substring_spans(spark, sf_dir).cache()
    assert out.count() == read_table(spark, sf_dir, "documents").count()
    assert out.where(F.col("dup_tokens") > F.col("n_tokens")).count() == 0
    assert (
        out.where(
            (F.col("n_spans") > 0)
            & (F.col("dup_tokens") < _SPAN_K * F.col("n_spans"))
        ).count()
        == 0
    )
    with_spans = out.where(F.col("n_spans") > 0).count()
    assert with_spans != 1, "a duplicated substring needs two documents"
    assert with_spans > 0, "fixture has organic cross-doc duplicated runs"
    out.unpersist()


def test_merged_span_stats_matches_brute_force(spark):
    """Property check of the gaps-and-islands window math: 60 random
    (doc, starts, k) cases — merged-span count and covered-token total
    must equal the brute-force union of [p, p+k) position sets."""
    import random

    from time_series_prediction_spark.plans.text_queries3 import (
        merged_span_stats,
    )

    rng = random.Random(11)
    for trial in range(6):
        k = rng.randint(1, 9)
        rows, want = [], {}
        for doc in range(10):
            n = rng.randint(1, 25)
            starts = sorted(rng.sample(range(0, 120), n))
            rows += [(doc, p) for p in starts]
            covered = set()
            for p in starts:
                covered.update(range(p, p + k))
            # count maximal contiguous runs of covered positions
            spans = sum(
                1 for x in covered if x - 1 not in covered
            )
            want[doc] = (spans, len(covered))
        df = spark.createDataFrame(rows, "doc_id long, p long")
        got = {
            r["doc_id"]: (r["n_spans"], r["dup_tokens"])
            for r in merged_span_stats(df, k).collect()
        }
        assert got == want, (trial, k)


def test_dup_substring_spans_boilerplate_hot_key(spark):
    """The hot-key case: EVERY doc shares an identical 8-token header
    (one shingle hash carries the whole corpus through the semi join)
    followed by a unique body. Expected per-doc coverage is exactly
    the header span [0, 8) — one span, 8 tokens — computed over a
    planted corpus, not the fixture."""
    from time_series_prediction_spark.plans.text_queries3 import (
        dup_substring_spans_frame,
    )

    n_docs = 400
    header = " ".join(f"h{i}" for i in range(8))
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(header + " "),
            # unique body: 12 tokens derived from doc_id, shared with
            # no other doc
            F.expr(
                "array_join(transform(sequence(0, 11), "
                "i -> concat('b', id, '_', i)), ' ')"
            ),
        ).alias("text"),
    )
    out = dup_substring_spans_frame(docs, 8).collect()
    assert len(out) == n_docs
    for r in out:
        assert r["n_tokens"] == 20
        assert r["n_spans"] == 1, r
        assert r["dup_tokens"] == 8, r


def test_unigram_surprisal_matches_numpy_truth(spark, sf_dir):
    """The staged portable ln + nano-nat quantization must agree with
    float math.log scoring to well inside the quantization step."""
    import math
    from collections import Counter

    from time_series_prediction_spark.plans.text_queries3 import (
        doc_unigram_surprisal,
    )
    from time_series_prediction_spark.sources.io import read_table

    got = {r["doc_id"]: r for r in doc_unigram_surprisal(spark, sf_dir).collect()}
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    counts: Counter = Counter()
    total = 0
    toks_by_doc = {}
    for r in docs:
        toks = [t for t in r["text"].split(" ") if t]
        toks_by_doc[r["doc_id"]] = toks
        counts.update(toks)
        total += len(toks)
    for doc_id, row in got.items():
        toks = toks_by_doc[doc_id]
        want = sum(math.log(total / counts[t]) for t in toks) / len(toks)
        assert abs(row["avg_surprisal"] - want) < 1e-7, (doc_id, row, want)
        assert row["n_tokens"] == len(toks)
    # top-20 really are the max-surprisal docs: recompute all and check
    all_scores = sorted(
        (
            sum(math.log(total / counts[t]) for t in toks) / len(toks)
            for toks in toks_by_doc.values()
        ),
        reverse=True,
    )
    floor20 = all_scores[19] if len(all_scores) >= 20 else all_scores[-1]
    for row in got.values():
        assert row["avg_surprisal"] >= floor20 - 1e-7


def test_bm25_matches_pure_python_truth(spark, sf_dir):
    """BM25 golden check against an INDEPENDENT pure-Python Okapi
    implementation (math.log, no shared expression text with either
    engine) — catches a both-engines-agree-on-the-wrong-formula slip
    the mirrored DuckDB oracle cannot see. Also verifies the top-20
    really are the corpus-wide max scores."""
    import math

    from time_series_prediction_spark.plans.text_queries3 import (
        _BM25_TERMS,
        doc_bm25_topk,
    )
    from time_series_prediction_spark.sources.io import read_table

    got = {
        r["doc_id"]: r
        for r in doc_bm25_topk(spark, sf_dir).collect()
    }
    assert len(got) == 20
    docs = {
        r["doc_id"]: [t for t in r["text"].split(" ") if t]
        for r in read_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    df = {
        q: sum(1 for t in docs.values() if q in t) for q in _BM25_TERMS
    }
    k1, b = 1.2, 0.75

    def score(toks: list[str]) -> float:
        s = 0.0
        for q in _BM25_TERMS:
            tf = toks.count(q)
            if tf == 0:
                continue
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * (tf * (k1 + 1)) / (
                tf + k1 * (1 - b + b * len(toks) / avgdl)
            )
        return s

    truth = {d: score(t) for d, t in docs.items()}
    for doc_id, row in got.items():
        assert abs(row["bm25"] - truth[doc_id]) < 1e-6, (doc_id, row)
        assert row["dl"] == len(docs[doc_id])
        assert row["n_terms_hit"] == sum(
            1 for q in _BM25_TERMS if q in docs[doc_id]
        )
    floor = sorted(truth.values(), reverse=True)[19]
    for row in got.values():
        assert row["bm25"] >= floor - 1e-6
