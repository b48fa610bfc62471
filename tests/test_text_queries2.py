"""Corpus-curation queries part 2: oracle parity + semantic invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.oracle_harness import assert_matches_oracle, duck_connection
from time_series_prediction_spark.plans.text_queries2 import (
    TEXT2_QUERIES,
    corpus_mixture_weights,
    doc_token_budget_sample,
)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", sorted(n for n, (_, sql) in TEXT2_QUERIES.items() if sql)
)
def test_text2_matches_oracle(spark, sf_dir, duck, name):
    fn, sql = TEXT2_QUERIES[name]
    assert_matches_oracle(fn(spark, sf_dir), duck, sql, name=name)


def test_curation_funnel_monotone_and_raw_counts(spark, sf_dir):
    """The funnel can only shrink left-to-right, its raw counts must
    equal the corpus construction (non-bench docs + planted copies),
    and each stage must actually remove something somewhere (planted
    dups at dedup; bench copies at decontamination)."""
    from time_series_prediction_spark.plans.text_queries2 import (
        corpus_curation_funnel,
    )
    from time_series_prediction_spark.sources.io import read_table

    rows = corpus_curation_funnel(spark, sf_dir).collect()
    docs = read_table(spark, sf_dir, "documents")
    expect_raw = {
        r["lang"]: r["n"]
        for r in docs.where(F.col("doc_id") % 25 != 0)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in docs.where(F.col("doc_id") % 20 == 0).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")
    ).collect():
        expect_raw[r["lang"]] = expect_raw.get(r["lang"], 0) + r["n"]
    assert {r["lang"]: r["n_raw"] for r in rows} == expect_raw
    for r in rows:
        assert (
            r["n_raw"] >= r["n_quality"] >= r["n_unique"] >= r["n_clean"]
        ), r
    assert sum(r["n_quality"] for r in rows) > sum(
        r["n_unique"] for r in rows
    ), "dedup stage removed nothing (planted dups missed)"
    assert sum(r["n_unique"] for r in rows) > sum(
        r["n_clean"] for r in rows
    ), "decontamination removed nothing (bench copies missed)"


def test_containment_finds_every_planted_fragment(spark, sf_dir):
    """Every planted fragment (first 60% of a doc's words) has its
    3-gram shingle set fully inside its source doc, so it must surface
    as contained_id with containment exactly 1.0 — and the short side
    is always reported as the contained one."""
    from time_series_prediction_spark.plans.text_queries2 import (
        dedup_containment,
    )
    from time_series_prediction_spark.sources.io import read_table

    n_docs = read_table(spark, sf_dir, "documents").count()
    rows = dedup_containment(spark, sf_dir).collect()
    frag_pairs = {
        r["contained_id"]: r
        for r in rows
        if r["contained_id"] >= 2000000
        and r["container_id"] == r["contained_id"] - 2000000
    }
    assert len(frag_pairs) == n_docs, (
        f"{len(frag_pairs)}/{n_docs} planted fragments recovered"
    )
    assert all(r["containment"] == 1.0 for r in frag_pairs.values())
    # upsampling property of the temperature sampler: the rarest
    # language's keep rate exceeds the most common language's
    from time_series_prediction_spark.plans.text_queries2 import (
        corpus_temperature_sample,
    )

    trows = corpus_temperature_sample(spark, sf_dir).collect()
    lo = min(trows, key=lambda r: r["n_docs"])
    hi = max(trows, key=lambda r: r["n_docs"])
    if lo["n_docs"] < hi["n_docs"]:
        assert lo["rate"] > hi["rate"]
    assert all(r["n_sampled"] <= r["n_docs"] for r in trows)


def test_budget_sample_respects_budget(spark, sf_dir):
    rows = doc_token_budget_sample(spark, sf_dir, budget_chars=5000).collect()
    per_lang: dict[str, int] = {}
    for r in rows:
        per_lang[r["lang"]] = max(per_lang.get(r["lang"], 0), r["cum_chars"])
    assert per_lang, "selection must be non-empty at a 5k budget"
    for lang, cum in per_lang.items():
        assert cum <= 5000, (lang, cum)


def test_mixture_weights_sum_to_one_and_flatten(spark, sf_dir):
    rows = corpus_mixture_weights(spark, sf_dir).collect()
    assert abs(sum(r["raw_share"] for r in rows) - 1.0) < 1e-9
    assert abs(sum(r["temp_weight"] for r in rows) - 1.0) < 1e-9
    # temperature mixing flattens: smallest language gains share,
    # largest loses share
    lo = min(rows, key=lambda r: r["n_chars"])
    hi = max(rows, key=lambda r: r["n_chars"])
    if lo["n_chars"] < hi["n_chars"]:
        assert lo["temp_weight"] >= lo["raw_share"]
        assert hi["temp_weight"] <= hi["raw_share"]


def test_gopher_rule_counts_consistent(spark, sf_dir):
    """Rule-failure accounting: kept docs fail nothing, so n_kept +
    (docs failing >=1 rule) == n_docs, and no single-rule count can
    exceed the failing-doc total."""
    from time_series_prediction_spark.plans.text_queries2 import doc_quality_gopher
    from time_series_prediction_spark.sources.io import read_table

    rows = doc_quality_gopher(spark, sf_dir).collect()
    assert rows
    n_total = read_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_total
    for r in rows:
        failing = r["n_docs"] - r["n_kept"]
        for rule in (
            "fail_word_count",
            "fail_mean_word_len",
            "fail_stopword",
            "fail_singleton",
            "fail_repetition",
        ):
            assert 0 <= r[rule] <= failing
        assert (
            r["fail_word_count"]
            + r["fail_mean_word_len"]
            + r["fail_stopword"]
            + r["fail_singleton"]
            + r["fail_repetition"]
            >= failing
        )
