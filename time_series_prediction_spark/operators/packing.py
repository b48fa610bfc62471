"""Sequence packing: assign documents to fixed-token-budget bins
(context windows) — the last step of LLM training-data prep, after
chunking/dedup/sampling.

Optimal bin packing is NP-hard and inherently sequential; the
distributed form used here is partition-local best-fit-decreasing
(BFD): documents are hashed to P independent packing groups, each
group packs its own documents in one Arrow batch (applyInPandas),
bin ids are namespaced by group. BFD within a group guarantees
≤ (11/9·OPT + 1) bins for that group (same bound as FFD), groups are
independent, and P scales with the cluster — no global state, one
shuffle on the group key. A document longer than the budget gets a
bin of its own (callers should chunk first — see
plans/text_queries.doc_chunks).

Placement is O(log n_bins) per document: bins are kept as a sorted
list of (residual, bin) pairs and the smallest adequate residual is
found by bisect — no linear scan over all open bins, so a
multi-million-doc group stays near-linear.
"""

from __future__ import annotations

from bisect import bisect_left, insort

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# bin ids: (group << _LOCAL_BITS) | local index. 2^40 bins per group at
# budget 2048 ≈ 2.3e15 tokens per group before overflow — and _pack
# asserts rather than silently colliding across groups.
_LOCAL_BITS = 40


def pack_documents(
    docs: DataFrame,
    budget: int = 2048,
    id_col: str = "doc_id",
    len_col: str = "n_tokens",
    n_groups: int | None = None,
    rows_per_group: int = 1_000_000,
    group_expr=None,
) -> DataFrame:
    """→ (doc_id, n_tokens, bin_id): every input doc exactly once;
    sum(n_tokens) per bin ≤ budget unless the bin holds a single
    oversized doc. Deterministic: group = xxhash64(doc_id) mod P,
    BFD order = (length desc, id asc); ties in residual capacity go to
    the lower bin id.

    Group sizing: each group is ONE applyInPandas task holding all its
    documents' (id, length) rows in memory, so the group count must
    grow with the corpus. With ``n_groups=None`` (the default) it is
    derived as ceil(rows / rows_per_group) from one narrow count scan
    — at 10^10 docs that is 10^4 groups of ~1M (id, length) pairs
    (~tens of MB per task), never 32 groups of 300M. Pass ``n_groups``
    explicitly to pin a layout (bin ids are only comparable across
    runs that used the same group count).

    ``group_expr`` (a Column over the input) replaces the hash
    grouping with a CALLER-CHOSEN deterministic bucketing. The load-
    bearing case: bucketing by per-bin capacity class
    ``floor(budget / len)`` makes this BFD kernel's output closed-form
    replayable — within a class every doc lies in
    (budget/(c+1), budget/c], so a bin holds at most c docs (c+1
    exceed the budget) while ANY open bin with fewer than c holds the
    next doc (residual ≥ budget/c ≥ doc); best-fit therefore fills
    bins to exactly c docs in (length desc, id asc) order, i.e. the
    chunked rank assignment a SQL window recomputes bin-for-bin
    (``pack_documents_harmonic`` / its DuckDB oracle). Same real BFD
    code path, provably identical bins, full oracle coverage."""
    if group_expr is not None:
        grouped = docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(len_col).cast("long").alias("n_tokens"),
            group_expr.cast("int").alias("_grp"),
        )
    else:
        if n_groups is None:
            n_rows = docs.count()
            n_groups = max(1, -(-n_rows // rows_per_group))
        grouped = docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(len_col).cast("long").alias("n_tokens"),
            F.pmod(F.xxhash64(id_col), F.lit(n_groups))
            .cast("int").alias("_grp"),
        )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        grp = int(pdf["_grp"].iloc[0])
        open_bins: list[tuple[int, int]] = []  # (residual, bin) ascending
        n_bins = 0
        assign: list[int] = []
        for n in pdf["n_tokens"]:
            n = int(n)
            # best fit: smallest residual that still holds n
            i = bisect_left(open_bins, (n, -1))
            if i < len(open_bins):
                residual, b = open_bins.pop(i)
                insort(open_bins, (residual - n, b))
            else:
                b = n_bins
                n_bins += 1
                insort(open_bins, (max(0, budget - n), b))
            assign.append(b)
        # Not an assert: under `python -O` asserts are stripped and an
        # overflowing group would silently collide bin ids across groups.
        if n_bins >= (1 << _LOCAL_BITS):
            raise ValueError(
                f"packing group {grp} overflowed {n_bins} bins; raise n_groups"
            )
        pdf["bin_id"] = [(grp << _LOCAL_BITS) | b for b in assign]
        return pdf[["doc_id", "n_tokens", "bin_id"]]

    return grouped.groupBy("_grp").applyInPandas(
        _pack, "doc_id long, n_tokens long, bin_id long"
    )


def pack_documents_harmonic(
    docs: DataFrame,
    budget: int = 2048,
    id_col: str = "doc_id",
    len_col: str = "n_tokens",
) -> DataFrame:
    """Harmonic size-class packing — the fully closed-form,
    zero-Python alternative to ``pack_documents``.

    Documents are classed by per-bin capacity c = floor(budget/len)
    (so lengths fall in (budget/(c+1), budget/c]) and each bin takes
    exactly c documents of its class, assigned by dense rank (length
    desc, id asc). Every completely filled bin holds c docs each
    longer than budget/(c+1), so its fill fraction EXCEEDS c/(c+1) —
    ≥ 1/2, approaching 1 for short docs; only the last bin of each
    class can be underfull. Oversized docs (len > budget, c = 0) get
    singleton bins, same convention as BFD.

    Scale/verifiability trade vs BFD: BFD packs tighter
    (11/9·OPT + 1 per group) but is sequential per group — an
    applyInPandas stage whose per-group state must fit one task, and
    whose algorithm no SQL engine can replay. Harmonic is ONE window
    rank per class (a sort-shuffle keyed on ~log(budget) classes, no
    Python, no per-task state) and is plain relational algebra — the
    DuckDB oracle checks it bin-for-bin (``doc_packing_harmonic``).

    Bin ids are namespaced per class: c·2^40 + within-class index
    (same ``_LOCAL_BITS`` convention as ``pack_documents``).
    """
    from pyspark.sql import Window

    # floor of a double division of ints < 2^53 is exact (quotient is
    # ≥ 1/len away from the next integer, far beyond one ulp) — the
    # same dialect-portable idiom the oracle SQL uses
    cap = (
        f"CASE WHEN n_tokens > {budget} THEN CAST(0 AS BIGINT) "
        f"ELSE CAST(floor({float(budget)!r} / n_tokens) AS BIGINT) END"
    )
    w = Window.partitionBy("_cap").orderBy(
        F.col("n_tokens").desc(), F.col("doc_id").asc()
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(len_col).cast("long").alias("n_tokens"),
        )
        .withColumn("_cap", F.expr(cap))
        .withColumn("_rk", F.row_number().over(w))
        .select(
            "doc_id",
            "n_tokens",
            (
                F.col("_cap") * F.lit(1 << _LOCAL_BITS)
                + F.when(F.col("_cap") <= 1, F.col("_rk") - 1).otherwise(
                    F.expr(
                        "CAST(floor(CAST(_rk - 1 AS DOUBLE) / _cap) AS BIGINT)"
                    )
                )
            ).alias("bin_id"),
        )
    )
