"""Sequence packing: assign documents to fixed-token-budget bins
(context windows) — the last step of LLM training-data prep, after
chunking/dedup/sampling.

Optimal bin packing is NP-hard and inherently sequential; the
distributed form used here is partition-local first-fit-decreasing
(FFD): documents are hashed to P independent packing groups, each
group packs its own documents in one Arrow batch (applyInPandas),
bin ids are namespaced by group. FFD within a group guarantees
≤ (11/9·OPT + 1) bins for that group, groups are independent, and P
scales with the cluster — no global state, one shuffle on the group
key. A document longer than the budget gets a bin of its own (callers
should chunk first — see plans/text_queries.doc_chunks).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GROUP_SPAN = 1_000_000  # bin ids: group * span + local index


def pack_documents(
    docs: DataFrame,
    budget: int = 2048,
    id_col: str = "doc_id",
    len_col: str = "n_tokens",
    n_groups: int = 32,
) -> DataFrame:
    """→ (doc_id, n_tokens, bin_id): every input doc exactly once;
    sum(n_tokens) per bin ≤ budget unless the bin holds a single
    oversized doc. Deterministic: group = xxhash64(doc_id) mod P,
    FFD order = (length desc, id asc)."""
    grouped = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(len_col).cast("long").alias("n_tokens"),
        F.pmod(F.xxhash64(id_col), F.lit(n_groups)).cast("int").alias("_grp"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        grp = int(pdf["_grp"].iloc[0])
        fills: list[int] = []  # current fill per local bin
        assign: list[int] = []
        for n in pdf["n_tokens"]:
            n = int(n)
            for b, fill in enumerate(fills):  # first fit
                if fill + n <= budget:
                    fills[b] = fill + n
                    assign.append(b)
                    break
            else:
                fills.append(n)
                assign.append(len(fills) - 1)
        pdf["bin_id"] = [grp * _GROUP_SPAN + b for b in assign]
        return pdf[["doc_id", "n_tokens", "bin_id"]]

    return grouped.groupBy("_grp").applyInPandas(
        _pack, "doc_id long, n_tokens long, bin_id long"
    )
