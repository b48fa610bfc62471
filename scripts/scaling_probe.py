#!/usr/bin/env python3
"""Scale-up probe: run representative registry queries at every
fixture SF and print the warm wall-clock per SF plus the measured
scaling exponent between the two largest SFs (time ratio per 10x of
data; 1.0 would be perfectly linear, < 1 sub-linear because fixed
costs still dominate locally).

Usage: python scripts/scaling_probe.py [q1,q3,...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

DEFAULT = [
    "q1_pricing_summary",        # scan + wide aggregate
    "q3_shipping_priority",      # 3-way join + top-k
    "events_sessionization",     # window gap sessionize
    "dedup_exact",               # hash groupBy dedup
    "dedup_minhash_lsh",         # shingle + banded LSH join
    "embedding_cosine_topk",     # broadcast ANN scan
    "doc_quality_gopher",        # per-row array expressions
    "corpus_shuffle_shards",     # hash shard manifest
    "embedding_pq_ann",          # r4: IVF-pruned ADC scan + refine
    "dedup_containment",         # r4: blocked containment self-join
    "corpus_curation_funnel",    # r4: quality+dedup+decon composition
    "dedup_incremental_batch",   # r5: batch-vs-corpus key-set joins
    "corpus_dup_substring_spans",  # r5: shingle freq + interval merge
    "corpus_leakage_safe_split",   # r5: group-hash split aggregate
    # r6: the rest of the dedup + ANN families
    "dedup_simhash",             # md5 simhash + adaptive banding
    "dedup_ngram_jaccard",       # blocked exact-Jaccard self-join
    "dedup_clusters",            # LSH pairs -> connected components
    "embedding_lsh_ann",         # hyperplane-bucketed ANN
    "embedding_ivf_ann",         # Lloyd cells + probed scan
    # r6 session 2: layout + semantic additions
    "bucketed_orders_revenue",   # bucketed co-located fact join
    "dedup_semantic_prune",      # SemDeDup k-means cell pruning
    "embedding_hard_negatives",  # cross-label exact top-k
    "events_streamed_ingest_scan",  # streamed z-layout pruned scan
    "ts_backtest_linear",        # rolling-origin OLS backtest
    "orders_quality_audit",      # one-pass declarative validation
    "docs_quarantine_ingest_scan",  # audited streaming landing scan
    # r7: copy-on-write table family
    "orders_cow_current_scan",   # MERGE+DELETE state via committed manifest
    "orders_cow_changes",        # symmetric-difference CDC feed
    "orders_cow_view_maintenance",  # CDC-folded incremental rollup
    "orders_upsert_ingest_scan",  # streamed-merge final state
    "orders_dv_scan",            # deletion-vector merge-on-read scan
    "orders_cow_history",        # DESCRIBE HISTORY off manifest metadata
    # r8: portable sketches + packing + runtime-filter join
    "approx_distinct_users_daily",   # portable HLL register fold
    "events_type_overlap_sketch",    # register set-algebra pairs
    "lineitem_quantiles_portable",   # log-linear histogram quantiles
    "doc_packing_harmonic",          # closed-form size-class packing
    "bloom_pruned_join",             # runtime bloom semi-join reduction
    "cashflow_scoring_pipeline",     # serving lifecycle, ppm R2
]

SFS = ["sf0.001", "sf0.01", "sf0.1"]


def main() -> int:
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else DEFAULT

    import __spark_entry__ as entrymod
    from time_series_prediction_spark.session import get_spark

    spark = get_spark(
        app_name="scaling-probe", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    out: dict[str, dict[str, float]] = {}
    for name in names:
        fn = qs[name]
        per_sf: dict[str, float] = {}
        for sf in SFS:
            sf_dir = f"/root/testdata/{sf}"
            fn(spark, sf_dir).count()  # warm: plan + code cache
            t0 = time.time()
            fn(spark, sf_dir).count()
            per_sf[sf] = round(time.time() - t0, 3)
        ratio = per_sf["sf0.1"] / max(per_sf["sf0.01"], 1e-9)
        per_sf["x_per_10x"] = round(ratio, 2)
        # fitted scaling exponent for t ~ n^e between the two largest
        # SFs: e = log10(ratio). e <= 1 is at-most-linear; anything
        # clearly above 1 is flagged super-linear.
        import math

        per_sf["exponent"] = round(math.log10(max(ratio, 1e-9)), 2)
        out[name] = per_sf
        flag = "  ** SUPER-LINEAR **" if per_sf["exponent"] > 1.05 else ""
        print(f"{name:28s} " + "  ".join(f"{sf}={per_sf[sf]:6.2f}s" for sf in SFS)
              + f"  ratio(0.01->0.1)={per_sf['x_per_10x']:.2f}x"
              + f"  e={per_sf['exponent']:.2f}{flag}")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
