"""Similarity search over embedding columns (array<float>).

Beyond-reference scope (SURVEY §7.1.8): approximate-nearest-neighbor
over a vector column, the retrieval primitive of a training-data
pipeline (near-dup by embedding, semantic dedup, hard-negative
mining).

* cosine_topk — brute-force baseline: broadcast the (small) query set,
  compute cosine against every corpus vector, window top-k. The corpus
  side never shuffles until the final per-query top-k (k rows per
  query via row_number), so at 100 TB the cost is one scan + tiny
  exchange. Dot products are computed over QUANTIZED components
  (round(v·2^20) as bigint): exact integer arithmetic → results are
  order-independent and reproducible across engines (the DuckDB
  oracle computes the identical quantized cosine), at 1e-6 relative
  quantization error — semantically irrelevant for ANN.
* lsh_ann_topk — scale path: random-hyperplane LSH. Each vector gets a
  b-bit bucket (sign pattern against b pseudo-random hyperplanes
  derived from seeded hashes — no stored model, any executor
  recomputes the same planes); candidates = bucket-mates across probe
  tables; exact cosine re-rank within candidates. Bucketing turns the
  all-pairs problem into an equi-join on bucket id.
"""

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_SCALE = 1 << 20  # component quantization: exact in bigint, ~1e-6 rel err


def quantize(vec_col: str) -> Column:
    """array<float> → array<bigint> of round(v * 2^20)."""
    return F.expr(
        f"transform({vec_col}, v -> CAST(round(CAST(v AS DOUBLE) * {_SCALE}) AS BIGINT))"
    )


def _dot(a: str, b: str) -> str:
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"


def _norm2(a: str) -> str:
    return f"aggregate({a}, 0L, (acc, v) -> acc + v * v)"


def cosine_expr(a: str, b: str) -> Column:
    """Quantized cosine similarity between two bigint vectors."""
    return F.expr(
        f"CAST({_dot(a, b)} AS DOUBLE) / "
        f"(sqrt(CAST({_norm2(a)} AS DOUBLE)) * sqrt(CAST({_norm2(b)} AS DOUBLE)))"
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact (quantized) cosine top-k: for each query vector, the k
    nearest corpus vectors (excluding itself). Queries are broadcast —
    the corpus scan stays shuffle-free until the top-k exchange."""
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), quantize(vec_col).alias("cvec")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), quantize(vec_col).alias("qvec")
    )
    scored = c.join(F.broadcast(q), F.col("corpus_id") != F.col("query_id")).select(
        "query_id",
        "corpus_id",
        cosine_expr("qvec", "cvec").alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("corpus_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "corpus_id",
            "cosine",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def lsh_bucket(
    vec_col: str, n_planes: int = 12, seed: int = 42, dim: int = 64
) -> Column:
    """Random-hyperplane LSH bucket id (bigint of n_planes sign bits).

    Plane components are generated driver-side from the seed (numpy
    PCG64 — identical on every run/cluster) and embedded as a LITERAL
    nested array, so the per-row work is n_planes·dim multiply-adds in
    codegen — no hashing or transcendentals in the inner loop, and no
    model state to ship: the literal travels inside the plan."""
    import numpy as np

    planes = np.random.default_rng(seed).standard_normal((n_planes, dim))
    lit = (
        "array("
        + ", ".join(
            "array(" + ", ".join(f"{float(v)!r}D" for v in row) + ")" for row in planes
        )
        + ")"
    )
    proj = (
        f"aggregate(sequence(0, {dim - 1}), 0D, "
        f"(acc, i) -> acc + CAST({vec_col}[i] AS DOUBLE) * _pl[p][i])"
    )
    return F.expr(
        f"transform(array({lit}), _pl -> "
        f"aggregate(sequence(0, {n_planes - 1}), 0L, (acc, p) -> "
        f"acc + CASE WHEN {proj} > 0D THEN shiftleft(1L, p) ELSE 0L END))[0]"
    )


def lsh_table_buckets(
    n_planes: int, n_tables: int, seed: int = 42
) -> Column:
    """All-tables LSH bucket ids as ONE vectorized ``pandas_udf``:
    Arrow-batched numpy matmul (B×dim @ dim×(tables·planes)) → sign
    bits → per-table bucket ids (array<bigint> of n_tables).

    This is the deliberate Python exception (like model inference):
    dense projections are BLAS work — the Arrow batch + matmul path is
    ~1000× the throughput of interpreted array-lambda folds, and the
    planes are regenerated from the seed inside each worker (no model
    state shipped). Table t's planes use rng(seed + 1000·t), identical
    to ``lsh_bucket``'s, so the two implementations bucket identically.
    """
    @pandas_udf("array<bigint>")
    def _buckets(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        dim = mat.shape[1]
        weights = np.concatenate(
            [
                np.random.default_rng(seed + 1000 * t).standard_normal(
                    (n_planes, dim)
                )
                for t in range(n_tables)
            ],
            axis=0,
        ).T  # dim × (tables·planes)
        bits = (mat @ weights) > 0  # B × (tables·planes)
        pows = 1 << np.arange(n_planes, dtype=np.int64)
        buckets = bits.reshape(len(mat), n_tables, n_planes) @ pows
        return pd.Series(list(buckets))

    return _buckets


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 10,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in ≥1 of
    ``n_tables`` independent hash tables, re-ranked by exact
    (quantized) cosine. Recall is tuned by (n_planes, n_tables);
    validated against cosine_topk in tests."""
    bucket_udf = lsh_table_buckets(n_planes, n_tables, seed)

    def with_buckets(df: DataFrame, vid: str, vq: str) -> DataFrame:
        out = df.select(
            F.col(id_col).alias(vid),
            quantize(vec_col).alias(vq),
            bucket_udf(F.col(vec_col)).alias("_buckets"),
        )
        stacked = out.select(
            vid,
            vq,
            F.posexplode(F.col("_buckets")).alias("table", "bucket"),
        )
        return stacked

    c = with_buckets(corpus, "corpus_id", "cvec")
    q = with_buckets(queries, "query_id", "qvec")
    cand = (
        c.join(
            q,
            (c.table == q.table)
            & (c.bucket == q.bucket)
            & (F.col("corpus_id") != F.col("query_id")),
        )
        .select("query_id", "corpus_id", "qvec", "cvec")
        .dropDuplicates(["query_id", "corpus_id"])
    )
    scored = cand.select(
        "query_id", "corpus_id", cosine_expr("qvec", "cvec").alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "corpus_id",
            "cosine",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def centroids_by_label(
    df: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """Per-label mean embedding from exact quantized integer sums
    (deterministic elementwise average)."""
    dim_df = df.select(
        F.col(label_col),
        F.posexplode(quantize(vec_col)).alias("dim", "q"),
    )
    per_dim = dim_df.groupBy(label_col, "dim").agg(
        F.sum("q").alias("s"), F.count(F.lit(1)).alias("n")
    )
    return (
        per_dim.groupBy(label_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("dim"), F.col("s"), F.col("n")))
            ).alias("_parts")
        )
        .select(
            label_col,
            F.expr(
                f"transform(_parts, p -> CAST(p.s AS DOUBLE) / p.n / {_SCALE})"
            ).alias("centroid"),
        )
    )
