"""Cross-engine-deterministic k-means cells for SemDeDup blocking.

The generic IVF trainer (``similarity.ivf_centroids``) runs Lloyd in
NumPy over Arrow batches — fast, but its float reductions (BLAS order,
pairwise summation) are not reproducible outside that stack, which is
why ``dedup_semantic_prune`` was a rows-only driver check through
round 6. This module re-derives the clustering as EXACT arithmetic so
a DuckDB oracle can replay it bit-for-bit:

* vectors are the already-quantized ``round(v · 2^20)`` bigints shared
  with every other oracle-backed similarity query;
* a centroid is held as ``(S: array<bigint> per-dim sums, m: count)``
  — never a float mean. Integer addition is associative, so no
  execution order (Spark shuffle, NumPy axis-sum, SQL GROUP BY) can
  perturb training;
* the squared distance to a centroid is ``Σ_i (v_i·m − S_i)² / m²``
  where every residual ``v_i·m − S_i`` is an exact int64 (|qv| ≤ 2^20,
  m ≤ 4096 ⇒ |v·m − S| ≤ 2^33), each squared term is one
  correctly-rounded double product, and the sum is a SEQUENTIAL fold
  in dimension order — the same IEEE op sequence in Spark
  (``aggregate``), NumPy (``cumsum``), and DuckDB (``list_reduce``);
* ties (equal double distances) break to the lowest cell id
  everywhere;
* the training sample is the deterministic rule ``vec_id <
  sample_cap`` (bounded work at any corpus size), init spreads the
  sample across cells by rank stripes ``(rk·k) DIV m``, and the
  iteration count is fixed — so the whole procedure, not just one
  trained snapshot, is expressible as unrolled SQL CTEs.

Scale shape: training collects the ≤ ``sample_cap``-row sample to the
driver ONCE and runs the exact Lloyd in NumPy (bounded memory/time at
any corpus size — the classic train-on-a-sample discipline); the full
corpus then pays a single JVM-side fold against the 16 centroid
literals — no Python stage, no shuffle — and the cell equi-join bounds
pair work by cell occupancy. Reference scope: beyond-reference
curation (SemDeDup, Abbas et al. 2023, arXiv:2303.09540); the
reference repo has no embedding operators.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from time_series_prediction_spark.operators.materialize import materialize
from time_series_prediction_spark.operators.similarity import quantize

N_CELLS = 16
SAMPLE_CAP = 4096
N_ITERS = 2
_SCALE = 1 << 20


# ---------------------------------------------------------------------------
# driver-side exact Lloyd on the bounded sample
# ---------------------------------------------------------------------------


def _dists_to(V: np.ndarray, s: np.ndarray, m: int) -> np.ndarray:
    """Per-row distance of int64 matrix ``V`` (n, d) to one centroid:
    exact residuals, double squares, SEQUENTIAL dim-order sum
    (``cumsum``, not pairwise ``sum``) — the engines' fold order."""
    t = (V * int(m) - s[None, :]).astype(np.float64)
    sq = t * t
    return np.cumsum(sq, axis=1)[:, -1] / float(int(m) * int(m))


def _train(V: np.ndarray, n_cells: int, n_iters: int) -> list[tuple[int, list[int], int]]:
    """Exact-integer Lloyd over the sample matrix ``V`` (rows already
    in vec_id order). Returns sorted (cell, S, m) triples."""
    mt = V.shape[0]
    rk = np.arange(mt, dtype=np.int64)
    stripe = (rk * n_cells) // mt
    cents: list[tuple[int, np.ndarray, int]] = []
    for c in np.unique(stripe):
        first = int(np.nonzero(stripe == c)[0][0])
        cents.append((int(c), V[first].copy(), 1))
    for _ in range(n_iters):
        dist = np.stack([_dists_to(V, s, m) for _, s, m in cents], axis=1)
        pick = np.argmin(dist, axis=1)  # first minimum = lowest cell
        nxt = []
        for col, (cell, _, _) in enumerate(cents):
            mask = pick == col
            mc = int(mask.sum())
            if mc == 0:
                continue  # empty cell drops, same as the SQL GROUP BY
            nxt.append((cell, V[mask].sum(axis=0), mc))  # exact int64
        cents = nxt
    return [(c, [int(v) for v in s], m) for c, s, m in cents]


def _cents_literal(cents: list[tuple[int, list[int], int]]) -> str:
    items = ", ".join(
        f"named_struct('cell', CAST({c} AS INT), "
        f"'s', array({', '.join(f'{v}L' for v in s)}), "
        f"'m', CAST({m} AS BIGINT))"
        for c, s, m in cents
    )
    return f"array({items})"


def _dist_sql(qv: str, s: str, m: str) -> str:
    """Squared-distance SQL fragment (double), the exact op sequence
    mirrored by the DuckDB oracle and the NumPy trainer."""
    term = f"CAST(v * {m} - sv AS DOUBLE) * CAST(v * {m} - sv AS DOUBLE)"
    return (
        f"aggregate(zip_with({qv}, {s}, (v, sv) -> {term}), 0D, "
        f"(a, x) -> a + x) / CAST({m} * {m} AS DOUBLE)"
    )


def _argmin_expr(cents_literal: str) -> str:
    """Each distance computed ONCE per cell, then a lexicographic
    struct sort (d, cell): the minimum distance wins, equal distances
    fall to the lowest cell — the oracle's ``ORDER BY dist, cell``."""
    return (
        f"element_at(array_sort(transform({cents_literal}, "
        f"ct -> named_struct('d', {_dist_sql('qv', 'ct.s', 'ct.m')}, "
        f"'cell', ct.cell))), 1).cell"
    )


def lloyd_assign(
    emb: DataFrame,
    n_cells: int = N_CELLS,
    sample_cap: int = SAMPLE_CAP,
    n_iters: int = N_ITERS,
) -> DataFrame:
    """(vec_id, qv, nrm, cell) for the full corpus, cells from the
    deterministic exact-integer Lloyd procedure above. The returned
    frame is materialized — it feeds both sides of the pair join and
    the membership counts, so the assignment fold is paid once."""
    q = emb.select("vec_id", quantize("embedding").alias("qv"))
    sample = (
        q.where(F.col("vec_id") < sample_cap)
        .orderBy("vec_id")
        .collect()
    )
    V = np.array([r.qv for r in sample], dtype=np.int64)
    cents = _train(V, n_cells, n_iters)
    full = q.withColumn("cell", F.expr(_argmin_expr(_cents_literal(cents))))
    return materialize(
        full.withColumn(
            "nrm",
            F.expr(
                "sqrt(CAST(aggregate(qv, 0L, (a, v) -> a + v * v) AS DOUBLE))"
            ),
        )
    )


# ---------------------------------------------------------------------------
# DuckDB mirror: the SAME procedure as unrolled CTEs
# ---------------------------------------------------------------------------


def _duck_dist(qv: str, s: str, m: str, dims: int) -> str:
    term = (
        f"CAST({qv}[i] * {m} - {s}[i] AS DOUBLE)"
        f" * CAST({qv}[i] * {m} - {s}[i] AS DOUBLE)"
    )
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(range(1, {dims + 1}), i -> {term})), "
        f"(a, x) -> a + x) / CAST({m} * {m} AS DOUBLE)"
    )


def _duck_assign_cte(src: str, cents: str, out: str, dims: int) -> str:
    """CTE assigning every row of ``src`` (vec_id, qv) to its nearest
    centroid in ``cents`` (cell, s, m): window argmin, ties to the
    lowest cell — same comparison stream as the Spark fold."""
    dist = _duck_dist("r.qv", "c.s", "c.m", dims)
    return f"""{out} AS (
  SELECT vec_id, qv, cell FROM (
    SELECT r.vec_id, r.qv, c.cell,
           row_number() OVER (PARTITION BY r.vec_id
                              ORDER BY {dist} ASC, c.cell ASC) AS prn
    FROM {src} r CROSS JOIN {cents} c)
  WHERE prn = 1
)"""


def _duck_centroid_cte(src: str, out: str, dims: int) -> str:
    return f"""{out}_d AS (
  SELECT cell, t.pos AS pos, sum(qv[t.pos]) AS sv
  FROM {src} CROSS JOIN (SELECT unnest(range(1, {dims + 1})) AS pos) t
  GROUP BY cell, t.pos
), {out}_m AS (
  SELECT cell, CAST(count(*) AS BIGINT) AS m FROM {src} GROUP BY cell
), {out} AS (
  SELECT d.cell, array_agg(d.sv ORDER BY d.pos) AS s, any_value(m.m) AS m
  FROM {out}_d d JOIN {out}_m m USING (cell)
  GROUP BY d.cell
)"""


def lloyd_cells_sql(
    dims: int,
    n_cells: int = N_CELLS,
    sample_cap: int = SAMPLE_CAP,
    n_iters: int = N_ITERS,
) -> str:
    """CTE chain ending in ``final`` = (vec_id, qv, nrm, cell) over the
    ``embeddings`` view — the full Lloyd procedure unrolled (the
    iteration count is a constant, so 'iterative' collapses to a fixed
    CTE pipeline DuckDB can run)."""
    parts = [
        f"""e AS (
  SELECT vec_id,
         list_transform(embedding,
           v -> CAST(round(CAST(v AS DOUBLE) * {_SCALE}) AS BIGINT)) AS qv
  FROM embeddings
), samp AS (
  SELECT vec_id, qv FROM e WHERE vec_id < {sample_cap}
), rks AS (
  SELECT vec_id, qv,
         row_number() OVER (ORDER BY vec_id) - 1 AS rk,
         count(*) OVER () AS mt
  FROM samp
), c0 AS (
  SELECT cell, s, m FROM (
    SELECT CAST((rk * {n_cells}) // mt AS INT) AS cell, qv AS s,
           CAST(1 AS BIGINT) AS m,
           row_number() OVER (PARTITION BY (rk * {n_cells}) // mt
                              ORDER BY rk) AS rn
    FROM rks)
  WHERE rn = 1
)"""
    ]
    prev_cents = "c0"
    for it in range(1, n_iters + 1):
        parts.append(_duck_assign_cte("rks", prev_cents, f"a{it}", dims))
        parts.append(_duck_centroid_cte(f"a{it}", f"c{it}", dims))
        prev_cents = f"c{it}"
    parts.append(_duck_assign_cte("e", prev_cents, "af", dims))
    parts.append(
        """final AS (
  SELECT vec_id, qv, cell,
         sqrt(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(qv, v -> v * v)), (a, b) -> a + b) AS DOUBLE)) AS nrm
  FROM af
)"""
    )
    return "WITH " + ",\n".join(parts)
