"""Portable, oracle-verifiable sketches: HyperLogLog and a log-linear
quantile histogram whose every operation is engine-agnostic SQL.

The engine-native sketch aggregates (``approx_count_distinct``,
``hll_sketch_agg``, ``percentile_approx``) are the right production
path at 100 TB, but their register layouts and estimators are
engine-specific, so a DuckDB oracle can never value-match them — they
are condemned to rows-only driver checks. This module takes the same
route the exact-integer k-means (operators/kmeans_exact.py) and the
integer-hyperplane LSH took: re-derive the sketch from arithmetic that
is BIT-IDENTICAL across engines, so the whole sketch — hash, register
fold, estimator, bias correction — replays in DuckDB and the driver
can hash-compare estimates exactly.

Determinism contract (why every op here is bit-exact in both engines):

* integer ``%``, ``*``, ``+`` on bigints with all intermediates
  < 2^63 — identical everywhere;
* double ``+ - * /`` are IEEE-754 correctly rounded in both engines,
  so identical operand order ⇒ identical bits;
* NO transcendental library calls: ``ln`` (needed by HLL's small-range
  linear-counting correction) is evaluated as an atanh series — range
  reduction by integer powers of two (exact), then a 9-term odd
  polynomial in z = (mant-1)/(mant+1), |z| ≤ 1/3, truncation error
  ~5e-11 relative, every term plain rational arithmetic;
* every float literal is emitted with ``repr`` (17 significant
  digits), which both engines parse to the identical nearest double;
* register-sum terms are powers of two spanning < 53 bits, so partial
  sums are EXACT and therefore aggregation-order-independent — safe
  under any shuffle schedule.

Hash: the classic multiplicative Lehmer chain is linear, and linear
maps send consecutive ids to arithmetic progressions — trailing-zero
counts (the HLL rho) come out badly skewed (measured +50..85% bias on
dense id ranges). The portable nonlinearity is mid-square hashing:
three rounds of x ← (x² + c_k) mod M with M = 2^31 − 1; x² < 2^62
never overflows a bigint. Two chains with different constants
decorrelate the register index from rho. Measured error vs exact
distinct on both dense and random id sets is within the m=256 HLL RSE
(±2σ ≈ 13%) at every fixture scale; pinned in
tests/test_sketch_portable.py.

Scale shape (the reason HLL exists): the register table is m rows per
group regardless of input size — at 100 TB the plan is one scan with
map-side partial MAX into m×groups cells, one exchange of that
fixed-size state, never a shuffle of raw ids. The same fold is the
merge operator: max-of-max register folds are associative, so per-shard
partials roll up losslessly to any coarser grain (proved bit-exactly by
``events_dau_portable_rollup``'s oracle — the two-level fold and the
flat fold hash to the same estimates).

No counterpart exists in the reference repo (its cardinality needs are
exact pandas ``nunique`` on collected frames — e.g.
``notebooks/utils.py`` plotting helpers); this layer is part of the
engine's 100 TB surface.
"""

from __future__ import annotations

import math

M = 2_147_483_647  # 2^31 - 1 (prime); squares of residues fit in int64


def _dlit(x: float) -> str:
    """A float literal BOTH engines type as DOUBLE. Spark parses bare
    decimal literals (0.95, 640.0) as DECIMAL — decimal arithmetic
    then diverges from DuckDB's double arithmetic exactly where it
    hurts (ceil(0.95*n) with double(0.95) > 0.95: decimal says 19,
    double says 20 at n=20). Scientific notation is DOUBLE in both
    dialects; repr keeps all 17 significant digits."""
    r = repr(float(x))
    return r if "e" in r or "E" in r else r + "e0"
_C_BUCKET = 987_654_321  # chain-A additive constants (register index)
_C_RHO = 1_234_567_891  # chain-B additive constants (rho bits)
_RHO_CAP = 25
_HASH_ROUNDS = 3


def _sq_chain_cte(
    name: str, src: str, keep: str, xa: str, xb: str, k: int
) -> str:
    """One mid-square round for both chains as a CTE body."""
    return (
        f"{name} AS (SELECT {keep}, "
        f"({xa}*{xa} + {_C_BUCKET + k}) % {M} AS xa, "
        f"({xb}*{xb} + {_C_RHO + k}) % {M} AS xb FROM {src})"
    )


def _rho_case(x: str, cap: int = _RHO_CAP) -> str:
    """rho = 1 + trailing zeros of ``x`` (lowest set bit position),
    capped. Pure %-arithmetic so it is dialect-neutral (no shift/xor
    operators, which differ between Spark SQL and DuckDB)."""
    whens = " ".join(
        f"WHEN ({x}) % {2 ** r} = {2 ** (r - 1)} THEN {r}"
        for r in range(1, cap)
    )
    return f"CASE {whens} ELSE {cap} END"


def _recip_case(col: str, cap: int = _RHO_CAP) -> str:
    """2^-rho as exact decimal literals (powers of two round-trip
    exactly through repr), avoiding pow()/shift dialect differences."""
    whens = " ".join(
        f"WHEN {r} THEN {_dlit(2.0 ** -r)}" for r in range(1, cap + 1)
    )
    return f"CASE {col} {whens} ELSE 0.0e0 END"


def _ln_poly(z2: str) -> str:
    """atanh-series tail: 1 + z2/3 + z2^2/5 + ... + z2^8/17, Horner
    form with repr'd coefficients. ln(x) = 2·z·poly for
    z = (x-1)/(x+1); |z| ≤ 1/3 on the reduced range [1, 2)."""
    poly = _dlit(1.0 / 17)
    for i in range(7, 0, -1):
        poly = f"({_dlit(1.0 / (2 * i + 1))} + {z2}*{poly})"
    return f"(1.0e0 + {z2}*{poly})"


def _log2_cases(x: str, max_e: int) -> tuple[str, str]:
    """(floor(log2(x)) CASE, 2^floor(log2(x)) CASE) for x ≥ 1.
    Thresholds are exact power-of-two doubles, comparisons exact."""
    k_case = (
        "CASE "
        + " ".join(
            f"WHEN {x} >= {_dlit(2 ** e)} THEN {e}"
            for e in range(max_e, 0, -1)
        )
        + " ELSE 0 END"
    )
    pow_case = (
        "CASE "
        + " ".join(
            f"WHEN {x} >= {_dlit(2 ** e)} THEN {_dlit(2 ** e)}"
            for e in range(max_e, 0, -1)
        )
        + " ELSE 1.0e0 END"
    )
    return k_case, pow_case


def portable_hll_daily_sql(
    table: str,
    m: int = 256,
    shard_mod: int | None = None,
    id_col: str = "user_id",
    day_expr: str = "CAST(ts AS DATE)",
) -> str:
    """Daily distinct-``id_col`` HLL estimate over ``table`` — one SQL
    text that runs verbatim in Spark SQL AND DuckDB and produces
    bit-identical (day, approx_dau, n_reg) rows.

    ``shard_mod`` = k interposes a per-(day, shard) register fold
    before the per-day merge: registers are MAXed per (day, id % k,
    bucket) first, then re-MAXed per (day, bucket). Associativity of
    MAX makes the result identical to the flat fold — this is the
    mergeable-sketch pattern (persist tiny per-shard partials, roll up
    to any grain without rescanning raw data), here verifiable
    bit-exactly rather than within an error bound.

    Estimator: Flajolet et al. HLL with the small-range
    linear-counting branch (E ≤ 2.5m and empty registers present →
    m·ln(m/V)); the ln is the series above, so the correction is as
    portable as the raw harmonic mean. No 32-bit large-range wraparound
    branch: the hash space is 31-bit, estimates here are ≪ 2^31/30.
    """
    assert m & (m - 1) == 0, "m must be a power of two"
    alpha_m2 = _dlit(0.7213 / (1 + 1.079 / m) * m * m)
    ln2 = _dlit(math.log(2))
    max_e = m.bit_length() - 1  # ln input range is [1, m]

    keep = "day"
    base = (
        f"base AS (SELECT {day_expr} AS day, "
        + (
            f"{id_col} % {shard_mod} AS shard, "
            if shard_mod is not None
            else ""
        )
        + f"{id_col} % {M - 1} + 1 AS xa, {id_col} % {M - 1} + 1 AS xb "
        f"FROM {table} WHERE {id_col} IS NOT NULL)"
    )
    if shard_mod is not None:
        keep = "day, shard"
    rounds = [
        _sq_chain_cte(f"h{k + 1}", f"h{k}" if k else "base", keep, "xa", "xb", k)
        for k in range(_HASH_ROUNDS)
    ]
    last = f"h{_HASH_ROUNDS}"

    if shard_mod is None:
        reg = (
            f"reg AS (SELECT day, xa % {m} AS bucket, "
            f"MAX({_rho_case('xb')}) AS rho "
            f"FROM {last} GROUP BY day, xa % {m})"
        )
    else:
        reg = (
            f"reg0 AS (SELECT day, shard, xa % {m} AS bucket, "
            f"MAX({_rho_case('xb')}) AS rho "
            f"FROM {last} GROUP BY day, shard, xa % {m}), "
            # lossless merge: max of per-shard maxes == flat max
            f"reg AS (SELECT day, bucket, MAX(rho) AS rho "
            f"FROM reg0 GROUP BY day, bucket)"
        )

    return f"""
WITH {base},
{", ".join(rounds)},
{reg},
{_estimate_ctes(m)}
{_estimate_select(m)}
"""


def _estimate_ctes(m: int, g: str = "day") -> str:
    """CTE chain turning a ``reg`` relation (g, bucket, rho) into the
    per-group estimator inputs; ``g`` is the group column name."""
    alpha_m2 = _dlit(0.7213 / (1 + 1.079 / m) * m * m)
    max_e = m.bit_length() - 1
    k_case, pow_case = _log2_cases("x", max_e)
    return f"""est AS (
  SELECT {g}, COUNT(*) AS nb, SUM({_recip_case("rho")}) AS sobs
  FROM reg GROUP BY {g}
), raw AS (
  SELECT {g}, nb,
         {alpha_m2} / (CAST({m} - nb AS DOUBLE) + sobs) AS e_raw,
         CASE WHEN nb < {m} THEN {_dlit(m)} / CAST({m} - nb AS DOUBLE)
              ELSE 2.0e0 END AS x
  FROM est
), lnk AS (
  SELECT {g}, nb, e_raw, x, {k_case} AS k, {pow_case} AS p2 FROM raw
), lnz AS (
  SELECT {g}, nb, e_raw, k, (x/p2 - 1.0e0)/(x/p2 + 1.0e0) AS z FROM lnk
), lnz2 AS (
  SELECT {g}, nb, e_raw, k, z, z*z AS z2 FROM lnz
)"""


def _estimate_select(
    m: int, g: str = "day", est_alias: str = "approx_dau"
) -> str:
    ln2 = _dlit(math.log(2))
    return f"""SELECT {g},
       CASE WHEN e_raw <= {_dlit(2.5 * m)} AND nb < {m}
            THEN {_dlit(m)} * (CAST(k AS DOUBLE)*{ln2} + 2.0e0*z*{_ln_poly("z2")})
            ELSE e_raw END AS {est_alias},
       CAST(nb AS BIGINT) AS n_reg
FROM lnz2"""


def portable_hll_registers_sql(
    table: str,
    m: int = 256,
    id_col: str = "user_id",
    day_expr: str = "CAST(ts AS DATE)",
) -> str:
    """(day, bucket, rho) register partial for one slice of data — the
    persistable sketch state. Registers from ANY partition of the data
    fold losslessly by MAX(rho) per (day, bucket) into exactly the
    registers a flat pass would build, so incremental maintenance
    (fold each new batch into a tiny state table, never rescan
    history) reproduces the full-recompute estimate BIT-exactly —
    ``events_dau_incremental``'s oracle is that equality."""
    assert m & (m - 1) == 0, "m must be a power of two"
    base = (
        f"base AS (SELECT {day_expr} AS day, "
        f"{id_col} % {M - 1} + 1 AS xa, {id_col} % {M - 1} + 1 AS xb "
        f"FROM {table} WHERE {id_col} IS NOT NULL)"
    )
    rounds = [
        _sq_chain_cte(f"h{k + 1}", f"h{k}" if k else "base", "day", "xa", "xb", k)
        for k in range(_HASH_ROUNDS)
    ]
    last = f"h{_HASH_ROUNDS}"
    return f"""
WITH {base},
{", ".join(rounds)}
SELECT day, xa % {m} AS bucket, MAX({_rho_case("xb")}) AS rho
FROM {last} GROUP BY day, xa % {m}
"""


def portable_hll_estimate_sql(reg_table: str, m: int = 256) -> str:
    """Per-day estimates from a persisted (day, bucket, rho) register
    table (the other half of ``portable_hll_registers_sql``). Output
    is identical to ``portable_hll_daily_sql`` run flat over the raw
    data the registers were folded from."""
    assert m & (m - 1) == 0, "m must be a power of two"
    return f"""
WITH reg AS (SELECT day, bucket, rho FROM {reg_table}),
{_estimate_ctes(m)}
{_estimate_select(m)}
"""


def portable_hll_overlap_sql(
    table: str,
    m: int = 256,
    id_col: str = "user_id",
    group_col: str = "event_type",
) -> str:
    """Sketch SET OPERATIONS: estimated pairwise overlap of
    ``id_col`` populations across ``group_col`` values, via
    inclusion-exclusion on portable HLL registers — one SQL text,
    bit-identical in Spark SQL and DuckDB.

    |A∩B| ≈ est(A) + est(B) − est(A∪B), where est(A∪B) comes from the
    MAX-merge of A's and B's registers (HLL union is exact on
    registers). This is the 100 TB path for cross-corpus contamination
    / audience-overlap questions: the exact answer needs a distinct
    self-join of the raw ids per pair; the sketch answer touches the
    raw data ONCE (one register fold per group, m rows each) and every
    pairwise combination after that is arithmetic over g×m register
    rows. All joins are equi-joins over the tiny types/registers
    relations (pair membership is expressed as two equi-joins unioned,
    not an OR-join, to keep nested loops out of the plan).

    The estimate can be slightly negative for disjoint sets (the two
    error terms need not cancel) — standard for inclusion-exclusion on
    sketches; callers clamp if they need non-negativity. Deterministic
    end to end, so no rounding is applied.
    """
    assert m & (m - 1) == 0, "m must be a power of two"
    base = (
        f"base AS (SELECT {group_col} AS et, "
        f"{id_col} % {M - 1} + 1 AS xa, {id_col} % {M - 1} + 1 AS xb "
        f"FROM {table} WHERE {id_col} IS NOT NULL "
        f"AND {group_col} IS NOT NULL)"
    )
    rounds = [
        _sq_chain_cte(f"h{k + 1}", f"h{k}" if k else "base", "et", "xa", "xb", k)
        for k in range(_HASH_ROUNDS)
    ]
    last = f"h{_HASH_ROUNDS}"
    return f"""
WITH {base},
{", ".join(rounds)},
regs AS (
  SELECT et, xa % {m} AS bucket, MAX({_rho_case("xb")}) AS rho
  FROM {last} GROUP BY et, xa % {m}
),
types AS (SELECT DISTINCT et FROM regs),
pairs AS (
  SELECT a.et AS t1, b.et AS t2 FROM types a JOIN types b ON a.et < b.et
),
gregs AS (
  SELECT et AS g, bucket, rho FROM regs
  UNION ALL
  SELECT p.t1 || '|' || p.t2 AS g, r.bucket, r.rho
  FROM pairs p JOIN regs r ON r.et = p.t1
  UNION ALL
  SELECT p.t1 || '|' || p.t2 AS g, r.bucket, r.rho
  FROM pairs p JOIN regs r ON r.et = p.t2
),
reg AS (SELECT g, bucket, MAX(rho) AS rho FROM gregs GROUP BY g, bucket),
{_estimate_ctes(m, g="g")},
ests AS ({_estimate_select(m, g="g", est_alias="est")})
SELECT p.t1 AS type_a,
       p.t2 AS type_b,
       ea.est AS users_a,
       eb.est AS users_b,
       ea.est + eb.est - eab.est AS overlap_est
FROM pairs p
JOIN ests ea ON ea.g = p.t1
JOIN ests eb ON eb.g = p.t2
JOIN ests eab ON eab.g = p.t1 || '|' || p.t2
"""


def portable_hll_group_registers_sql(
    table: str,
    m: int = 256,
    id_col: str = "user_id",
    group_col: str = "event_type",
) -> str:
    """The register fold of ``portable_hll_overlap_sql`` ALONE:
    (et, bucket, rho) per group — byte-identical arithmetic to the
    regs CTE inside the one-text overlap SQL. Split out so an engine
    whose planner INLINES multiply-referenced CTEs (Spark) can
    materialize this fold once and run the overlap algebra over the
    pinned result: the one-text form re-planned the full hash-chain
    subtree per reference (~12 copies of the scan, 88 Exchanges at
    m=1024 — r14 plan audit), while DuckDB materializes shared CTEs
    itself and keeps running the single text."""
    assert m & (m - 1) == 0, "m must be a power of two"
    base = (
        f"base AS (SELECT {group_col} AS et, "
        f"{id_col} % {M - 1} + 1 AS xa, {id_col} % {M - 1} + 1 AS xb "
        f"FROM {table} WHERE {id_col} IS NOT NULL "
        f"AND {group_col} IS NOT NULL)"
    )
    rounds = [
        _sq_chain_cte(f"h{k + 1}", f"h{k}" if k else "base", "et", "xa", "xb", k)
        for k in range(_HASH_ROUNDS)
    ]
    last = f"h{_HASH_ROUNDS}"
    return f"""
WITH {base},
{", ".join(rounds)}
SELECT et, xa % {m} AS bucket, MAX({_rho_case("xb")}) AS rho
FROM {last} GROUP BY et, xa % {m}
"""


def portable_hll_overlap_from_regs_sql(regs_table: str, m: int = 256) -> str:
    """The overlap algebra of ``portable_hll_overlap_sql`` over an
    already-computed (et, bucket, rho) register table — the remaining
    CTE chain of the one-text form, token for token, so estimates are
    bit-identical to running the single text."""
    assert m & (m - 1) == 0, "m must be a power of two"
    return f"""
WITH regs AS (SELECT et, bucket, rho FROM {regs_table}),
types AS (SELECT DISTINCT et FROM regs),
pairs AS (
  SELECT a.et AS t1, b.et AS t2 FROM types a JOIN types b ON a.et < b.et
),
gregs AS (
  SELECT et AS g, bucket, rho FROM regs
  UNION ALL
  SELECT p.t1 || '|' || p.t2 AS g, r.bucket, r.rho
  FROM pairs p JOIN regs r ON r.et = p.t1
  UNION ALL
  SELECT p.t1 || '|' || p.t2 AS g, r.bucket, r.rho
  FROM pairs p JOIN regs r ON r.et = p.t2
),
reg AS (SELECT g, bucket, MAX(rho) AS rho FROM gregs GROUP BY g, bucket),
{_estimate_ctes(m, g="g")},
ests AS ({_estimate_select(m, g="g", est_alias="est")})
SELECT p.t1 AS type_a,
       p.t2 AS type_b,
       ea.est AS users_a,
       eb.est AS users_b,
       ea.est + eb.est - eab.est AS overlap_est
FROM pairs p
JOIN ests ea ON ea.g = p.t1
JOIN ests eb ON eb.g = p.t2
JOIN ests eab ON eab.g = p.t1 || '|' || p.t2
"""


def portable_quantile_sql(
    table: str,
    value_expr: str = "l_extendedprice",
    group_col: str = "l_returnflag",
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    sub_bits: int = 4,
    max_value_bits: int = 40,
) -> str:
    """Log-linear quantile histogram (DDSketch family, base-2 octaves
    split into 2^sub_bits linear sub-buckets ⇒ relative error ≤
    2^-sub_bits) — one SQL text, bit-identical in Spark SQL and DuckDB.

    The value is first fixed-pointed to integer cents (the repo-wide
    exact-decimal convention, plans/relational.py:_cents); bucketing is
    then pure integer arithmetic: octave e = bit_length(cents) via an
    exact-threshold CASE, sub-bucket = floor(cents·2^sub_bits / 2^(e-1))
    − 2^sub_bits (the division is by a power of two, exact in doubles
    below 2^53). Quantile q reads the smallest bucket whose cumulative
    count reaches ceil(q·n) and reports the bucket's lower bound —
    a deterministic, mergeable, single-scan quantile whose histogram
    (≤ 16·40 cells per group) shuffles instead of the raw rows; the
    engine-native GK twin (lineitem_quantiles_approx) keeps the
    tighter-error production role, this one the verifiable role.

    Tiny values (cents < 2^(sub_bits+1)) get identity buckets — exact.
    """
    sub = 1 << sub_bits
    cents = f"CAST(round(({value_expr}) * 100) AS BIGINT)"
    # bit_length via exact integer thresholds
    e_case = (
        "CASE "
        + " ".join(
            f"WHEN c >= {2 ** (e - 1)} THEN {e}"
            for e in range(max_value_bits, sub_bits + 1, -1)
        )
        + " ELSE 0 END"  # 0 marks the identity-bucket regime
    )
    # 2^(e-1) as an exact double literal, selected by octave
    pow_half = (
        "CASE "
        + " ".join(
            f"WHEN e = {k} THEN {_dlit(2 ** (k - 1))}"
            for k in range(sub_bits + 2, max_value_bits + 1)
        )
        + " ELSE 1.0e0 END"
    )
    # bucket id: identity below 2^sub_bits, else
    # (e-1)*sub + floor(c*sub/2^(e-1)) - sub; division by a power of
    # two is exact in doubles, floor exact, so the id is deterministic
    bucket = (
        f"CASE WHEN e = 0 THEN c "
        f"ELSE CAST(e - 1 AS BIGINT) * {sub} "
        f"+ CAST(floor(CAST(c AS DOUBLE) * {sub} / ({pow_half})) AS BIGINT) - {sub} END"
    )
    # lower bound of the bucket in cents (exact integer for e > sub_bits+1);
    # identity regime has b = c, so the bound IS the bucket id
    lb = (
        f"CASE WHEN e = 0 THEN b "
        f"ELSE CAST(({pow_half}) * (1.0e0 + CAST(b - CAST(e - 1 AS BIGINT)*{sub} AS DOUBLE) / {sub}) AS BIGINT) END"
    )
    q_cols = ", ".join(
        f"MIN(CASE WHEN cum >= ceil({_dlit(q)} * n) THEN lb END) / 100.0e0 AS p{int(q * 100)}"
        for q in qs
    )
    return f"""
WITH vals AS (
  SELECT {group_col} AS g, {cents} AS c FROM {table}
  WHERE ({value_expr}) IS NOT NULL
), oct AS (
  SELECT g, c, {e_case} AS e FROM vals
), bkt AS (
  SELECT g, c, e, {bucket} AS b FROM oct
), hist AS (
  SELECT g, e, b, COUNT(*) AS cnt FROM bkt GROUP BY g, e, b
), bounds AS (
  SELECT g, b, cnt, {lb} AS lb FROM hist
), cdf AS (
  SELECT g, lb,
         CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY b) AS BIGINT) AS cum,
         CAST(SUM(cnt) OVER (PARTITION BY g) AS BIGINT) AS n
  FROM bounds
)
SELECT g AS {group_col}, {q_cols}, MAX(n) AS n
FROM cdf GROUP BY g
"""


# --- Count-Min sketch (portable: md5-prefix token hash + seeded ---
# --- arithmetic row-hashes; every count is an exact integer)     ---

CMS_DEPTH = 4
CMS_WIDTH = 512


def cms_perms(depth: int = CMS_DEPTH) -> list[tuple[int, int]]:
    """Seeded (a, b) pairs for the d row-hash functions
    h_k(t) = ((a_k·H(t) + b_k) mod P) mod w over P = 2^31 − 1, where
    H is the 28-bit md5-prefix token hash (identical in every engine;
    the same construction MinHash uses, operators/dedup.py:175).
    a·H < 2^59 — no int64 overflow anywhere."""
    import random

    rng = random.Random(731)
    return [
        (rng.randrange(1, M), rng.randrange(0, M))
        for _ in range(depth)
    ]


def cms_bucket_sql(h_expr: str, a: int, b: int, width: int = CMS_WIDTH) -> str:
    """The row-hash bucket expression — identical text in Spark SQL
    and DuckDB (``%`` on non-negative bigints agrees)."""
    return f"(({a} * {h_expr} + {b}) % {M}) % {width}"


def portable_ln_stage_cols(
    x_col: str = "x", max_e: int = 40
) -> list[tuple[str, str]]:
    """Staged column expressions computing ``ln(x_col)`` for x ≥ 1,
    engine-portably (the HLL linear-counting ln, generalized):
    range-reduce by the exact power-of-two CASE ladder, then the
    9-term atanh series on z = (y−1)/(y+1), |z| ≤ 1/3. Apply each
    (name, expr) in order — as ``withColumn`` stages in Spark and as
    CTE columns in DuckDB — so every double op sees identical operands
    in identical order in both engines. The final stage is ``lnx``.
    Relative truncation error ~5e-11; quantize consumers accordingly
    (e.g. round to nano-units before integer aggregation)."""
    k_case, pow_case = _log2_cases(x_col, max_e)
    ln2 = _dlit(math.log(2))
    return [
        ("k", k_case),
        ("p2", pow_case),
        ("z", f"({x_col}/p2 - 1.0e0)/({x_col}/p2 + 1.0e0)"),
        ("z2", "z*z"),
        ("lnx", f"CAST(k AS DOUBLE)*{ln2} + 2.0e0*z*{_ln_poly('z2')}"),
    ]
