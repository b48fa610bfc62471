"""Seeded synthetic cashflow-series generator, fully native columns.

Replicates the reference generator's signal model (reference
``src/demo/utils.py:128-197``, wired as a zero-arg nondeterministic
Python UDF at ``src/demo/create_time_series.py:172-190``):

    trend     sign · salary · exp(trend_exp · linspace(0, 1, n))
    seasonal  sine / sawtooth / triangle / square, period 30.5 days,
              random phase (scipy.signal conventions: sawtooth rises
              -1→1 per period; square is +1 for the first half period)
    noise     N(0, noise_sd · salary) per day
    spikes    3 level shifts at uniform integer times in
              [n-457, n-92), each ±N(3·salary, salary), applied from
              the spike time to the end of the series
    params    salary = max(N(15000, 5000), 100); trend_exp = U(1, 2);
              noise_sd = |N(0, 0.01)| + 0.1; values rounded half-even
              to 2 decimals, stored float32

The one intentional semantic upgrade (SURVEY §7.4.5): the reference's
RNG is unseeded per-row Python, so its output is irreproducible. Here
every random draw is a hash of (seed, series_id, purpose-tag[, day]) —
md5-derived 52-bit uniforms, Box-Muller normals — so the same call
always produces the same table, on any cluster, at any parallelism.
Parity with the reference generator is distributional, not per-value.

The md5 derivation (not xxhash64, which DuckDB lacks) makes the draw
sequence CROSS-ENGINE replayable: ``duckdb_u``/``duckdb_normal`` emit
the DuckDB mirror of the same (seed, id, tag, extra) → uniform map,
which is how ``cashflow_synthetic_pipeline`` is oracle-checked end to
end (the hash integers are bit-identical; the few transcendentals —
ln/cos in Box-Muller, exp/sin in the signal — agree to ≤1 ulp between
the JVM and DuckDB's libm, absorbed by the generator's terminal
``bround(·, 2)`` cents quantization; verified value-exact over the
full fixture in tests).

Everything is a Column expression: generation runs inside whole-stage
codegen, embarrassingly parallel over ``spark.range`` splits — 2.5M
series (the reference's serving scale) is ~100 ms of planning and pure
executor-side compute, and 2.5B series would scale the same way.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from time_series_prediction_spark.sources.io import date_sequence_col

# 13 hex chars of md5 = 52 bits — exactly representable in a double,
# so (v + 0.5) / 2^52 is the same IEEE value in every engine
_U_DIV = float(2**52)


def _u(id_col: str, seed: int, tag: int, extra: str = "'0'") -> str:
    """Uniform(0,1) from md5('{seed}|{id}|{tag}|' || extra) (Spark SQL
    fragment). ``extra`` is a STRING expression (day index etc.)."""
    s = (
        f"concat('{seed}|', CAST({id_col} AS STRING), '|{tag}|', {extra})"
    )
    return (
        f"((CAST(conv(substring(md5({s}), 1, 13), 16, 10) AS BIGINT)"
        f" + 0.5D) / {_U_DIV!r}D)"
    )


def duckdb_u(seed: int, tag: int, extra: str = "'0'") -> str:
    """DuckDB mirror of ``_u`` over a column named ``id`` — same md5
    input string, same 52-bit slice, same IEEE map."""
    s = f"'{seed}|' || CAST(id AS VARCHAR) || '|{tag}|' || {extra}"
    return (
        f"((('0x' || substr(md5({s}), 1, 13))::BIGINT + 0.5e0)"
        f" / {_U_DIV!r})"
    )


def _normal(id_col: str, seed: int, tag: int, extra: str = "'0'") -> str:
    """Standard normal via Box-Muller from ONE md5 digest: the 32 hex
    chars carry two independent 52-bit uniforms (chars 1-13 and
    14-26). The digest binds once through a single-element transform
    (higher-order functions are interpreted with no common-
    subexpression elimination — two ``md5(...)`` mentions would hash
    twice per draw, and the per-day noise draw is the generator's hot
    loop). Tag namespace ``n{tag}`` keeps normal draws disjoint from
    ``_u``'s."""
    s = (
        f"concat('{seed}|', CAST({id_col} AS STRING), '|n{tag}|', {extra})"
    )

    def u(lo: int) -> str:
        return (
            f"((CAST(conv(substring(_hn, {lo}, 13), 16, 10) AS BIGINT)"
            f" + 0.5D) / {_U_DIV!r}D)"
        )

    return (
        f"(transform(array(md5({s})), _hn -> "
        f"sqrt(-2.0D * ln({u(1)})) * cos({2 * math.pi}D * {u(14)}))[0])"
    )


def duckdb_normal(seed: int, tag: int, extra: str = "'0'") -> str:
    """DuckDB mirror of ``_normal`` (identical digest, slices, and
    operand order)."""
    s = f"'{seed}|' || CAST(id AS VARCHAR) || '|n{tag}|' || {extra}"

    def u(lo: int) -> str:
        return (
            f"((('0x' || substr(_hn, {lo}, 13))::BIGINT + 0.5e0)"
            f" / {_U_DIV!r})"
        )

    return (
        f"(list_transform([md5({s})], _hn -> "
        f"sqrt(-2.0e0 * ln({u(1)})) * cos({2 * math.pi!r} * {u(14)}))[1])"
    )


def _paired_values_array(
    id_col: str, seed: int, tag: int, n_expr: str, val_of_iz: str
) -> str:
    """Array of ``n`` values ``f(i, z_i)`` where the ``z_i`` are
    standard normals from PAIRED Box-Muller: ONE md5 digest per TWO
    draws — elements 2p and 2p+1 come from digest (seed, id,
    ``n{tag}p``, p) as r·cos(θ) and r·sin(θ) with r = sqrt(−2 ln u₁),
    θ = 2π u₂. The per-day noise draw is the generator's hot loop,
    and the classic one-digest-per-draw form discarded the sine
    normal — pairing halves the md5 AND ln work (round-12 VERDICT
    #4). ``val_of_iz`` is a SQL fragment over lambda vars ``i`` (day
    index) and ``_z`` (the normal draw); building the WHOLE element
    inside the pair transform matters: a separate normals column
    would be INLINED back into the per-element transform by
    Catalyst's projection collapse (interpreted higher-order fns get
    no common-subexpression elimination), re-evaluating the entire
    pair array once per element — O(n²) digests (measured: 3 s →
    142 s). The nested single-element transform bindings keep digest,
    radius, and angle each computed exactly once.
    ``duckdb_normal_pair`` replays the identical draw sequence
    row-shaped."""
    s = (
        f"concat('{seed}|', CAST({id_col} AS STRING), '|n{tag}p|', "
        f"CAST(p AS STRING))"
    )
    u1 = (
        f"((CAST(conv(substring(_hn, 1, 13), 16, 10) AS BIGINT)"
        f" + 0.5D) / {_U_DIV!r}D)"
    )
    u2 = (
        f"((CAST(conv(substring(_hn, 14, 13), 16, 10) AS BIGINT)"
        f" + 0.5D) / {_U_DIV!r}D)"
    )

    def elem(i_expr: str, z_expr: str) -> str:
        return (
            f"transform(array({z_expr}), _z -> "
            f"transform(array({i_expr}), i -> {val_of_iz})[0])[0]"
        )

    return (
        f"slice(flatten(transform("
        f"sequence(0, CAST(ceil({n_expr} / 2.0D) AS INT) - 1), p -> "
        f"transform(array(md5({s})), _hn -> "
        f"transform(array(sqrt(-2.0D * ln({u1}))), _r -> "
        f"transform(array({2 * math.pi}D * {u2}), _c -> "
        f"array({elem('2 * p', '_r * cos(_c)')}, "
        f"{elem('2 * p + 1', '_r * sin(_c)')})"
        f")[0])[0])[0])), 1, {n_expr})"
    )


def duckdb_normal_pair(seed: int, tag: int, i_expr: str = "i") -> str:
    """DuckDB mirror of ``_normal_pair_array`` for ROW-SHAPED replay:
    the draw for day ``i`` — digest keyed on pair index ``i // 2``,
    cos branch for even ``i``, sin for odd. Identical digest string,
    slices, and operand order, so the IEEE sequence matches the Spark
    array element for element."""
    s = (
        f"'{seed}|' || CAST(id AS VARCHAR) || '|n{tag}p|' || "
        f"CAST(({i_expr} // 2) AS VARCHAR)"
    )
    u1 = (
        f"((('0x' || substr(_hn, 1, 13))::BIGINT + 0.5e0)"
        f" / {_U_DIV!r})"
    )
    u2 = (
        f"((('0x' || substr(_hn, 14, 13))::BIGINT + 0.5e0)"
        f" / {_U_DIV!r})"
    )
    return (
        f"(list_transform([md5({s})], _hn -> "
        f"list_transform([sqrt(-2.0e0 * ln({u1}))], _r -> "
        f"list_transform([{2 * math.pi!r} * {u2}], _c -> "
        f"CASE WHEN ({i_expr}) % 2 = 0 THEN _r * cos(_c) "
        f"ELSE _r * sin(_c) END)[1])[1])[1])"
    )


def generate_series_frame(
    spark: SparkSession,
    n_series: int,
    start_date: str = "2018-12-01",
    end_date: str = "2020-03-31",
    seed: int = 42,
    cycle_period: float = 30.5,
    n_spikes: int = 3,
    id_col: str = "primaryaccountholder",
) -> DataFrame:
    """Generate the ``ts_balance`` table (FIXTURES.md A1 schema):
    (primaryaccountholder, transactiondate array<date>, balance
    array<float>, signal_type int).

    r14: generation runs as ONE vectorized Arrow pass over the
    ``spark.range`` splits (``_gen_batch`` — hashlib md5 + NumPy),
    replacing the interpreted nested-transform expression chain: the
    md5-derived integers are bit-identical by construction, every
    float op follows the SQL fragments' operand order, the
    transcendentals (ln/cos/sin/exp) agree with the JVM/DuckDB libms
    to ≤1 ulp exactly as those two already agree with each other, and
    the terminal shortest-repr half-even ``bround(·, 2)`` absorbs the
    difference — value-exactness stays pinned by the DuckDB-replay
    goldens (tests/test_generate_pipeline.py) and the
    cashflow_synthetic_pipeline oracle at both scales. Catalyst's
    interpreted higher-order functions evaluated ~30 expression nodes
    per element (~15M per 1000-series build, the pipeline's dominant
    cost — r14 profile); the batch path does the same math in
    vectorized C. Scale shape unchanged: embarrassingly parallel over
    range splits, no shuffle, 2.5M series fan out linearly."""
    df = spark.range(n_series).toDF(id_col)
    return _generate_numpy(
        df, id_col, start_date, end_date, seed, cycle_period, n_spikes
    )


def _generate_numpy(
    df: DataFrame,
    id_col: str,
    start_date: str,
    end_date: str,
    seed: int,
    cycle_period: float,
    n_spikes: int,
) -> DataFrame:
    """The Arrow-batch twin of the retired expression chain — same
    draw map ((seed, id, tag[, p]) → md5 → uniforms/Box-Muller), same
    operand order per element."""
    import datetime as _dt
    import hashlib
    from decimal import ROUND_HALF_EVEN, Decimal

    import numpy as np
    import pandas as pd

    d0 = _dt.date.fromisoformat(str(start_date))
    d1 = _dt.date.fromisoformat(str(end_date))
    dates = [d0 + _dt.timedelta(days=k) for k in range((d1 - d0).days + 1)]
    n = len(dates)
    nf = float(n)
    two_pi = 2 * math.pi
    per = float(cycle_period)
    q2 = Decimal("0.01")

    def _u_of(sid: str, tag, extra="0") -> float:
        h = hashlib.md5(f"{seed}|{sid}|{tag}|{extra}".encode()).hexdigest()
        return (int(h[:13], 16) + 0.5) / _U_DIV

    def _z_of(sid: str, tag: int, extra="0") -> float:
        h = hashlib.md5(
            f"{seed}|{sid}|n{tag}|{extra}".encode()
        ).hexdigest()
        u1 = (int(h[:13], 16) + 0.5) / _U_DIV
        u2 = (int(h[13:26], 16) + 0.5) / _U_DIV
        return math.sqrt(-2.0 * math.log(u1)) * math.cos(two_pi * u2)

    i_f = np.arange(n, dtype=np.float64)
    t_i = (-nf / 2.0) + (i_f * nf) / (nf - 1.0)
    n_pairs = (n + 1) // 2

    def _gen_batch(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out_bal = []
            out_type = []
            for rid in pdf[id_col]:
                sid = str(int(rid))
                salary = max(_z_of(sid, 1) * 5000.0 + 15000.0, 100.0)
                trend_exp = _u_of(sid, 5) + 1.0
                noise_sd = abs(_z_of(sid, 3) * 0.01) + 0.1
                sign = -1.0 if _u_of(sid, 7) < 0.5 else 1.0
                phase = (_u_of(sid, 9) * 2.0 - 1.0) * math.pi
                choice = int(math.floor(_u_of(sid, 11) * 4.0))
                # paired Box-Muller day noise: one digest per two days
                u1 = np.empty(n_pairs)
                u2 = np.empty(n_pairs)
                for p in range(n_pairs):
                    h = hashlib.md5(
                        f"{seed}|{sid}|n50p|{p}".encode()
                    ).hexdigest()
                    u1[p] = int(h[:13], 16)
                    u2[p] = int(h[13:26], 16)
                u1 = (u1 + 0.5) / _U_DIV
                u2 = (u2 + 0.5) / _U_DIV
                r = np.sqrt(-2.0 * np.log(u1))
                c = two_pi * u2
                z = np.empty(2 * n_pairs)
                z[0::2] = r * np.cos(c)
                z[1::2] = r * np.sin(c)
                z = z[:n]
                x = (two_pi * t_i) / per + phase
                q = x / two_pi
                frac = q - np.floor(q)
                saw = 2.0 * frac - 1.0
                if choice == 0:
                    seasonal = 0.5 * salary * np.sin(x)
                elif choice == 1:
                    seasonal = -0.5 * salary * saw
                elif choice == 2:
                    seasonal = salary * np.abs(saw) - 1.0
                else:
                    square = np.where(frac < 0.5, 1.0, -1.0)
                    seasonal = 0.5 * salary * square
                trend = (sign * salary) * np.exp(
                    (trend_exp * i_f) / (nf - 1.0)
                )
                noise = (noise_sd * salary) * z
                total = seasonal + trend + noise
                for k in range(n_spikes):
                    t_k = n - 457 + int(
                        math.floor(_u_of(sid, 20 + k) * 365.0)
                    )
                    s_k = -1.0 if _u_of(sid, 30 + k) < 0.5 else 1.0
                    a_k = s_k * (
                        3.0 * salary + salary * _z_of(sid, 40 + k)
                    )
                    spike = np.where(i_f >= float(t_k), a_k, 0.0)
                    total = total + spike
                # bround(·, 2): shortest-repr decimal, HALF_EVEN —
                # BigDecimal.valueOf semantics, element by element
                bal = np.fromiter(
                    (
                        float(
                            Decimal(repr(float(v))).quantize(
                                q2, rounding=ROUND_HALF_EVEN
                            )
                        )
                        for v in total
                    ),
                    dtype=np.float32,
                    count=n,
                )
                out_bal.append(bal)
                out_type.append((1, 4, 2, 3)[choice])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "balance": out_bal,
                    "signal_type": np.array(out_type, dtype=np.int32),
                }
            )

    gen = df.mapInPandas(
        _gen_batch,
        f"{id_col} long, balance array<float>, signal_type int",
    )
    # the shared date axis is one constant-folded sequence expression —
    # attaching it JVM-side keeps ~n_days date objects per row out of
    # the Arrow channel (guide §4.1: pass only what the function needs)
    return gen.withColumn(
        "transactiondate", date_sequence_col(start_date, end_date)
    ).select(id_col, "transactiondate", "balance", "signal_type")


def _generate_series_frame_expr(
    spark: SparkSession,
    n_series: int,
    start_date: str = "2018-12-01",
    end_date: str = "2020-03-31",
    seed: int = 42,
    cycle_period: float = 30.5,
    n_spikes: int = 3,
    id_col: str = "primaryaccountholder",
) -> DataFrame:
    """The retired pure-expression generator, kept as the
    cross-implementation determinism witness
    (tests/test_generate_pipeline.py pins numpy == expression ==
    DuckDB on a sample)."""
    df = spark.range(n_series).toDF(id_col)

    salary = f"greatest({_normal(id_col, seed, 1)} * 5000.0D + 15000.0D, 100.0D)"
    trend_exp = f"({_u(id_col, seed, 5)} + 1.0D)"  # U(1,2)
    noise_sd = f"(abs({_normal(id_col, seed, 3)} * 0.01D) + 0.1D)"
    sign = f"(CASE WHEN {_u(id_col, seed, 7)} < 0.5D THEN -1.0D ELSE 1.0D END)"
    phase = f"(({_u(id_col, seed, 9)} * 2.0D - 1.0D) * {math.pi}D)"
    # random.choice(['sine','sawtooth','triangle','square']) then the
    # reference's int mapping sine→1 triangle→2 square→3 sawtooth→4
    choice = f"CAST(floor({_u(id_col, seed, 11)} * 4.0D) AS INT)"

    df = (
        df.withColumn("_salary", F.expr(salary))
        .withColumn("_trend_exp", F.expr(trend_exp))
        .withColumn("_noise_sd", F.expr(noise_sd))
        .withColumn("_sign", F.expr(sign))
        .withColumn("_phase", F.expr(phase))
        .withColumn("_choice", F.expr(choice))
        .withColumn(
            "signal_type",
            F.expr(
                "CASE _choice WHEN 0 THEN 1 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 3 END"
            ),
        )
        .withColumn("transactiondate", date_sequence_col(start_date, end_date))
        .withColumn("_n", F.size("transactiondate"))
    )

    # spike times/amplitudes: k = 0..n_spikes-1
    spike_terms = []
    for k in range(n_spikes):
        t_k = (
            f"(_n - 457 + CAST(floor({_u(id_col, seed, 20 + k)} * 365.0D) AS INT))"
        )
        s_k = f"(CASE WHEN {_u(id_col, seed, 30 + k)} < 0.5D THEN -1.0D ELSE 1.0D END)"
        a_k = f"({s_k} * (3.0D * _salary + _salary * {_normal(id_col, seed, 40 + k)}))"
        spike_terms.append(
            f"(CASE WHEN i >= {t_k} THEN {a_k} ELSE 0.0D END)"
        )
    spikes = " + ".join(spike_terms) if spike_terms else "0.0D"

    # linspace(-n/2, n/2, n): t_i = -n/2 + i*n/(n-1); x = 2π t/P + phase
    t_i = "(-_n / 2.0D + CAST(i AS DOUBLE) * _n / (_n - 1.0D))"
    x = f"({2 * math.pi}D * {t_i} / {cycle_period}D + _phase)"
    frac = f"(({x}) / {2 * math.pi}D - floor(({x}) / {2 * math.pi}D))"
    saw = f"(2.0D * {frac} - 1.0D)"  # scipy sawtooth, width=1
    square = f"(CASE WHEN {frac} < 0.5D THEN 1.0D ELSE -1.0D END)"
    seasonal = (
        f"(CASE _choice "
        f"WHEN 0 THEN 0.5D * _salary * sin({x}) "
        f"WHEN 1 THEN -0.5D * _salary * {saw} "
        f"WHEN 2 THEN _salary * abs({saw}) - 1.0D "
        f"ELSE 0.5D * _salary * {square} END)"
    )
    trend_ts = f"(_sign * _salary * exp(_trend_exp * CAST(i AS DOUBLE) / (_n - 1.0D)))"
    # per-day noise: the hot loop — paired Box-Muller (one md5 per
    # TWO days), with the WHOLE balance element built inside the pair
    # transform (see _paired_values_array for why a separate normals
    # column is an O(n²) trap)
    noise = "(_noise_sd * _salary * _z)"

    val = (
        f"CAST(bround({seasonal} + {trend_ts} + {noise} + {spikes}, 2)"
        " AS FLOAT)"
    )
    balance = _paired_values_array(id_col, seed, 50, "_n", val)
    return df.withColumn("balance", F.expr(balance)).select(
        id_col, "transactiondate", "balance", "signal_type"
    )


def duckdb_bround(v: str, ndigits: int) -> str:
    """DuckDB mirror of Spark's ``bround(v, ndigits)`` on DOUBLE —
    shortest-repr (VARCHAR cast) decimal, HALF_EVEN. Same construction
    as ``plans/flagship._bround3`` (fuzz-verified against Spark),
    generalized over the scale."""
    scale = 10 ** ndigits
    d = f"CAST(CAST({v} AS VARCHAR) AS DECIMAL(38,18)) * {scale}"
    return (
        f"list_transform([{d}], _s -> "
        f"list_transform([floor(_s)], _f -> "
        f"CASE WHEN _s - _f > 0.5 THEN _f + 1 "
        f"WHEN _s - _f < 0.5 THEN _f "
        f"WHEN CAST(_f AS BIGINT) % 2 = 0 THEN _f "
        f"ELSE _f + 1 END)[1])[1] / {scale}.0e0"
    )


def duckdb_series_cte(
    n_series: int,
    n_days: int,
    seed: int = 42,
    cycle_period: float = 30.5,
    n_spikes: int = 3,
) -> str:
    """DuckDB CTE chain replaying ``generate_series_frame`` draw for
    draw: ``gen(id, signal_type, b LIST(FLOAT))``. Every expression
    mirrors the Spark fragment's operand ORDER (IEEE addition is not
    associative) and every literal is e-notation (a bare DuckDB
    decimal literal is DECIMAL, not DOUBLE — different rounding). The
    md5-derived uniforms are bit-identical across engines; the
    transcendentals (exp/sin/ln/cos) agree to ≤1 ulp and the terminal
    ``bround(·, 2)`` absorbs the difference (value-exact over the
    whole fixture — pinned in tests/test_generate_pipeline.py)."""
    n = n_days
    pi = repr(math.pi)
    two_pi = repr(2 * math.pi)

    def u(tag, extra="'0'"):
        return duckdb_u(seed, tag, extra)

    def normal(tag, extra="'0'"):
        return duckdb_normal(seed, tag, extra)

    salary = (
        f"greatest({normal(1)} * 5000.0e0 + 15000.0e0, 100.0e0)"
    )
    trend_exp = f"({u(5)} + 1.0e0)"
    noise_sd = f"(abs({normal(3)} * 0.01e0) + 0.1e0)"
    sign = f"(CASE WHEN {u(7)} < 0.5e0 THEN -1.0e0 ELSE 1.0e0 END)"
    phase = f"(({u(9)} * 2.0e0 - 1.0e0) * {pi})"
    choice = f"CAST(floor({u(11)} * 4.0e0) AS INT)"
    spike_cols = []
    for k in range(n_spikes):
        t_k = f"({n} - 457 + CAST(floor({u(20 + k)} * 365.0e0) AS INT))"
        s_k = (
            f"(CASE WHEN {u(30 + k)} < 0.5e0 THEN -1.0e0 ELSE 1.0e0 END)"
        )
        a_k = (
            f"({s_k} * (3.0e0 * _salary + _salary * {normal(40 + k)}))"
        )
        spike_cols.append(f"{t_k} AS _t{k}, {a_k} AS _a{k}")
    spikes = (
        " + ".join(
            f"(CASE WHEN i >= _t{k} THEN _a{k} ELSE 0.0e0 END)"
            for k in range(n_spikes)
        )
        if n_spikes
        else "0.0e0"
    )
    t_i = (
        f"(-{n} / 2.0e0 + CAST(i AS DOUBLE) * {n} / ({n} - 1.0e0))"
    )
    x = f"({two_pi} * {t_i} / {cycle_period!r} + _phase)"
    frac = f"(({x}) / {two_pi} - floor(({x}) / {two_pi}))"
    saw = f"(2.0e0 * {frac} - 1.0e0)"
    square = f"(CASE WHEN {frac} < 0.5e0 THEN 1.0e0 ELSE -1.0e0 END)"
    seasonal = (
        f"(CASE _choice "
        f"WHEN 0 THEN 0.5e0 * _salary * sin({x}) "
        f"WHEN 1 THEN -0.5e0 * _salary * {saw} "
        f"WHEN 2 THEN _salary * abs({saw}) - 1.0e0 "
        f"ELSE 0.5e0 * _salary * {square} END)"
    )
    trend_ts = (
        f"(_sign * _salary * exp(_trend_exp * CAST(i AS DOUBLE)"
        f" / ({n} - 1.0e0)))"
    )
    noise = (
        f"(_noise_sd * _salary * {duckdb_normal_pair(seed, 50, 'i')})"
    )
    val = duckdb_bround(
        f"{seasonal} + {trend_ts} + {noise} + {spikes}", 2
    )
    return f"""
gen_params AS (
  SELECT id,
         {salary} AS _salary,
         {trend_exp} AS _trend_exp,
         {noise_sd} AS _noise_sd,
         {sign} AS _sign,
         {phase} AS _phase,
         {choice} AS _choice,
         {', '.join(spike_cols)}
  FROM range({n_series}) t(id)
),
gen_vals AS (
  SELECT id, _choice, i, CAST({val} AS FLOAT) AS v
  FROM gen_params CROSS JOIN (
    SELECT unnest(range(0, {n})) AS i
  ) days
),
gen AS (
  SELECT id,
         CASE _choice WHEN 0 THEN 1 WHEN 1 THEN 4 WHEN 2 THEN 2
              ELSE 3 END AS signal_type,
         array_agg(v ORDER BY i) AS b
  FROM gen_vals GROUP BY id, _choice
)"""
