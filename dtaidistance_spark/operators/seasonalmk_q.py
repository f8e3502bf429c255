"""TS69 — SEASONAL Mann-Kendall trend test per series (Hirsch & Slack
WRR'84): the seasonality-robust upgrade of TS14's MK — compare only
observations in the SAME phase of the cycle (here the series' own
period P = 64), so the seasonal component can never masquerade as (or
mask) a monotone trend; S and the tie-corrected variance simply SUM
across seasons.

The textbook statement loops over seasons; this implementation uses
the equivalent ELEMENTWISE form that needs no per-season arrays at
all — a pair (i, j) is within-season iff j = i + 64k, so with
L = min(n, 512) (8 items per season, declared cap):

    S      = Σ_i Σ_{k≥1, i+64k<L} sgn(v[i+64k] − v[i])
    t_i    = #{same-season elements equal to v[i]}  (both directions)
    tie18  = Σ_i (t_i − 1)(2t_i + 5)     [= Σ_groups t(t−1)(2t+5)]
    base18 = Σ_i (m_i − 1)(2m_i + 5)     [= Σ_g m_g(m_g−1)(2m_g+5)],
             m_i = ⌊(L−1−i)/64⌋ + ⌊i/64⌋ + 1  (closed form)
    Var    = (base18 − tie18)/18

— every quantity a pure INT64 fold with a ≤7-step inner loop (tokens
are integers, so ties are REAL here and the Hirsch-Slack tie
correction is exercised, unlike the continuous-valued TS14 corpus).
z is the continuity-corrected (S ∓ 1)/√Var shared tree, floor-1e6,
verdict |z| > 1.96, NULL-guarded at Var = 0.

Honest (gated) reading: deseasonalizing by the true period isolates
the RAMP — the unwrapped-ramp docs read 'increasing' with huge z,
while heavily wrapping sawtooths read 'none'/mixed; rejections land
in a middle band (neither all nor none) with both signs present.

Scale shape: ZERO exchanges — per-row integer folds, a pure map job.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512
_P = 64
_CAP = 512  # -> at most 8 per season

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _folds(eng: str) -> dict[str, str]:
    sp = eng == "spark"
    el = (lambda i: f"element_at(v, {i})") if sp else (lambda i: f"v[{i}]")
    kmax = _CAP // _P - 1  # 7

    def fold(term: str) -> str:
        if sp:
            return (
                f"aggregate(sequence(0, CAST(l AS INT) - 1),"
                f" CAST(0 AS BIGINT), (acc, i) -> acc + ({term}))"
            )
        return (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
            f" list_transform(range(0, CAST(l AS INT)),"
            f" i -> CAST({term} AS BIGINT))), (acc, q) -> acc + q)"
        )

    def ksum(term: str, krange: str) -> str:
        if sp:
            return (
                f"aggregate(sequence(1, {kmax}),"
                f" CAST(0 AS BIGINT), (a2, k) -> a2 + ({term}))"
            )
        return (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
            f" list_transform(range(1, {kmax} + 1),"
            f" k -> CAST({term} AS BIGINT))), (a2, q2) -> a2 + q2)"
        )

    fwd = el(f"i + {_P} * k + 1")
    cur = el("i + 1")
    bwd = el(f"i - {_P} * k + 1")
    sgn = (
        f"CASE WHEN i + {_P} * k < l THEN"
        f" (CASE WHEN {fwd} > {cur} THEN 1"
        f" WHEN {fwd} < {cur} THEN -1 ELSE 0 END) ELSE 0 END"
    )
    eq_f = (
        f"CASE WHEN i + {_P} * k < l AND {fwd} = {cur}"
        f" THEN 1 ELSE 0 END"
    )
    eq_b = (
        f"CASE WHEN i - {_P} * k >= 0 AND {bwd} = {cur}"
        f" THEN 1 ELSE 0 END"
    )
    ti = f"(1 + {ksum(f'({eq_f}) + ({eq_b})', '')})"
    dv = "DIV" if sp else "//"
    mi = f"((l - 1 - i) {dv} {_P} + i {dv} {_P} + 1)"
    return {
        "s_stat": fold(ksum(sgn, "")),
        "tie18": fold(f"({ti} - 1) * (2 * {ti} + 5)"),
        "base18": fold(f"({mi} - 1) * (2 * {mi} + 5)"),
    }


_Z = (
    "CASE WHEN base18 - tie18 <= 0 THEN CAST(NULL AS DOUBLE)"
    " WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)"
    " / sqrt(CAST(base18 - tie18 AS DOUBLE) / 18.0)"
    " WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)"
    " / sqrt(CAST(base18 - tie18 AS DOUBLE) / 18.0)"
    " ELSE CAST(0 AS DOUBLE) END"
)
_TREND = (
    "CASE WHEN ({z}) IS NULL THEN CAST(NULL AS STRING)"
    " WHEN ({z}) > 1.96 THEN 'increasing'"
    " WHEN ({z}) < -1.96 THEN 'decreasing' ELSE 'none' END"
)


@register(
    "seasonal_mann_kendall",
    oracle=synth_sql(_N)
    + f"""
    , docs AS (
      SELECT doc_id,
             least(CAST(n_tok AS BIGINT), {_CAP}) AS l,
             list_transform(tokens[1 : least(n_tok, {_CAP})],
               y -> CAST(y AS BIGINT)) AS v
      FROM synth
    ),
    st AS (
      SELECT doc_id, l,
             {", ".join(f"{x} AS {k}"
                        for k, x in _folds("duck").items())}
      FROM docs
    )
    SELECT doc_id, l, s_stat, tie18, base18,
           {_F6.format(x=_Z)} AS z,
           {_TREND.format(z=_Z)} AS trend
    FROM st
    """,
)
def seasonal_mann_kendall(spark, sf_dir):
    """TS69: seasonal Mann-Kendall at the series' own period (module
    header) — elementwise stride-64 int64 folds for S / tie18 /
    base18, tie-corrected continuity z, floor-1e6."""
    docs = synth.sequences_df(spark, _N).select(
        "doc_id",
        F.expr(f"least(CAST(n_tok AS BIGINT), {_CAP})").alias("l"),
        F.expr(
            f"transform(slice(tokens, 1, least(n_tok, {_CAP})),"
            f" y -> CAST(y AS BIGINT))"
        ).alias("v"),
    )
    st = docs.select(
        "doc_id",
        "l",
        *[F.expr(x).alias(k) for k, x in _folds("spark").items()],
    )
    return st.select(
        "doc_id",
        "l",
        "s_stat",
        "tie18",
        "base18",
        F.expr(_F6.format(x=_Z)).alias("z"),
        F.expr(_TREND.format(z=_Z)).alias("trend"),
    )
