"""TS79 — Higuchi fractal dimension per series (Higuchi Physica D
'88): the standard time-domain roughness estimator — D ≈ 1 for a
smooth curve, → 2 for white noise — read from how the reconstructed
curve length L(k) shrinks with the sampling stride k:

    L_m(k) = [Σᵢ |x(m+ik) − x(m+(i−1)k)|] · (N−1) / (n_km·k²),
    n_km   = ⌊(N−m)/k⌋,
    L(k)   = (1/k) Σ_{m=1..k} L_m(k),
    D      = slope of ln L(k) on ln(1/k).

Complements the family: DFA reads long-range correlation of the
PROFILE, Hurst/R-S rescaled range, sample/permutation entropy
recurrence and ordinal structure; Higuchi is the curve-length
roughness dial, and it's the cheapest of them all.

Grid (declared): k = 1..4, so the 1+2+3+4 = 10 stride
absolute-difference sums are exact INT64 HOF folds (tokens are
integers; |Δ| ≤ 50256, sums ≤ n·50256 ≈ 4e11 — no overflow).  L(k)
and the four-point least-squares slope are ONE shared double tree
with every chain order-pinned (m = 1..k, then k = 1..4) and every
literal CAST(... AS DOUBLE) (the Benford lesson: bare decimal
literals parse as DECIMAL in Spark and truncate).  floor-1e6 finals;
NULL-guarded at n < 20 or any L(k) ≤ 0 (constant-at-stride series).

Honest (gated) reading — the data corrected the draft's "smooth ⇒
median near 1" expectation: the corpus median is ≈ 2.09 with 5%/95%
quantiles ≈ 1.05 / 2.94 and a max ≈ 4.0, OUTSIDE the theoretical
1 ≤ D ≤ 2 band.  That is the k_max = 4 finite-grid estimator being
what it is: on series with near-period-k structure the stride-k
differences partially cancel, L(k) decays FASTER than any curve
geometry allows, and the log-log slope inflates — at small k_max
Higuchi doubles as a short-period detector, not a calibrated
dimension.  Genuinely smooth docs still read ≈ 1 (min 0.986), the
exact-line identity D = 1 and an LCG-noise ≈ 2 control are pytest
gates, and the gate pins the measured out-of-band quantiles rather
than clamping them.

Scale shape: ZERO exchanges — per-row integer folds, a pure map job.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512
_KMAX = 4

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _folds(eng: str) -> dict[str, str]:
    """10 int64 folds s{k}_{m} = Σ_i |v[m+ik] − v[m+(i−1)k]|,
    i = 1..(n−m) DIV k (1-based element indices)."""
    sp = eng == "spark"
    el = (
        (lambda i: f"element_at(v, CAST({i} AS INT))")
        if sp
        else (lambda i: f"v[{i}]")
    )

    def fold(hi: str, term: str) -> str:
        if sp:
            return (
                f"aggregate(sequence(1, CAST({hi} AS INT)),"
                f" CAST(0 AS BIGINT), (a, i) -> a + ({term}))"
            )
        return (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
            f" list_transform(range(1, CAST({hi} AS BIGINT) + 1),"
            f" i -> CAST({term} AS BIGINT))), (a, q) -> a + q)"
        )

    idiv = "DIV" if sp else "//"
    out = {}
    for k in range(1, _KMAX + 1):
        for m in range(1, k + 1):
            term = f"abs({el(f'{m} + i * {k}')} - {el(f'{m} + (i - 1) * {k}')})"
            out[f"s{k}_{m}"] = fold(f"(n - {m}) {idiv} {k}", term)
            # n_km as an int64 column so the shared float tree never
            # needs an engine-specific integer-division operator
            out[f"n{k}_{m}"] = f"CAST((n - {m}) {idiv} {k} AS BIGINT)"
    return out


def _d(x: str = "") -> str:
    return f"CAST({x} AS DOUBLE)"


def _lk(k: int) -> str:
    """L(k) = (1/k) Σ_m S_km·(N−1)/(n_km·k²) — order-pinned m chain."""
    terms = []
    for m in range(1, k + 1):
        nkm = f"n{k}_{m}"
        terms.append(
            f"({_d(f's{k}_{m}')} * {_d('n - 1')}"
            f" / ({_d(nkm)} * {_d(str(k * k))}))"
        )
    return f"(({' + '.join(terms)}) / {_d(str(k))})"


_LKS = {k: _lk(k) for k in range(1, _KMAX + 1)}

# four-point least squares of y = ln L(k) on x = ln(1/k) = -ln(k);
# slope = Σ(x−x̄)(y−ȳ)/Σ(x−x̄)² with pinned 4-term chains
_XS = {k: f"(0.0 - ln({_d(str(k))}))" for k in range(1, _KMAX + 1)}
_XBAR = f"(({' + '.join(_XS[k] for k in range(1, _KMAX + 1))}) / {_d('4')})"
_YBAR = (
    f"(({' + '.join(f'ln({_LKS[k]})' for k in range(1, _KMAX + 1))})"
    f" / {_d('4')})"
)
_SXY = " + ".join(
    f"(({_XS[k]} - {_XBAR}) * (ln({_LKS[k]}) - {_YBAR}))"
    for k in range(1, _KMAX + 1)
)
_SXX = " + ".join(
    f"(({_XS[k]} - {_XBAR}) * ({_XS[k]} - {_XBAR}))"
    for k in range(1, _KMAX + 1)
)
_D_STAT = f"(({_SXY}) / ({_SXX}))"
_GUARD = "n >= 20 AND " + " AND ".join(
    f"({_LKS[k]}) > 0" for k in range(1, _KMAX + 1)
)


def _finals() -> list[str]:
    cols = []
    for k in range(1, _KMAX + 1):
        cols.append(
            f"CASE WHEN {_GUARD} THEN {_F6.format(x=_LKS[k])}"
            f" ELSE CAST(NULL AS DOUBLE) END AS l{k}"
        )
    cols.append(
        f"CASE WHEN {_GUARD} THEN {_F6.format(x=_D_STAT)}"
        " ELSE CAST(NULL AS DOUBLE) END AS higuchi_d"
    )
    return cols


@register(
    "higuchi_fd",
    oracle=synth_sql(_N)
    + f"""
    , docs AS (
      SELECT doc_id, CAST(n_tok AS BIGINT) AS n,
             list_transform(tokens, y -> CAST(y AS BIGINT)) AS v
      FROM synth
    ),
    sums AS (
      SELECT doc_id, n,
             {", ".join(f"{x} AS {k}"
                        for k, x in _folds("duck").items())}
      FROM docs
    )
    SELECT doc_id, n,
           {", ".join(f"s{k}_{m}" for k in range(1, _KMAX + 1)
                      for m in range(1, k + 1))},
           {", ".join(_finals())}
    FROM sums
    """,
)
def higuchi_fd(spark, sf_dir):
    """TS79: Higuchi fractal dimension, k = 1..4 (module header) —
    10 exact int64 stride folds, order-pinned L(k) chains, pinned
    four-point log-log least-squares slope, floor-1e6,
    NULL-guarded."""
    docs = synth.sequences_df(spark, _N).select(
        "doc_id",
        F.expr("CAST(n_tok AS BIGINT)").alias("n"),
        F.expr("transform(tokens, y -> CAST(y AS BIGINT))").alias("v"),
    )
    sums = docs.select(
        "doc_id",
        "n",
        *[F.expr(x).alias(k) for k, x in _folds("spark").items()],
    )
    return sums.selectExpr(
        "doc_id",
        "n",
        *[
            f"s{k}_{m}"
            for k in range(1, _KMAX + 1)
            for m in range(1, k + 1)
        ],
        *_finals(),
    )
