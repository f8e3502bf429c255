"""TS92 — time-reversal asymmetry per series (Ramsey–Rothman
J.Econometrics'96 normalized-difference form; the `trev` feature of
the catch22/hctsa canon, Fulcher-Jones IEEE-TKDE'14): does the
series look the same played BACKWARDS?  Every Gaussian linear
process is time-reversible, so a significantly nonzero trev is a
model-free NONLINEARITY signature — the dial that separates "rises
slowly, falls fast" dynamics from anything ARMA can generate.  The
complexity family reads disorder (entropy, LZ76) and roughness
(Higuchi, DFA); trev reads ARROW-OF-TIME, which none of them see.

    trev(τ) = ⟨(y_{t+τ} − y_t)³⟩ / ⟨(y_{t+τ} − y_t)²⟩^{3/2}

at τ = 1 and τ = 8 (the hctsa default grid's ends at this series
length): the skewness of the τ-step increment distribution without
demeaning — a slow-rise/fast-fall sawtooth has many small positive
and few large negative increments, and the CUBE keeps the sign the
square kills.

Exactness: four INT64 folds — Σ(Δ_τ)², Σ(Δ_τ)³ for both lags; the
bound is the reason τ stops at 8: |Δ|³ < V³ ≈ 1.27e14 and n ≤ 8191
gives |ΣΔ³| < 1.04e18, inside int64 with a 9× margin (the TS78
bound-analysis discipline — a τ large enough to need demeaning or
doubles would change the tier).  The two ratios are ONE shared
double tree over the exact sums; floor-1e6; NULL-guarded at
n ≤ τ + 1 or a zero second moment.

Honest (gated) reading — measured, and the lag-8 half REFUTED the
draft's "the mechanism survives aggregation" guess with something
sharper: the corpus is overwhelmingly time-IRREVERSIBLE (only 3.5%
sit within |trev₁| < 0.1 of the reversible line), and the sign at
lag τ follows the EFFECTIVE congruential step τ·hm mod V — at
lag 1, up-steppers (hm < V/2) ride slow rises broken by rare large
negative wraps (trev₁ < 0 on 100% of them, mirrored at 99.2% for
down-steppers), and at lag 8 the SAME law holds for 8·hm mod V
(100%/99.2%) — but because ×8 mod V re-randomizes the direction,
the two lags' verdicts agree on only 51% of docs: two lags
genuinely read two different arrows in the same series, which is
exactly why the hctsa canon carries trev at a GRID of lags rather
than one.  All four purity rates, the near-zero minority, and the
~chance lag-agreement are gated; the reversible-null control
(symmetric LCG noise), the planted slow-rise/fast-fall sawtooth
with its closed-form trev = −72/27, and the defining antisymmetry
trev(reverse(y)) = −trev(y) live in pytest.

Scale shape: ZERO exchanges — per-row integer folds, a pure map job.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512
_LAGS = (1, 8)

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _folds(eng: str) -> dict[str, str]:
    sp = eng == "spark"
    el = (lambda i: f"element_at(v, CAST({i} AS INT))") if sp else (
        lambda i: f"v[{i}]"
    )

    def fold(lo: str, hi: str, term: str) -> str:
        if sp:
            return (
                f"aggregate(sequence(CAST({lo} AS INT), CAST({hi} AS INT)),"
                f" CAST(0 AS BIGINT), (a, j) -> a + ({term}))"
            )
        return (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
            f" list_transform(range(CAST({lo} AS BIGINT),"
            f" CAST({hi} AS BIGINT) + 1),"
            f" j -> CAST({term} AS BIGINT))), (a, q) -> a + q)"
        )

    out = {}
    for tau in _LAGS:
        d = f"({el(f'j + {tau}')} - {el('j')})"
        out[f"s2_{tau}"] = fold("1", f"n - {tau}", f"{d} * {d}")
        out[f"s3_{tau}"] = fold("1", f"n - {tau}", f"{d} * {d} * {d}")
    return out


def _d(x: str) -> str:
    return f"CAST({x} AS DOUBLE)"


def _trev(tau: int) -> str:
    m2 = f"({_d(f's2_{tau}')} / {_d(f'n - {tau}')})"
    m3 = f"({_d(f's3_{tau}')} / {_d(f'n - {tau}')})"
    return f"({m3} / ({m2} * sqrt({m2})))"


def _out() -> list[str]:
    cols = []
    for tau in _LAGS:
        g = f"n > {tau} + 1 AND s2_{tau} > 0"
        cols.append(
            f"CASE WHEN {g} THEN {_F6.format(x=_trev(tau))}"
            f" ELSE CAST(NULL AS DOUBLE) END AS trev_lag{tau}"
        )
    return cols


@register(
    "time_reversal_asymmetry",
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
    SELECT doc_id, n, s2_1, s3_1, s2_8, s3_8,
           {", ".join(_out())}
    FROM sums
    """,
)
def time_reversal_asymmetry(spark, sf_dir):
    """TS92: trev at lags 1 and 8 per series (module header) — four
    exact int64 increment-moment folds, one shared double tree,
    floor-1e6."""
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
        "doc_id", "n", "s2_1", "s3_1", "s2_8", "s3_8", *_out()
    )
