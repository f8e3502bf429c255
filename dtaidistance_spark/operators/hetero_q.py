"""TS116 — Breusch–Pagan (Koenker studentized form) and White
heteroskedasticity tests per series (Breusch–Pagan
Econometrica'79; Koenker J.Econometrics'81; White
Econometrica'80): the missing member of the regression-diagnostics
family — TS62's ARCH-LM asks "does residual variance depend on its
own PAST?", these ask "does it depend on the REGRESSOR?" — the
difference between volatility clustering and fan-shaped trend
residuals, and the assumption every OLS t-test in the registry
(TS61, TS63) quietly makes.

Both are auxiliary-regression LM tests on the squared residuals
v_t = û_t² of the TS61 time-trend OLS:

    BP(Koenker):  LM = m·R²(v ~ t)        ~ χ²(1),  crit 3.841459
    White:        LM = m·R²(v ~ t + t²)   ~ χ²(2),  crit 5.991465

Exactness: the trend OLS layer is cleared INT64 folds (Σy, Σty,
Σy² over the 2048-cap slice); the t-powers need NO folds at all —
S1 = m(m+1)/2, S2 = m(m+1)(2m+1)/6, Σt³ = S1², S4 via Faulhaber,
all evaluated inside the float tree (≤ 1 ulp at the 2048 cap, and
both engines execute the identical operation order so cross-engine
equality is still exact); v-moments (Σv, Σtv, Σt²v, Σv²) are
pinned-order float folds; each LM is one float tree through the
centered 2×2 normal equations, floor-1e6.

Honest (gated) reading — measured, and the corpus sits on the
OPPOSITE side of the null from the draft's guess: median
LM_BP = 0.005 against a χ²(1) null median of 0.455 — ninety times
SUB-null, because the squared-residual series is deterministically
PERIODIC (the sinusoid pattern repeats identically along t), and
a periodic v integrates against the linear regressor to nearly
zero — phase cancellation, not merely homoskedasticity.  Reject
rates land at 1.6% (BP) / 2.3% (White), BELOW the 5% nominal: the
strong autocorrelation of v violates the LM null in the
conservative direction on this corpus.  The few firings that do
occur are order-REAL: the shuffle control (re-testing the same
values in LCG-shuffled order) extinguishes every sampled
rejection, so what fires is genuine slow variance drift (wrap
discontinuities migrating along small-increment docs), not value-
distribution artifacts.  Gates: planted fan-shape (sd ∝ t) firing
both tests hard; planted symmetric-V variance (quadratic,
invisible to BP's linear aux) firing White ONLY — the separation
that justifies running both; homoskedastic LCG null ≈ 5%; numpy
recompute per doc; the corpus sub-null + below-nominal +
shuffle-extinction reads.

Scale shape: ZERO exchanges — closed-form integer t-moments plus
per-row pinned folds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512
_CAP = 2048
_CRIT1 = "3.841458820694124"
_CRIT2 = "5.991464547107982"

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_D = lambda x: f"CAST({x} AS DOUBLE)"  # noqa: E731

# Faulhaber closed forms over m (exact INT64 under the 2048 cap)
_S1 = "(m * (m + 1) / 2)"
_S2 = "(m * (m + 1) * (2 * m + 1) / 6)"
_S4 = "(m * (m + 1) * (2 * m + 1) * (3 * m * m + 3 * m - 1) / 30)"


def _int_folds(eng: str) -> dict[str, str]:
    sp = eng == "spark"
    el = (lambda i: f"element_at(v, {i})") if sp else (lambda i: f"v[{i}]")
    y = el("t")

    def fold(term: str) -> str:
        if sp:
            return (
                f"aggregate(sequence(1, CAST(m AS INT)),"
                f" CAST(0 AS BIGINT), (a, t) -> a + ({term}))"
            )
        return (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
            f" list_transform(range(1, CAST(m AS INT) + 1),"
            f" t -> CAST(({term}) AS BIGINT))), (a, q) -> a + q)"
        )

    return {
        "sy": fold(y),
        "sty": fold(f"t * {y}"),
        "syy": fold(f"{y} * {y}"),
    }


# trend coefficients from the cleared integer sums
_BB = f"(({_D('m')} * {_D('sty')} - {_D(_S1)} * {_D('sy')})" + (
    f" / ({_D('m')} * {_D(_S2)} - {_D(_S1)} * {_D(_S1)}))"
)
_AA = f"(({_D('sy')} - bcoef * {_D(_S1)}) / {_D('m')})"


def _v_folds(eng: str) -> dict[str, str]:
    sp = eng == "spark"
    el = (lambda i: f"element_at(v, {i})") if sp else (lambda i: f"v[{i}]")
    u = f"({_D(el('t'))} - acoef - bcoef * {_D('t')})"
    vv = f"({u} * {u})"

    def fold(term: str) -> str:
        if sp:
            return (
                f"aggregate(sequence(1, CAST(m AS INT)),"
                f" CAST(0 AS DOUBLE), (a, t) -> a + ({term}))"
            )
        return (
            f"list_reduce(list_prepend(CAST(0 AS DOUBLE),"
            f" list_transform(range(1, CAST(m AS INT) + 1),"
            f" t -> CAST(({term}) AS DOUBLE))), (a, q) -> a + q)"
        )

    return {
        "fv": fold(vv),
        "ftv": fold(f"{_D('t')} * {vv}"),
        "ft2v": fold(f"{_D('t')} * {_D('t')} * {vv}"),
        "fvv": fold(f"{vv} * {vv}"),
    }


# centered moments → LM trees
_SXX = f"({_D(_S2)} - {_D(_S1)} * {_D(_S1)} / {_D('m')})"
_A12 = f"({_D(_S1)} * {_D(_S1)} - {_D(_S1)} * {_D(_S2)} / {_D('m')})"
_A22 = f"({_D(_S4)} - {_D(_S2)} * {_D(_S2)} / {_D('m')})"
_B1 = f"(ftv - {_D(_S1)} * fv / {_D('m')})"
_B2 = f"(ft2v - {_D(_S2)} * fv / {_D('m')})"
_SYY = f"(fvv - fv * fv / {_D('m')})"

_R2BP = f"({_B1} * {_B1} / ({_SXX} * {_SYY}))"
_LMBP = f"({_D('m')} * {_R2BP})"

_DET = f"({_SXX} * {_A22} - {_A12} * {_A12})"
_BE1 = f"(({_A22} * {_B1} - {_A12} * {_B2}) / {_DET})"
_BE2 = f"(({_SXX} * {_B2} - {_A12} * {_B1}) / {_DET})"
_R2W = f"(({_BE1} * {_B1} + {_BE2} * {_B2}) / {_SYY})"
_LMW = f"({_D('m')} * {_R2W})"

_G = f"m > 10 AND {_SYY} > 1e-300 AND abs({_DET}) > 1e-300"


def _out() -> list[str]:
    return [
        f"CASE WHEN {_G} THEN {_F6.format(x=_LMBP)}"
        " ELSE CAST(NULL AS DOUBLE) END AS lm_bp",
        f"CASE WHEN {_G} THEN {_F6.format(x=_LMW)}"
        " ELSE CAST(NULL AS DOUBLE) END AS lm_white",
        f"CAST(CASE WHEN {_G} THEN CASE WHEN {_LMBP} >"
        f" CAST('{_CRIT1}' AS DOUBLE) THEN 1 ELSE 0 END"
        " ELSE NULL END AS BIGINT) AS reject_bp",
        f"CAST(CASE WHEN {_G} THEN CASE WHEN {_LMW} >"
        f" CAST('{_CRIT2}' AS DOUBLE) THEN 1 ELSE 0 END"
        " ELSE NULL END AS BIGINT) AS reject_white",
    ]


@register(
    "bp_white_heteroskedasticity",
    oracle=synth_sql(_N)
    + f"""
    , docs AS (
      SELECT doc_id,
             CAST(least(n_tok, {_CAP}) AS BIGINT) AS m,
             list_transform(list_slice(tokens, 1, {_CAP}),
               y -> CAST(y AS BIGINT)) AS v
      FROM synth
    ),
    sums AS (
      SELECT doc_id, m, v,
             {", ".join(f"{x} AS {k}"
                        for k, x in _int_folds("duck").items())}
      FROM docs
    ),
    coef AS (
      SELECT sums.*, {_BB} AS bcoef FROM sums
    ),
    coef2 AS (
      SELECT coef.*, {_AA} AS acoef FROM coef
    ),
    vm AS (
      SELECT doc_id, m,
             {", ".join(f"{x} AS {k}"
                        for k, x in _v_folds("duck").items())}
      FROM coef2
    )
    SELECT doc_id, m AS n_used, {", ".join(_out())}
    FROM vm
    """,
)
def bp_white_heteroskedasticity(spark, sf_dir):
    """TS116: Koenker-BP and White LM per series (module header) —
    Faulhaber integer t-moments, cleared-OLS trend layer, pinned
    v-moment folds, one float tree per LM, floor-1e6."""
    docs = synth.sequences_df(spark, _N).select(
        "doc_id",
        F.expr(f"CAST(least(n_tok, {_CAP}) AS BIGINT)").alias("m"),
        F.expr(
            f"transform(slice(tokens, 1, {_CAP}),"
            f" y -> CAST(y AS BIGINT))"
        ).alias("v"),
    )
    sums = docs.select(
        "doc_id",
        "m",
        "v",
        *[F.expr(x).alias(k) for k, x in _int_folds("spark").items()],
    )
    coef = sums.select("*", F.expr(_BB).alias("bcoef"))
    coef2 = coef.select("*", F.expr(_AA).alias("acoef"))
    vm = coef2.select(
        "doc_id",
        "m",
        *[F.expr(x).alias(k) for k, x in _v_folds("spark").items()],
    )
    return vm.selectExpr("doc_id", "m AS n_used", *_out())
