"""TS68 — Fisher's g-test for hidden periodicity per series (Fisher
Proc.Roy.Soc.'29): the SIGNIFICANCE verdict on top of the spectral
family — goertzel_power/dominant_period (TS13) read WHERE the power
is, spectral_entropy how spread it is; Fisher's g asks whether the
largest ordinate is TOO large to be white noise, with an EXACT finite-
sample null distribution:

    g = max_j I_j / Σ_j I_j ,
    P(g > x) = Σ_{j≥1, jx<1} (−1)^{j−1} C(m,j) (1 − jx)^{m−1}

over m periodogram ordinates that are iid exponential under H₀ when
taken at full-cycle frequencies.  Grid here (declared): the m = 6
periods {2,4,8,16,32,64} — every one divides the 64-multiple
truncation, so each Goertzel run closes whole cycles (the classic
full-periodogram test uses all ⌊(n−1)/2⌋ frequencies; the grid
restriction keeps the ordinates iid-exponential under H₀ and the
formula exact for m = 6).

Exactness: the Goertzel state folds are the TS13 machinery — the
2·cos(2π/p) coefficients are PINNED DECIMAL-STRING literals (no libm
at query time; p = 2, 4 give the exact −2 and 0), the folds
sequential float ops shared verbatim, powers I_p unfloored
shared-double columns; g one greatest/sum tree; the alternating
binomial p-value a 6-term CASE-guarded shared tree (each term drops
when j·g ≥ 1, exactly the formula's support).  floor-1e6 finals,
verdict p < 0.05.

Honest (gated) reading: the period-64 sinusoid is REAL but small
(amplitude 1000 against a full-vocab sawtooth), and the sawtooth's
broadband leakage inflates the other grid ordinates — so Fisher's g
finds the line only on the ≈40% of docs whose ramp wraps little,
while the heavily-wrapped docs correctly fail to reject: the test is
doing exactly its job of refusing to call a diluted peak significant.

Scale shape: ZERO exchanges — per-row sequential folds, a pure map
job.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512

# (period, pinned 2cos(2*pi/p) literal) — periods divide 64
_GRID = (
    (2, "-2.0"),
    (4, "0.0"),
    (8, "1.4142135623730951"),
    (16, "1.8477590650225735"),
    (32, "1.9615705608064609"),
    (64, "1.9903694533443939"),
)
_M = len(_GRID)

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _exprs(eng: str):
    """(period, state_expr, power_expr) per grid period — the TS13
    Goertzel shapes (tsanalytics_q._goertzel_exprs) with this grid."""
    sp = eng == "spark"
    out = []
    for p, c in _GRID:
        cc = f"CAST('{c}' AS DOUBLE)"
        if sp:
            st = (
                f"aggregate(slice(xs, 2, nc - 1),"
                f" array(element_at(xs, 1), CAST(0 AS DOUBLE)),"
                f" (s, x) -> array(((x + ({cc} * element_at(s, 1)))"
                f" - element_at(s, 2)), element_at(s, 1)))"
            )
            pw = (
                f"(((element_at(st{p}, 1) * element_at(st{p}, 1))"
                f" + (element_at(st{p}, 2) * element_at(st{p}, 2)))"
                f" - (({cc} * element_at(st{p}, 1))"
                f" * element_at(st{p}, 2)))"
            )
        else:
            st = (
                f"list_reduce(list_transform(xs,"
                f" x -> [x, CAST(0 AS DOUBLE)]),"
                f" (s, e) -> [((e[1] + ({cc} * s[1])) - s[2]), s[1]])"
            )
            pw = (
                f"(((st{p}[1] * st{p}[1]) + (st{p}[2] * st{p}[2]))"
                f" - (({cc} * st{p}[1]) * st{p}[2]))"
            )
        out.append((p, st, pw))
    return out


_SUM = "(" + " + ".join(f"i{p}" for p, _ in _GRID) + ")"
_MAX = "greatest(" + ", ".join(f"i{p}" for p, _ in _GRID) + ")"
_G = f"({_MAX} / {_SUM})"

_PVAL = "(" + " + ".join(
    f"(CASE WHEN {j}.0 * g < 1.0 THEN "
    f"{'' if j % 2 == 1 else '-'}{math.comb(_M, j)}.0"
    f" * pow(1.0 - {j}.0 * g, {_M - 1}.0) ELSE 0.0 END)"
    for j in range(1, _M + 1)
) + ")"

_GUARD = "CASE WHEN {c} THEN {x} ELSE CAST(NULL AS DOUBLE) END"
_REJ = (
    "CAST(CASE WHEN g IS NULL THEN NULL"
    f" WHEN ({_PVAL}) < 0.05 THEN 1 ELSE 0 END AS BIGINT)"
)


@register(
    "fisher_g_test",
    oracle=synth_sql(_N)
    + f"""
    , gx AS (
      SELECT doc_id, n_tok - n_tok % 64 AS nc,
        list_transform(tokens[1 : n_tok - n_tok % 64],
                       t -> CAST(t AS DOUBLE)) AS xs
      FROM synth
    ),
    st AS (
      SELECT doc_id, nc,
             {", ".join(f"{s} AS st{p}" for p, s, _ in _exprs("duck"))}
      FROM gx
    ),
    pw AS (
      SELECT doc_id, nc,
             {", ".join(f"{w} AS i{p}" for p, _, w in _exprs("duck"))}
      FROM st
    ),
    gg AS (
      SELECT doc_id, nc,
             {_GUARD.format(c=f"{_SUM} > 0.0", x=_G)} AS g
      FROM pw
    )
    SELECT doc_id, nc,
           {_F6.format(x="g")} AS g_stat,
           {_F6.format(x=_GUARD.format(c="g IS NOT NULL", x=_PVAL))}
             AS p_value,
           {_REJ} AS reject_white
    FROM gg
    """,
)
def fisher_g_test(spark, sf_dir):
    """TS68: Fisher's g over the 6-period full-cycle Goertzel grid
    (module header) — pinned-literal coefficients, unfloored shared-
    double powers, exact alternating-binomial null p, floor-1e6."""
    ex = _exprs("spark")
    gx = synth.sequences_df(spark, _N).selectExpr(
        "doc_id",
        "n_tok - n_tok % 64 AS nc",
        "transform(slice(tokens, 1, n_tok - n_tok % 64),"
        " t -> CAST(t AS DOUBLE)) AS xs",
    )
    st = gx.select(
        "doc_id",
        "nc",
        *[F.expr(s).alias(f"st{p}") for p, s, _ in ex],
    )
    pw = st.select(
        "doc_id",
        "nc",
        *[F.expr(w).alias(f"i{p}") for p, _, w in ex],
    )
    gg = pw.select(
        "doc_id",
        "nc",
        F.expr(_GUARD.format(c=f"{_SUM} > 0.0", x=_G)).alias("g"),
    )
    return gg.select(
        "doc_id",
        "nc",
        F.expr(_F6.format(x="g")).alias("g_stat"),
        F.expr(
            _F6.format(x=_GUARD.format(c="g IS NOT NULL", x=_PVAL))
        ).alias("p_value"),
        F.expr(_REJ).alias("reject_white"),
    )
