"""TS87 — Bartlett variance-break test between series halves
(Bartlett Proc.Roy.Soc.A'37, two-group form): completes the
structural-break triptych — Chow (TS78) asks whether the LINE breaks
at the midpoint, PELT/Pettitt where the MEAN/distribution shifts,
ARCH LM (TS70) whether volatility CLUSTERS; Bartlett asks whether the
VARIANCE LEVEL itself differs between the halves (a regime change in
noise, invisible to all three).

Two-group Bartlett with χ²(1) null:

    T = M/C,   M = (N−2)·ln s_p² − (n₁−1)·ln s₁² − (n₂−1)·ln s₂²,
    C = 1 + (1/(n₁−1) + 1/(n₂−1) − 1/(N−2)) / 3

with s_i² the unbiased half variances and s_p² the pooled variance.
Exactness: the corrected sums of squares are cleared int64 —
SS_i·n_i = n_i·Σy² − (Σy)² (four folds, the TS78 bound analysis
applies) — and everything after is ONE shared double tree
(SS_i = cleared/n_i, variances, three ln's, M, C); floor-1e6; verdict
T > 3.841458820694124 (χ²₀.₉₅(1)); NULL-guarded at n < 10 or
degenerate halves (SS ≤ 0).

Honest (gated) reading — measured, and it killed the draft's
"wrap-density minority rejects" story: only 7/512 reject (1.4%,
BELOW the nominal 5%) with median T ≈ 0.002.  Both halves carry the
same generator, so the variance LEVEL genuinely matches — and the
strong positive serial correlation makes the half-variances move
TOGETHER, deflating T far below its iid χ²(1) null (the mirror image
of TS84's lesson: correlation reshapes every classical null, here
conservatively).  The gate pins the sub-nominal rate and tiny
median; the planted variance-regime break (noise amplitude doubling
at the midpoint → decisive rejection) lives in pytest.  Bartlett's
normality sensitivity is declared (TS62: these tokens are
non-normal) — on this corpus the dial under-fires rather than
over-fires, and either way it is a variance-difference dial, not a
calibrated p-value.

Scale shape: ZERO exchanges — per-row integer folds, a pure map job.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"
_CHI1 = "3.841458820694124"


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

    y = el("j")
    return {
        "s1a": fold("1", "m", y),
        "s2a": fold("1", "m", f"{y} * {y}"),
        "s1b": fold("m + 1", "n", y),
        "s2b": fold("m + 1", "n", f"{y} * {y}"),
    }


def _d(x: str) -> str:
    return f"CAST({x} AS DOUBLE)"


# cleared int64: SSa·m = m·Σy² − (Σy)², SSb·(n−m) likewise
_CA = "(m * s2a - s1a * s1a)"
_CB = "((n - m) * s2b - s1b * s1b)"
_SSA = f"({_d(_CA)} / {_d('m')})"
_SSB = f"({_d(_CB)} / {_d('n - m')})"
_V1 = f"({_SSA} / {_d('m - 1')})"
_V2 = f"({_SSB} / {_d('n - m - 1')})"
_VP = f"(({_SSA} + {_SSB}) / {_d('n - 2')})"
_M = (
    f"({_d('n - 2')} * ln({_VP})"
    f" - {_d('m - 1')} * ln({_V1})"
    f" - {_d('n - m - 1')} * ln({_V2}))"
)
_C = (
    f"(CAST(1 AS DOUBLE) + (CAST(1 AS DOUBLE) / {_d('m - 1')}"
    f" + CAST(1 AS DOUBLE) / {_d('n - m - 1')}"
    f" - CAST(1 AS DOUBLE) / {_d('n - 2')}) / CAST(3 AS DOUBLE))"
)
_T = f"({_M} / {_C})"
_GUARD = f"n >= 10 AND {_CA} > 0 AND {_CB} > 0"


@register(
    "bartlett_variance_break",
    oracle=synth_sql(_N)
    + f"""
    , docs AS (
      SELECT doc_id, CAST(n_tok AS BIGINT) AS n,
             CAST(n_tok // 2 AS BIGINT) AS m,
             list_transform(tokens, y -> CAST(y AS BIGINT)) AS v
      FROM synth
    ),
    sums AS (
      SELECT doc_id, n, m,
             {", ".join(f"{x} AS {k}"
                        for k, x in _folds("duck").items())}
      FROM docs
    )
    SELECT doc_id, n, m, s1a, s2a, s1b, s2b,
           CASE WHEN {_GUARD} THEN {_F6.format(x=_V1)}
                ELSE CAST(NULL AS DOUBLE) END AS var_first,
           CASE WHEN {_GUARD} THEN {_F6.format(x=_V2)}
                ELSE CAST(NULL AS DOUBLE) END AS var_second,
           CASE WHEN {_GUARD} THEN {_F6.format(x=_T)}
                ELSE CAST(NULL AS DOUBLE) END AS bartlett_t,
           CAST(CASE WHEN NOT ({_GUARD}) THEN NULL
                WHEN {_T} > {_CHI1} THEN 1 ELSE 0 END
                AS BIGINT) AS reject_equal_variance
    FROM sums
    """,
)
def bartlett_variance_break(spark, sf_dir):
    """TS87: two-group Bartlett variance-break at the midpoint per
    series (module header) — four cleared int64 folds, one shared
    double tree (three ln's), χ²₀.₉₅(1) literal, floor-1e6."""
    docs = synth.sequences_df(spark, _N).select(
        "doc_id",
        F.expr("CAST(n_tok AS BIGINT)").alias("n"),
        F.expr("CAST(n_tok DIV 2 AS BIGINT)").alias("m"),
        F.expr("transform(tokens, y -> CAST(y AS BIGINT))").alias("v"),
    )
    sums = docs.select(
        "doc_id",
        "n",
        "m",
        *[F.expr(x).alias(k) for k, x in _folds("spark").items()],
    )
    return sums.selectExpr(
        "doc_id",
        "n",
        "m",
        "s1a",
        "s2a",
        "s1b",
        "s2b",
        f"CASE WHEN {_GUARD} THEN {_F6.format(x=_V1)}"
        " ELSE CAST(NULL AS DOUBLE) END AS var_first",
        f"CASE WHEN {_GUARD} THEN {_F6.format(x=_V2)}"
        " ELSE CAST(NULL AS DOUBLE) END AS var_second",
        f"CASE WHEN {_GUARD} THEN {_F6.format(x=_T)}"
        " ELSE CAST(NULL AS DOUBLE) END AS bartlett_t",
        f"CAST(CASE WHEN NOT ({_GUARD}) THEN NULL"
        f" WHEN {_T} > {_CHI1} THEN 1 ELSE 0 END"
        " AS BIGINT) AS reject_equal_variance",
    )
