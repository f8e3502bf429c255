"""TS86 — Theta-method one-step forecast evaluation per series
(Assimakopoulos & Nikolopoulos IJF'00, the M3-competition winner;
Hyndman & Billah IJF'03 equivalence): Theta(θ = 2) is EXACTLY simple
exponential smoothing plus half the linear-trend slope as drift —
the H&B identity this implementation uses directly:

    f_t = l_{t−1} + b̂/2,    l_t = α·y_t + (1−α)·l_{t−1}

with b̂ the full-sample OLS slope (the in-sample evaluation
convention, a DECLARED look-ahead — the standard way the M3 theta
fit is scored in-sample) from the TS61/TS78 cleared int64 forms
b̂ = B/C, B = n·Σxy − Σx·Σy, C = n·Σx² − (Σx)².  Completes the
forecaster quartet: naive, SES (TS81), Holt (TS83), Theta — same
α = 0.2, same error score, same corpus, so the four SSEs are
directly comparable.

The recursion is the SES struct-accumulator fold with the drift as a
plain COLUMN referenced inside the lambda (hazard-safe: only 'l' is
accumulator state and it is assigned last).  Drift sums are exact
int64 folds.  floor-1e6; NULL-guarded at n < 3, SAD = 0, or C ≤ 0.

Honest (gated) reading: on this corpus the full-sample slope of a
WRAPPING ramp is nearly zero (the wraps cancel the climb), so theta's
drift is tiny and theta ≈ SES almost everywhere — the measured SSE
ratio theta/SES concentrates at 1.000 with only the cleanest-trend
tail pulling below; the gate pins that near-equivalence AND the
clean-trend control where drift genuinely wins lives in pytest.

Scale shape: ZERO exchanges — per-row folds only, a pure map job.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.ses_q import _naive_folds, _ses_fold
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512
_AL = "CAST('0.2' AS DOUBLE)"
_OMA = "CAST('0.8' AS DOUBLE)"

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _slope_folds(eng: str) -> dict[str, str]:
    """Int64 sums for the full-sample OLS slope (x = j−1)."""
    sp = eng == "spark"
    el = (lambda i: f"element_at(v, {i})") if sp else (lambda i: f"v[{i}]")

    def fold(term: str) -> str:
        if sp:
            return (
                "aggregate(sequence(1, CAST(n AS INT)),"
                f" CAST(0 AS BIGINT), (a, j) -> a + ({term}))"
            )
        return (
            "list_reduce(list_prepend(CAST(0 AS BIGINT),"
            " list_transform(range(1, CAST(n AS BIGINT) + 1),"
            f" j -> CAST({term} AS BIGINT))), (a, q) -> a + q)"
        )

    y = el("j")
    return {
        "ty": fold(y),
        "txy": fold(f"(j - 1) * {y}"),
        "tx": fold("(j - 1)"),
        "tx2": fold("(j - 1) * (j - 1)"),
    }


# drift = b/2, b = (n·Σxy − Σx·Σy)/(n·Σx² − Σx²) — one shared tree
_C = "(n * tx2 - tx * tx)"
_DRIFT = (
    f"((CAST(n AS DOUBLE) * CAST(txy AS DOUBLE)"
    f" - CAST(tx AS DOUBLE) * CAST(ty AS DOUBLE))"
    f" / CAST({_C} AS DOUBLE) / CAST(2 AS DOUBLE))"
)


def _theta_fold(eng: str) -> str:
    """SES fold with the drift column d added to every forecast."""
    sp = eng == "spark"
    if sp:
        y = "CAST(element_at(v, j) AS DOUBLE)"
        return (
            "aggregate(sequence(2, CAST(n AS INT)),"
            " named_struct('sse', CAST(0 AS DOUBLE),"
            " 'sae', CAST(0 AS DOUBLE),"
            " 'l', CAST(element_at(v, 1) AS DOUBLE)),"
            " (a, j) -> named_struct("
            f" 'sse', a.sse + ({y} - (a.l + d)) * ({y} - (a.l + d)),"
            f" 'sae', a.sae + abs({y} - (a.l + d)),"
            f" 'l', {_AL} * {y} + {_OMA} * a.l))"
        )
    return (
        "list_reduce(list_prepend("
        " {'sse': CAST(0 AS DOUBLE), 'sae': CAST(0 AS DOUBLE),"
        " 'l': CAST(v[1] AS DOUBLE)},"
        " list_transform(range(2, CAST(n AS BIGINT) + 1),"
        " j -> {'sse': CAST(0 AS DOUBLE), 'sae': CAST(0 AS DOUBLE),"
        " 'l': CAST(v[j] AS DOUBLE)})),"
        " (a, e) -> {"
        " 'sse': a.sse + (e.l - (a.l + d)) * (e.l - (a.l + d)),"
        " 'sae': a.sae + abs(e.l - (a.l + d)),"
        f" 'l': {_AL} * e.l + {_OMA} * a.l}})"
    )


_GUARD = "n >= 3 AND sad > 0 AND c_ok = 1"
_MASE = "(tacc.sae / CAST(sad AS DOUBLE))"


@register(
    "theta_forecast_eval",
    oracle=synth_sql(_N)
    + f"""
    , docs AS (
      SELECT doc_id, CAST(n_tok AS BIGINT) AS n,
             list_transform(tokens, y -> CAST(y AS BIGINT)) AS v
      FROM synth
    ),
    pre AS (
      SELECT doc_id, n, v,
             {", ".join(f"{x} AS {k}"
                        for k, x in _slope_folds("duck").items())},
             {", ".join(f"{x} AS {k}"
                        for k, x in _naive_folds("duck").items())}
      FROM docs
    ),
    withd AS (
      SELECT *, CASE WHEN {_C} > 0 THEN {_DRIFT}
                     ELSE CAST(0 AS DOUBLE) END AS d,
             CAST(CASE WHEN {_C} > 0 THEN 1 ELSE 0 END AS BIGINT) AS c_ok
      FROM pre
    ),
    folded AS (
      SELECT doc_id, n, sad, nsse, d, c_ok,
             {_theta_fold("duck")} AS tacc,
             {_ses_fold("duck")} AS sacc
      FROM withd
    )
    SELECT doc_id, n, sad, nsse,
           {_F6.format(x="d")} AS drift,
           {_F6.format(x="tacc.sse")} AS theta_sse,
           {_F6.format(x="tacc.sae")} AS theta_sae,
           {_F6.format(x="sacc.sse")} AS ses_sse,
           CASE WHEN {_GUARD} THEN {_F6.format(x=_MASE)}
                ELSE CAST(NULL AS DOUBLE) END AS theta_mase,
           CAST(CASE WHEN NOT ({_GUARD}) THEN NULL
                WHEN tacc.sse < sacc.sse THEN 1 ELSE 0 END
                AS BIGINT) AS theta_beats_ses
    FROM folded
    """,
)
def theta_forecast_eval(spark, sf_dir):
    """TS86: Theta(θ=2) via the Hyndman-Billah SES+drift identity
    (module header) — int64 slope folds, drift as a column inside the
    SES lambda, floor-1e6."""
    docs = synth.sequences_df(spark, _N).select(
        "doc_id",
        F.expr("CAST(n_tok AS BIGINT)").alias("n"),
        F.expr("transform(tokens, y -> CAST(y AS BIGINT))").alias("v"),
    )
    pre = docs.select(
        "doc_id",
        "n",
        "v",
        *[F.expr(x).alias(k) for k, x in _slope_folds("spark").items()],
        *[F.expr(x).alias(k) for k, x in _naive_folds("spark").items()],
    )
    withd = pre.withColumn(
        "d",
        F.expr(
            f"CASE WHEN {_C} > 0 THEN {_DRIFT}"
            " ELSE CAST(0 AS DOUBLE) END"
        ),
    ).withColumn(
        "c_ok",
        F.expr(f"CAST(CASE WHEN {_C} > 0 THEN 1 ELSE 0 END AS BIGINT)"),
    )
    folded = withd.select(
        "doc_id",
        "n",
        "sad",
        "nsse",
        "d",
        "c_ok",
        F.expr(_theta_fold("spark")).alias("tacc"),
        F.expr(_ses_fold("spark")).alias("sacc"),
    )
    return folded.selectExpr(
        "doc_id",
        "n",
        "sad",
        "nsse",
        f"{_F6.format(x='d')} AS drift",
        f"{_F6.format(x='tacc.sse')} AS theta_sse",
        f"{_F6.format(x='tacc.sae')} AS theta_sae",
        f"{_F6.format(x='sacc.sse')} AS ses_sse",
        f"CASE WHEN {_GUARD} THEN {_F6.format(x=_MASE)}"
        " ELSE CAST(NULL AS DOUBLE) END AS theta_mase",
        f"CAST(CASE WHEN NOT ({_GUARD}) THEN NULL"
        " WHEN tacc.sse < sacc.sse THEN 1 ELSE 0 END"
        " AS BIGINT) AS theta_beats_ses",
    )
