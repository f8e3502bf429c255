"""TS83 — Holt's linear-trend one-step-ahead forecast evaluation per
series (Holt'57 / Winters'60 lineage; the second rung of the ETS
ladder), run as a three-way MODEL SELECTION against SES and lag-1
naive — the question a rollup pipeline actually asks ("which cheap
forecaster do I attach to this metric?"), scored on identical errors.

    l₁ = y₁,  b₁ = y₂ − y₁  (⇒ the t = 2 forecast is exactly y₂)
    f_t = l_{t−1} + b_{t−1};  l_t = α·y_t + (1−α)·f_t;
    b_t = b_{t−1} + α·β·(y_t − f_t),          α = 0.2, β = 0.1

(the b_t line is the standard recursion ALGEBRAICALLY SUBSTITUTED
into old-state-only form: β(l_t − l_{t−1}) + (1−β)b_{t−1} =
b_{t−1} + αβ·e_t — identity gated in pytest).  State is the KPSS/SES
struct-accumulator fold carrying {sse, sae, b, lpb = l + b}; carrying
the FORECAST lpb instead of l makes every update old-state-only
except one.

Engine note (documented divergence in STRING, proven convergence in
VALUE): DuckDB evaluates struct-literal fields sequentially (the KPSS
live finding), so its 'lpb' field deliberately reads the
just-assigned NEW 'b'; Spark's named_struct is pure, so its 'lpb'
recomputes b_new inline with the IDENTICAL arithmetic ops — same
inputs, same op order, bit-equal doubles (the oracle hash-match over
all 512 rows is the proof).

Emits the naive (Σ|Δy|, Σ(Δy)² — exact INT64 folds), SES (TS81's
fold, verbatim), and Holt error sums side by side (declared init
artifact: Holt's t = 2 error is structurally zero so its sums start
at t = 3, while SES and naive include the t = 2 term — the classic
comparison's convention, favoring Holt slightly, which makes the
measured Holt shut-out below all the stronger), Holt's MASE, and
``best_model`` ∈ {0 naive, 1 ses, 2 holt} by SSE with ties to the
simpler model.  floor-1e6; NULL-guarded at n < 4 or SAD = 0.

Honest (gated) reading — the data REFUTED the draft's "Holt takes a
real minority" expectation: Holt wins ZERO of 512 series (SES 398,
naive 114).  Every ramp in this corpus wraps mod V, and a trend
component extrapolates STRAIGHT THROUGH each wrap — the one-step
overshoot at every wrap point costs more than the trend ever saves
between wraps, so pure level adaptation dominates corpus-wide.  The
gate pins holt-wins = 0 here, and the positive control lives in
pytest: on a clean unwrapped trend Holt beats both SES and naive
decisively (as the algebra says it must).

Scale shape: ZERO exchanges — per-row folds only, a pure map job.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.ses_q import _naive_folds, _ses_fold
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512
_AL = "CAST('0.2' AS DOUBLE)"   # α
_OMA = "CAST('0.8' AS DOUBLE)"  # 1 − α
_AB = "CAST('0.02' AS DOUBLE)"  # α·β

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _holt_fold(eng: str) -> str:
    """ARRAY accumulator [sse, sae, b, lpb] — NOT a struct: probing
    DuckDB 1.0 showed struct-literal field visibility in list_reduce
    is EXPRESSION-DEPENDENT (a bare a.b read the old accumulator, the
    same a.b inside arithmetic read the just-assigned new field on
    step 2 but the old one on step 1) — unusable for a coupled
    two-component recursion.  List literals evaluate PURELY in both
    engines (probed), so every slot expression references only OLD
    state, with b_new recomputed inline in the lpb slot via the
    identical op sequence."""
    sp = eng == "spark"
    if sp:
        y = "CAST(element_at(v, j) AS DOUBLE)"
        a = lambda i: f"element_at(a, {i})"  # noqa: E731
        return (
            "aggregate(sequence(3, CAST(n AS INT)),"
            " array(CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),"
            " CAST(element_at(v, 2) - element_at(v, 1) AS DOUBLE),"
            " CAST(element_at(v, 2) AS DOUBLE)),"
            " (a, j) -> array("
            f" {a(1)} + ({y} - {a(4)}) * ({y} - {a(4)}),"
            f" {a(2)} + abs({y} - {a(4)}),"
            f" {a(3)} + {_AB} * ({y} - {a(4)}),"
            f" {_AL} * {y} + {_OMA} * {a(4)}"
            f" + ({a(3)} + {_AB} * ({y} - {a(4)}))))"
        )
    y = "e[4]"  # element carries y in slot 4
    a = lambda i: f"a[{i}]"  # noqa: E731
    return (
        "list_reduce(list_prepend("
        " [CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),"
        " CAST(v[2] - v[1] AS DOUBLE), CAST(v[2] AS DOUBLE)],"
        " list_transform(range(3, CAST(n AS BIGINT) + 1),"
        " j -> [CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),"
        " CAST(0 AS DOUBLE), CAST(v[j] AS DOUBLE)])),"
        " (a, e) -> ["
        f" {a(1)} + ({y} - {a(4)}) * ({y} - {a(4)}),"
        f" {a(2)} + abs({y} - {a(4)}),"
        f" {a(3)} + {_AB} * ({y} - {a(4)}),"
        f" {_AL} * {y} + {_OMA} * {a(4)}"
        f" + ({a(3)} + {_AB} * ({y} - {a(4)}))])"
    )


_GUARD = "n >= 4 AND sad > 0"
_MASE = "(hsae / CAST(sad AS DOUBLE))"
_BEST = (
    "CAST(CASE WHEN hsse < ssse AND hsse < CAST(nsse AS DOUBLE) THEN 2"
    " WHEN ssse < CAST(nsse AS DOUBLE) THEN 1 ELSE 0 END AS BIGINT)"
)


@register(
    "holt_model_selection",
    oracle=synth_sql(_N)
    + f"""
    , docs AS (
      SELECT doc_id, CAST(n_tok AS BIGINT) AS n,
             list_transform(tokens, y -> CAST(y AS BIGINT)) AS v
      FROM synth
    ),
    folded AS (
      SELECT doc_id, n,
             {_holt_fold("duck")} AS hacc,
             {_ses_fold("duck")} AS sacc,
             {", ".join(f"{x} AS {k}"
                        for k, x in _naive_folds("duck").items())}
      FROM docs
    ),
    w AS (
      SELECT doc_id, n, sad, nsse,
             hacc[1] AS hsse, hacc[2] AS hsae, hacc[3] AS hb,
             hacc[4] AS hlpb, sacc.sse AS ssse
      FROM folded
    )
    SELECT doc_id, n, sad, nsse,
           {_F6.format(x="hsse")} AS holt_sse,
           {_F6.format(x="hsae")} AS holt_sae,
           {_F6.format(x="ssse")} AS ses_sse,
           {_F6.format(x="hb")} AS final_trend,
           {_F6.format(x="hlpb")} AS final_forecast,
           CASE WHEN {_GUARD} THEN {_F6.format(x=_MASE)}
                ELSE CAST(NULL AS DOUBLE) END AS holt_mase,
           CAST(CASE WHEN NOT ({_GUARD}) THEN NULL
                ELSE {_BEST} END AS BIGINT) AS best_model
    FROM w
    """,
)
def holt_model_selection(spark, sf_dir):
    """TS83: Holt linear-trend vs SES vs naive, scored per series
    (module header) — old-state-substituted struct fold, the SES and
    naive folds reused verbatim, floor-1e6."""
    docs = synth.sequences_df(spark, _N).select(
        "doc_id",
        F.expr("CAST(n_tok AS BIGINT)").alias("n"),
        F.expr("transform(tokens, y -> CAST(y AS BIGINT))").alias("v"),
    )
    folded = docs.select(
        "doc_id",
        "n",
        F.expr(_holt_fold("spark")).alias("hacc"),
        F.expr(_ses_fold("spark")).alias("sacc"),
        *[F.expr(x).alias(k) for k, x in _naive_folds("spark").items()],
    )
    w = folded.selectExpr(
        "doc_id",
        "n",
        "sad",
        "nsse",
        "element_at(hacc, 1) AS hsse",
        "element_at(hacc, 2) AS hsae",
        "element_at(hacc, 3) AS hb",
        "element_at(hacc, 4) AS hlpb",
        "sacc.sse AS ssse",
    )
    return w.selectExpr(
        "doc_id",
        "n",
        "sad",
        "nsse",
        f"{_F6.format(x='hsse')} AS holt_sse",
        f"{_F6.format(x='hsae')} AS holt_sae",
        f"{_F6.format(x='ssse')} AS ses_sse",
        f"{_F6.format(x='hb')} AS final_trend",
        f"{_F6.format(x='hlpb')} AS final_forecast",
        f"CASE WHEN {_GUARD} THEN {_F6.format(x=_MASE)}"
        " ELSE CAST(NULL AS DOUBLE) END AS holt_mase",
        f"CAST(CASE WHEN NOT ({_GUARD}) THEN NULL"
        f" ELSE {_BEST} END AS BIGINT) AS best_model",
    )
