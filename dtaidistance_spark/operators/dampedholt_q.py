"""TS127 — damped-trend Holt one-step forecast evaluation per series
(Gardner & McKenzie Mgmt.Sci.'85; the FPP3 "damped methods" rung),
run as a FOUR-way model selection against naive / SES / undamped
Holt on one scoring rail — the direct follow-up to TS83's measured
shut-out (Holt won ZERO of 512 because a trend component
extrapolates straight through every mod-V wrap): damping is the
textbook remedy for exactly that failure, so the question this
module asks the data is "does φ < 1 rescue the trend family here?"

    f_t = l_{t−1} + φ·b_{t−1};   l_t = α·y_t + (1−α)·f_t;
    b_t = φ·b_{t−1} + α·β·e_t        (α = 0.2, β = 0.1, φ = 0.9)

with the b_t line algebraically substituted into old-state-only form
(b_t = β(l_t − l_{t−1}) + (1−β)·φ·b_{t−1} = φ·b_{t−1} + αβ·e_t —
identity gated in pytest).  Textbook init, DECLARED (differs from
TS83's artifact init, stated there): l₂ = y₂, b₂ = y₂ − y₁, so
f₃ = y₂ + φ·(y₂ − y₁) and all four models score errors from t = 3
on the identical series.  At φ = 1 the fold IS textbook Holt (the
undamped column is this fold at φ = '1.0' — one code path, two
pinned literals); at φ = 0 it degenerates to SES-from-t₃ (both
gated).

Exactness: the TS83 ARRAY-accumulator posture verbatim ([sse, sae,
b, f] — list literals evaluate purely in both engines where struct
fields don't), every slot reading only OLD state with b_new
recomputed inline in the f slot via the identical op sequence;
constants as shortest-round-trip string literals; floor-1e6;
NULL-guarded at n < 4 or SAD = 0.

Honest (gated) reading — measured: damping DOES rescue the trend
family, but not to victory: damped beats undamped Holt head-to-head
on 511 of 512 series, and even beats SES outright on 26 — yet wins
the 4-way on ZERO, because on exactly those 26 series the lag-1
naive undercuts both (best_model reads SES 398, naive 114, damped
0, Holt 0 — the same 398/114 split TS83 measured, meaning damping
never flips a single selection); φ = 0.9 still carries 90% of the
trend into every wrap overshoot while SES carries none.  The
corpus's lesson is sharpened, not overturned: under mod-V wraps ANY
trend weight is a liability, and damping only prices the liability
down — by enough to dominate Holt, never by enough to earn the
trend back.
Gates: numpy recompute of the fold per sampled doc; the φ = 1 ≡
textbook-Holt and φ = 0 ≡ SES-from-t₃ identities; the substituted
b_t identity; a clean unwrapped-trend control where undamped Holt
wins decisively and damping is shown NOT free — its steady-state
under-extrapolation bias e* ≈ (1−φ)·b/(αβ) prices damped below
even the naive on a clean ramp (h < naive < damped < ses, asserted
in full with the bias-magnitude band): damping is insurance, paid
for when the trend is real and paying out when it wraps; the
corpus pins above.

Scale shape: ZERO exchanges — per-row folds only, a pure map job
over the scan (the TS83 plan, re-used).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.holt_q import _holt_fold  # noqa: F401
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.ses_q import _naive_folds, _ses_fold
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512
_AL = "CAST('0.2' AS DOUBLE)"
_OMA = "CAST('0.8' AS DOUBLE)"
_AB = "CAST('0.02' AS DOUBLE)"  # α·β


def _damped_fold(eng: str, phi: str) -> str:
    """[sse, sae, b, f] array fold with damping φ (pinned string
    literal): e = y − f_old; b_new = φ·b_old + αβ·e;
    l_new = α·y + (1−α)·f_old; f_new = l_new + φ·b_new (b_new
    recomputed inline — old-state-only slots, the TS83 posture)."""
    ph = f"CAST('{phi}' AS DOUBLE)"
    if eng == "spark":
        y = "CAST(element_at(v, j) AS DOUBLE)"
        a = lambda i: f"element_at(a, {i})"  # noqa: E731
        return (
            # empty-guarded: Spark sequence(3, 2) would be the
            # DESCENDING [3, 2] (DuckDB range(3, 3) is empty), so for
            # n < 3 slice the iteration list to zero elements and the
            # fold returns its init state in both engines
            "aggregate(slice(sequence(3, CAST(greatest(n, 3) AS INT)),"
            " 1, CAST(greatest(n - 2, 0) AS INT)),"
            " array(CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),"
            " CAST(element_at(v, 2) - element_at(v, 1) AS DOUBLE),"
            f" CAST(element_at(v, 2) AS DOUBLE) + {ph}"
            " * CAST(element_at(v, 2) - element_at(v, 1) AS DOUBLE)),"
            " (a, j) -> array("
            f" {a(1)} + ({y} - {a(4)}) * ({y} - {a(4)}),"
            f" {a(2)} + abs({y} - {a(4)}),"
            f" {ph} * {a(3)} + {_AB} * ({y} - {a(4)}),"
            f" {_AL} * {y} + {_OMA} * {a(4)}"
            f" + {ph} * ({ph} * {a(3)} + {_AB} * ({y} - {a(4)}))))"
        )
    y = "e[4]"
    a = lambda i: f"a[{i}]"  # noqa: E731
    return (
        "list_reduce(list_prepend("
        " [CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),"
        " CAST(v[2] - v[1] AS DOUBLE),"
        f" CAST(v[2] AS DOUBLE) + {ph}"
        " * CAST(v[2] - v[1] AS DOUBLE)],"
        " list_transform(range(3, CAST(n AS BIGINT) + 1),"
        " j -> [CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),"
        " CAST(0 AS DOUBLE), CAST(v[j] AS DOUBLE)])),"
        " (a, e) -> ["
        f" {a(1)} + ({y} - {a(4)}) * ({y} - {a(4)}),"
        f" {a(2)} + abs({y} - {a(4)}),"
        f" {ph} * {a(3)} + {_AB} * ({y} - {a(4)}),"
        f" {_AL} * {y} + {_OMA} * {a(4)}"
        f" + {ph} * ({ph} * {a(3)} + {_AB} * ({y} - {a(4)}))])"
    )


_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_GUARD = "n >= 4 AND sad > 0"
_MASE = "(dsae / CAST(sad AS DOUBLE))"
# ties to the simpler model: naive < ses < holt < damped
_BEST = (
    "CAST(CASE"
    " WHEN dsse < hsse AND dsse < ssse AND dsse < CAST(nsse AS DOUBLE)"
    " THEN 3"
    " WHEN hsse < ssse AND hsse < CAST(nsse AS DOUBLE) THEN 2"
    " WHEN ssse < CAST(nsse AS DOUBLE) THEN 1 ELSE 0 END AS BIGINT)"
)

_OUT = [
    "doc_id",
    "n",
    "sad",
    "nsse",
    _F6.format(x="ssse") + " AS ses_sse",
    _F6.format(x="hsse") + " AS holt_sse",
    _F6.format(x="dsse") + " AS damped_sse",
    _F6.format(x="dsae") + " AS damped_sae",
    _F6.format(x="db") + " AS final_trend",
    _F6.format(x="df") + " AS final_forecast",
    "CASE WHEN {g} THEN {m} ELSE CAST(NULL AS DOUBLE) END"
    " AS damped_mase".format(g=_GUARD, m=_F6.format(x=_MASE)),
    "CAST(CASE WHEN NOT ({g}) THEN NULL ELSE {b} END AS BIGINT)"
    " AS best_model".format(g=_GUARD, b=_BEST),
    "CAST(CASE WHEN NOT ({g}) THEN NULL"
    " WHEN dsse < hsse THEN 1 ELSE 0 END AS BIGINT)"
    " AS damped_beats_holt".format(g=_GUARD),
]


@register(
    "damped_holt_selection",
    oracle=synth_sql(_N)
    + f"""
    , docs AS (
      SELECT doc_id, CAST(n_tok AS BIGINT) AS n,
             list_transform(tokens, y -> CAST(y AS BIGINT)) AS v
      FROM synth
    ),
    folded AS (
      SELECT doc_id, n,
             {_damped_fold("duck", "0.9")} AS dacc,
             {_damped_fold("duck", "1.0")} AS hacc,
             {_ses_fold("duck")} AS sacc,
             {", ".join(f"{x} AS {k}"
                        for k, x in _naive_folds("duck").items())}
      FROM docs
    ),
    w AS (
      SELECT doc_id, n, sad, nsse,
             dacc[1] AS dsse, dacc[2] AS dsae, dacc[3] AS db,
             dacc[4] AS df, hacc[1] AS hsse, sacc.sse AS ssse
      FROM folded
    )
    SELECT {", ".join(_OUT)}
    FROM w
    """,
)
def damped_holt_selection(spark, sf_dir):
    """TS127: damped-trend Holt (φ = 0.9) four-way model selection
    (module header) — the TS83 array-fold posture at two pinned φ
    literals, one zero-exchange map job."""
    docs = synth.sequences_df(spark, _N).selectExpr(
        "doc_id",
        "CAST(n_tok AS BIGINT) AS n",
        "transform(tokens, y -> CAST(y AS BIGINT)) AS v",
    )
    folded = docs.selectExpr(
        "doc_id",
        "n",
        _damped_fold("spark", "0.9") + " AS dacc",
        _damped_fold("spark", "1.0") + " AS hacc",
        _ses_fold("spark") + " AS sacc",
        *[
            f"{x} AS {k}"
            for k, x in _naive_folds("spark").items()
        ],
    )
    w = folded.selectExpr(
        "doc_id",
        "n",
        "sad",
        "nsse",
        "element_at(dacc, 1) AS dsse",
        "element_at(dacc, 2) AS dsae",
        "element_at(dacc, 3) AS db",
        "element_at(dacc, 4) AS df",
        "element_at(hacc, 1) AS hsse",
        "sacc.sse AS ssse",
    )
    return w.selectExpr(*_OUT)
