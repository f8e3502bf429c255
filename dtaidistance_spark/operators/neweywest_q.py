"""TS84 — Newey-West (Bartlett-kernel) long-run variance and
effective sample size per series (Newey & West Econometrica'87;
Bartlett'46 weights): the HAC dial every OTHER test in the battery
implicitly needs — the mean of n POSITIVELY correlated observations
is far noisier than σ²/n says, and

    lrv  = γ̂₀ + 2·Σ_{k=1..4} (1 − k/5)·γ̂_k        (K = 4, declared)
    vif  = lrv/γ̂₀            (variance inflation of the sample mean)
    n_eff = n/vif             (what n is actually worth)

is the standard correction (the HAC denominator in econometrics, the
"effective sample size" in MCMC diagnostics).  Complements TS66: von
Neumann DETECTS serial correlation; Newey-West QUANTIFIES what it
costs you.

Exactness: the demeaned autocovariance numerators expand as
n²·c_k = n²·Σy_t y_{t+k} − n·S₁·(H_k + T_k) + (n−k)·S₁² whose first
term exceeds int64 at this length, so (the Granger/TS65 precedent)
the INPUTS are exact int64 folds — Σ y_t y_{t+k} for k = 0..4, S₁,
and the ≤4-term head/tail prefix sums as direct element expressions —
and the expansion itself is ONE all-DOUBLE shared tree:
c_k = Σyy_k − S₁·(H_k + T_k)/n + (n−k)·(S₁/n)², γ̂_k = c_k/n.
floor-1e6 finals; NULL-guarded at n ≤ 10 or γ̂₀ ≤ 0 or lrv ≤ 0
(Bartlett weights make lrv ≥ 0 up to rounding, so the guard is a
degenerate-series catch, not a crutch).

Honest (gated) reading — the data flipped the draft's "vif ≫ 1
nearly everywhere" guess, and the resolution is instructive: TS66's
von Neumann found positive LAG-1 correlation on most docs, but these
series are short-period sinusoids, so γ̂_k oscillates in k and
γ̂₂..γ̂₄ go NEGATIVE inside the K = 4 window — the Bartlett sum drops
below γ̂₀ on 73% of the corpus (median vif 0.50, min 0.19): the mean
of a periodic series is genuinely MORE precise than iid because the
oscillations cancel, and the dial reports it.  The positively-
correlated tail is real too (vif up to 4.9, n_eff collapsing to
n/5).  Both tails pinned; the lag-1-only view (vif > 1) and the
K = 4 view disagreeing is the point of carrying the full window.

Scale shape: ZERO exchanges — per-row integer folds + one float
tree, a pure map job.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512
_K = 4

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _folds(eng: str) -> dict[str, str]:
    sp = eng == "spark"
    el = (lambda i: f"element_at(v, CAST({i} AS INT))") if sp else (
        lambda i: f"v[{i}]"
    )

    def fold(hi: str, term: str) -> str:
        if sp:
            return (
                f"aggregate(sequence(1, CAST({hi} AS INT)),"
                f" CAST(0 AS BIGINT), (a, t) -> a + ({term}))"
            )
        return (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
            f" list_transform(range(1, CAST({hi} AS BIGINT) + 1),"
            f" t -> CAST({term} AS BIGINT))), (a, q) -> a + q)"
        )

    out = {"s1": fold("n", el("t"))}
    for k in range(_K + 1):
        out[f"syy{k}"] = fold(
            f"n - {k}", f"{el('t')} * {el(f't + {k}')}"
        )
    # ≤4-term prefix/suffix sums as direct element expressions
    for k in range(1, _K + 1):
        out[f"p{k}"] = (
            "CAST(" + " + ".join(el(str(i)) for i in range(1, k + 1)) + " AS BIGINT)"
        )
        out[f"q{k}"] = (
            "CAST("
            + " + ".join(el(f"n - {i}") for i in range(0, k))
            + " AS BIGINT)"
        )
    return out


def _d(x: str) -> str:
    return f"CAST({x} AS DOUBLE)"


_MU = f"({_d('s1')} / {_d('n')})"


def _gamma(k: int) -> str:
    # H_k = S1 − (last k), T_k = S1 − (first k)
    h = "s1" if k == 0 else f"(s1 - q{k})"
    t = "s1" if k == 0 else f"(s1 - p{k})"
    c = (
        f"({_d(f'syy{k}')} - {_MU} * {_d(f'{h} + {t}')}"
        f" + {_d(f'n - {k}')} * {_MU} * {_MU})"
    )
    return f"({c} / {_d('n')})"


_G = {k: _gamma(k) for k in range(_K + 1)}
_LRV = (
    f"({_G[0]}"
    + "".join(
        f" + 2.0 * {_d(str(_K + 1 - k))} / {_d(str(_K + 1))} * {_G[k]}"
        for k in range(1, _K + 1)
    )
    + ")"
)
_VIF = f"({_LRV} / {_G[0]})"
_NEFF = f"({_d('n')} * {_G[0]} / {_LRV})"
_GUARD = f"n > 10 AND {_G[0]} > 0 AND {_LRV} > 0"


def _finals() -> list[str]:
    cols = []
    for k in range(_K + 1):
        cols.append(
            f"CASE WHEN {_GUARD} THEN {_F6.format(x=_G[k])}"
            f" ELSE CAST(NULL AS DOUBLE) END AS gamma{k}"
        )
    for name, x in (("lrv", _LRV), ("vif", _VIF), ("n_eff", _NEFF)):
        cols.append(
            f"CASE WHEN {_GUARD} THEN {_F6.format(x=x)}"
            f" ELSE CAST(NULL AS DOUBLE) END AS {name}"
        )
    return cols


@register(
    "newey_west_lrv",
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
    SELECT doc_id, n, s1,
           {", ".join(f"syy{k}" for k in range(_K + 1))},
           {", ".join(_finals())}
    FROM sums
    """,
)
def newey_west_lrv(spark, sf_dir):
    """TS84: Bartlett-kernel long-run variance, variance inflation,
    and effective sample size per series (module header) — exact
    int64 lagged-product folds, one all-DOUBLE shared tree,
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
        "doc_id",
        "n",
        "s1",
        *[f"syy{k}" for k in range(_K + 1)],
        *_finals(),
    )
