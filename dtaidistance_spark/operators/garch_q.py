"""TS121 — GARCH(1,1) quasi-maximum-likelihood fit by
variance-targeted grid profiling per series (Engle
Econometrica'82; Bollerslev J.Econometrics'86; variance targeting
per Engle–Mezrich'96): TS70's ARCH-LM PROVED volatility clustering
on 441/512 series; this operator FITS the model that test
motivates — conditional variance h_t = ω + α·e²_{t−1} + β·h_{t−1}
— and answers "how persistent is the volatility?" (α̂+β̂) and "is
GARCH better than constant variance?" (the LLR column).

Estimation (declared, deterministic): ω is eliminated by variance
targeting (ω = σ̂²(1−α−β), σ̂² the sample variance of the centered
diffs), and the Gaussian quasi-likelihood

    ℓ(α, β) = −½ Σ_{t≥2} ( ln h_t + e_t²/h_t ),   h_1 = σ̂²

is profiled over a FIXED 24-point (α, β) grid (α ∈ {.05,.10,.15,
.20,.30}, β ∈ {0,.3,.5,.7,.8,.9,.95}, α+β ≤ 0.98, plus the (0,0)
constant-variance null), argmax with the pinned (smallest α, then
β) tie-break — no optimizer, no RNG, bit-reproducible.  The
recursion runs as a sequential struct fold INSIDE a transform over
the candidate array (nested HOFs, one pass per candidate).

Oracle strategy (declared): the likelihood recursion is exactly
the shape that triggers the DuckDB list_reduce cross-row
corruption TS120 discovered, so the fit is a rows-only entry whose
full recursion is gated in pytest (numpy recompute mirroring the
fold order, per doc, plus planted-GARCH recovery); the oracled
twin ``garch_inputs_check`` pins the entire input reduction with
EXACT integers — m, Σd, Σd² (int64) and the derived σ̂² — so any
upstream divergence is driver-visible.

Honest (gated) reading — measured, and the draft's guess was
inverted in the most instructive way in this batch: 126 of 128
docs choose the CONSTANT-VARIANCE null (α̂ = β̂ = 0), even though
TS70's ARCH-LM rejects no-ARCH on 86% of the same corpus — and
BOTH are right.  The LM test detects second-moment
autocorrelation of ANY form, including the sawtooth's
deterministic isolated wrap spikes; a GARCH can only EXPLOIT
clustering that persists geometrically — after an isolated spike,
α·e² inflates h for steps where nothing follows, and the ln h
penalty buys nothing, so Gaussian QML correctly refuses the model
on every regularly-wrapping doc.  The 2 docs where GARCH wins are
surgical confirmation: doc…116 (increment −11 mod V; LLR = 774,
fit (α, β) = (0.05, 0.90)) and doc…120 (increment −89;
LLR = 14.6) — the near-boundary small-increment docs whose RARE
wrap bursts genuinely cluster, and doc…116 is exactly TS120's
top Inclán–Tiao firing doc: three operators (LM test, variance
CUSUM, QML fit) triangulating one mechanism at three
sensitivities.  Test-rejection ≠ model-improvement is the
operational lesson, measured.  Gates: planted GARCH(0.1, 0.8)
recovering its own grid cell as argmax; planted constant-variance
choosing (0, 0); the ω-targeting identity; numpy fold-order
recompute per doc; the corpus 126/128-null + two-winner +
TS120-overlap pins.

Scale shape: ZERO exchanges — per-row nested folds, a pure map
job; 24 candidates × one sequential pass each.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 128

_GRID = [(0.0, 0.0)] + [
    (a, b)
    for a in (0.05, 0.10, 0.15, 0.20, 0.30)
    for b in (0.0, 0.30, 0.50, 0.70, 0.80, 0.90, 0.95)
    if a + b <= 0.98
]

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _diff_folds(eng: str) -> dict[str, str]:
    sp = eng == "spark"
    el = (lambda i: f"element_at(v, {i})") if sp else (lambda i: f"v[{i}]")
    d = f"({el('t + 1')} - {el('t')})"

    def fold(term: str) -> str:
        if sp:
            return (
                "aggregate(sequence(1, CAST(n AS INT) - 1),"
                f" CAST(0 AS BIGINT), (a, t) -> a + ({term}))"
            )
        return (
            "list_reduce(list_prepend(CAST(0 AS BIGINT),"
            " list_transform(range(1, CAST(n AS INT)),"
            f" t -> CAST(({term}) AS BIGINT))), (a, q) -> a + q)"
        )

    return {"sd": fold(d), "sdd": fold(f"{d} * {d}")}


# Spark-side nested evaluation: for each candidate, one sequential
# likelihood fold.  e_t = (v[t+1] − v[t]) − mu; h threads through a
# two-field struct (ll first: reads OLD h — also the DuckDB-safe
# order, kept for symmetry even though this fold never runs there).
_E_PREV = (
    "(CAST(element_at(v, t) AS DOUBLE)"
    " - CAST(element_at(v, t - 1) AS DOUBLE) - mu)"
)
_E_CUR = (
    "(CAST(element_at(v, t + 1) AS DOUBLE)"
    " - CAST(element_at(v, t) AS DOUBLE) - mu)"
)
_H_NEW = f"(c.om + c.al * {_E_PREV} * {_E_PREV} + c.be * a.h)"

_LL_FOLD = f"""
aggregate(sequence(2, CAST(m AS INT)),
  named_struct('ll', CAST(0 AS DOUBLE), 'h', s2),
  (a, t) -> named_struct(
    'll', a.ll - 0.5 * (ln({_H_NEW})
          + {_E_CUR} * {_E_CUR} / {_H_NEW}),
    'h', {_H_NEW})).ll
"""


def _cands_expr() -> str:
    rows = ", ".join(
        f"named_struct('al', CAST({a} AS DOUBLE),"
        f" 'be', CAST({b} AS DOUBLE), 'om', CAST(0 AS DOUBLE))"
        for a, b in _GRID
    )
    return f"array({rows})"


@register("garch_grid_fit")
def garch_grid_fit(spark, sf_dir):
    """TS121: variance-targeted GARCH(1,1) grid QML per series
    (module header) — deterministic 24-cell profile, pinned
    tie-break, rows-only with the oracled integer input twin and
    the pytest fold-order recompute."""
    docs = synth.sequences_df(spark, _N).select(
        "doc_id",
        F.expr("CAST(n_tok AS BIGINT)").alias("n"),
        F.expr("CAST(n_tok - 1 AS BIGINT)").alias("m"),
        F.expr("transform(tokens, y -> CAST(y AS BIGINT))").alias("v"),
    )
    sums = docs.select(
        "*",
        *[
            F.expr(x).alias(k)
            for k, x in _diff_folds("spark").items()
        ],
    )
    base = sums.selectExpr(
        "doc_id",
        "n",
        "m",
        "v",
        "CAST(sd AS DOUBLE) / CAST(m AS DOUBLE) AS mu",
        "(CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)"
        " / CAST(m AS DOUBLE)) / CAST(m AS DOUBLE) AS s2",
    )
    with_cands = base.selectExpr(
        "doc_id",
        "n",
        "m",
        "v",
        "mu",
        "s2",
        f"transform({_cands_expr()}, c -> named_struct("
        " 'al', c.al, 'be', c.be,"
        " 'om', s2 * (1.0 - c.al - c.be))) AS cands",
    )
    scored = with_cands.selectExpr(
        "doc_id",
        "n",
        "s2",
        f"transform(cands, c -> named_struct("
        f" 'al', c.al, 'be', c.be, 'll', {_LL_FOLD})) AS scores",
    )
    best = scored.selectExpr(
        "doc_id",
        "n",
        "s2",
        "scores",
        # argmax ll with (smallest al, then be) tie-break
        "aggregate(scores, scores[0], (b, s) -> CASE"
        " WHEN s.ll > b.ll THEN s"
        " WHEN s.ll = b.ll AND (s.al < b.al OR"
        "      (s.al = b.al AND s.be < b.be)) THEN s"
        " ELSE b END) AS bst",
        "filter(scores, s -> s.al = 0.0 AND s.be = 0.0)[0].ll"
        " AS ll_const",
    )
    return best.selectExpr(
        "doc_id",
        "CAST(n AS BIGINT) AS n",
        _F6.format(x="s2") + " AS sigma2",
        "CAST(bst.al AS DOUBLE) AS alpha_hat",
        "CAST(bst.be AS DOUBLE) AS beta_hat",
        _F6.format(x="bst.ll") + " AS ll_best",
        _F6.format(x="ll_const") + " AS ll_const",
        _F6.format(x="(bst.ll - ll_const)") + " AS llr",
        "CAST(bst.al + bst.be AS DOUBLE) AS persistence",
    )


@register(
    "garch_inputs_check",
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
                        for k, x in _diff_folds("duck").items())}
      FROM docs
    )
    SELECT doc_id, n, CAST(sd AS BIGINT) AS sum_d,
           CAST(sdd AS BIGINT) AS sum_d2,
           {_F6.format(
               x="((CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE)"
               " * CAST(sd AS DOUBLE) / CAST(n - 1 AS DOUBLE))"
               " / CAST(n - 1 AS DOUBLE))")} AS sigma2
    FROM sums
    """,
)
def garch_inputs_check(spark, sf_dir):
    """TS121 twin: exact INT64 diff reductions + the targeted σ̂²
    the QML consumes (module header) — fully DuckDB-oracled."""
    docs = synth.sequences_df(spark, _N).select(
        "doc_id",
        F.expr("CAST(n_tok AS BIGINT)").alias("n"),
        F.expr("transform(tokens, y -> CAST(y AS BIGINT))").alias("v"),
    )
    sums = docs.select(
        "doc_id",
        "n",
        *[
            F.expr(x).alias(k)
            for k, x in _diff_folds("spark").items()
        ],
    )
    return sums.selectExpr(
        "doc_id",
        "n",
        "CAST(sd AS BIGINT) AS sum_d",
        "CAST(sdd AS BIGINT) AS sum_d2",
        _F6.format(
            x="((CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE)"
            " * CAST(sd AS DOUBLE) / CAST(n - 1 AS DOUBLE))"
            " / CAST(n - 1 AS DOUBLE))"
        )
        + " AS sigma2",
    )
