"""TS66 — von Neumann successive-difference ratio per series (von
Neumann Ann.Math.Stat.'41; identically the Durbin-Watson statistic of
the mean-centered series): the SERIAL-INDEPENDENCE verdict next to the
TS48 randomness battery — turning points / runs / difference signs
read combinatorial randomness, the von Neumann ratio reads it in the
VARIANCE domain: d = Σ(Δx)² / Σ(x − x̄)² ∈ [0, 4], ≈ 2 under iid,
≪ 2 under positive serial correlation (smooth series), ≫ 2 under
alternation.

Exactness: both sides clear to INT64 — numerator n·Σd² with
Σd² = Σ(v_{t+1} − v_t)² a pure int64 transition fold, denominator
M2 = n·Σy² − (Σy)² (n·Σd² ≤ 1.7e17, bound verified); the ratio
d = n·Σd²/M2 is ONE float divide.  The lag-1 autocorrelation reading
r₁ ≈ 1 − d/2 and its Bartlett z = r₁·√n are the same shared tree
(floor-1e6), verdict |z| > 1.96, NULL-guarded at M2 = 0.

Honest (gated) reading: 477/512 series reject — mostly d ≪ 2 (the
smooth sinusoid+ramp segments) with a d > 2 alternation minority —
while 35 series whose ramp step wraps mod V nearly every tick land at
d ≈ 2: the wraps inject white-noise-like jumps that genuinely
DECORRELATE consecutive values, and the test correctly declines to
reject on them.  The complement of TS62: JB says the VALUES aren't
Gaussian; von Neumann reads whether the ORDER is random.

Scale shape: ZERO exchanges — per-row integer folds, a pure map job.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _folds(eng: str) -> dict[str, str]:
    sp = eng == "spark"
    el = (lambda i: f"element_at(v, {i})") if sp else (lambda i: f"v[{i}]")

    def fold(rng_lo: str, rng_hi: str, term: str) -> str:
        if sp:
            return (
                f"aggregate(sequence({rng_lo}, {rng_hi}),"
                f" CAST(0 AS BIGINT), (a, j) -> a + ({term}))"
            )
        return (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
            f" list_transform(range({rng_lo}, {rng_hi} + 1),"
            f" j -> CAST({term} AS BIGINT))), (a, q) -> a + q)"
        )

    d = f"({el('j + 1')} - {el('j')})"
    y = el("j")
    return {
        "s1": fold("1", "CAST(n AS INT)", y),
        "s2": fold("1", "CAST(n AS INT)", f"{y} * {y}"),
        "sdd": fold("1", "CAST(n AS INT) - 1", f"{d} * {d}"),
    }


_D = "(CAST(num AS DOUBLE) / CAST(m2 AS DOUBLE))"
_Z = f"((1.0 - {_D} / 2.0) * sqrt(CAST(n AS DOUBLE)))"
_GUARD = "CASE WHEN m2 > 0 THEN {x} ELSE CAST(NULL AS DOUBLE) END"
_REJ = (
    "CAST(CASE WHEN m2 <= 0 THEN NULL"
    f" WHEN abs({_Z}) > 1.96 THEN 1 ELSE 0 END AS BIGINT)"
)


@register(
    "von_neumann_ratio",
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
    ),
    w AS (
      SELECT doc_id, n,
             CAST(n * sdd AS BIGINT) AS num,
             CAST(n * s2 - s1 * s1 AS BIGINT) AS m2
      FROM sums
    )
    SELECT doc_id, n, num, m2,
           {_F6.format(x=_GUARD.format(x=_D))} AS d_ratio,
           {_F6.format(x=_GUARD.format(x=_Z))} AS z_lag1,
           {_REJ} AS reject_independence
    FROM w
    """,
)
def von_neumann_ratio(spark, sf_dir):
    """TS66: von Neumann / Durbin-Watson ratio per series (module
    header) — int64 numerator n·Σ(Δx)² and denominator M2, one float
    divide, Bartlett z on r₁ ≈ 1 − d/2, floor-1e6."""
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
    w = sums.select(
        "doc_id",
        "n",
        F.expr("CAST(n * sdd AS BIGINT)").alias("num"),
        F.expr("CAST(n * s2 - s1 * s1 AS BIGINT)").alias("m2"),
    )
    return w.select(
        "doc_id",
        "n",
        "num",
        "m2",
        F.expr(_F6.format(x=_GUARD.format(x=_D))).alias("d_ratio"),
        F.expr(_F6.format(x=_GUARD.format(x=_Z))).alias("z_lag1"),
        F.expr(_REJ).alias("reject_independence"),
    )
