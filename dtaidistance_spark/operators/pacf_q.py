"""TS67 — partial autocorrelation (PACF, lags 1–4) via the
Levinson-Durbin recursion, plus the Yule-Walker AR(2) fit per series
(Durbin Biometrika'60; Box-Jenkins ch.3): the ORDER-SELECTION
diagnostic the ACF family was missing — ACF (in tsanalytics) reads
total correlation at each lag, PACF reads what lag k adds AFTER lags
1..k−1 are regressed out, and the Box-Jenkins recipe reads AR order
off the PACF cutoff against the Bartlett band ±1.96/√n.

Machinery: the TS-ACF int64 sufficient statistics (lagged products,
head/tail sums, power sums — all exact folds, zero shuffles) computed
for lags 1..4 side by side, then the sample ACF r₁..r₄ as UNFLOORED
shared-double columns (both engines evaluate the identical IEEE tree,
so the intermediates agree bit-for-bit and may safely feed the next
projection), then the Durbin recursion unrolled:

    φ₁₁ = r₁
    φ₂₂ = (r₂ − r₁²)/(1 − r₁²)          φ₂₁ = r₁·(1 − φ₂₂)
    φ₃₃ = (r₃ − φ₂₁r₂ − φ₂₂r₁)/(1 − φ₂₁r₁ − φ₂₂r₂)
    φ₃₁ = φ₂₁ − φ₃₃φ₂₂                   φ₃₂ = φ₂₂ − φ₃₃φ₂₁
    φ₄₄ = (r₄ − φ₃₁r₃ − φ₃₂r₂ − φ₃₃r₁)/(1 − φ₃₁r₁ − φ₃₂r₂ − φ₃₃r₃)

each level ONE projection deep (no exponential inlining).  The
Yule-Walker AR(2) coefficients are the level-2 row (a₁ = φ₂₁,
a₂ = φ₂₂) with innovation-variance ratio 1 − a₁r₁ − a₂r₂.  Final
outputs floor-1e6; NULL-guarded on each zero denominator.

Honest (gated) reading: the lag-1 Bartlett flag fires on ≥90% of
series (the TS66 fast-wrapping sawtooths decorrelate and land inside
the band), and the AR(2) innovation-variance ratio spans the corpus
honestly — near zero on the smooth unwrapped docs, large (median
≈ 0.7) on the wrapped ones, always inside [0, 1].

Scale shape: ZERO exchanges — per-row folds and five narrow
projections, a pure map job.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512
_LAGS = (1, 2, 3, 4)

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _stats(eng: str) -> dict[str, str]:
    """Int64 sufficient statistics: sa, qa shared; pa/ha/ta per lag."""
    sp = eng == "spark"

    def fold(arr: str) -> str:
        if sp:
            return f"aggregate({arr}, 0L, (a, x) -> a + x)"
        return "list_sum(" + arr + ")::BIGINT"

    def longs(arr: str) -> str:
        tr = "transform" if sp else "list_transform"
        return f"{tr}({arr}, x -> CAST(x AS BIGINT))"

    sl = (
        (lambda a, i, ln: f"slice({a}, {i}, {ln})")
        if sp
        else (lambda a, i, ln: f"list_slice({a}, {i}, {i} + {ln} - 1)")
    )
    out = {
        "sa": fold(longs("tokens")),
        "qa": fold(
            ("transform" if sp else "list_transform")
            + "(tokens, x -> CAST(x AS BIGINT) * x)"
        ),
    }
    for k in _LAGS:
        head = sl("tokens", "1", f"n - {k}")
        tail = sl("tokens", f"{k} + 1", f"n - {k}")
        if sp:
            out[f"pa{k}"] = (
                f"aggregate(zip_with({head}, {tail},"
                f" (a, b) -> CAST(a AS BIGINT) * b), 0L, (s, v) -> s + v)"
            )
        else:
            out[f"pa{k}"] = (
                f"list_sum(list_transform(range(1, n - {k} + 1),"
                f" i -> tokens[i]::BIGINT * tokens[i + {k}]))::BIGINT"
            )
        out[f"ha{k}"] = fold(longs(head))
        out[f"ta{k}"] = fold(longs(tail))
    return out


_MU = "(CAST(sa AS DOUBLE) / CAST(n AS DOUBLE))"


def _r(k: int) -> str:
    return (
        f"((((CAST(pa{k} AS DOUBLE) - ({_MU} * CAST(ta{k} AS DOUBLE)))"
        f" - ({_MU} * CAST(ha{k} AS DOUBLE)))"
        f" + (CAST(n - {k} AS DOUBLE) * ({_MU} * {_MU})))"
        f" / (CAST(qa AS DOUBLE) - (CAST(sa AS DOUBLE) * {_MU})))"
    )


# level-by-level Durbin recursion over unfloored double columns
_L2 = {
    "p22": (
        "CASE WHEN 1.0 - r1 * r1 = 0.0 THEN CAST(NULL AS DOUBLE)"
        " ELSE (r2 - r1 * r1) / (1.0 - r1 * r1) END"
    ),
}
_L2B = {"p21": "r1 * (1.0 - p22)"}
_L3 = {
    "p33": (
        "CASE WHEN 1.0 - p21 * r1 - p22 * r2 = 0.0"
        " THEN CAST(NULL AS DOUBLE)"
        " ELSE (r3 - p21 * r2 - p22 * r1)"
        " / (1.0 - p21 * r1 - p22 * r2) END"
    ),
}
_L3B = {"p31": "p21 - p33 * p22", "p32": "p22 - p33 * p21"}
_L4 = {
    "p44": (
        "CASE WHEN 1.0 - p31 * r1 - p32 * r2 - p33 * r3 = 0.0"
        " THEN CAST(NULL AS DOUBLE)"
        " ELSE (r4 - p31 * r3 - p32 * r2 - p33 * r1)"
        " / (1.0 - p31 * r1 - p32 * r2 - p33 * r3) END"
    ),
}

_VRATIO = "(1.0 - p21 * r1 - p22 * r2)"
_BARTLETT = "(1.96 / sqrt(CAST(n AS DOUBLE)))"

_FINAL = (
    [(f"r{k}", f"r{k}") for k in _LAGS]
    + [
        ("pacf1", "r1"),
        ("pacf2", "p22"),
        ("pacf3", "p33"),
        ("pacf4", "p44"),
        ("ar2_a1", "p21"),
        ("ar2_a2", "p22"),
        ("var_ratio", _VRATIO),
    ]
)

_SIG = (
    "CAST(CASE WHEN {p} IS NULL THEN NULL"
    f" WHEN abs({{p}}) > {_BARTLETT} THEN 1 ELSE 0 END AS BIGINT)"
)


@register(
    "pacf_yule_walker",
    oracle=synth_sql(_N)
    + f"""
    , docs AS (
      SELECT doc_id, CAST(n_tok AS BIGINT) AS n, tokens
      FROM synth
    ),
    st AS (
      SELECT doc_id, n,
             {", ".join(f"{x} AS {k}"
                        for k, x in _stats("duck").items())}
      FROM docs
    ),
    rr AS (
      SELECT doc_id, n,
             {", ".join(f"{_r(k)} AS r{k}" for k in _LAGS)}
      FROM st
    ),
    l2 AS (SELECT rr.*, {_L2['p22']} AS p22 FROM rr),
    l2b AS (SELECT l2.*, {_L2B['p21']} AS p21 FROM l2),
    l3 AS (SELECT l2b.*, {_L3['p33']} AS p33 FROM l2b),
    l3b AS (SELECT l3.*, {_L3B['p31']} AS p31,
                   {_L3B['p32']} AS p32 FROM l3),
    l4 AS (SELECT l3b.*, {_L4['p44']} AS p44 FROM l3b)
    SELECT doc_id, n,
           {", ".join(_F6.format(x=x) + " AS " + a for a, x in _FINAL)},
           {_SIG.format(p="r1")} AS sig1,
           {_SIG.format(p="p22")} AS sig2,
           {_SIG.format(p="p33")} AS sig3,
           {_SIG.format(p="p44")} AS sig4
    FROM l4
    """,
)
def pacf_yule_walker(spark, sf_dir):
    """TS67: PACF lags 1–4 by unrolled Levinson-Durbin + Yule-Walker
    AR(2) per series (module header) — int64 ACF statistics, unfloored
    shared-double intermediates level by level, floor-1e6 finals,
    Bartlett-band significance flags."""
    docs = synth.sequences_df(spark, _N).select(
        "doc_id",
        F.expr("CAST(n_tok AS BIGINT)").alias("n"),
        "tokens",
    )
    st = docs.select(
        "doc_id",
        "n",
        *[F.expr(x).alias(k) for k, x in _stats("spark").items()],
    )
    rr = st.select(
        "doc_id",
        "n",
        *[F.expr(_r(k)).alias(f"r{k}") for k in _LAGS],
    )
    df = rr
    for lvl in (_L2, _L2B, _L3, _L3B, _L4):
        df = df.select(
            "*", *[F.expr(x).alias(k) for k, x in lvl.items()]
        )
    return df.select(
        "doc_id",
        "n",
        *[F.expr(_F6.format(x=x)).alias(a) for a, x in _FINAL],
        F.expr(_SIG.format(p="r1")).alias("sig1"),
        F.expr(_SIG.format(p="p22")).alias("sig2"),
        F.expr(_SIG.format(p="p33")).alias("sig3"),
        F.expr(_SIG.format(p="p44")).alias("sig4"),
    )
