"""TS78 — Chow structural-break test per series (Chow Econometrica
'60): does ONE linear trend fit the whole series, or do the two
halves demand different lines?  The PARAMETRIC break verdict next to
the family's nonparametric members — Pettitt locates a distribution
shift by ranks, CUSUM/PELT find mean changepoints, TS61's OLS t tests
whether a single slope is nonzero; Chow asks whether the (intercept,
slope) pair itself BREAKS at a declared point (here the midpoint
m = n DIV 2).

    F = ((RSS_p − RSS₁ − RSS₂)/2) / ((RSS₁ + RSS₂)/(n − 4))

with RSS from the closed-form simple-OLS identity
RSS = (A − B²/C)/n_s where (per segment, x = global 0-based index,
y = token value — RSS is invariant to the affine x shift, so the
global index serves both halves):

    A = n_s·Σy² − (Σy)²       (int64, ≤ 1.6e17 at n = 7968 — bound
    B = n_s·Σxy − Σx·Σy        verified in pytest)
    C = n_s·Σx² − (Σx)²

All six sums per half are exact INT64 HOF folds; pooled sums are the
segment sums ADDED (gated), so the whole statistic needs 10 folds and
no second pass.  The F ratio is one shared double tree (floor-1e6).

The 5% critical value is EXACT and closed-form because the numerator
df is 2: for F(2, d₂) the CDF is 1 − (1 + 2x/d₂)^(−d₂/2), so

    F_crit = (d₂/2)·(0.05^(−2/d₂) − 1),   d₂ = n − 4

— no quantile table, no approximation (identity gated in pytest
against a numerically integrated F CDF).  NULL-guarded at n < 8 or
degenerate halves (C ≤ 0, RSS₁+RSS₂ ≤ 0).

Honest (gated) reading — and the data REFUTED the first draft's
claim that a wavy series must reject: only 21/512 (4.1%, essentially
the nominal 5%) reject, with median F ≈ 0.08.  The midpoint halves of
a long sinusoid+ramp series carry nearly IDENTICAL linear fits (the
sinusoid averages out per half, the wrapping ramp has the same mean
slope in both), so separate lines buy almost nothing — and the
periodic residuals, being structured rather than iid, deflate F far
below its H0 median (~0.7), making the test conservative here.  The
gate pins the measured near-nominal rate and the deflated median; the
planted-break positive control (two genuinely different slopes →
huge F, decisive rejection) lives in pytest.

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
    """Ten int64 folds: {s1,s2,sxy,sx,sx2} × halves {a: [1,m], b: [m+1,n]}
    (1-indexed elements; x = j−1)."""
    sp = eng == "spark"
    el = (lambda i: f"element_at(v, CAST(j AS INT))") if sp else (lambda i: "v[j]")

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
    x = "(j - 1)"
    terms = {
        "s1": y,
        "s2": f"{y} * {y}",
        "sxy": f"{x} * {y}",
        "sx": x,
        "sx2": f"{x} * {x}",
    }
    out = {}
    for k, t in terms.items():
        out[f"{k}a"] = fold("1", "m", t)
        out[f"{k}b"] = fold("m + 1", "n", t)
    return out


def _rss(ns: str, a: str, b: str, c: str) -> str:
    """RSS = (A − B²/C)/n_s as a shared double tree."""
    return (
        f"((CAST({a} AS DOUBLE)"
        f" - CAST({b} AS DOUBLE) * CAST({b} AS DOUBLE) / CAST({c} AS DOUBLE))"
        f" / CAST({ns} AS DOUBLE))"
    )


# per-half cleared int64 sufficient statistics, then the float tree
_ABC = """
  CAST(m * s2a - s1a * s1a AS BIGINT) AS aa,
  CAST(m * sxya - sxa * s1a AS BIGINT) AS ba,
  CAST(m * sx2a - sxa * sxa AS BIGINT) AS ca,
  CAST((n - m) * s2b - s1b * s1b AS BIGINT) AS ab,
  CAST((n - m) * sxyb - sxb * s1b AS BIGINT) AS bb,
  CAST((n - m) * sx2b - sxb * sxb AS BIGINT) AS cb,
  CAST(n * (s2a + s2b) - (s1a + s1b) * (s1a + s1b) AS BIGINT) AS ap,
  CAST(n * (sxya + sxyb) - (sxa + sxb) * (s1a + s1b) AS BIGINT) AS bp,
  CAST(n * (sx2a + sx2b) - (sxa + sxb) * (sxa + sxb) AS BIGINT) AS cp
"""

_RSS1 = _rss("m", "aa", "ba", "ca")
_RSS2 = _rss("n - m", "ab", "bb", "cb")
_RSSP = _rss("n", "ap", "bp", "cp")

_D2 = "CAST(n - 4 AS DOUBLE)"
_FSTAT = (
    f"((({_RSSP} - ({_RSS1}) - ({_RSS2})) / 2.0)"
    f" / ((({_RSS1}) + ({_RSS2})) / {_D2}))"
)
_FCRIT = f"(({_D2} / 2.0) * (pow(0.05, -2.0 / {_D2}) - 1.0))"
_GUARD = (
    "n >= 8 AND ca > 0 AND cb > 0 AND cp > 0"
    f" AND (({_RSS1}) + ({_RSS2})) > 0"
)


@register(
    "chow_break_test",
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
    ),
    abc AS (
      SELECT doc_id, n, m, {_ABC}
      FROM sums
    )
    SELECT doc_id, n, m, aa, ba, ca, ab, bb, cb, ap, bp, cp,
           CASE WHEN {_GUARD} THEN {_F6.format(x=_FSTAT)}
                ELSE CAST(NULL AS DOUBLE) END AS chow_f,
           CASE WHEN {_GUARD} THEN {_F6.format(x=_FCRIT)}
                ELSE CAST(NULL AS DOUBLE) END AS f_crit,
           CAST(CASE WHEN NOT ({_GUARD}) THEN NULL
                WHEN {_FSTAT} > {_FCRIT} THEN 1 ELSE 0 END
                AS BIGINT) AS reject_stability
    FROM abc
    """,
)
def chow_break_test(spark, sf_dir):
    """TS78: Chow structural-break F at the midpoint per series
    (module header) — ten int64 HOF folds, per-half cleared A/B/C,
    one shared double tree for F, and the EXACT closed-form
    F(2, n−4) 5% critical value; floor-1e6, NULL-guarded."""
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
    abc = sums.selectExpr("doc_id", "n", "m", *_ABC.split(",\n"))
    return abc.selectExpr(
        "doc_id",
        "n",
        "m",
        "aa",
        "ba",
        "ca",
        "ab",
        "bb",
        "cb",
        "ap",
        "bp",
        "cp",
        f"CASE WHEN {_GUARD} THEN {_F6.format(x=_FSTAT)}"
        " ELSE CAST(NULL AS DOUBLE) END AS chow_f",
        f"CASE WHEN {_GUARD} THEN {_F6.format(x=_FCRIT)}"
        " ELSE CAST(NULL AS DOUBLE) END AS f_crit",
        f"CAST(CASE WHEN NOT ({_GUARD}) THEN NULL"
        f" WHEN {_FSTAT} > {_FCRIT} THEN 1 ELSE 0 END"
        " AS BIGINT) AS reject_stability",
    )
