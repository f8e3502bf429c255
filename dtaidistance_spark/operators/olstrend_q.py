"""TS61 — OLS linear-trend t-test per series (the Gauss/least-squares
slope with its standard-error inference, textbook form per e.g.
Draper-Smith "Applied Regression Analysis"): the PARAMETRIC trend
verdict completing the trend family — Mann-Kendall (TS in
tsanalytics) is the nonparametric sign-based verdict, Theil-Sen the
robust slope ESTIMATE; OLS supplies the classical t-statistic a
monitoring pipeline thresholds when the series is well-behaved.

Per series, x = position 0..n−1, y = the FULL token array (no cap —
every statistic is a linear fold).  The three cleared-denominator
sufficient statistics are pure INT64 (bounds verified for n ≤ 8192,
y < 50257):

    A = n·Σxy − Σx·Σy        (slope numerator,   |A| ≤ 1.4e16)
    B = n·Σxx − (Σx)²        (slope denominator,  B ≤ 1.5e15)
    C = n·Σyy − (Σy)²        (total variation,    C ≤ 1.7e17)

Σx and Σxx are closed forms of n (exact integer division); Σy, Σxy,
Σyy are int64 array folds (integer addition — order-free).  Then
slope = A/B, r² = A²/(B·C) and the t-statistic in its
denominator-cleared form

    t = A · √((n−2) / (C·B − A²))

are each ONE shared float tree (floor-1e6; the doubles may round —
both engines evaluate the IDENTICAL tree, so outputs stay bit-exact),
verdict |t| > 1.96 (large-n normal approximation, declared — n ≥ 64
everywhere).

Honest (gated) reading: tokens are a modular ramp + seasonal term —
the mod-V wraps make most series trend-free sawtooths (|t| small),
but docs whose ramp step hm is small enough to avoid wrapping carry a
GENUINE linear trend the test must find: both verdicts present, with
rejections a minority.

Scale shape: ZERO exchanges — per-row folds over the token array,
nothing corpus-sized sorts or shuffles.
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

    def fold(term: str) -> str:
        if sp:
            return (
                f"aggregate(sequence(0, CAST(n AS INT) - 1),"
                f" CAST(0 AS BIGINT), (a, j) -> a + ({term}))"
            )
        return (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
            f" list_transform(range(n),"
            f" j -> CAST({term} AS BIGINT))), (a, x) -> a + x)"
        )

    y = el("j + 1")
    dv = "DIV" if sp else "//"
    return {
        "s_y": fold(y),
        "s_xy": fold(f"j * {y}"),
        "s_yy": fold(f"{y} * {y}"),
        "s_x": f"(n * (n - 1)) {dv} 2",
        "s_xx": f"(n * (n - 1) * (2 * n - 1)) {dv} 6",
    }


_ABC = {
    "a_num": "n * s_xy - s_x * s_y",
    "b_den": "n * s_xx - s_x * s_x",
    "c_num": "n * s_yy - s_y * s_y",
}

_T = (
    "CASE WHEN CAST(c_num AS DOUBLE) * CAST(b_den AS DOUBLE)"
    " - CAST(a_num AS DOUBLE) * CAST(a_num AS DOUBLE) > 0.0 THEN"
    " CAST(a_num AS DOUBLE)"
    " * sqrt((CAST(n AS DOUBLE) - 2.0)"
    " / (CAST(c_num AS DOUBLE) * CAST(b_den AS DOUBLE)"
    " - CAST(a_num AS DOUBLE) * CAST(a_num AS DOUBLE)))"
    " ELSE CAST(NULL AS DOUBLE) END"
)

_SLOPE = "(CAST(a_num AS DOUBLE) / CAST(b_den AS DOUBLE))"

_R2 = (
    "(CAST(a_num AS DOUBLE) * CAST(a_num AS DOUBLE)"
    " / (CAST(b_den AS DOUBLE) * CAST(c_num AS DOUBLE)))"
)

_REJ = (
    "CAST(CASE WHEN ({t}) IS NULL THEN NULL"
    " WHEN abs({t}) > 1.96 THEN 1 ELSE 0 END AS BIGINT)"
)


@register(
    "ols_trend_ttest",
    oracle=synth_sql(_N)
    + f"""
    , docs AS (
      SELECT doc_id, CAST(n_tok AS BIGINT) AS n,
             list_transform(tokens, x -> CAST(x AS BIGINT)) AS v
      FROM synth
    ),
    sums AS (
      SELECT doc_id, n,
             {", ".join(f"{x} AS {k}"
                        for k, x in _folds("duck").items())}
      FROM docs
    ),
    abc AS (
      SELECT doc_id, n,
             {", ".join(f"CAST({x} AS BIGINT) AS {k}"
                        for k, x in _ABC.items())}
      FROM sums
    )
    SELECT doc_id, n, a_num, b_den, c_num,
           {_F6.format(x=_SLOPE)} AS slope,
           {_F6.format(x=_R2)} AS r2,
           {_F6.format(x=_T)} AS t_stat,
           {_REJ.format(t=_T)} AS reject_no_trend
    FROM abc
    """,
)
def ols_trend_ttest(spark, sf_dir):
    """TS61: OLS trend t-test per series (module header) — cleared
    A/B/C int64 folds over the full token array, slope/r²/t one shared
    float tree each, floor-1e6, verdict |t| > 1.96."""
    docs = synth.sequences_df(spark, _N).select(
        "doc_id",
        F.expr("CAST(n_tok AS BIGINT)").alias("n"),
        F.expr("transform(tokens, x -> CAST(x AS BIGINT))").alias("v"),
    )
    sums = docs.select(
        "doc_id",
        "n",
        *[F.expr(x).alias(k) for k, x in _folds("spark").items()],
    )
    abc = sums.select(
        "doc_id",
        "n",
        *[
            F.expr(x).cast("long").alias(k)
            for k, x in _ABC.items()
        ],
    )
    return abc.select(
        "doc_id",
        "n",
        "a_num",
        "b_den",
        "c_num",
        F.expr(_F6.format(x=_SLOPE)).alias("slope"),
        F.expr(_F6.format(x=_R2)).alias("r2"),
        F.expr(_F6.format(x=_T)).alias("t_stat"),
        F.expr(_REJ.format(t=_T)).alias("reject_no_trend"),
    )
