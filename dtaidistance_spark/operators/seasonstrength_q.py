"""TS53 — trend and seasonal STRENGTH (Hyndman & Athanasopoulos,
FPP3 §4.3; Wang-Smith-Hyndman'06 feature space): the two numbers a
rollup planner reads from a decomposition —

    F_T = max(0, 1 − Var(R) / Var(T+R)),
    F_S = max(0, 1 − Var(R) / Var(S+R)),

deciding whether a series deserves trend-aware tiers or seasonal
windows at all.  Built directly on TS16's bit-exact classical
decomposition (same trend/seasonal/remainder trees, imported — not
re-derived), at the generator's planted period 64.

Exactness: all variances are computed ARRAY-SIDE over the interior
positions with order-pinned Σ / Σx² folds of the identical component
expressions both engines already share — nothing is exploded, no
float aggregate exists, and S+R = detrended/128 falls out of the
int64 d128 array exactly.  Outputs floor-1e6.  Docs need m = n − 2H ≥ 8
interior positions (declared; H = 32, the 2×64-MA half-window).

The honest corpus reading (measured, gated): the mod-50257 wraps
dominate the remainder — the 2×64 MA cannot track a discontinuity, so
removing the trend barely beats removing seasonality (F_T median
≈ 0.002) while the planted period-64 component keeps F_S positive on
EVERY series (min 0.012, median 0.063, a saturated tail to 1.0).
F_S > F_T on most rows: the measures genuinely separate the two
planted structures, in the direction the generator actually has.

Scale shape: ZERO exchanges — per-row HOFs (the TS16 plan).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql
from dtaidistance_spark.operators.tsanalytics_q import (
    _DEC_C_DUCK,
    _DEC_C_SPARK,
    _DEC_CAP,
    _DEC_D128_DUCK,
    _DEC_D128_SPARK,
    _DEC_H,
    _DEC_P,
    _DEC_SEAS_DUCK,
    _DEC_SEAS_SPARK,
    _DEC_TREND_DUCK,
    _DEC_TREND_SPARK,
)

_N = 512
_MIN_M = 8

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


class _E:
    def __init__(self, eng: str):
        self.sp = eng == "spark"

    def el(self, a: str, i) -> str:
        return f"element_at({a}, {i})" if self.sp else f"{a}[{i}]"

    def interior(self) -> str:
        if self.sp:
            return f"sequence({_DEC_H + 1}, n - {_DEC_H})"
        return f"range({_DEC_H + 1}, n - {_DEC_H - 1})"

    def ffold(self, body: str) -> str:
        """Order-pinned Σ over interior t of double ``body(t)``."""
        if self.sp:
            return (
                f"aggregate({self.interior()}, CAST(0 AS DOUBLE),"
                f" (a, t) -> a + ({body}))"
            )
        return (
            f"list_reduce(list_prepend(CAST(0 AS DOUBLE),"
            f" list_transform({self.interior()}, t -> ({body}))),"
            f" (a, x) -> a + x)"
        )

    def d128_at(self) -> str:
        if self.sp:
            return f"CAST(element_at(d128, CAST(t - {_DEC_H} AS INT)) AS DOUBLE)"
        return f"CAST(d128[t - {_DEC_H}] AS DOUBLE)"

    def seas_at(self) -> str:
        return (
            f"({self.el('seas', f'((t - 1) % {_DEC_P}) + 1')} - c)"
        )

    def x_at(self) -> str:
        if self.sp:
            return "CAST(element_at(xs, CAST(t AS INT)) AS DOUBLE)"
        return "CAST(xs[t] AS DOUBLE)"


def _var(e: _E, body: str) -> str:
    """Population variance of body(t) over the m interior positions."""
    s = e.ffold(body)
    q = e.ffold(f"({body}) * ({body})")
    m = f"CAST(n - {2 * _DEC_H} AS DOUBLE)"
    return (
        f"(({q}) / {m} - (({s}) / {m}) * (({s}) / {m}))"
    )


def _strength(num: str, den: str) -> str:
    return (
        f"CASE WHEN {den} > CAST(0 AS DOUBLE) THEN"
        f" greatest(CAST(0 AS DOUBLE),"
        f" CAST(1 AS DOUBLE) - ({num}) / ({den}))"
        f" ELSE CAST(NULL AS DOUBLE) END"
    )


def _cols(e: _E) -> dict[str, str]:
    c128 = "CAST(128 AS DOUBLE)"
    rem = f"({e.d128_at()} - {e.seas_at()}) / {c128}"
    detr = f"{e.d128_at()} / {c128}"
    deseas = f"{e.x_at()} - {e.seas_at()} / {c128}"
    v_rem = _var(e, rem)
    v_detr = _var(e, detr)
    v_deseas = _var(e, deseas)
    return {
        "m": f"CAST(n - {2 * _DEC_H} AS BIGINT)",
        "var_rem": v_rem,
        "var_detr": v_detr,
        "var_deseas": v_deseas,
        "f_seasonal": _strength("var_rem", "var_detr"),
        "f_trend": _strength("var_rem", "var_deseas"),
    }


@register(
    "seasonal_strength",
    oracle=synth_sql(_N)
    + f"""
    , dec0 AS (
      SELECT doc_id,
             tokens[1 : least(n_tok, {_DEC_CAP})] AS xs,
             least(n_tok, {_DEC_CAP}) AS n
      FROM synth WHERE n_tok >= {128 + _MIN_M}
    ),
    dec1 AS (SELECT doc_id, xs, n, {_DEC_TREND_DUCK} AS tr FROM dec0),
    dec2 AS (SELECT *, {_DEC_D128_DUCK} AS d128 FROM dec1),
    dec3 AS (SELECT *, {_DEC_SEAS_DUCK} AS seas FROM dec2),
    dec4 AS (SELECT *, {_DEC_C_DUCK} AS c FROM dec3),
    v AS (
      SELECT doc_id, n, var_rem, var_detr, var_deseas, m,
             f_seasonal, f_trend
      FROM (
        SELECT doc_id, n,
               {", ".join(f"{x} AS {k}" for k, x in list(_cols(_E('duck')).items())[:4])}
        FROM dec4
      ) base0,
      LATERAL (SELECT
        {_strength("var_rem", "var_detr")} AS f_seasonal,
        {_strength("var_rem", "var_deseas")} AS f_trend)
    )
    SELECT doc_id, m,
           {_F6.format(x="var_rem")} AS var_rem,
           {_F6.format(x="var_detr")} AS var_detr,
           {_F6.format(x="var_deseas")} AS var_deseas,
           {_F6.format(x="f_seasonal")} AS f_seasonal,
           {_F6.format(x="f_trend")} AS f_trend
    FROM v
    """,
)
def seasonal_strength(spark, sf_dir):
    """TS53: Hyndman trend/seasonal strength per series (module
    header) — TS16's component trees reused, variances as order-pinned
    array-side folds, F_T/F_S floor-1e6 with a max(0,·) clamp."""
    e = _E("spark")
    df = (
        synth.sequences_df(spark, _N)
        .where(F.col("n_tok") >= 128 + _MIN_M)
        .select(
            "doc_id",
            F.expr(
                f"slice(tokens, 1, least(n_tok, {_DEC_CAP}))"
            ).alias("xs"),
            F.expr(f"CAST(least(n_tok, {_DEC_CAP}) AS INT)").alias("n"),
        )
    )
    df = df.withColumn("tr", F.expr(_DEC_TREND_SPARK))
    df = df.withColumn("d128", F.expr(_DEC_D128_SPARK))
    df = df.withColumn("seas", F.expr(_DEC_SEAS_SPARK))
    df = df.withColumn("c", F.expr(_DEC_C_SPARK))
    cols = _cols(e)
    base = df.select(
        "doc_id",
        "n",
        *[F.expr(x).alias(k) for k, x in list(cols.items())[:4]],
    )
    v = base.select(
        "doc_id",
        "m",
        "var_rem",
        "var_detr",
        "var_deseas",
        F.expr(_strength("var_rem", "var_detr")).alias("f_seasonal"),
        F.expr(_strength("var_rem", "var_deseas")).alias("f_trend"),
    )
    return v.select(
        "doc_id",
        "m",
        F.expr(_F6.format(x="var_rem")).alias("var_rem"),
        F.expr(_F6.format(x="var_detr")).alias("var_detr"),
        F.expr(_F6.format(x="var_deseas")).alias("var_deseas"),
        F.expr(_F6.format(x="f_seasonal")).alias("f_seasonal"),
        F.expr(_F6.format(x="f_trend")).alias("f_trend"),
    )
