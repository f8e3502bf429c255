"""TS45/TS46 — whiteness + spectral-flatness diagnostics per series:
the Ljung-Box portmanteau test (Ljung & Box Biometrika'78 — THE
residual-whiteness gate of classical forecasting) and spectral entropy
over the Goertzel bins (the tsfresh/antropy "spectral flatness" score).

TS45 ``ljung_box``: r_k at lags 1..8 over the first 256 tokens with
the GLOBAL-mean normalization the test specifies, every numerator and
the shared denominator INT64-EXACT by n²-scaling:

    num_k = n²·Σ x_t x_{t+k} − n·S·(Sh_k + St_k) + (n−k)·S²
    den   = n·(n·Q − S²)            (identical scaling, so r_k = num/den)

(bounds at n = 256, x < 50257: n²Σxy ≤ 4.3e16, n·S·Sh ≤ 4.3e16 — all
inside int64; this is why the slice is 256, not 8192).  Q_LB =
n(n+2)·Σ r_k²/(n−k) is one 8-term verbatim tree over the RAW ratios,
and the verdict compares against the χ²₀.₉₅(8) = 15.507 literal.  The
strongly autocorrelated ramps must all reject whiteness — gated.

TS46 ``spectral_entropy``: the four Goertzel powers (TS13's bit-exact
fold, reused verbatim) normalized to shares; H = −Σ p ln p / ln 4 —
flat spectrum → 1, single line → 0.  Entropy tree shared verbatim,
floor-1e6.

Plan: both ZERO exchanges — per-row folds/HOFs in the scan projection.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql
from dtaidistance_spark.operators.tsanalytics_q import _goertzel_exprs

_N = 512
_LBN = 256  # slice length for Ljung-Box
_LAGS = tuple(range(1, 9))
_CHI2_95_8 = "15.507313055865453"  # chi2.ppf(0.95, 8), shortest round-trip

_FLOOR6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


class _E:
    def __init__(self, eng: str):
        self.sp = eng == "spark"

    def el(self, a: str, i) -> str:
        return f"element_at({a}, {i})" if self.sp else f"{a}[{i}]"

    def isum(self, lo: int, hi_expr: str, body: str) -> str:
        """Σ over u in lo..hi of int64 body(u) (0-based u)."""
        if self.sp:
            return (
                f"aggregate(sequence({lo}, {hi_expr}), CAST(0 AS BIGINT),"
                f" (a, u) -> a + ({body}))"
            )
        return (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
            f" list_transform(range({lo}, {hi_expr} + 1),"
            f" u -> ({body}))), (a, x) -> a + x)"
        )

    def v(self, i) -> str:
        return f"CAST({self.el('v', i)} AS BIGINT)"


def _lb_stage1(e: _E) -> dict[str, str]:
    # nn = least(n_tok, 256) is a per-row column (many series are
    # shorter than the slice cap)
    cols = {
        "s": e.isum(0, "nn - 1", e.v("u + 1")),
        "q": e.isum(0, "nn - 1", f"{e.v('u + 1')} * {e.v('u + 1')}"),
    }
    for k in _LAGS:
        cols[f"sxy_{k}"] = e.isum(
            0, f"nn - 1 - {k}", f"{e.v('u + 1')} * {e.v(f'u + {k} + 1')}"
        )
        cols[f"sh_{k}"] = e.isum(0, f"nn - 1 - {k}", e.v("u + 1"))
        cols[f"st_{k}"] = e.isum(0, f"nn - 1 - {k}", e.v(f"u + {k} + 1"))
    return cols


def _lb_stage2() -> dict[str, str]:
    nb = "CAST(nn AS BIGINT)"
    cols = {"den": f"{nb} * ({nb} * q - s * s)"}
    for k in _LAGS:
        cols[f"num_{k}"] = (
            f"{nb} * {nb} * sxy_{k}"
            f" - {nb} * s * (sh_{k} + st_{k})"
            f" + ({nb} - {k}) * s * s"
        )
    return cols


def _r_raw(k: int) -> str:
    return f"(CAST(num_{k} AS DOUBLE) / CAST(den AS DOUBLE))"


def _qlb_tree() -> str:
    nd = "CAST(nn AS DOUBLE)"
    terms = " + ".join(
        f"({_r_raw(k)} * {_r_raw(k)} / ({nd} - CAST({k} AS DOUBLE)))"
        for k in _LAGS
    )
    return f"({nd} * ({nd} + CAST(2 AS DOUBLE)) * ({terms}))"


@register(
    "ljung_box",
    oracle=synth_sql(_N)
    + f"""
    , s0 AS (
      SELECT doc_id, least(n_tok, {_LBN}) AS nn,
             list_transform(list_slice(tokens, 1, {_LBN}),
               x -> CAST(x AS BIGINT)) AS v
      FROM synth
    ),
    s1 AS (
      SELECT doc_id, nn,
             {", ".join(f"{x} AS {c}" for c, x in _lb_stage1(_E('duck')).items())}
      FROM s0
    ),
    s2 AS (
      SELECT doc_id, nn,
             {", ".join(f"{x} AS {c}" for c, x in _lb_stage2().items())}
      FROM s1
    )
    SELECT doc_id, nn, den,
           {", ".join(_FLOOR6.format(x=_r_raw(k)) + f" AS r_{k}" for k in _LAGS)},
           {_FLOOR6.format(x=_qlb_tree())} AS q_lb,
           CAST(CASE WHEN {_qlb_tree()}
                > CAST('{_CHI2_95_8}' AS DOUBLE)
                THEN 1 ELSE 0 END AS BIGINT) AS reject_white
    FROM s2
    """,
)
def ljung_box(spark, sf_dir):
    """TS45: Ljung-Box Q at lags 1..8 over the first 256 tokens
    (module header) — global-mean ACF with n²-scaled INT64 numerators
    and denominator, Q_LB as one verbatim 8-term tree over the raw
    ratios, verdict vs the χ²₀.₉₅(8) literal.  Plan: ZERO exchanges."""
    e = _E("spark")
    docs = synth.sequences_df(spark, _N).select(
        "doc_id", "n_tok", "tokens"
    )
    s0 = docs.select(
        "doc_id",
        F.expr(f"least(n_tok, {_LBN})").alias("nn"),
        F.expr(
            f"transform(slice(tokens, 1, {_LBN}),"
            f" x -> CAST(x AS BIGINT))"
        ).alias("v"),
    )
    s1 = s0.select(
        "doc_id",
        "nn",
        *[F.expr(x).alias(c) for c, x in _lb_stage1(e).items()],
    )
    s2 = s1.select(
        "doc_id",
        "nn",
        *[F.expr(x).alias(c) for c, x in _lb_stage2().items()],
    )
    return s2.select(
        "doc_id",
        "nn",
        "den",
        *[
            F.expr(_FLOOR6.format(x=_r_raw(k))).alias(f"r_{k}")
            for k in _LAGS
        ],
        F.expr(_FLOOR6.format(x=_qlb_tree())).alias("q_lb"),
        F.expr(
            f"CAST(CASE WHEN {_qlb_tree()}"
            f" > CAST('{_CHI2_95_8}' AS DOUBLE)"
            f" THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("reject_white"),
    )


# ---------------------------------------------------------------------------
# TS46 — spectral entropy over the Goertzel bins
# ---------------------------------------------------------------------------

_PERIODS = tuple(p for p, *_ in _goertzel_exprs())


def _se_tree() -> str:
    tot = " + ".join(f"pw_{p}" for p in _PERIODS)
    term = (
        "CASE WHEN pw_{p} > CAST(0 AS DOUBLE) THEN"
        " (pw_{p} / ({tot})) * ln(pw_{p} / ({tot}))"
        " ELSE CAST(0 AS DOUBLE) END"
    )
    s = " + ".join(term.format(p=p, tot=tot) for p in _PERIODS)
    return f"(-({s}) / ln(CAST({len(_PERIODS)} AS DOUBLE)))"


@register(
    "spectral_entropy",
    oracle=synth_sql(_N)
    + f"""
    , gx AS (
      SELECT doc_id, n_tok - n_tok % 64 AS nc,
        list_transform(tokens[1 : n_tok - n_tok % 64],
                       t -> CAST(t AS DOUBLE)) AS xs
      FROM synth
    ),
    st AS (
      SELECT doc_id,
             {", ".join(f"{duck} AS st_{p}" for p, _s, duck, _pw, _pd in _goertzel_exprs())}
      FROM gx
    ),
    pw AS (
      SELECT doc_id,
             {", ".join(
                 pd.replace("st[", f"st_{p}[") + f" AS pw_{p}"
                 for p, _s, _d, _pw, pd in _goertzel_exprs())}
      FROM st
    )
    SELECT doc_id,
           {", ".join(f"pw_{p}" for p in _PERIODS)},
           {_FLOOR6.format(x=_se_tree())} AS spec_entropy
    FROM pw
    """,
)
def spectral_entropy(spark, sf_dir):
    """TS46: normalized spectral entropy over the four Goertzel bins
    (module header) — the TS13 bit-exact folds reused verbatim, powers
    normalized to shares, H = −Σ p ln p / ln 4 as one shared tree
    (floor-1e6; raw powers also emitted floored).  Plan: ZERO
    exchanges."""
    docs = synth.sequences_df(spark, _N).select(
        "doc_id",
        F.expr("n_tok - n_tok % 64").alias("nc"),
        F.expr(
            "transform(slice(tokens, 1, n_tok - n_tok % 64),"
            " t -> CAST(t AS DOUBLE))"
        ).alias("xs"),
    )
    st = docs.select(
        "doc_id",
        *[
            F.expr(spark_fold).alias(f"st_{p}")
            for p, spark_fold, _d, _pw, _pd in _goertzel_exprs()
        ],
    )
    pw = st.select(
        "doc_id",
        *[
            F.expr(
                pw_s.replace("element_at(st,", f"element_at(st_{p},")
            ).alias(f"pw_{p}")
            for p, _s, _d, pw_s, _pd in _goertzel_exprs()
        ],
    )
    # raw powers (the TS13 precedent: they hash-match with no
    # tolerance; ×1e6 would overflow Spark's BIGINT floor)
    return pw.select(
        "doc_id",
        *[f"pw_{p}" for p in _PERIODS],
        F.expr(_FLOOR6.format(x=_se_tree())).alias("spec_entropy"),
    )
