"""TS119 — Hoeffding's D test of bivariate independence, with
Goodman–Kruskal γ and Blomqvist β (Hoeffding AMS'48; Goodman–
Kruskal JASA'54; Blomqvist AMS'50): the SYMMETRIC nonparametric
independence dial completing the dependence-coefficient matrix —
Pearson needs moments, Spearman/Kendall/γ need monotonicity,
TS108's ξ is asymmetric by design; Hoeffding's D estimates
∫(F_xy − F_x·F_y)² dF, ZERO iff independent (continuous case),
positive under ANY dependence shape, monotone or not, in either
direction.

Exact integer core (quadrupled to clear tie-halves): with
φ = 2·[x_j < x_i] + [x_j = x_i] (j ≠ i),

    P_i = Σφ_x = 2(R_i−1),  T_i = Σφ_y = 2(S_i−1),
    Q_i = Σ φ_x·φ_y = 4c_i                        (all INT64)
    A = ΣQ(Q−4), B = ΣP(P−2)T(T−2), C = Σ(P−2)(T−2)Q
    D = 30·[(n−2)(n−3)A + B − 2(n−2)C]
        / (16·n(n−1)(n−2)(n−3)(n−4))

γ = (con − dis)/(con + dis) reuses the TS58 concordance counts;
β counts quadrants against the DOUBLED sample medians
(x_(m)+x_(m+1), ties at the median dropped).  One float division
per coefficient, floor-1e6.  O(n²) HOFs bounded by the 128-value
cap — the TS58 verification-tier posture (scale path: Hoeffding's
D decomposes over the TS15 window-rank machinery; the cap tier is
the declared registry form).

Two views, one machinery:
  ``hoeffding_cross_pairs`` — consecutive-doc aligned positions
  (genuinely independent streams: the calibration view), and
  ``hoeffding_lag_pairs`` — (tok_j, tok_{j+1}) within each doc
  (the rotation structure TS108's ξ read at 0.98: the power view).

The emitted value is the 30-SCALED statistic (the R ``hoeffd``
convention): 30·D ∈ [−0.5, 1], 1 at strict monotone dependence.

Honest (gated) reading — measured, and BOTH views taught something
the draft missed.  Lag pairs: 30D median 0.216, positive on
128/128 docs, min 0.056 — Hoeffding sees the ring rotation
unconditionally — while γ follows the KENDALL-family rotation
curve 1 − 4f(1−f) (minimum 0 at f = ½, always ≥ 0 — measured
γ ∈ [−0.01, 1.00] — a genuinely DIFFERENT curve from Spearman's
1 − 6f(1−f) with its −0.5 dip, though the two correlate 0.9986
through their shared f(1−f) core), and β tracks the quadrant
version (corr 0.967).  The sensitivity ladder for the same
dependence: ξ = 0.98 ≫ 30D = 0.22 ≫ γ's f-dependent sweep.
Cross pairs: the MEDIAN is null (−0.004) but the draft's
"genuinely independent streams" was wrong in the tail — |30D|
reaches 0.908 with γ to 0.967 on pairs of small-increment docs
sharing the period-64 positional sinusoid: consecutive docs ARE
coupled through the generator's shared seasonal grid, the same
structure TS94's DCCA removed by detrending, here re-detected by
a pure independence test on aligned positions — two operator
families converging on one mechanism.  Gates: 30D = 1 exactly on
strictly monotone continuous samples (both directions);
independence null band over LCG pairs; the parabola (30D large
where Spearman ≈ 0); numpy recompute per pair for both views;
the lag-positive + γ-curve + cross median-null-with-coupled-tail
corpus pins.

Scale shape: ZERO exchanges beyond the broadcast consecutive-doc
zip join; all HOFs capped.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_ND = 128
_CAP = 128

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_D = lambda x: f"CAST({x} AS DOUBLE)"  # noqa: E731


class _E:
    def __init__(self, eng: str):
        self.sp = eng == "spark"

    def el(self, a: str, i: str) -> str:
        return (
            f"element_at({a}, {i})" if self.sp else f"{a}[{i}]"
        )

    def sum_j(self, term: str, n: str = "n") -> str:
        """Σ over j = 1..n, j ≠ i, of term(i, j)."""
        guarded = f"CASE WHEN j = i THEN 0 ELSE ({term}) END"
        if self.sp:
            return (
                f"aggregate(sequence(1, CAST({n} AS INT)),"
                f" CAST(0 AS BIGINT), (a, j) -> a + ({guarded}))"
            )
        return (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
            f" list_transform(range(1, CAST({n} AS INT) + 1),"
            f" j -> CAST(({guarded}) AS BIGINT))), (a, q) -> a + q)"
        )

    def sum_i(self, term: str, n: str = "n") -> str:
        if self.sp:
            return (
                f"aggregate(sequence(1, CAST({n} AS INT)),"
                f" CAST(0 AS BIGINT), (a, i) -> a + ({term}))"
            )
        return (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
            f" list_transform(range(1, CAST({n} AS INT) + 1),"
            f" i -> CAST(({term}) AS BIGINT))), (a, q) -> a + q)"
        )


def _abc(e: _E) -> dict[str, str]:
    xi, xj = e.el("xa", "i"), e.el("xa", "j")
    yi, yj = e.el("xb", "i"), e.el("xb", "j")
    phx = f"(2 * CASE WHEN {xj} < {xi} THEN 1 ELSE 0 END + CASE WHEN {xj} = {xi} THEN 1 ELSE 0 END)"
    phy = f"(2 * CASE WHEN {yj} < {yi} THEN 1 ELSE 0 END + CASE WHEN {yj} = {yi} THEN 1 ELSE 0 END)"
    p = e.sum_j(phx)
    t = e.sum_j(phy)
    q = e.sum_j(f"{phx} * {phy}")
    # concordance counts for γ (pairs i < j)
    dx = f"({xi} - {xj})"
    dy = f"({yi} - {yj})"
    con_term = f"CASE WHEN j > i AND {dx} * {dy} > 0 THEN 1 ELSE 0 END"
    dis_term = f"CASE WHEN j > i AND {dx} * {dy} < 0 THEN 1 ELSE 0 END"
    return {
        "ha": e.sum_i(f"(({q}) * (({q}) - 4))"),
        "hb": e.sum_i(f"(({p}) * (({p}) - 2) * ({t}) * (({t}) - 2))"),
        "hc": e.sum_i(f"((({p}) - 2) * (({t}) - 2) * ({q}))"),
        "con": e.sum_i(e.sum_j(con_term)),
        "dis": e.sum_i(e.sum_j(dis_term)),
        # quadrant counts vs doubled medians (ties at median dropped)
        "q_pp": e.sum_i(
            f"CASE WHEN 2 * {e.el('xa', 'i')} > mx2 AND"
            f" 2 * {e.el('xb', 'i')} > my2 THEN 1 ELSE 0 END"
        ),
        "q_mm": e.sum_i(
            f"CASE WHEN 2 * {e.el('xa', 'i')} < mx2 AND"
            f" 2 * {e.el('xb', 'i')} < my2 THEN 1 ELSE 0 END"
        ),
        "q_pm": e.sum_i(
            f"CASE WHEN 2 * {e.el('xa', 'i')} > mx2 AND"
            f" 2 * {e.el('xb', 'i')} < my2 THEN 1 ELSE 0 END"
        ),
        "q_mp": e.sum_i(
            f"CASE WHEN 2 * {e.el('xa', 'i')} < mx2 AND"
            f" 2 * {e.el('xb', 'i')} > my2 THEN 1 ELSE 0 END"
        ),
    }


_HD = (
    "(30.0 * (("
    + _D("(n - 2) * (n - 3)")
    + " * "
    + _D("ha")
    + ") + "
    + _D("hb")
    + " - 2.0 * "
    + _D("(n - 2)")
    + " * "
    + _D("hc")
    + ") / (16.0 * "
    + _D("n")
    + " * "
    + _D("(n - 1)")
    + " * "
    + _D("(n - 2)")
    + " * "
    + _D("(n - 3)")
    + " * "
    + _D("(n - 4)")
    + "))"
)

_GAMMA = (
    "CASE WHEN con + dis > 0 THEN "
    + _F6.format(x=f"({_D('con - dis')} / {_D('con + dis')})")
    + " ELSE CAST(NULL AS DOUBLE) END"
)

_BETA = (
    "CASE WHEN q_pp + q_mm + q_pm + q_mp > 0 THEN "
    + _F6.format(
        x=(
            f"({_D('q_pp + q_mm - q_pm - q_mp')}"
            f" / {_D('q_pp + q_mm + q_pm + q_mp')})"
        )
    )
    + " ELSE CAST(NULL AS DOUBLE) END"
)

_G = "n > 5"


def _out() -> list[str]:
    return [
        "CAST(n AS BIGINT) AS n_used",
        f"CASE WHEN {_G} THEN {_F6.format(x=_HD)}"
        " ELSE CAST(NULL AS DOUBLE) END AS hoeffding_d",
        f"{_GAMMA} AS gk_gamma",
        f"{_BETA} AS blomqvist_beta",
    ]


def _pair_cte(lag: bool) -> str:
    """DuckDB CTE producing (key, n, xa, xb [, hm])."""
    if not lag:
        return f"""
    , docs AS (
      SELECT CAST(substr(doc_id, 4, 12) AS BIGINT) AS i, doc_id,
             list_transform(list_slice(tokens, 1, {_CAP}),
               x -> CAST(x AS BIGINT)) AS v
      FROM synth
    ),
    prs AS (
      SELECT a.doc_id AS key_id,
             CAST(least(len(a.v), len(b.v)) AS BIGINT) AS n,
             list_slice(a.v, 1, least(len(a.v), len(b.v))) AS xa,
             list_slice(b.v, 1, least(len(a.v), len(b.v))) AS xb
      FROM docs a JOIN docs b ON b.i = a.i + 1 AND a.i % 2 = 0
    )"""
    return f"""
    , docs AS (
      SELECT doc_id AS key_id,
             list_transform(list_slice(tokens, 1, {_CAP + 1}),
               x -> CAST(x AS BIGINT)) AS v
      FROM synth
    ),
    prs AS (
      SELECT key_id,
             CAST(len(v) - 1 AS BIGINT) AS n,
             list_slice(v, 1, len(v) - 1) AS xa,
             list_slice(v, 2, len(v)) AS xb
      FROM docs
    )"""


def _oracle(lag: bool) -> str:
    e = _E("duck")
    meds = f"""
    , meds AS (
      SELECT prs.*,
             list_sort(xa) AS sx, list_sort(xb) AS sy
      FROM prs
    ),
    meds2 AS (
      SELECT key_id, n, xa, xb,
             sx[CAST(floor((n + 1) / 2.0) AS INT)]
               + sx[CAST(floor((n + 2) / 2.0) AS INT)] AS mx2,
             sy[CAST(floor((n + 1) / 2.0) AS INT)]
               + sy[CAST(floor((n + 2) / 2.0) AS INT)] AS my2
      FROM meds
    ),
    cc AS (
      SELECT key_id, n,
             {", ".join(f"{x} AS {k}" for k, x in _abc(e).items())}
      FROM meds2
    )
    SELECT key_id, {", ".join(_out())}
    FROM cc
    """
    return synth_sql(_ND) + _pair_cte(lag) + meds


def _spark_impl(spark, lag: bool):
    e = _E("spark")
    if not lag:
        docs = synth.sequences_df(spark, _ND).select(
            F.expr("CAST(substr(doc_id, 4, 12) AS BIGINT)").alias("i"),
            "doc_id",
            F.expr(
                f"transform(slice(tokens, 1, {_CAP}),"
                f" x -> CAST(x AS BIGINT))"
            ).alias("v"),
        )
        a = docs.where(F.col("i") % 2 == 0).select(
            "i",
            F.col("doc_id").alias("key_id"),
            F.col("v").alias("va"),
        )
        b = docs.select(
            (F.col("i") - 1).alias("i"), F.col("v").alias("vb")
        )
        prs = a.join(F.broadcast(b), "i").selectExpr(
            "key_id",
            "CAST(least(size(va), size(vb)) AS BIGINT) AS n",
            "slice(va, 1, least(size(va), size(vb))) AS xa",
            "slice(vb, 1, least(size(va), size(vb))) AS xb",
        )
    else:
        prs = synth.sequences_df(spark, _ND).selectExpr(
            "doc_id AS key_id",
            f"transform(slice(tokens, 1, {_CAP + 1}),"
            f" x -> CAST(x AS BIGINT)) AS v",
        ).selectExpr(
            "key_id",
            "CAST(size(v) - 1 AS BIGINT) AS n",
            "slice(v, 1, size(v) - 1) AS xa",
            "slice(v, 2, size(v) - 1) AS xb",
        )
    meds2 = prs.selectExpr(
        "key_id",
        "n",
        "xa",
        "xb",
        "element_at(array_sort(xa), CAST(floor((n + 1) / 2.0) AS INT))"
        " + element_at(array_sort(xa), CAST(floor((n + 2) / 2.0) AS INT)) AS mx2",
        "element_at(array_sort(xb), CAST(floor((n + 1) / 2.0) AS INT))"
        " + element_at(array_sort(xb), CAST(floor((n + 2) / 2.0) AS INT)) AS my2",
    )
    cc = meds2.select(
        "key_id",
        "n",
        *[F.expr(x).alias(k) for k, x in _abc(e).items()],
    )
    return cc.selectExpr("key_id", *_out())


@register("hoeffding_cross_pairs", oracle=_oracle(lag=False))
def hoeffding_cross_pairs(spark, sf_dir):
    """TS119 calibration view: Hoeffding D + γ + β over 64
    consecutive-doc aligned-position pairs (module header)."""
    return _spark_impl(spark, lag=False)


@register("hoeffding_lag_pairs", oracle=_oracle(lag=True))
def hoeffding_lag_pairs(spark, sf_dir):
    """TS119 power view: Hoeffding D + γ + β over (tok_j, tok_{j+1})
    within each doc (module header)."""
    return _spark_impl(spark, lag=True)
