"""Semantic gates for welch_q (T74): numpy recompute of t/df/d for
all three pairs, the Fisher-expansion critical value validated
against a numerically-integrated exact t CDF, and the pairwise null
honest reading."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.welch_q import _N, welch_ttest_sources

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _t_quantile_975(df):
    """Exact t 97.5% quantile by numeric integration of the density
    (no scipy in the container) — bisection on the integrated CDF."""

    def cdf(x):
        # integrate pdf from 0 to x on a fine grid + 0.5
        g = np.linspace(0.0, x, 20001)
        c = math.exp(
            math.lgamma((df + 1) / 2.0)
            - math.lgamma(df / 2.0)
            - 0.5 * math.log(df * math.pi)
        )
        pdf = c * (1.0 + g * g / df) ** (-(df + 1) / 2.0)
        return 0.5 + np.trapz(pdf, g)

    lo, hi = 1.5, 3.0
    for _ in range(60):
        mid = (lo + hi) / 2.0
        if cdf(mid) < 0.975:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2.0


def test_matches_numpy(spark, sf_dir):
    out = welch_ttest_sources(spark, sf_dir).toPandas()
    assert len(out) == 3
    loc = synth.sequences_local(_N)
    gs = {
        g: loc.loc[loc.source == g, "n_tok"].to_numpy(dtype=np.float64)
        for g in ("web", "code", "books")
    }
    for row in out.itertuples():
        xa, xb = gs[row.src_a], gs[row.src_b]
        na, nb = len(xa), len(xb)
        assert (row.na, row.nb) == (na, nb)
        va, vb = xa.var(ddof=1), xb.var(ddof=1)
        se2 = va / na + vb / nb
        t = (xa.mean() - xb.mean()) / math.sqrt(se2)
        df = se2 * se2 / (
            (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
        )
        crit = 1.96 * (1.0 + (1.96**2 + 1.0) / (4.0 * df))
        d = (xa.mean() - xb.mean()) / math.sqrt(
            ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
        )
        assert abs(row.t_stat - f6(t)) < 1e-5
        assert abs(row.df_welch - f6(df)) < 1e-3 * df
        assert abs(row.crit_05 - f6(crit)) < 1e-6
        assert abs(row.cohens_d - f6(d)) < 1e-6
        # the expansion matches the exact t quantile to < 5e-3 at
        # these dfs — the declared accuracy bound (df ≥ 25 here)
        exact = _t_quantile_975(df)
        assert df > 25
        assert abs(crit - exact) < 5e-3
        assert row.reject_same_mean == (1 if abs(t) > crit else 0)
    # honest reading (the robustness lesson): only pairs involving the
    # tiny heavy-tailed books cell may reject; the big-cell pair never
    # does — mean-based t is fragile exactly where rank-based MWU
    # (TS59) stays correctly null
    for row in out.itertuples():
        if row.reject_same_mean == 1:
            assert "books" in (row.src_a, row.src_b)
        if {row.src_a, row.src_b} == {"web", "code"}:
            assert row.reject_same_mean == 0
            assert abs(row.cohens_d) < 0.25


def test_expansion_accuracy_band():
    # Fisher's t_(0.975) ≈ 1.96(1 + (1.96²+1)/(4d)): sub-5e-3 from
    # df = 25 up, tightening as O(d⁻²)
    for df, bound in ((25, 5e-3), (40, 2e-3), (120, 5e-4), (400, 2e-4)):
        approx = 1.96 * (1.0 + (1.96**2 + 1.0) / (4.0 * df))
        assert abs(approx - _t_quantile_975(df)) < bound
