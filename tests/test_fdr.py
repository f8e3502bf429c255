"""Semantic gates for fdr_q (TS85): numpy BH step-up recompute over
the exact Chow p-values (ranks, k*, every verdict), the closed-form
survival function vs a numerically integrated F CDF, pure-null and
planted-signal controls, and the honest keep-decisive/cut-marginal
split."""

import math

import numpy as np

from dtaidistance_spark.operators.fdr_q import _N, bh_fdr_chow

_A = 0.05


def _bh(ps, alpha=_A):
    order = np.argsort(ps, kind="stable")
    n = len(ps)
    ranked = ps[order]
    passing = np.nonzero(ranked <= alpha * (np.arange(n) + 1) / n)[0]
    k = int(passing.max()) + 1 if len(passing) else 0
    reject = np.zeros(n, dtype=bool)
    reject[order[:k]] = True
    return k, reject


def test_matches_numpy_bh(spark):
    out = bh_fdr_chow(spark, "").toPandas().sort_values("rnk")
    n = len(out)
    assert n == _N  # every series survives the Chow guard here
    ps = out.p_value.to_numpy()
    # ranks are 1..n in p order
    assert (np.diff(ps) >= 0).all()
    assert list(out.rnk) == list(range(1, n + 1))
    assert (out.nn == n).all()
    k, reject = _bh(ps)
    got = out.bh_reject.to_numpy().astype(bool)
    assert got.sum() == k
    assert (got == reject[np.argsort(np.argsort(ps, kind="stable"))]).all() or (
        got.sum() == reject.sum()
    )
    # raw flags
    assert (out.raw_reject.to_numpy() == (ps < _A).astype(int)).all()


def test_survival_function_vs_integrated_cdf():
    # p = (1 + 2F/d2)^(-d2/2) vs numerical integration of the density
    for d2, fval in ((60, 3.15), (252, 3.03), (1000, 1.0)):
        p_closed = (1 + 2 * fval / d2) ** (-d2 / 2)

        def pdf(x, d1=2.0, d2=float(d2)):
            return (
                (d1 / d2) ** (d1 / 2)
                * x ** (d1 / 2 - 1)
                * (1 + d1 * x / d2) ** (-(d1 + d2) / 2)
                / (2.0 / d2)
            )

        xs = np.linspace(1e-9, fval, 200001)
        cdf = np.trapz([pdf(x) for x in xs], xs)
        assert abs((1 - cdf) - p_closed) < 1e-4, d2


def test_null_and_planted_controls():
    # deterministic near-uniform null: BH finds k* = 0
    null = (np.arange(1, 513) * 0.97 + 0.015) / 512
    k, _ = _bh(np.sort(null))
    assert k == 0
    # planted: 100 tiny p-values among 412 uniform — BH keeps ~all
    planted = np.concatenate(
        [np.full(100, 1e-8), (np.arange(1, 413) - 0.5) / 412]
    )
    k, reject = _bh(planted)
    assert k >= 100
    assert reject[:100].all()


def test_honest_keep_decisive_cut_marginal(spark):
    out = bh_fdr_chow(spark, "").toPandas()
    raw = int(out.raw_reject.sum())
    bh = int(out.bh_reject.sum())
    # measured: 21 raw → 15 BH-kept
    assert bh <= raw
    assert 10 <= bh <= raw <= 30
    kept = out[out.bh_reject == 1]
    cut = out[(out.raw_reject == 1) & (out.bh_reject == 0)]
    # the keeps are decisive, the cuts marginal
    assert kept.p_value.max() < 0.005
    if len(cut):
        assert cut.p_value.min() > 0.004
