"""Semantic gates for garch_q (TS121): numpy fold-order recompute,
planted GARCH recovery, constant-variance null, ω-targeting
identity, and the 126/128-null + two-winner corpus reading."""

import math

import numpy as np

from dtaidistance_spark.operators.garch_q import (
    _GRID,
    garch_grid_fit,
    garch_inputs_check,
)
from dtaidistance_spark.synth import gen_row

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _ll(e, s2, al, be):
    """Gaussian QML mirroring the engine fold order exactly."""
    om = s2 * (1.0 - al - be)
    h = s2
    ll = 0.0
    for t in range(1, len(e)):
        h = om + al * e[t - 1] * e[t - 1] + be * h
        ll -= 0.5 * (math.log(h) + e[t] * e[t] / h)
    return ll


def _fit(y):
    y = np.asarray(y, dtype=np.float64)
    d = np.diff(y)
    m = len(d)
    mu = d.sum() / m
    e = d - mu
    s2 = (e @ e) / m
    best = None
    for al, be in _GRID:
        ll = _ll(e, s2, al, be)
        if best is None or ll > best[2]:
            best = (al, be, ll)
    ll0 = _ll(e, s2, 0.0, 0.0)
    return s2, best, ll0


def test_matches_numpy(spark, sf_dir):
    out = (
        garch_grid_fit(spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    for i in (0, 31, 116, 120):
        doc_id, tokens, n, _, _ = gen_row(i)
        s2, (al, be, ll), ll0 = _fit(tokens)
        row = out.loc[doc_id]
        assert abs(row.sigma2 - f6(s2)) < 1e-3
        assert row.alpha_hat == al
        assert row.beta_hat == be
        assert abs(row.ll_best - f6(ll)) < 1e-2
        assert abs(row.llr - f6(ll - ll0)) < 1e-2


def test_inputs_twin(spark, sf_dir):
    out = (
        garch_inputs_check(spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    for i in (0, 63):
        doc_id, tokens, n, _, _ = gen_row(i)
        d = np.diff(tokens.astype(np.int64))
        row = out.loc[doc_id]
        assert row.sum_d == d.sum()
        assert row.sum_d2 == (d * d).sum()


def _lcg_normal(seed, n):
    s = seed
    out = np.empty(n)
    for i in range(n):
        acc = 0.0
        for _ in range(12):
            s = (1103515245 * s + 12345) % (1 << 31)
            acc += s / (1 << 31)
        out[i] = acc - 6.0
    return out


def test_planted_garch_recovery():
    # (the first grid draft OMITTED β = 0.8 entirely, so this very
    # gate recovered the neighboring cell (0.15, 0.7) and exposed
    # the hole — the grid now contains the classic cell)
    n = 12000
    z = _lcg_normal(3, n)
    e = np.zeros(n)
    h = 1.0
    for t in range(1, n):
        h = 0.1 + 0.1 * e[t - 1] ** 2 + 0.8 * h
        e[t] = math.sqrt(h) * z[t]
    y = np.cumsum(e * 1000 + 500)
    _, (al, be, _), ll0 = _fit(np.floor(y))
    assert (al, be) == (0.10, 0.80)  # its own grid cell wins


def test_planted_constant_null():
    y = np.cumsum(_lcg_normal(9, 3000) * 500 + 100)
    _, (al, be, ll), ll0 = _fit(np.floor(y))
    assert (al, be) == (0.0, 0.0)
    assert abs(ll - ll0) < 1e-9


def test_omega_targeting_identity():
    # unconditional variance preserved: ω/(1−α−β) = σ̂² by design
    for al, be in _GRID[1:]:
        s2 = 7.3
        om = s2 * (1 - al - be)
        assert abs(om / (1 - al - be) - s2) < 1e-12


def test_honest_null_bulk_and_winners(spark):
    out = garch_grid_fit(
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    # 126/128 choose constant variance despite ARCH-LM's 86%
    assert int(((out.alpha_hat == 0) & (out.beta_hat == 0)).sum()) == 126
    win = out[out.llr > 1.92].sort_values("llr", ascending=False)
    assert len(win) == 2
    assert win.iloc[0].doc_id == "doc000000000116"  # TS120's top doc
    assert win.iloc[0].llr > 700
    assert (win.iloc[0].alpha_hat, win.iloc[0].beta_hat) == (0.05, 0.90)
    assert win.iloc[1].doc_id == "doc000000000120"
    assert (win.iloc[1].alpha_hat, win.iloc[1].beta_hat) == (0.30, 0.50)
