"""Semantic gates for hoeffding_q (TS119): numpy recompute of the
quadrupled-integer 30D/γ/β chain for both views, monotone maximum,
independence null, the parabola power case, and the corpus
ladder + coupled-tail pins."""

import math

import numpy as np

from dtaidistance_spark.operators.hoeffding_q import (
    _CAP,
    hoeffding_cross_pairs,
    hoeffding_lag_pairs,
)
from dtaidistance_spark.synth import gen_row

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _ref(x, y):
    """(30D, γ, β) with the quadrupled-integer definitions."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    n = len(x)
    P = np.zeros(n, dtype=np.int64)
    T = np.zeros(n, dtype=np.int64)
    Q = np.zeros(n, dtype=np.int64)
    for i in range(n):
        phx = 2 * (x < x[i]) + (x == x[i])
        phy = 2 * (y < y[i]) + (y == y[i])
        phx[i] = 0
        phy[i] = 0
        P[i] = phx.sum()
        T[i] = phy.sum()
        Q[i] = (phx * phy).sum()
    A = (Q * (Q - 4)).sum()
    B = (P * (P - 2) * T * (T - 2)).sum()
    C = ((P - 2) * (T - 2) * Q).sum()
    d30 = (
        30.0
        * ((n - 2) * (n - 3) * A + B - 2 * (n - 2) * C)
        / (16.0 * n * (n - 1) * (n - 2) * (n - 3) * (n - 4))
    )
    dx = x[:, None] - x[None, :]
    dy = y[:, None] - y[None, :]
    iu = np.triu_indices(n, 1)
    prod = dx[iu] * dy[iu]
    con, dis = (prod > 0).sum(), (prod < 0).sum()
    gamma = (con - dis) / (con + dis) if con + dis else None
    sx, sy = np.sort(x), np.sort(y)
    mx2 = sx[(n - 1) // 2] + sx[n // 2]
    my2 = sy[(n - 1) // 2] + sy[n // 2]
    qpp = ((2 * x > mx2) & (2 * y > my2)).sum()
    qmm = ((2 * x < mx2) & (2 * y < my2)).sum()
    qpm = ((2 * x > mx2) & (2 * y < my2)).sum()
    qmp = ((2 * x < mx2) & (2 * y > my2)).sum()
    tot = qpp + qmm + qpm + qmp
    beta = (qpp + qmm - qpm - qmp) / tot if tot else None
    return d30, gamma, beta


def test_matches_numpy_lag(spark, sf_dir):
    out = (
        hoeffding_lag_pairs(spark, sf_dir)
        .toPandas()
        .set_index("key_id")
        .sort_index()
    )
    for i in range(0, 128, 31):
        doc_id, tokens, n, _, _ = gen_row(i)
        v = tokens[: _CAP + 1].astype(np.int64)
        d30, gamma, beta = _ref(v[:-1], v[1:])
        row = out.loc[doc_id]
        assert row.n_used == len(v) - 1
        assert abs(row.hoeffding_d - f6(d30)) < 1e-6
        assert abs(row.gk_gamma - f6(gamma)) < 1e-6
        assert abs(row.blomqvist_beta - f6(beta)) < 1e-6


def test_matches_numpy_cross(spark, sf_dir):
    out = (
        hoeffding_cross_pairs(spark, sf_dir)
        .toPandas()
        .set_index("key_id")
        .sort_index()
    )
    for i in (0, 34, 126):
        da, ta, _, _, _ = gen_row(i)
        db, tb, _, _, _ = gen_row(i + 1)
        m = min(len(ta), len(tb), _CAP)
        d30, gamma, beta = _ref(ta[:m], tb[:m])
        row = out.loc[da]
        assert row.n_used == m
        assert abs(row.hoeffding_d - f6(d30)) < 1e-6
        assert abs(row.gk_gamma - f6(gamma)) < 1e-6


def test_monotone_maximum():
    x = np.arange(40) * 7 + 3
    d30, gamma, beta = _ref(x, x * 3 + 1)
    assert abs(d30 - 1.0) < 1e-12
    assert gamma == 1.0
    d30r, gammar, _ = _ref(x, -x)
    assert abs(d30r - 1.0) < 1e-12  # symmetric in direction
    assert gammar == -1.0


def _lcg(seed, n, mod):
    s = seed
    out = np.empty(n, dtype=np.int64)
    for i in range(n):
        s = (1103515245 * s + 12345) % (1 << 31)
        out[i] = (s >> 12) % mod
    return out


def test_independence_null():
    for seed in (3, 17, 91):
        x = _lcg(seed, 120, 10**6)
        y = _lcg(seed + 1000, 120, 10**6)
        d30, gamma, _ = _ref(x, y)
        assert abs(d30) < 0.02
        assert abs(gamma) < 0.2


def test_parabola_power():
    n = 121
    x = np.arange(n)
    y = (x - n // 2) ** 2
    d30, gamma, _ = _ref(x, y)
    assert d30 > 0.1  # sees the non-monotone dependence
    assert abs(gamma) < 0.05  # the monotone dial is blind


def test_honest_ladder_and_coupled_tail(spark):
    lg = hoeffding_lag_pairs(
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    cr = hoeffding_cross_pairs(
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    # lag: unconditionally positive, the 0.22-median rung of the
    # sensitivity ladder (ξ = 0.98 above it)
    assert (lg.hoeffding_d > 0).all()
    assert abs(lg.hoeffding_d.median() - 0.2164) < 0.01
    assert lg.hoeffding_d.min() > 0.05
    # γ follows the Kendall-family rotation curve 1 − 4f(1−f) ≥ 0
    import hashlib

    f = np.array(
        [
            min(
                int(hashlib.md5(d.encode()).hexdigest()[:15], 16)
                % 50257,
                50257
                - int(hashlib.md5(d.encode()).hexdigest()[:15], 16)
                % 50257,
            )
            / 50257
            for d in lg.key_id
        ]
    )
    curve4 = 1 - 4 * f * (1 - f)
    assert np.corrcoef(lg.gk_gamma, curve4)[0, 1] > 0.99
    assert lg.gk_gamma.min() > -0.05  # never the Spearman −0.5 dip
    # cross: median null, but the coupled tail is real (the shared
    # period-64 grid — the DCCA mechanism re-detected)
    assert abs(cr.hoeffding_d.median()) < 0.02
    assert cr.hoeffding_d.abs().max() > 0.5
    assert cr.gk_gamma.abs().max() > 0.9
