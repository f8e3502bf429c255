"""Semantic gates for neweywest_q (TS84): numpy autocovariance
recompute of every 7th series (all five γ̂_k, lrv, vif, n_eff), exact
int64 lagged-product sums, AR(+)/alternating/white hand cases, and
the honest short-period vif < 1 majority reading."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.neweywest_q import _K, _N, newey_west_lrv

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _nw(y, kmax=_K):
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    mu = y.mean()
    g = [float(((y[: n - k] - mu) * (y[k:] - mu)).sum() / n) for k in range(kmax + 1)]
    lrv = g[0] + 2 * sum((1 - k / (kmax + 1)) * g[k] for k in range(1, kmax + 1))
    return g, lrv


def test_matches_numpy(spark):
    out = newey_west_lrv(spark, "").toPandas().set_index("doc_id")
    assert len(out) == _N
    loc = synth.sequences_local(_N)
    checked = 0
    for i in range(0, _N, 7):
        row_l = loc.iloc[i]
        y = row_l.tokens.astype(np.int64)
        row = out.loc[row_l.doc_id]
        # exact int64 sums
        assert row.s1 == int(y.astype(object).sum())
        for k in range(_K + 1):
            want = int((y[: len(y) - k].astype(object) * y[k:]).sum())
            assert row[f"syy{k}"] == want
        if len(y) <= 10:
            continue
        g, lrv = _nw(y)
        if g[0] <= 0 or lrv <= 0:
            assert np.isnan(row.vif)
            continue
        for k in range(_K + 1):
            assert abs(row[f"gamma{k}"] - f6(g[k])) < max(1e-5, 1e-11 * abs(g[k]))
        assert abs(row.lrv - f6(lrv)) < max(1e-5, 1e-11 * lrv)
        assert abs(row.vif - f6(lrv / g[0])) < 1e-5
        assert abs(row.n_eff - f6(len(y) * g[0] / lrv)) < max(1e-4, 1e-9 * len(y))
        checked += 1
    assert checked >= 60


def test_hand_cases():
    # persistent positive correlation: slow square wave ⇒ vif ≫ 1
    y = np.array(([0] * 50 + [100] * 50) * 6)
    g, lrv = _nw(y)
    assert all(v > 0 for v in g[1:])
    assert lrv / g[0] > 3.0
    # strict alternation: γ_k alternates sign, Bartlett sum ≪ γ0
    y = np.array([0, 100] * 300)
    g, lrv = _nw(y)
    assert g[1] < 0 < g[2]
    assert lrv / g[0] < 0.3
    # LCG white noise (high bits): vif ≈ 1
    x, vals = 777, []
    for _ in range(5000):
        x = (1103515245 * x + 12345) % (2**31)
        vals.append((x >> 12) % 1000)
    g, lrv = _nw(np.array(vals))
    assert 0.8 < lrv / g[0] < 1.2


def test_honest_short_period_majority(spark):
    out = newey_west_lrv(spark, "").toPandas()
    ok = out.dropna(subset=["vif"])
    assert len(ok) >= 500
    # measured: 73% of series have vif < 1 (periodic cancellation),
    # median 0.50; the positively-correlated tail reaches ~4.9
    assert 0.6 < (ok.vif < 1).mean() < 0.85
    assert 0.4 < ok.vif.median() < 0.65
    assert ok.vif.max() > 3.0
    assert ok.vif.min() > 0.1
    # n_eff is consistent with vif by construction
    r = (ok.n_eff * ok.vif / ok.n).astype(float)
    assert ((r - 1).abs() < 1e-4).all()
