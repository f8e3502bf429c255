"""Semantic gates for archlm_q (TS70): numpy recompute of the exact
integer/decimal sums and the LM statistic for a stride of series, the
volatility-clustering honest reading, and a constructed GARCH-burst
hand case."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.archlm_q import _N, arch_lm_test

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _lm(y):
    e = (np.diff(y.astype(np.float64))) ** 2
    x, z = e[:-1], e[1:]
    m = len(x)
    a = m * float(np.dot(x, z)) - x.sum() * z.sum()
    b = m * float(np.dot(x, x)) - x.sum() ** 2
    c = m * float(np.dot(z, z)) - z.sum() ** 2
    if b * c <= 0:
        return m, None
    return m, m * a * a / (b * c)


def test_matches_numpy(spark, sf_dir):
    out = arch_lm_test(spark, sf_dir).toPandas().set_index("doc_id")
    assert len(out) == _N
    loc = synth.sequences_local(_N)
    for i in range(0, _N, 7):
        row = loc.iloc[i]
        y = row.tokens.astype(np.int64)
        d = np.diff(y).astype(object)
        e = d * d
        x, z = e[:-1], e[1:]
        got = out.loc[row.doc_id]
        assert got.sx == int(sum(x)) and got.sz == int(sum(z))
        assert int(got.sxx) == int(sum(v * v for v in x))
        assert int(got.szz) == int(sum(v * v for v in z))
        assert int(got.sxz) == int(sum(a * b for a, b in zip(x, z)))
        m, lm = _lm(y)
        if lm is None:
            continue
        assert abs(got.lm_stat - lm) < 1e-4 * max(1.0, lm)
        assert got.reject_no_arch == (1 if got.lm_stat > 1.96**2 else 0)
    # honest reading: the wrap points arrive in runs → real volatility
    # clustering on most series, quiet unwrapped docs fail to reject
    rate = float((out.reject_no_arch == 1).mean())
    assert 0.6 < rate < 0.98
    assert (out.reject_no_arch == 0).sum() > 0


def test_garch_burst_hand_case():
    # calm/burst/calm variance regimes → LM must reject loudly; a pure
    # iid series must not (nominal behavior)
    rng = np.random.RandomState(9)
    calm = rng.randn(400)
    burst = 10.0 * rng.randn(200)
    y = np.cumsum(np.concatenate([calm, burst, calm]))
    _m, lm = _lm(y)
    assert lm > 40.0
    _m, lm0 = _lm(np.cumsum(rng.randn(800)))
    assert lm0 < 10.0
