"""Semantic gates for vonneumann_q (TS66): numpy recompute of the
ratio/z for a stride of series, the d ≈ 2(1 − r1) identity, and the
reject-everywhere honest reading on smooth series."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.vonneumann_q import (
    _N,
    von_neumann_ratio,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def test_matches_numpy(spark, sf_dir):
    out = von_neumann_ratio(spark, sf_dir).toPandas().set_index("doc_id")
    assert len(out) == _N
    loc = synth.sequences_local(_N)
    for i in range(0, _N, 7):
        r = loc.iloc[i]
        y = r.tokens.astype(np.int64)
        n = len(y)
        sdd = int((np.diff(y).astype(object) ** 2).sum())
        s1 = int(y.sum())
        m2 = n * int((y.astype(object) ** 2).sum()) - s1 * s1
        got = out.loc[r.doc_id]
        assert got.num == n * sdd and got.m2 == m2
        d = float(n * sdd) / float(m2)
        z = (1.0 - d / 2.0) * math.sqrt(float(n))
        assert abs(got.d_ratio - f6(d)) < 1e-9
        assert abs(got.z_lag1 - f6(z)) < 1e-9
        # identity: d ≈ 2(1 − r1) against the direct acf estimate
        yc = y - y.mean()
        r1 = float((yc[1:] * yc[:-1]).sum() / (yc**2).sum())
        assert abs((1.0 - d / 2.0) - r1) < 0.02
    # honest reading: >90% reject (both smooth d<2 and alternating
    # d>2 present); the fast-wrapping sawtooths genuinely decorrelate
    # and land at d ≈ 2, correctly not rejected
    rej = out[out.reject_independence == 1]
    assert len(rej) > 0.9 * _N
    assert float(rej.d_ratio.min()) < 1.0 < 2.0 < float(rej.d_ratio.max())
    keep = out[out.reject_independence == 0]
    assert len(keep) > 0
    assert keep.z_lag1.abs().le(1.96).all()
    assert 1.8 < float(keep.d_ratio.median()) < 2.2


def test_hand_cases():
    # perfectly alternating series → d near 4 (negative correlation)
    y = np.array([0, 10] * 50, dtype=np.int64)
    n = len(y)
    sdd = int((np.diff(y) ** 2).sum())
    s1 = int(y.sum())
    m2 = n * int((y**2).sum()) - s1 * s1
    d = float(n * sdd) / m2
    assert d > 3.9
    # a pure linear ramp → d near 0
    y = np.arange(100, dtype=np.int64)
    sdd = int((np.diff(y) ** 2).sum())
    s1 = int(y.sum())
    m2 = 100 * int((y**2).sum()) - s1 * s1
    assert float(100 * sdd) / m2 < 0.02
