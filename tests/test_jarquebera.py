"""Semantic gates for jarquebera_q (TS62): numpy recompute of the
moment statistics and JB for a stride of series, the uniform-limit
kurtosis band, and the reject-everywhere honest reading."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.jarquebera_q import (
    _N,
    jarque_bera_series,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def test_matches_numpy(spark, sf_dir):
    out = jarque_bera_series(spark, sf_dir).toPandas().set_index("doc_id")
    assert len(out) == _N
    loc = synth.sequences_local(_N)
    kurts = []
    for i in range(0, _N, 7):
        r = loc.iloc[i]
        y = r.tokens.astype(np.int64)
        n = len(y)
        got = out.loc[r.doc_id]
        s1 = int(y.sum())
        s2 = int((y.astype(object) ** 2).sum())
        s3 = int((y.astype(object) ** 3).sum())
        s4 = int((y.astype(object) ** 4).sum())
        assert got.n == n and got.s1 == s1 and got.s3 == s3
        assert got.m2 == n * s2 - s1 * s1
        assert int(got.s4) == s4  # exact digit string
        # float recompute on the same cleared forms
        nd, s1d, s2d, s3d, s4d = map(float, (n, s1, s2, s3, s4))
        m2d = float(n * s2 - s1 * s1)
        m3 = nd * nd * s3d - 3.0 * nd * s1d * s2d + 2.0 * s1d**3
        m4 = (
            nd**3 * s4d
            - 4.0 * nd * nd * s1d * s3d
            + 6.0 * nd * s1d * s1d * s2d
            - 3.0 * s1d**4
        )
        skew = m3 / (m2d * math.sqrt(m2d))
        kurt = m4 / (m2d * m2d) - 3.0
        jb = nd * (skew * skew / 6.0 + kurt * kurt / 24.0)
        assert abs(got["skew"] - f6(skew)) < 1e-6
        assert abs(got["ex_kurt"] - f6(kurt)) < 1e-6
        assert abs(got["jb"] - f6(jb)) < 1e-4 * max(1.0, jb)
        # cross-check the cleared identities against direct centrals
        yc = y - y.mean()
        assert abs(skew - (yc**3).mean() / (yc**2).mean() ** 1.5) < 1e-8
        assert abs(kurt - ((yc**4).mean() / (yc**2).mean() ** 2 - 3)) < 1e-8
        kurts.append(kurt)
    # honest reading: near-uniform token streams sit near the uniform
    # kurtosis limit -1.2 and JB rejects normality on every series
    assert -1.4 < float(np.median(kurts)) < -0.8
    # the only non-rejections are short series (JB has low power at
    # small n even at kurtosis -1.2: JB ~ 0.06n needs n >~ 100)
    assert (out.reject_normal == 1).mean() > 0.95
    assert int(out.loc[out.reject_normal == 0, "n"].max()) <= 128


def test_hand_case():
    # uniform 0..k-1 exact moments: skew 0, excess kurtosis
    # -6(k^2+1)/(5(k^2-1))
    k = 101
    y = np.arange(k, dtype=np.int64)
    yc = y - y.mean()
    kurt = (yc**4).mean() / (yc**2).mean() ** 2 - 3
    assert abs(kurt - (-6.0 * (k * k + 1) / (5.0 * (k * k - 1)))) < 1e-12
    assert abs((yc**3).mean()) == 0.0
