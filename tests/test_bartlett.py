"""Semantic gates for bartlett_q (TS87): numpy recompute of the
two-group Bartlett statistic per 7th series (int64 sums exact), the
k = 2 textbook hand case, the planted variance-regime-break positive
control, and the honest sub-nominal deflated reading."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.bartlett_q import (
    _N,
    bartlett_variance_break,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731

_CHI1 = 3.841458820694124


def _bartlett(y):
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    m = n // 2
    a, b = y[:m], y[m:]
    ssa = ((a - a.mean()) ** 2).sum()
    ssb = ((b - b.mean()) ** 2).sum()
    if ssa <= 0 or ssb <= 0 or n < 10:
        return None
    v1 = ssa / (m - 1)
    v2 = ssb / (n - m - 1)
    vp = (ssa + ssb) / (n - 2)
    M = (n - 2) * math.log(vp) - (m - 1) * math.log(v1) - (
        n - m - 1
    ) * math.log(v2)
    C = 1 + (1 / (m - 1) + 1 / (n - m - 1) - 1 / (n - 2)) / 3
    return v1, v2, M / C


def test_matches_numpy(spark):
    out = bartlett_variance_break(spark, "").toPandas().set_index("doc_id")
    assert len(out) == _N
    loc = synth.sequences_local(_N)
    checked = 0
    for i in range(0, _N, 7):
        row_l = loc.iloc[i]
        y = row_l.tokens.astype(np.int64)
        row = out.loc[row_l.doc_id]
        m = len(y) // 2
        assert row.s1a == int(y[:m].astype(object).sum())
        assert row.s2a == int((y[:m].astype(object) ** 2).sum())
        r = _bartlett(y)
        if r is None:
            assert np.isnan(row.bartlett_t)
            continue
        v1, v2, t = r
        assert abs(row.var_first - f6(v1)) < max(1e-5, 1e-10 * v1)
        assert abs(row.var_second - f6(v2)) < max(1e-5, 1e-10 * v2)
        assert abs(row.bartlett_t - f6(t)) < 1e-4
        assert row.reject_equal_variance == (1 if t > _CHI1 else 0)
        checked += 1
    assert checked >= 60


def test_textbook_hand_case():
    # equal halves up to a mean shift: variance equal ⇒ T ≈ 0
    y = np.concatenate([np.tile([0, 10], 50), 100 + np.tile([0, 10], 50)])
    _, _, t = _bartlett(y)
    assert t < 0.01


def test_planted_variance_break_rejects():
    # deterministic noise amplitude triples at the midpoint
    base = np.array([3, -1, 4, -1, 5, -9, 2, -6] * 25)
    y = np.concatenate([1000 + base, 1000 + 3 * base])
    _, _, t = _bartlett(y)
    assert t > 10 * _CHI1  # decisive


def test_honest_subnominal_deflation(spark):
    out = bartlett_variance_break(spark, "").toPandas()
    ok = out.dropna(subset=["bartlett_t"])
    assert len(ok) >= 500
    # measured: 7/512 = 1.4% — below nominal; correlated halves move
    # together and deflate the iid chi2(1) null
    rate = (ok.reject_equal_variance == 1).mean()
    assert rate < 0.05
    assert ok.bartlett_t.median() < 0.1
    # variances of the two halves are near-identical corpus-wide
    r = ok.var_first / ok.var_second
    assert 0.9 < r.median() < 1.1
