"""Semantic gates for chow_q (TS78): numpy OLS-RSS recompute of the
Chow F per series, the closed-form F(2, d2) critical value validated
against a numerically integrated F CDF, int64 bound verification,
planted-break / stable-line hand cases, and the honest near-nominal
rejection reading."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.chow_q import _N, chow_break_test

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _rss(y, x):
    n = len(y)
    A = n * (y * y).sum() - y.sum() ** 2
    B = n * (x * y).sum() - x.sum() * y.sum()
    C = n * (x * x).sum() - x.sum() ** 2
    return (float(A) - float(B) * float(B) / float(C)) / float(n)


def _chow(y):
    y = np.asarray(y, dtype=np.int64)
    n = len(y)
    m = n // 2
    x = np.arange(n, dtype=np.int64)
    rss1 = _rss(y[:m], x[:m])
    rss2 = _rss(y[m:], x[m:])
    rssp = _rss(y, x)
    d2 = float(n - 4)
    fstat = ((rssp - rss1 - rss2) / 2.0) / ((rss1 + rss2) / d2)
    fcrit = (d2 / 2.0) * (0.05 ** (-2.0 / d2) - 1.0)
    return fstat, fcrit


def test_matches_numpy(spark):
    from dtaidistance_spark import synth

    out = chow_break_test(spark, "").toPandas().set_index("doc_id")
    assert len(out) == _N
    loc = synth.sequences_local(_N)
    checked = 0
    for i in range(0, _N, 7):
        row_l = loc.iloc[i]
        y = row_l.tokens.astype(np.int64)
        if len(y) < 8:
            continue
        fstat, fcrit = _chow(y)
        row = out.loc[row_l.doc_id]
        assert abs(row.chow_f - f6(fstat)) < 1e-6, row_l.doc_id
        assert abs(row.f_crit - f6(fcrit)) < 1e-9, row_l.doc_id
        assert row.reject_stability == (1 if fstat > fcrit else 0)
        # int64 bound premise: n*S2 stays far inside int64
        assert len(y) * int((y.astype(object) ** 2).sum()) < 2**62
        checked += 1
    assert checked >= 60


def test_fcrit_closed_form_vs_integrated_cdf():
    # numerically integrate the F(2, d2) density and check the
    # closed-form 5% critical value hits CDF = 0.95
    for d2 in (60, 252, 1000):
        fcrit = (d2 / 2.0) * (0.05 ** (-2.0 / d2) - 1.0)

        def pdf(x, d1=2.0, d2=float(d2)):
            # Beta-form F density; B(1, d2/2) = 2/d2 when d1 = 2
            return (
                (d1 / d2) ** (d1 / 2)
                * x ** (d1 / 2 - 1)
                * (1 + d1 * x / d2) ** (-(d1 + d2) / 2)
                / (2.0 / d2)
            )

        xs = np.linspace(1e-9, fcrit, 200001)
        cdf = np.trapz([pdf(x) for x in xs], xs)
        assert abs(cdf - 0.95) < 1e-4, (d2, cdf)


def test_planted_break_rejects():
    # two genuinely different slopes, deterministic small wiggle
    n = 400
    t = np.arange(n)
    y1 = 100 + 3 * t[:200] + (t[:200] % 5)
    y2 = 700 - 2 * (t[200:] - 200) + (t[200:] % 5)
    fstat, fcrit = _chow(np.concatenate([y1, y2]).astype(np.int64))
    assert fstat > 100 * fcrit  # decisive


def test_stable_line_accepts():
    # one global line + tiny deterministic residue: no break
    n = 400
    t = np.arange(n)
    y = (17 + 5 * t + (t % 3)).astype(np.int64)
    fstat, fcrit = _chow(y)
    assert fstat < fcrit


def test_honest_near_nominal_rate(spark):
    out = chow_break_test(spark, "").toPandas()
    ok = out.dropna(subset=["chow_f"])
    rate = (ok.reject_stability == 1).mean()
    # measured on this corpus: 21/512 = 4.1% — essentially nominal
    assert 0.02 <= rate <= 0.08
    # structured (non-iid) periodic residuals deflate F far below the
    # iid H0 median (~0.7)
    assert ok.chow_f.median() < 0.2


