"""Semantic gates for holt_q (TS83): numpy recursion recompute
(proving the old-state substitution b_t = b_{t−1} + αβ·e_t identity),
the clean-trend positive control where Holt must win, the measured
holt-never-wins corpus reading, and best_model consistency."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.holt_q import _N, holt_model_selection

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731

_A, _B = 0.2, 0.1


def _holt(y):
    y = np.asarray(y, dtype=np.float64)
    l, b = y[0], y[1] - y[0]
    sse = sae = 0.0
    for t in range(2, len(y)):
        f = l + b
        e = y[t] - f
        sse += e * e
        sae += abs(e)
        l_new = _A * y[t] + (1 - _A) * f
        # textbook form — the substituted form is asserted equal below
        b_txt = _B * (l_new - l) + (1 - _B) * b
        b_sub = b + _A * _B * e
        assert abs(b_txt - b_sub) < 1e-9 * max(1.0, abs(b_txt))
        l, b = l_new, b_sub
    return sse, sae, b, l + b


def _ses(y):
    y = np.asarray(y, dtype=np.float64)
    l = y[0]
    sse = 0.0
    for t in range(1, len(y)):
        sse += (y[t] - l) ** 2
        l = _A * y[t] + (1 - _A) * l
    return sse


def test_matches_numpy(spark):
    out = holt_model_selection(spark, "").toPandas().set_index("doc_id")
    assert len(out) == _N
    loc = synth.sequences_local(_N)
    checked = 0
    for i in range(0, _N, 7):
        row_l = loc.iloc[i]
        y = row_l.tokens.astype(np.int64)
        if len(y) < 4:
            continue
        sse, sae, b, lpb = _holt(y)
        row = out.loc[row_l.doc_id]
        rel = max(1e-6, 1e-11 * sse)
        assert abs(row.holt_sse - f6(sse)) < rel
        assert abs(row.holt_sae - f6(sae)) < max(1e-6, 1e-11 * sae)
        assert abs(row.final_trend - f6(b)) < 1e-5
        assert abs(row.final_forecast - f6(lpb)) < 1e-5
        ssse = _ses(y)
        assert abs(row.ses_sse - f6(ssse)) < max(1e-6, 1e-11 * ssse)
        if row.sad > 0:
            assert abs(row.holt_mase - f6(sae / row.sad)) < 1e-5
            want = (
                2
                if sse < ssse and sse < row.nsse
                else (1 if ssse < row.nsse else 0)
            )
            assert row.best_model == want
        checked += 1
    assert checked >= 60


def test_clean_trend_holt_wins():
    # unwrapped linear trend + small deterministic wiggle: the trend
    # component is exactly what naive and SES lack
    t = np.arange(300)
    y = (50 + 7 * t + (t % 3)).astype(np.int64)
    hsse = _holt(y)[0]
    ssse = _ses(y)
    nsse = float((np.diff(y).astype(np.float64) ** 2).sum())
    assert hsse < 0.2 * ssse
    assert hsse < 0.2 * nsse


def test_honest_holt_never_wins_here(spark):
    out = holt_model_selection(spark, "").toPandas()
    ok = out.dropna(subset=["best_model"])
    counts = ok.best_model.value_counts().to_dict()
    # measured: {1: 398, 0: 114} — the mod-V wraps punish trend
    # extrapolation at every wrap point
    assert counts.get(2, 0) == 0
    assert counts.get(1, 0) > counts.get(0, 0) > 50
    assert 0.6 < ok.holt_mase.median() < 1.0
