"""Semantic gates for trev_q (TS92): independent numpy recompute of
every emitted number, the defining antisymmetry under time
reversal, the closed-form asymmetric-sawtooth hand case, the
reversible LCG null, and the honest per-lag step mechanism with its
~chance cross-lag agreement."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.trev_q import (
    _LAGS,
    _N,
    time_reversal_asymmetry,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731
V = synth.VOCAB


def _trev_np(y, tau):
    y = np.asarray(y, dtype=np.int64)
    d = (y[tau:] - y[:-tau]).astype(object)  # exact int arithmetic
    s2 = int((d * d).sum())
    s3 = int((d * d * d).sum())
    m = len(d)
    if m < 1 or s2 <= 0:
        return None, s2, s3
    m2, m3 = s2 / m, s3 / m
    return m3 / (m2 * math.sqrt(m2)), s2, s3


def test_matches_numpy(spark):
    out = time_reversal_asymmetry(spark, "").toPandas().set_index(
        "doc_id"
    )
    loc = synth.sequences_local(_N)
    checked = 0
    for i in range(0, _N, 7):
        row_l = loc.iloc[i]
        row = out.loc[row_l.doc_id]
        for tau in _LAGS:
            t, s2, s3 = _trev_np(row_l.tokens, tau)
            assert row[f"s2_{tau}"] == s2 and row[f"s3_{tau}"] == s3
            assert abs(row[f"trev_lag{tau}"] - f6(t)) < 1e-5
        checked += 1
    assert checked >= 70


def test_antisymmetry_under_reversal():
    # reversing time negates every increment: Σd² fixed, Σd³ negated,
    # so trev(reverse) = −trev exactly
    loc = synth.sequences_local(16)
    for i in range(16):
        y = loc.iloc[i].tokens
        for tau in _LAGS:
            t_f, _, s3f = _trev_np(y, tau)
            t_b, _, s3b = _trev_np(y[::-1], tau)
            assert s3b == -s3f
            assert abs(t_b + t_f) < 1e-12


def test_sawtooth_closed_form():
    # rise +1 nine times, fall −9 once: per cycle Σd³ = 9 − 729 = −720,
    # Σd² = 9 + 81 = 90 → trev = (−72)/(9^1.5) = −8/3 exactly
    y = np.tile(np.arange(10), 100)
    y = np.append(y, 0)  # whole cycles of increments
    t, s2, s3 = _trev_np(y, 1)
    assert s2 == 100 * 90 and s3 == -100 * 720
    assert abs(t - (-8.0 / 3.0)) < 1e-12
    # and its mirror (fast rise, slow fall) flips the sign
    t2, _, _ = _trev_np(y[::-1], 1)
    assert abs(t2 - 8.0 / 3.0) < 1e-12


def test_reversible_lcg_null():
    s, vals = 4242, []
    for _ in range(20000):
        s = (1103515245 * s + 12345) % (1 << 31)
        vals.append(s >> 16)
    for tau in _LAGS:
        t, _, _ = _trev_np(np.array(vals, dtype=np.int64), tau)
        assert abs(t) < 0.1


def test_honest_per_lag_step_mechanism(spark):
    out = time_reversal_asymmetry(spark, "").toPandas().set_index(
        "doc_id"
    )
    hm = np.array([synth.doc_hash(d) % V for d in out.index])
    # sign at lag τ follows the EFFECTIVE step τ·hm mod V
    for tau in _LAGS:
        eff = (tau * hm) % V
        up = eff < V / 2
        col = out[f"trev_lag{tau}"]
        assert (col[up] < 0).all()
        assert (col[~up] > 0).mean() > 0.98
    # ×8 mod V re-randomizes direction → ~chance cross-lag agreement
    agree = (
        np.sign(out.trev_lag1) == np.sign(out.trev_lag8)
    ).mean()
    assert 0.40 < agree < 0.65
    # near-reversible minority is small
    assert 0.01 < (out.trev_lag1.abs() < 0.1).mean() < 0.08
