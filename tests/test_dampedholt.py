"""Semantic gates for dampedholt_q (TS127): numpy recompute of the
damped fold per sampled doc, the φ=1 ≡ textbook-Holt and φ=0 ≡
SES-from-t₃ degenerations, the substituted b_t identity, a clean
unwrapped-trend control (damped beats SES/naive; undamped beats
damped when the trend is real), and the measured corpus pins
(511/512 damped-over-Holt, zero 4-way wins, the unchanged 398/114
SES/naive split)."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.dampedholt_q import (
    _N,
    damped_holt_selection,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _damped_np(x, phi, al=0.2, ab=0.02):
    """The module's fold: textbook init l2=y2, b2=y2-y1, errors from
    t=3; returns (sse, sae, b, f)."""
    x = [float(v) for v in x]
    b = x[1] - x[0]
    f = x[1] + phi * b
    sse = sae = 0.0
    for y in x[2:]:
        e = y - f
        sse += e * e
        sae += abs(e)
        b = phi * b + ab * e
        le = al * y + (1 - al) * f
        f = le + phi * b
    return sse, sae, b, f


def _textbook_holt_np(x, al=0.2, be=0.1):
    """Unsubstituted textbook recursion: l/b state, f = l + b."""
    x = [float(v) for v in x]
    l, b = x[1], x[1] - x[0]
    sse = 0.0
    for y in x[2:]:
        f = l + b
        e = y - f
        sse += e * e
        l_new = al * y + (1 - al) * f
        b = be * (l_new - l) + (1 - be) * b
        l = l_new
    return sse


def _ses_from_t3_np(x, al=0.2):
    x = [float(v) for v in x]
    l = x[1]
    sse = 0.0
    for y in x[2:]:
        e = y - l
        sse += e * e
        l = al * y + (1 - al) * l
    return sse


def test_matches_numpy(spark, sf_dir):
    out = (
        damped_holt_selection(spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
    )
    pdf = synth.gen_pdf(range(0, _N, 61))
    for row in pdf.itertuples():
        sse, sae, b, f = _damped_np(list(row.tokens), 0.9)
        got = out.loc[row.doc_id]
        assert abs(got.damped_sse - f6(sse)) < 1e-5
        assert abs(got.damped_sae - f6(sae)) < 1e-6
        assert abs(got.final_trend - f6(b)) < 1e-6
        assert abs(got.final_forecast - f6(f)) < 1e-6
        hsse = _damped_np(list(row.tokens), 1.0)[0]
        assert abs(got.holt_sse - f6(hsse)) < 1e-5


def test_phi_degenerations():
    rng = np.random.RandomState(4)
    x = list(rng.randint(0, 1000, size=200))
    # φ=1 == textbook Holt recursion (the substituted identity)
    sse1 = _damped_np(x, 1.0)[0]
    assert abs(sse1 - _textbook_holt_np(x)) < 1e-6
    # φ=0 == SES with level init y2, errors from t=3
    sse0 = _damped_np(x, 0.0)[0]
    assert abs(sse0 - _ses_from_t3_np(x)) < 1e-6


def test_substituted_bt_identity():
    """b_t = β(l_t − l_{t−1}) + (1−β)·φ·b_{t−1} equals
    φ·b_{t−1} + αβ·e_t given l_t = l_{t−1}... the damped forecast
    form — checked numerically along a trajectory."""
    rng = np.random.RandomState(7)
    x = rng.randint(0, 500, size=50).astype(float)
    al, be, phi = 0.2, 0.1, 0.9
    l, b = x[1], x[1] - x[0]
    for y in x[2:]:
        f = l + phi * b
        e = y - f
        l_new = al * y + (1 - al) * f
        b_text = be * (l_new - l) + (1 - be) * phi * b
        b_sub = phi * b + al * be * e
        assert abs(b_text - b_sub) < 1e-9
        l, b = l_new, b_sub


def test_clean_trend_control():
    """No wraps: a genuine linear trend + noise. Undamped Holt wins
    decisively (the trend is real), and damping is NOT free — its
    steady-state under-extrapolation bias e* ≈ (1−φ)·b/(αβ) prices
    the damped model below even the lag-1 naive (whose errors are
    just increment noise on a clean trend), with SES trailing far
    behind as it lags the ramp: h < naive < damped < ses, measured
    and asserted in full."""
    rng = np.random.RandomState(9)
    x = [100 + 7 * t + rng.randint(-3, 4) for t in range(300)]
    d_sse = _damped_np(x, 0.9)[0]
    h_sse = _damped_np(x, 1.0)[0]
    s_sse = _ses_from_t3_np(x)
    n_sse = sum((x[t + 1] - x[t]) ** 2 for t in range(len(x) - 1))
    assert h_sse < n_sse < d_sse < s_sse
    # the steady-state bias magnitude: e* = (1-phi)*b/(alpha*beta)
    # = 0.1*7/0.02 = 35 per step -> sse ~ 300*35^2 order
    assert 0.2 * 300 * 35**2 < d_sse < 2 * 300 * 35**2


def test_corpus_pins(spark, sf_dir):
    out = damped_holt_selection(spark, sf_dir).toPandas()
    counts = out.best_model.value_counts().to_dict()
    assert counts == {1: 398, 0: 114}  # unchanged from TS83
    assert int(out.damped_beats_holt.sum()) == 511
    assert int((out.damped_sse < out.ses_sse).sum()) == 26
