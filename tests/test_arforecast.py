"""Semantic gates for arforecast_q (TS118): numpy recompute of the
full LD chain + backtest per doc, planted AR(2)/sinusoid/white
cases, and the corpus win-rate pins."""

import math

import numpy as np

from dtaidistance_spark.operators.arforecast_q import (
    ar4_forecast_backtest,
)
from dtaidistance_spark.synth import gen_row

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _ld4(r):
    a11 = r[1] / r[0]
    s1 = r[0] - a11 * r[1]
    k2 = (r[2] - a11 * r[1]) / s1
    a22, a21 = k2, a11 - k2 * a11
    s2 = s1 * (1 - k2 * k2)
    k3 = (r[3] - a21 * r[2] - a22 * r[1]) / s2
    a33, a32, a31 = k3, a22 - k3 * a21, a21 - k3 * a22
    s3 = s2 * (1 - k3 * k3)
    k4 = (r[4] - a31 * r[3] - a32 * r[2] - a33 * r[1]) / s3
    a44 = k4
    a43 = a33 - k4 * a31
    a42 = a32 - k4 * a32
    a41 = a31 - k4 * a33
    s4 = s3 * (1 - k4 * k4)
    return (a41, a42, a43, a44), s4


def _ref(y):
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    m0 = int(math.floor(0.8 * n))
    mu = y[:m0].sum() / m0
    c = y - mu
    r = [
        float((c[: m0 - j] * c[j:m0]).sum()) / m0 for j in range(5)
    ]
    phi, s4 = _ld4(r)
    sae = 0.0
    sad = 0
    for t in range(m0, n):  # 0-based t = array index
        pred = mu + sum(
            phi[i] * (y[t - 1 - i] - mu) for i in range(4)
        )
        sae += abs(y[t] - pred)
        sad += abs(int(y[t]) - int(y[t - 1]))
    return m0, phi, s4, sae / sad if sad else None


def test_matches_numpy(spark, sf_dir):
    out = (
        ar4_forecast_backtest(spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    for i in range(0, 512, 61):
        doc_id, tokens, n, _, _ = gen_row(i)
        m0, phi, s4, mase = _ref(tokens)
        row = out.loc[doc_id]
        assert row.n_train == m0
        for k in range(4):
            assert abs(row[f"phi{k+1}"] - f6(phi[k])) < 1e-4
        assert abs(row.innov_var - f6(s4)) < 1e-2
        assert abs(row.mase_ar - f6(mase)) < 1e-4


def _lcg_normal(seed, n):
    s = seed
    out = np.empty(n)
    for i in range(n):
        acc = 0.0
        for _ in range(12):
            s = (1103515245 * s + 12345) % (1 << 31)
            acc += s / (1 << 31)
        out[i] = acc - 6.0
    return out


def test_planted_ar2_recovery():
    n = 6000
    e = _lcg_normal(3, n)
    y = np.zeros(n)
    for t in range(2, n):
        y[t] = 0.6 * y[t - 1] - 0.3 * y[t - 2] + e[t]
    y = np.floor(y * 1000).astype(np.int64) + 50000
    _, phi, _, mase = _ref(y)
    assert abs(phi[0] - 0.6) < 0.06
    assert abs(phi[1] + 0.3) < 0.06
    assert abs(phi[2]) < 0.06 and abs(phi[3]) < 0.06
    assert mase < 1.0  # AR wins on an AR process


def test_planted_sinusoid_crushes_naive():
    t = np.arange(4000)
    y = np.floor(10000 * np.sin(2 * np.pi * t / 16)).astype(
        np.int64
    )
    _, _, _, mase = _ref(y)
    assert mase < 0.2


def test_planted_white_noise_calibration():
    y = np.floor(_lcg_normal(17, 5000) * 10000).astype(np.int64)
    _, phi, _, mase = _ref(y)
    # white noise: φ ≈ 0, and the mean-forecast beats naive by the
    # known E|N(0,σ√1)|/E|N(0,σ√2)| = 1/√2 ≈ 0.707 ratio
    assert max(abs(p) for p in phi) < 0.05
    assert abs(mase - 1 / math.sqrt(2)) < 0.06


def test_honest_corpus_pins(spark):
    out = ar4_forecast_backtest(
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    assert abs(out.ar_beats_naive.mean() - 0.8359) < 0.01
    assert abs(out.mase_ar.median() - 0.4387) < 0.01
    assert out.mase_ar.min() < 0.05  # near-perfect best docs
    assert out.mase_ar.max() > 5  # the phase-rotation losing tail
    # the anti-persistent alternation, now exploited
    assert out.phi1.median() < 0
