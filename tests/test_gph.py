"""TS130 gates — GPH log-periodogram long-memory estimator
(operators/gph_q.py):

1. FFT parity: an independent numpy rfft periodogram route reproduces
   every corpus d̂ to ≤ 1e-5 (the Goertzel fold == |DFT|² identity
   plus float-route noise under the 1e-6 floor grain);
2. calibration controls through the EXACT production expression tree
   (``_fit_from_xs``): white noise reads d ≈ 0 (mean-of-8, the known
   m = 16 variance acknowledged), its cumulative sum reads d ≈ 1,
   and a planted pure period-64 seasonal splits the two columns by
   ≈ 0.86 — the j = 4 exclusion doing exactly its job;
3. the measured corpus pins: median d = −0.120432 (mildly
   anti-persistent — the spectral twin of the VR/von-Neumann
   readings), seasonal-bin exclusion a no-op on the corpus (median
   shift ≤ 0.01), 457 rows.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from dtaidistance_spark import synth


def _d_np(xs, W):
    X = np.fft.rfft(np.asarray(xs, dtype=np.float64))
    return sum(w * math.log(abs(X[j]) ** 2) for j, w in W.items())


def _lcg(seed, n):
    s = seed
    out = []
    for _ in range(n):
        s = (s * 6364136223846793005 + 1442695040888963407) % (2**64)
        out.append(((s >> 33) / 2**31) - 1.0)
    return np.array(out)


def test_fft_parity_and_corpus_pins(spark, sf_dir):
    from dtaidistance_spark.operators import gph_q as G

    got = {
        r["doc_id"]: (r["d_gph"], r["d_gph_ex4"])
        for r in G.gph_long_memory(spark, sf_dir).collect()
    }
    assert len(got) == 457
    W_ALL = {j: float(w) for j, w in G._W_ALL.items()}
    W_EX4 = {j: float(w) for j, w in G._W_EX4.items()}
    pdf = synth.sequences_local(512)
    checked = 0
    for _, r in pdf.iterrows():
        if r["n_tok"] < 256 or checked >= 60:
            continue
        xs = np.asarray(r["tokens"][:256], dtype=np.float64)
        xs = xs - xs.sum() / 256.0
        d_all, d_ex4 = got[r["doc_id"]]
        assert abs(d_all - _d_np(xs, W_ALL)) <= 1e-5
        assert abs(d_ex4 - _d_np(xs, W_EX4)) <= 1e-5
        checked += 1
    assert checked == 60
    all_d = np.array([v[0] for v in got.values()])
    all_dx = np.array([v[1] for v in got.values()])
    assert np.median(all_d) == pytest.approx(-0.120432, abs=1e-6)
    assert np.median(all_dx) == pytest.approx(-0.122642, abs=1e-6)
    # the corpus no-op: excluding the seasonal bin barely moves d
    assert abs(np.median(all_d - all_dx)) <= 0.01
    assert float((all_d > 0.5).mean()) == pytest.approx(0.083, abs=0.01)


def test_controls_through_production_tree(spark):
    """White → 0, integrated → 1, pure seasonal splits the columns."""
    from dtaidistance_spark.operators.gph_q import _fit_from_xs

    rows = []
    for k in range(8):
        w = _lcg(1000 + k, 256)
        rows.append((f"white{k}", [float(x) for x in (w - w.mean())]))
        c = np.cumsum(_lcg(2000 + k, 256))
        rows.append((f"integ{k}", [float(x) for x in (c - c.mean())]))
        t = np.arange(256)
        s = 1000.0 * np.sin(2 * np.pi * t / 64 + 0.1 * k)
        s = s + 0.01 * _lcg(3000 + k, 256)
        rows.append((f"seas{k}", [float(x) for x in (s - s.mean())]))
    df = spark.createDataFrame(rows, "doc_id string, xs array<double>")
    got = {
        r["doc_id"]: (r["d_gph"], r["d_gph_ex4"])
        for r in _fit_from_xs(df).collect()
    }
    white = np.mean([got[f"white{k}"][0] for k in range(8)])
    integ = np.mean([got[f"integ{k}"][0] for k in range(8)])
    assert abs(white) <= 0.2  # measured 0.048 (per-doc spread ±0.36)
    assert integ == pytest.approx(1.0, abs=0.1)  # measured 1.002
    for k in range(8):
        d_all, d_ex4 = got[f"seas{k}"]
        assert d_all - d_ex4 > 0.5  # measured split ≈ 0.86
