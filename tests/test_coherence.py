"""Semantic gates for coherence_q (TS88): direct cos/sin DFT numpy
recompute (independent of the Goertzel folds) of every pair, the
single-segment degeneracy identity (coherence ≡ 1 at K = 1), the
shifted-copy positive control, and the honest independent-phases
null-floor reading."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.coherence_q import (
    _K,
    _ND,
    _P,
    coherence_pairs,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _seg_dft(x, s):
    seg = np.asarray(x[s * _P : (s + 1) * _P], dtype=np.float64)
    t = np.arange(_P)
    re = (seg * np.cos(2 * np.pi * t / _P)).sum()
    im = -(seg * np.sin(2 * np.pi * t / _P)).sum()
    return re, im


def _coh(x, y, k=_K):
    sxy = 0j
    sxx = syy = 0.0
    for s in range(k):
        xr, xi = _seg_dft(x, s)
        yr, yi = _seg_dft(y, s)
        X, Y = complex(xr, xi), complex(yr, yi)
        sxy += X * np.conj(Y)
        sxx += abs(X) ** 2
        syy += abs(Y) ** 2
    return abs(sxy) ** 2 / (sxx * syy), sxx, syy


def test_matches_direct_dft(spark):
    out = (
        coherence_pairs(spark, "")
        .toPandas()
        .set_index(["doc_a", "doc_b"])
    )
    loc = synth.sequences_local(_ND).reset_index(drop=True)
    checked = 0
    for i in range(0, _ND - 1, 2):
        a, b = loc.iloc[i], loc.iloc[i + 1]
        L = min(len(a.tokens), len(b.tokens))
        if L < _K * _P:
            assert (a.doc_id, b.doc_id) not in out.index
            continue
        x = a.tokens[:L].astype(np.int64)
        y = b.tokens[:L].astype(np.int64)
        coh, sxx, syy = _coh(x, y)
        row = out.loc[(a.doc_id, b.doc_id)]
        # Goertzel folds vs the direct DFT: same math, different
        # route — agreement to the floor-1e6 display scale
        assert abs(row.coherence - f6(coh)) < 2e-5, (i, row.coherence, coh)
        assert abs(row.sxx - sxx) < max(1e-4, 1e-8 * sxx)
        assert abs(row.syy - syy) < max(1e-4, 1e-8 * syy)
        checked += 1
    assert checked >= 35


def test_single_segment_degeneracy():
    # K = 1: |X·conj(Y)|² = |X|²·|Y|² identically ⇒ coherence ≡ 1
    x = np.arange(64) * 37 % 101
    y = (np.arange(64) * 53 + 11) % 97
    coh, _, _ = _coh(x, y, k=1)
    assert abs(coh - 1.0) < 1e-12


def test_shifted_copy_positive_control():
    # y = x delayed by half a period: full coherence, phase π
    t = np.arange(_K * _P)
    x = (1000 + 500 * np.sin(2 * np.pi * t / _P)).astype(np.int64)
    y = np.roll(x, _P // 2)
    coh, _, _ = _coh(x, y)
    assert coh > 0.999


def test_honest_independent_phases(spark):
    out = coherence_pairs(spark, "").toPandas()
    ok = out.dropna(subset=["coherence"])
    assert len(ok) >= 35
    # measured: median 0.065, max 0.395 — near the 1/K = 0.125 null
    # floor; no pair reads as sharing a rhythm
    assert ok.coherence.median() < 0.15
    assert ok.coherence.max() < 0.6
    assert (ok.coherence >= 0).all() and (ok.coherence <= 1).all()
