"""Semantic gates for fisherg_q (TS68): numpy DFT recompute of the
grid periodogram, the exact null p-value formula vs a Monte-Carlo
null, and the period-64 honest reading."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.fisherg_q import (
    _GRID,
    _M,
    _N,
    fisher_g_test,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _p_fisher(g, m):
    return sum(
        (-1) ** (j - 1) * math.comb(m, j) * (1 - j * g) ** (m - 1)
        for j in range(1, m + 1)
        if j * g < 1
    )


def _grid_powers(x):
    """Goertzel power == |DFT|^2-style line power at 2π/p (full
    cycles): cross-check via the direct cos/sin sums."""
    n = len(x)
    out = []
    for p, _ in _GRID:
        w = 2 * math.pi / p
        t = np.arange(n)
        c = float(np.dot(x, np.cos(w * t)))
        s = float(np.dot(x, np.sin(w * t)))
        out.append(c * c + s * s)
    return out


def test_matches_numpy(spark, sf_dir):
    out = fisher_g_test(spark, sf_dir).toPandas().set_index("doc_id")
    assert len(out) == _N
    loc = synth.sequences_local(_N)
    n_rej = 0
    for i in range(0, _N, 7):
        row = loc.iloc[i]
        nc = len(row.tokens) - len(row.tokens) % 64
        x = row.tokens[:nc].astype(np.float64)
        pws = _grid_powers(x)
        got = out.loc[row.doc_id]
        assert got.nc == nc
        tot = sum(pws)
        g = max(pws) / tot
        # the Goertzel fold and the direct DFT accumulate differently
        assert abs(got.g_stat - g) < 1e-6 * max(1.0, abs(g))
        p = _p_fisher(float(got.g_stat), _M)
        assert abs(got.p_value - f6(p)) < 2e-5
        assert got.reject_white == (1 if p < 0.05 else 0)
        n_rej += int(got.reject_white)
    # honest reading: the period-64 line is REAL but small (amplitude
    # 1000 against a full-vocab sawtooth), and the sawtooth's broadband
    # leakage inflates the OTHER grid ordinates — so Fisher's g finds
    # the line only on the ~40% of docs where the ramp wraps little;
    # both verdicts must be well represented
    checked = len(range(0, _N, 7))
    assert 0.2 * checked < n_rej < 0.8 * checked
    assert (out.reject_white == 0).sum() > 0


def test_null_formula_monte_carlo():
    # m iid Exp ordinates: P(g > x) formula vs simulation
    rng = np.random.RandomState(3)
    m = _M
    sims = rng.exponential(size=(20000, m))
    gs = sims.max(axis=1) / sims.sum(axis=1)
    for x in (0.5, 0.6, 0.7):
        emp = float((gs > x).mean())
        assert abs(emp - _p_fisher(x, m)) < 0.01
    # support edges: p(1/m) = 1, p(→1) → 0
    assert abs(_p_fisher(1.0 / m + 1e-9, m) - 1.0) < 1e-6
    assert _p_fisher(0.999, m) < 1e-12
