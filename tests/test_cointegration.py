"""Semantic gates for cointegration_q (TS80): direct numpy
residual-regression recompute of every pair (proving the β-expansion
telescoping identities), the planted cointegrated-pair positive
control, the independent-random-walks negative control, and the
honest stationary-inputs misuse reading."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.cointegration_q import (
    _ND,
    engle_granger_pairs,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731

_CRIT = -3.3377


def _eg(x, y):
    """Textbook two-step EG: OLS on levels, lag-0 ADF (no determin-
    istics) on residuals — independent of the module's sum algebra."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    L = len(x)
    xc, yc = x - x.mean(), y - y.mean()
    beta = (xc * yc).sum() / (xc * xc).sum()
    e = yc - beta * xc
    el, de = e[:-1], np.diff(e)
    num = (el * de).sum()
    den = (el * el).sum()
    gamma = num / den
    ssr = ((de - gamma * el) ** 2).sum()
    t = gamma * math.sqrt(L - 2) * math.sqrt(den) / math.sqrt(ssr)
    return beta, gamma, t


def test_matches_numpy(spark):
    out = (
        engle_granger_pairs(spark, "")
        .toPandas()
        .set_index(["doc_a", "doc_b"])
    )
    assert len(out) == _ND // 2
    loc = synth.sequences_local(_ND).reset_index(drop=True)
    checked = 0
    for i in range(0, _ND - 1, 2):
        a, b = loc.iloc[i], loc.iloc[i + 1]
        L = min(len(a.tokens), len(b.tokens))
        x = a.tokens[:L].astype(np.int64)
        y = b.tokens[:L].astype(np.int64)
        beta, gamma, t = _eg(x, y)
        row = out.loc[(a.doc_id, b.doc_id)]
        assert row.m == L - 1
        # int64 sufficient statistics, exact
        assert row.sx == int(x.sum()) and row.sy == int(y.sum())
        assert row.sxy == int((x.astype(object) * y).sum())
        assert row.cxx == int((x[:-1].astype(object) * x[1:]).sum())
        assert row.cxy == int((x[:-1].astype(object) * y[1:]).sum())
        assert row.cyx == int((y[:-1].astype(object) * x[1:]).sum())
        if L < 31:
            assert np.isnan(row.eg_t)
            continue
        # the telescoped float tree agrees with the direct regression
        assert abs(row.beta - f6(beta)) < 5e-6, (i, row.beta, beta)
        assert abs(row.gamma - f6(gamma)) < 5e-6
        assert abs(row.eg_t - f6(t)) < 5e-5
        assert row.cointegrated == (1 if t < _CRIT else 0)
        checked += 1
    assert checked >= 60


def _lcg_walk(seed, n, step=9):
    x, vals, level = seed, [], 0
    for _ in range(n):
        x = (1103515245 * x + 12345) % (2**31)
        level += (x % (2 * step + 1)) - step
        vals.append(level)
    return np.array(vals, dtype=np.int64)


def test_independent_random_walks_mostly_fail_to_reject():
    # genuinely I(1), unrelated: the EG null — reject rarely
    rejects = 0
    for s in range(40):
        x = _lcg_walk(1000 + s, 600)
        y = _lcg_walk(5000 + 7 * s, 600)
        _, _, t = _eg(x, y)
        rejects += t < _CRIT
    assert rejects <= 6  # ~5% nominal; allow sampling slack


def test_planted_cointegration_rejects_decisively():
    # shared random walk + small independent stationary offsets
    w = _lcg_walk(42, 800)
    nx = np.array([(i * 37) % 11 - 5 for i in range(800)])
    ny = np.array([(i * 53) % 13 - 6 for i in range(800)])
    x = w + nx
    y = 2 * w + ny
    beta, _, t = _eg(x, y)
    assert 1.8 < beta < 2.2
    assert t < 3 * _CRIT  # decisive


def test_honest_stationary_misuse_rate(spark):
    out = engle_granger_pairs(spark, "").toPandas()
    ok = out.dropna(subset=["eg_t"])
    # bounded largely-stationary inputs ⇒ stationary residuals ⇒ the
    # "cointegration" flag fires nearly everywhere (measured 63/64)
    assert (ok.cointegrated == 1).mean() >= 0.9
    assert ok.eg_t.median() < -10
