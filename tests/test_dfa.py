"""Semantic gates for dfa_q: DFA-1 recomputed with numpy polyfit
(independent float route), plus the scaling-exponent readings."""

import math

import numpy as np
import pytest

from dtaidistance_spark import synth
from dtaidistance_spark.operators.dfa_q import _N, _NN, _SS, dfa_alpha


def _dfa_ref(x):
    x = np.asarray(x[:_NN], dtype=float)
    n = len(x)
    y = np.cumsum(x - x.mean())
    fs = {}
    for s in _SS:
        nb = n // s
        rss = []
        t = np.arange(1, s + 1, dtype=float)
        for b in range(nb):
            seg = y[b * s : (b + 1) * s]
            coef = np.polyfit(t, seg, 1)
            res = seg - np.polyval(coef, t)
            rss.append((res * res).sum())
        fs[s] = math.sqrt(sum(rss) / (nb * s))
    ls = np.log(list(_SS))
    lf = np.log([fs[s] for s in _SS])
    alpha = np.polyfit(ls, lf, 1)[0]
    return fs, alpha


def test_dfa_matches_numpy_polyfit(spark, sf_dir):
    out = dfa_alpha(spark, sf_dir).toPandas().set_index("doc_id")
    assert len(out) == _N
    loc = synth.sequences_local(_N)
    for row in list(loc.itertuples())[::9]:
        fs, alpha = _dfa_ref(row.tokens.tolist())
        got = out.loc[row.doc_id]
        for s in _SS:
            assert got[f"f_{s}"] == pytest.approx(fs[s], rel=1e-6), (
                row.doc_id,
                s,
            )
        assert got.alpha == pytest.approx(alpha, abs=2e-5), row.doc_id


def test_dfa_physical_band(spark, sf_dir):
    """F(s) grows with s on essentially every series (fluctuations
    accumulate), α stays in the physical (0, 3) band, and the honest
    corpus reading holds: the modular ramps' mod-50257 wraps make
    increments anti-persistent around the seasonal mean, so the
    DISTRIBUTION is mostly sub-diffusive (measured median ≈ 0.36,
    ~70% below 0.5) with a long super-diffusive tail from the
    smoothest series (max ≈ 2.5) — DFA genuinely spreads the corpus,
    it does not collapse to one value."""
    out = dfa_alpha(spark, sf_dir).toPandas()
    for a, b in zip(_SS, _SS[1:]):
        assert (out[f"f_{b}"] > out[f"f_{a}"]).mean() > 0.95, (a, b)
    d = out.dropna(subset=["alpha"])
    assert d["alpha"].between(0.0, 3.0).all()
    assert 0.5 < (d["alpha"] < 0.5).mean() < 0.9
    assert d["alpha"].max() > 1.5 and d["alpha"].min() < 0.2
