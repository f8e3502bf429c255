"""Semantic gates for dcca_q (TS94): independent numpy/polyfit
recompute of ρ at every scale for every pair, the self-pair ≡ 1
degeneracy, Cauchy–Schwarz bounds, planted coupled/anti-coupled
controls, and the honest decoupled corpus reading."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.dcca_q import _ND, _NN, _SS, dcca_pairs

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _dcca_np(x, y):
    """Textbook route: float profiles of the centered series, per-box
    polyfit residuals — none of the query's scaled-integer or
    cleared-form machinery."""
    x = np.asarray(x[:_NN], dtype=np.float64)
    y = np.asarray(y[:_NN], dtype=np.float64)
    px = np.cumsum(x - x.mean())
    py = np.cumsum(y - y.mean())
    t = np.arange(1.0, 100.0)
    out = {}
    for s in _SS:
        fxx = fyy = fxy = 0.0
        for b in range(_NN // s):
            tx, u, v = t[:s], px[b * s:(b + 1) * s], py[b * s:(b + 1) * s]
            ru = u - np.polyval(np.polyfit(tx, u, 1), tx)
            rv = v - np.polyval(np.polyfit(tx, v, 1), tx)
            fxx += ru @ ru
            fyy += rv @ rv
            fxy += ru @ rv
        out[s] = fxy / math.sqrt(fxx * fyy) if fxx > 0 and fyy > 0 else None
    return out


def test_matches_numpy_polyfit(spark):
    out = dcca_pairs(spark, "").toPandas().set_index("doc_a")
    loc = synth.sequences_local(_ND)
    by_id = {r.doc_id: r.tokens for r in loc.itertuples()}
    checked = 0
    for doc_a, row in out.iterrows():
        xa = by_id[doc_a]
        xb = by_id[row.doc_b]
        ref = _dcca_np(xa, xb)
        for s in _SS:
            assert abs(row[f"rho_s{s}"] - f6(ref[s])) < 1e-5
        checked += 1
    assert checked >= 55


def test_self_pair_is_one():
    loc = synth.sequences_local(8)
    for i in range(8):
        x = loc.iloc[i].tokens
        if len(x) < _NN:
            continue
        ref = _dcca_np(x, x)
        for s in _SS:
            assert abs(ref[s] - 1.0) < 1e-12


def test_cauchy_schwarz_bounds(spark):
    out = dcca_pairs(spark, "").toPandas()
    for s in _SS:
        assert out[f"rho_s{s}"].abs().max() <= 1.0


def test_planted_coupled_and_anti():
    s_, com, n1, n2 = 999, [], [], []
    for _ in range(_NN):
        s_ = (1103515245 * s_ + 12345) % (1 << 31)
        com.append(s_ >> 16)
        s_ = (1103515245 * s_ + 12345) % (1 << 31)
        n1.append((s_ >> 16) % 2000)
        s_ = (1103515245 * s_ + 12345) % (1 << 31)
        n2.append((s_ >> 16) % 2000)
    com = np.array(com)
    x = com + np.array(n1)
    y = com + np.array(n2)
    ref = _dcca_np(x, y)
    for s in _SS:
        assert ref[s] > 0.9  # shared innovations dominate
    anti = _dcca_np(x, -x + np.array(n2) // 4)
    for s in _SS:
        assert anti[s] < -0.9


def test_honest_decoupled_corpus(spark):
    out = dcca_pairs(spark, "").toPandas()
    assert len(out) >= 55  # 64 pairs minus the <128-token drops
    for s in _SS:
        c = out[f"rho_s{s}"]
        assert abs(c.mean()) < 0.1
        assert c.abs().median() < 0.15
        assert c.abs().max() < 0.6  # no pair reads as coupled
