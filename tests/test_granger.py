"""Semantic gates for granger_q (TS65): numpy least-squares recompute
of both direction F statistics for every pair (via actual lstsq
residuals, not the cleared-Gram shortcut — an independent route), the
nominal-rate honest reading on independent pairs, and a hand case
with a genuinely causal pair."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.granger_q import _ND, granger_pairs

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _f_lstsq(z, u, w):
    """Wald F via raw least-squares residuals (independent route)."""
    m = len(z)
    one = np.ones(m)
    xr = np.column_stack([one, u])
    xu = np.column_stack([one, u, w])
    rr = z - xr @ np.linalg.lstsq(xr, z, rcond=None)[0]
    ru = z - xu @ np.linalg.lstsq(xu, z, rcond=None)[0]
    sse_r, sse_u = float(rr @ rr), float(ru @ ru)
    return (sse_r - sse_u) * (m - 3) / sse_u


def test_matches_lstsq(spark, sf_dir):
    out = granger_pairs(spark, sf_dir).toPandas().set_index("doc_a")
    assert len(out) == _ND // 2
    loc = synth.sequences_local(_ND)
    toks = {r.doc_id: r.tokens.astype(np.float64) for r in loc.itertuples()}
    ids = sorted(toks)
    rej = {"ab": 0, "ba": 0}
    for p in range(_ND // 2):
        da, db = ids[2 * p], ids[2 * p + 1]
        va, vb = toks[da], toks[db]
        ln = min(len(va), len(vb))
        a, b = va[:ln], vb[:ln]
        got = out.loc[da]
        assert got.doc_b == db and got.m == ln - 1
        f_ab = _f_lstsq(b[1:], b[:-1], a[:-1])
        f_ba = _f_lstsq(a[1:], a[:-1], b[:-1])
        # lstsq route accumulates differently — loose-but-tight bound
        assert abs(got.f_ab - f_ab) < 1e-4 * max(1.0, abs(f_ab))
        assert abs(got.f_ba - f_ba) < 1e-4 * max(1.0, abs(f_ba))
        crit = 1.96 * 1.96
        assert got.reject_ab == (1 if got.f_ab > crit else 0)
        assert got.reject_ba == (1 if got.f_ba > crit else 0)
        rej["ab"] += int(got.reject_ab)
        rej["ba"] += int(got.reject_ba)
    # honest reading: independent pairs → ≈ nominal 5% rejections in
    # each direction (allow up to 15%)
    assert rej["ab"] <= 0.15 * (_ND // 2)
    assert rej["ba"] <= 0.15 * (_ND // 2)


def test_hand_causal_case():
    # b follows a with lag 1 (plus own decay): A→B must reject loudly,
    # B→A must not — the asymmetry IS Granger causality
    rng = np.random.RandomState(7)
    n = 400
    a = rng.randn(n).cumsum()  # persistent driver
    b = np.zeros(n)
    for t in range(1, n):
        b[t] = 0.5 * b[t - 1] + 0.9 * a[t - 1] + 0.1 * rng.randn()
    f_ab = _f_lstsq(b[1:], b[:-1], a[:-1])
    f_ba = _f_lstsq(a[1:], a[:-1], b[:-1])
    assert f_ab > 100.0
    assert f_ba < f_ab / 10.0
