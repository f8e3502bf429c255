"""Semantic gates for chatterjee_q (TS108): numpy recompute of the
tie-general ξ per doc/direction, the exact (n−2)/(n+1) linear hand
case, the parabola functional-not-monotone gate, the independence
null, and the honest rotation-curve corpus reading."""

import math

import numpy as np

from dtaidistance_spark.operators.chatterjee_q import (
    _CAP,
    _ND,
    _V,
    chatterjee_xi_tokens,
)
from dtaidistance_spark.synth import gen_row

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _xi_ref(x, y):
    """Tie-general ξ with the pinned (x, position) tie-break."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    n = len(x)
    order = np.lexsort((np.arange(n), x))
    ys = y[order]
    r = np.array([(y <= v).sum() for v in ys], dtype=np.int64)
    a = np.array([(y < v).sum() for v in ys], dtype=np.int64)
    s = int(np.abs(np.diff(r)).sum())
    d = int((a * (n - a)).sum())  # Σ l(n−l) with l = n − a
    if d == 0:
        return None
    return 1.0 - n * s / (2.0 * d)


def _rho_ref(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)

    def avg2rank(v):
        return np.array(
            [2 * (v < t).sum() + (v == t).sum() + 1 for t in v],
            dtype=np.int64,
        )

    rx, ry = avg2rank(x), avg2rank(y)
    n = len(x)
    num = n * (rx * ry).sum() - rx.sum() * ry.sum()
    vx = n * (rx * rx).sum() - rx.sum() ** 2
    vy = n * (ry * ry).sum() - ry.sum() ** 2
    # vx·vy exceeds int64 at n ≈ 500 — multiply in float like the
    # engine's CAST(... AS DOUBLE) tree does
    return float(num) / math.sqrt(float(vx) * float(vy))


def test_matches_numpy(spark, sf_dir):
    out = (
        chatterjee_xi_tokens(spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(out) == _ND
    for i in range(0, _ND, 17):
        doc_id, tokens, n, _, _ = gen_row(i)
        v = tokens[:_CAP].astype(np.int64)
        j = np.arange(len(v), dtype=np.int64)
        row = out.loc[doc_id]
        assert row.n_lag == len(v) - 1
        assert abs(row.xi_lag - f6(_xi_ref(v[:-1], v[1:]))) < 1e-6
        assert abs(row.rho_lag - f6(_rho_ref(v[:-1], v[1:]))) < 1e-6
        assert abs(row.xi_pos - f6(_xi_ref(j, v))) < 1e-6
        assert abs(row.xi_posrev - f6(_xi_ref(v, j))) < 1e-6


def test_linear_hand_case():
    # y = x, continuous: S = n−1 exactly, D = n(n²−1)/6 ⇒
    # ξ = 1 − 3/(n+1) = (n−2)/(n+1), exact
    for n in (5, 40, 257):
        x = np.arange(n)
        assert abs(_xi_ref(x, x) - (n - 2) / (n + 1)) < 1e-12
        # and the reversal is the same (|Δr| unchanged)
        assert abs(_xi_ref(x, -x) - (n - 2) / (n + 1)) < 1e-12


def test_parabola_functional_not_monotone():
    # y = (x − n/2)²: exactly functional but non-monotone — ξ high,
    # Spearman ≈ 0: the signature separation
    n = 400
    x = np.arange(n)
    y = (x - n // 2) ** 2
    assert _xi_ref(x, y) > 0.95
    assert abs(_rho_ref(x, y)) < 0.05


def test_independence_null():
    # x, y independent LCG streams: ξ ≈ 0 within 4·√(2/5)/√n both ways
    n = 2000
    seed = 1234567
    x = np.empty(n, dtype=np.int64)
    y = np.empty(n, dtype=np.int64)
    s = seed
    for i in range(n):
        s = (1103515245 * s + 12345) % (1 << 31)
        x[i] = s % 10007
        s = (1103515245 * s + 12345) % (1 << 31)
        y[i] = s % 10007
    bound = 4 * math.sqrt(2.0 / 5.0) / math.sqrt(n)
    assert abs(_xi_ref(x, y)) < bound
    assert abs(_xi_ref(y, x)) < bound


def test_asymmetry_periodic():
    # y = 13-period sinusoid of x: y IS a function of x (ξ(x→y)
    # 0.961) but x given y spreads over 26 preimages (ξ(y→x) −0.11).
    # (The earlier x-mod-8 draft gate was wrong: with the PINNED
    # position tie-break, massive x-ties inside y-classes inflate
    # ξ(y→x) to 0.34 — the documented bias of deterministic
    # tie-breaks; the sinusoid has no x-ties so the gate is clean.)
    n = 2000
    x = np.arange(n)
    y = np.floor(10000 * np.sin(2 * np.pi * x * 13 / n)).astype(
        np.int64
    )
    assert _xi_ref(x, y) > 0.9
    assert abs(_xi_ref(y, x)) < 0.2


def test_honest_rotation_curve(spark):
    out = chatterjee_xi_tokens(spark, "/root/testdata/sf0.01").toPandas()
    f = out.mult_frac.to_numpy()
    curve = 1 - 6 * f * (1 - f)
    # ξ_lag uniformly high and flat: dependence is near-functional
    assert out.xi_lag.median() > 0.97
    assert out.xi_lag.min() > 0.9
    # Spearman on the same pairs sweeps the rotation curve
    assert out.rho_lag.min() < -0.45 and out.rho_lag.max() > 0.99
    assert np.corrcoef(out.rho_lag, curve)[0, 1] > 0.99
    # ξ_pos tracks the SAME curve (the corrected draft guess)
    assert np.corrcoef(out.xi_pos, curve)[0, 1] > 0.99
    # the one near-null dial: position is not a function of token
    assert abs(out.xi_posrev.median()) < 0.15
    # headline contrast: near-half multipliers read ρ ≈ −0.48 for a
    # near-perfectly dependent pair
    half = out[f > 0.4]
    assert len(half) > 5
    assert half.rho_lag.median() < -0.4
    assert half.xi_lag.median() > 0.95


def test_vocab_const():
    assert _V == 50257
