"""Semantic gates for transferentropy_q (TS96): independent
Counter-based recompute of both directions for every pair, the
decisive lag-1-copy directional split (with its bijection twin),
the iid LCG null, TE ≥ 0 and the conditioning inequality, and the
honest no-arrow corpus reading."""

import math
from collections import Counter

import numpy as np

from dtaidistance_spark.operators.transferentropy_q import (
    _L,
    _M,
    _ND,
    transfer_entropy_pairs,
)
from dtaidistance_spark import synth

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731
_CHI36 = 50.998460165711464


def _te_np(src, tgt):
    """Textbook plug-in TE_{src→tgt} over fold-4 symbols — Counter
    route, none of the query's fold machinery."""
    x = np.asarray(src[:_L]) % _M
    y = np.asarray(tgt[:_L]) % _M
    n = _L - 1
    trip = Counter(zip(y[1:].tolist(), y[:-1].tolist(), x[:-1].tolist()))
    pyx = Counter(zip(y[:-1].tolist(), x[:-1].tolist()))
    pyy = Counter(zip(y[1:].tolist(), y[:-1].tolist()))
    my = Counter(y[:-1].tolist())
    te = 0.0
    for (yp, yc, xc), c in trip.items():
        te += (c / n) * math.log(
            c * my[yc] / (pyx[(yc, xc)] * pyy[(yp, yc)])
        )
    bias = (len(trip) - len(pyx) - len(pyy) + len(my)) / (2 * n)
    return te, bias, len(trip)


def test_matches_numpy(spark):
    out = transfer_entropy_pairs(spark, "").toPandas().set_index("doc_a")
    loc = synth.sequences_local(_ND)
    by_id = {r.doc_id: r.tokens for r in loc.itertuples()}
    checked = 0
    for doc_a, row in out.iterrows():
        xa, xb = by_id[doc_a], by_id[row.doc_b]
        te_xy, b_xy, mj_xy = _te_np(xa, xb)
        te_yx, b_yx, mj_yx = _te_np(xb, xa)
        assert row.mj_xy == mj_xy and row.mj_yx == mj_yx
        assert abs(row.te_xy - f6(te_xy)) < 1e-5
        assert abs(row.te_yx - f6(te_yx)) < 1e-5
        assert abs(row.bias_xy - f6(b_xy)) < 1e-6
        assert abs(row.te_net - f6(te_xy - te_yx)) < 2e-5
        assert row.reject_noflow_xy == int(
            2 * (_L - 1) * te_xy > _CHI36
        )
        checked += 1
    assert checked >= 38


def _lcg_seq(n, seed):
    s, out = seed, []
    for _ in range(n):
        s = (1103515245 * s + 12345) % (1 << 31)
        out.append(s >> 16)
    return np.array(out)


def test_lag1_copy_directional_split():
    # y_{t+1} = x_t: x's present fully determines y's next symbol →
    # TE_{x→y} ≈ ln 4 while TE_{y→x} stays at the floor
    x = _lcg_seq(_L, 99)
    y = np.roll(x, 1)
    te_fwd, _, _ = _te_np(x, y)
    te_bwd, b_bwd, _ = _te_np(y, x)
    assert te_fwd > 0.9 * math.log(_M)
    assert te_bwd < 3 * b_bwd + 0.05
    # bijection twin: y_{t+1} = (5x_t + 3) mod 4 reads the same arrow
    y2 = np.roll((5 * (x % _M) + 3) % _M, 1)
    te2, _, _ = _te_np(x, y2)
    assert te2 > 0.9 * math.log(_M)


def test_iid_null_and_nonnegativity():
    rejects, n_runs = 0, 60
    for k in range(n_runs):
        x = _lcg_seq(_L, 2000 + k)
        y = _lcg_seq(_L, 7000 + k)
        te, bias, _ = _te_np(x, y)
        assert te >= 0.0  # plug-in TE of counts is a KL — nonnegative
        rejects += int(2 * (_L - 1) * te > _CHI36)
    assert rejects / n_runs < 0.15


def test_honest_no_arrow(spark):
    out = transfer_entropy_pairs(spark, "").toPandas()
    assert len(out) >= 38
    for t in ["xy", "yx"]:
        assert 0.015 < out[f"te_{t}"].median() < 0.05
        assert out[f"te_{t}"].max() < 0.15  # far below the ln 4 ceiling
        # at the bias floor
        assert (
            abs(out[f"te_{t}"].median() - out[f"bias_{t}"].median())
            < 0.02
        )
        # serial-correlation inflation: above nominal, below 30%
        assert 0.02 < out[f"reject_noflow_{t}"].mean() < 0.30
    # no systematic arrow
    assert abs(out.te_net.median()) < 0.01
    assert out.te_net.abs().max() < 0.1
