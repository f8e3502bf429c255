"""Semantic gates for pelt_q (TS71): EXHAUSTIVE O(n^2) optimal-
partitioning DP equality (cost and changepoint set) on real series,
the objective-dominance properties, and a planted-shift hand case."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.pelt_q import _CAP, _N, pelt_l2, pelt_changepoints

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _brute(x, beta):
    """Exhaustive optimal partitioning (no pruning) — the ground
    truth PELT must equal exactly."""
    n = len(x)
    p1 = np.concatenate([[0], np.cumsum(x)]).astype(np.int64)
    p2 = np.concatenate([[0], np.cumsum(x.astype(np.int64) ** 2)])

    def c(s, t):
        d = float(p1[t] - p1[s])
        return float(p2[t] - p2[s]) - d * d / (t - s)

    f = [-beta] + [None] * n
    last = [0] * (n + 1)
    for t in range(1, n + 1):
        best, bs = None, 0
        for s in range(t):
            v = f[s] + c(s, t) + beta
            if best is None or v < best:
                best, bs = v, s
        f[t] = best
        last[t] = bs
    cps = []
    t = n
    while t > 0:
        if last[t] > 0:
            cps.append(last[t])
        t = last[t]
    return sorted(cps), f[n]


def test_pelt_equals_exhaustive_dp():
    loc = synth.sequences_local(24)
    for i in range(24):
        x = loc.iloc[i].tokens[:160].astype(np.int64)
        var = float(x.var())
        beta = 2.0 * var * math.log(len(x)) if var > 0 else 1.0
        cps_p, cost_p = pelt_l2(x, beta)
        cps_b, cost_b = _brute(x, beta)
        assert cps_p == cps_b
        assert abs(cost_p - cost_b) < 1e-6 * max(1.0, abs(cost_b))
        # dominance: optimal <= no-split and <= any single split
        p1 = np.concatenate([[0], np.cumsum(x)]).astype(np.float64)
        p2 = np.concatenate(
            [[0], np.cumsum(x.astype(np.int64) ** 2)]
        ).astype(np.float64)
        n = len(x)
        cseg = lambda s, t: p2[t] - p2[s] - (p1[t] - p1[s]) ** 2 / (t - s)  # noqa: E731
        tol = 1e-9 * max(1.0, abs(cost_p))
        assert cost_p <= cseg(0, n) + tol
        one = min(
            cseg(0, k) + cseg(k, n) + beta for k in range(1, n)
        )
        assert cost_p <= one + tol


def test_query_shape_and_planted_shift(spark, sf_dir):
    out = pelt_changepoints(spark, sf_dir).toPandas()
    assert len(out) == _N
    assert (out.l <= _CAP).all()
    assert (out.n_changepoints >= 0).all()
    # the emitted cost equals a local recompute for a stride of docs
    loc = synth.sequences_local(_N)
    got = out.set_index("doc_id")
    for i in range(0, _N, 37):
        r = loc.iloc[i]
        x = r.tokens[:_CAP].astype(np.int64)
        var = float(x.var())
        beta = 2.0 * var * math.log(len(x)) if var > 0 else 1.0
        cps, cost = pelt_l2(x, beta)
        g = got.loc[r.doc_id]
        assert g.penalized_cost == f6(cost)
        assert g.n_changepoints == len(cps)
        want = ",".join(str(c) for c in cps[:64])
        assert g.changepoints == want
    # planted shifts: three constant segments → exactly two
    # changepoints at the seams
    x = np.array([100] * 50 + [500] * 50 + [100] * 50, dtype=np.int64)
    beta = 2.0 * float(x.var()) * math.log(len(x))
    cps, cost = pelt_l2(x, beta)
    assert cps == [50, 100]
    assert abs(cost - 2 * beta) < 1e-9  # three zero-cost segments
