"""Semantic gates for hpfilter_q (TS72): the first-order optimality
condition checked elementwise, the exact variance decomposition, the
lambda limits (0 -> identity; inf -> the OLS line), and the query
audit row vs a local recompute."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.hpfilter_q import (
    _CAP,
    _LAM,
    _N,
    _dtd,
    hp_filter,
    hp_trend,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def test_optimality_and_limits():
    loc = synth.sequences_local(16)
    for i in range(16):
        y = loc.iloc[i].tokens[:200].astype(np.float64)
        n = len(y)
        tau = hp_trend(y)
        # gradient of the objective must vanish: (tau-y) + lam*DtD tau = 0
        g = (tau - y) + _LAM * (_dtd(n) @ tau)
        assert float(np.abs(g).max()) < 1e-6 * max(1.0, np.abs(y).max())
        # variance decomposition with the cross term pinned
        c = y - tau
        lhs = ((y - y.mean()) ** 2).sum()
        rhs = ((tau - tau.mean()) ** 2).sum() + (c**2).sum() + 2 * float(
            np.dot(tau - tau.mean(), c)
        )
        # note c has mean ~0 (the smoother preserves the mean)
        assert abs(c.mean()) < 1e-8 * max(1.0, np.abs(y).mean())
        assert abs(lhs - rhs) < 1e-6 * max(1.0, lhs)
    # lambda -> 0: trend = series
    y = loc.iloc[0].tokens[:100].astype(np.float64)
    assert float(np.abs(hp_trend(y, 1e-12) - y).max()) < 1e-6
    # lambda -> inf: the OLS line (1e10, not 1e14 — beyond that the
    # identity block falls under float64 eps of the lam*DtD entries
    # and the dense solve degrades, observed live)
    t_inf = hp_trend(y, 1e10)
    x = np.arange(len(y))
    slope = np.polyfit(x, y, 1)[0]
    fit_slope = (t_inf[-1] - t_inf[0]) / (len(y) - 1)
    assert abs(fit_slope - slope) < 1e-2 * max(1.0, abs(slope))
    d2 = np.diff(t_inf, 2)
    assert float(np.abs(d2).max()) < 1e-3


def test_query_matches_local(spark, sf_dir):
    out = hp_filter(spark, sf_dir).toPandas().set_index("doc_id")
    assert len(out) == _N
    loc = synth.sequences_local(_N)
    for i in range(0, _N, 47):
        r = loc.iloc[i]
        y = r.tokens[:_CAP].astype(np.float64)
        tau = hp_trend(y)
        c = y - tau
        d2 = np.diff(tau, 2)
        g = out.loc[r.doc_id]
        assert g.l == len(y)
        assert abs(g.trend_checksum - f6(np.abs(tau).sum())) < 1e-3
        assert abs(g.cycle_energy - f6((c * c).sum())) < 1e-3 * max(
            1.0, (c * c).sum()
        )
        assert abs(g.smoothness - f6((d2 * d2).sum())) < 1e-3 * max(
            1.0, (d2 * d2).sum()
        )
        assert 0.0 <= g.trend_var_share <= 1.001
