"""Semantic gates for pettitt_q (TS57): naive O(n^2) double-sum
recompute of U_t + the Pettitt identity + verdict structure."""

import math

import numpy as np
import pytest

from dtaidistance_spark import synth
from dtaidistance_spark.operators.pettitt_q import (
    _CAP,
    _N,
    pettitt_changepoint,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _naive(x):
    x = np.asarray(x[:_CAP], dtype=np.int64)
    n = len(x)
    sg = np.sign(x[:, None] - x[None, :])
    us = []
    for t in range(1, n):
        us.append(int(sg[:t, t:].sum()))
    k = max(abs(u) for u in us)
    t_star = next(i + 1 for i, u in enumerate(us) if abs(u) == k)
    p = 2 * math.exp(-6 * k * k / (n**3 + n**2))
    return n, k, t_star, p


def test_matches_naive_double_sum(spark, sf_dir):
    out = (
        pettitt_changepoint(spark, sf_dir).toPandas().set_index("doc_id")
    )
    assert len(out) == _N
    loc = synth.sequences_local(_N)
    for row in list(loc.itertuples())[::11]:
        n, k, t_star, p = _naive(row.tokens.tolist())
        got = out.loc[row.doc_id]
        assert got.nn == n
        assert got.k_stat == k, row.doc_id
        assert got.t_star == t_star, row.doc_id
        assert got.p_approx == pytest.approx(f6(p), abs=2e-6)
        assert got.reject_stable == (1 if p < 0.05 else 0)


def test_pettitt_structure(spark, sf_dir):
    """K bounded by the max possible t(n-t) pair count; t* a valid
    interior split; the stationary-by-construction ramps mostly do
    NOT reject (the median-level is stable within a series), though
    the long-period seasonal phase lets a minority trip 0.05."""
    out = pettitt_changepoint(spark, sf_dir).toPandas()
    assert (out["t_star"] >= 1).all()
    assert (out["t_star"] <= out["nn"] - 1).all()
    maxk = (out["nn"] // 2) * (out["nn"] - out["nn"] // 2)
    assert (out["k_stat"] <= maxk).all()
    assert (out["p_approx"] <= 2.0).all()
    assert 0 < out["reject_stable"].mean() < 1
