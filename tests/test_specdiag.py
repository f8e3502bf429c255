"""Semantic gates for specdiag_q: Ljung-Box recomputed on the float
route (numpy ACF with global mean), spectral entropy vs a direct
Goertzel recompute, and the statistical readings both tests exist to
give."""

import math

import numpy as np
import pytest

from dtaidistance_spark import synth
from dtaidistance_spark.operators.specdiag_q import (
    _LAGS,
    _LBN,
    _N,
    ljung_box,
    spectral_entropy,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _lb_ref(x):
    x = np.asarray(x[:_LBN], dtype=float)
    n = len(x)
    xc = x - x.mean()
    c0 = (xc * xc).sum()
    rs = {}
    for k in _LAGS:
        rs[k] = (xc[: n - k] * xc[k:]).sum() / c0
    q = n * (n + 2) * sum(rs[k] ** 2 / (n - k) for k in _LAGS)
    return n, rs, q


def test_ljung_box_matches_float_route(spark, sf_dir):
    out = ljung_box(spark, sf_dir).toPandas().set_index("doc_id")
    assert len(out) == _N
    loc = synth.sequences_local(_N)
    for row in list(loc.itertuples())[::7]:
        n, rs, q = _lb_ref(row.tokens.tolist())
        got = out.loc[row.doc_id]
        assert got.nn == n
        for k in _LAGS:
            assert got[f"r_{k}"] == pytest.approx(rs[k], abs=2e-6), (
                row.doc_id,
                k,
            )
        assert got.q_lb == pytest.approx(q, rel=1e-5)
        assert got.reject_white == (1 if q > 15.5073 else 0)


def test_ljung_box_rejects_on_structured_series(spark, sf_dir):
    """The period-64 modular ramps are strongly autocorrelated at the
    tested lags — LB must reject whiteness essentially everywhere."""
    out = ljung_box(spark, sf_dir).toPandas()
    assert out["reject_white"].mean() > 0.95
    assert (out["den"] > 0).all()


def _goertzel_pw(x, period):
    c = 2 * math.cos(2 * math.pi / period)
    s1 = s2 = 0.0
    for v in x:
        s1, s2 = v + c * s1 - s2, s1
    return s1 * s1 + s2 * s2 - c * s1 * s2


def test_spectral_entropy_matches_recompute(spark, sf_dir):
    out = spectral_entropy(spark, sf_dir).toPandas().set_index("doc_id")
    assert len(out) == _N
    loc = synth.sequences_local(_N)
    for row in list(loc.itertuples())[::9]:
        x = row.tokens.tolist()
        nc = len(x) - len(x) % 64
        x = [float(v) for v in x[:nc]]
        pws = {p: _goertzel_pw(x, p) for p in (64, 32, 16, 8)}
        got = out.loc[row.doc_id]
        for p, pw in pws.items():
            assert got[f"pw_{p}"] == pytest.approx(pw, rel=1e-9), (
                row.doc_id,
                p,
            )
        tot = sum(pws.values())
        h = -sum(
            (v / tot) * math.log(v / tot)
            for v in pws.values()
            if v > 0
        ) / math.log(4)
        assert got.spec_entropy == pytest.approx(h, abs=2e-6)
        assert 0 <= got.spec_entropy <= 1 + 1e-9
