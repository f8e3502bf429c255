"""Semantic gates for stationarity_q (TS63/TS64): numpy recompute of
the DF regression t and the KPSS eta for a stride of series, the
telescoping u_n = 0 identity, and the cross-test 2x2 concordance
honest reading (opposite nulls -> the no-evidence cell is empty)."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.stationarity_q import (
    _N,
    adf_unit_root,
    kpss_level_stat,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def test_adf_matches_numpy(spark, sf_dir):
    out = adf_unit_root(spark, sf_dir).toPandas().set_index("doc_id")
    assert len(out) == _N
    loc = synth.sequences_local(_N)
    for i in range(0, _N, 7):
        r = loc.iloc[i]
        y = r.tokens.astype(np.int64)
        x, d = y[:-1], np.diff(y)
        m = len(x)
        a = m * int(np.dot(x, d)) - int(x.sum()) * int(d.sum())
        b = m * int(np.dot(x, x)) - int(x.sum()) ** 2
        c = m * int(np.dot(d, d)) - int(d.sum()) ** 2
        got = out.loc[r.doc_id]
        assert (got.a_num, got.b_den, got.c_num) == (a, b, c)
        bc = float(c) * float(b) - float(a) * float(a)
        if bc > 0:
            t = float(a) * math.sqrt((m - 2.0) / bc)
            assert abs(got.t_stat - f6(t)) < 1e-6
            assert got.reject_unit_root == (1 if t < -2.86 else 0)


def test_kpss_matches_numpy(spark, sf_dir):
    out = kpss_level_stat(spark, sf_dir).toPandas().set_index("doc_id")
    assert len(out) == _N
    loc = synth.sequences_local(_N)
    for i in range(0, _N, 7):
        r = loc.iloc[i]
        y = r.tokens.astype(np.int64)
        n = len(y)
        s1 = int(y.sum())
        p = np.cumsum(y)
        u = n * p - np.arange(1, n + 1, dtype=np.int64) * s1
        assert int(u[-1]) == 0  # telescoping: S_n = 0 exactly
        q = int(sum(int(v) * int(v) for v in u))
        got = out.loc[r.doc_id]
        assert got.s1 == s1
        assert int(got.q) == q  # exact digit string
        m2 = n * int((y.astype(object) ** 2).sum()) - s1 * s1
        assert got.m2 == m2
        eta = float(q) / (float(n) * float(n) * float(m2))
        assert abs(got.eta - f6(eta)) < 1e-6
        assert got.reject_stationary == (1 if eta > 0.463 else 0)


def test_concordance_honest_reading(spark, sf_dir):
    adf = (
        adf_unit_root(spark, sf_dir)
        .toPandas()
        .set_index("doc_id")["reject_unit_root"]
    )
    kp = (
        kpss_level_stat(spark, sf_dir)
        .toPandas()
        .set_index("doc_id")["reject_stationary"]
    )
    tab = {
        (a, k): int(((adf == a) & (kp == k)).sum())
        for a in (0, 1)
        for k in (0, 1)
    }
    # concordant-stationary majority (sawtooths), a real
    # concordant-nonstationary minority (the unwrapped ramps), and an
    # EMPTY no-evidence cell — every series is long enough to speak
    assert tab[(1, 0)] > 0.9 * _N
    assert tab[(0, 1)] >= 5
    assert tab[(0, 0)] == 0
    assert sum(tab.values()) == _N


def test_hand_case():
    # the 5-element probe that exposed the DuckDB sequential-struct
    # hazard: y=[3,1,4,1,5], n=5, s1=14 -> u=[1,-8,-2,-11,0], Q=190
    y = np.array([3, 1, 4, 1, 5], dtype=np.int64)
    p = np.cumsum(y)
    u = 5 * p - np.arange(1, 6) * 14
    assert u.tolist() == [1, -8, -2, -11, 0]
    assert int((u * u).sum()) == 190
