"""Semantic gates for symbolicmi_q (TS95): independent numpy
recompute of every emitted number, the G = 2L·MI identity, the
balanced-diagonal MI = ln 8 exact case (and its bijection twin),
the iid LCG null at ~nominal, and the honest at-the-bias-floor
corpus reading."""

import math
from collections import Counter

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.symbolicmi_q import (
    _L,
    _M,
    _ND,
    symbolic_mi_pairs,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731
_CHI49 = 66.33864907355117


def _mi_np(x, y):
    """Textbook plug-in MI over fold-8 symbols of the first L aligned
    positions — Counter-based, none of the query's fold machinery."""
    a = np.asarray(x[:_L]) % _M
    b = np.asarray(y[:_L]) % _M
    jc = Counter(zip(a.tolist(), b.tolist()))
    ac = Counter(a.tolist())
    bc = Counter(b.tolist())
    mi = 0.0
    for (p, q), n in jc.items():
        mi += (n / _L) * math.log(n * _L / (ac[p] * bc[q]))
    mm = (len(jc) - len(ac) - len(bc) + 1) / (2 * _L)
    return mi, 2 * _L * mi, mm, len(jc), len(ac), len(bc)


def test_matches_numpy(spark):
    out = symbolic_mi_pairs(spark, "").toPandas().set_index("doc_a")
    loc = synth.sequences_local(_ND)
    by_id = {r.doc_id: r.tokens for r in loc.itertuples()}
    checked = 0
    for doc_a, row in out.iterrows():
        mi, g, mm, mab, ma, mb = _mi_np(by_id[doc_a], by_id[row.doc_b])
        assert row.m_ab == mab and row.m_a == ma and row.m_b == mb
        assert abs(row.mi_nats - f6(mi)) < 1e-5
        assert abs(row.g_stat - f6(g)) < 1e-2
        assert abs(row.mm_bias - f6(mm)) < 1e-6
        assert row.reject_independent == int(g > _CHI49)
        checked += 1
    assert checked >= 38
    # full marginals at this L (the guard that cannot fire)
    assert (out.m_a == _M).all() and (out.m_b == _M).all()


def test_diagonal_and_bijection_read_ln8():
    # balanced ramp vs itself: joint is the diagonal, MI = ln 8 exact
    x = np.arange(_L) % 64  # balanced over mod-8 classes
    mi, g, _, _, _, _ = _mi_np(x, x)
    assert abs(mi - math.log(_M)) < 1e-12
    # any bijection of the symbols reads the same — MI sees coupling
    # correlation cannot: y = (5x+3) mod 8 is a permutation
    y = (5 * (x % _M) + 3) % _M
    mi2, _, _, _, _, _ = _mi_np(x, y)
    assert abs(mi2 - math.log(_M)) < 1e-12


def test_iid_lcg_null_nominal():
    s, rejects, mis, mms = 31337, 0, [], []
    for _ in range(80):
        vals = []
        for _ in range(2 * _L):
            s = (1103515245 * s + 12345) % (1 << 31)
            vals.append(s >> 16)
        x, y = np.array(vals[:_L]), np.array(vals[_L:])
        mi, g, mm, _, _, _ = _mi_np(x, y)
        mis.append(mi)
        mms.append(mm)
        rejects += int(g > _CHI49)
    assert rejects / 80 < 0.15
    # plug-in MI sits at the Miller–Madow bias floor under the null
    assert abs(np.mean(mis) - np.mean(mms)) < 0.02


def test_honest_at_bias_floor(spark):
    out = symbolic_mi_pairs(spark, "").toPandas()
    assert len(out) >= 38
    assert 0.02 < out.mi_nats.median() < 0.06
    assert out.mi_nats.max() < 0.15  # nowhere near the ln 8 ceiling
    # measured MI indistinguishable from estimator bias
    assert abs(out.mi_nats.median() - out.mm_bias.median()) < 0.02
    # mild serial-correlation inflation of the iid null: above nominal,
    # below 25%
    assert 0.02 < out.reject_independent.mean() < 0.25
