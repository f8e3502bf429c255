"""Semantic gates for runstest_q (TS91): independent numpy recompute
of every emitted number, the interleaved-levels max-positive hand
case, the two-block minimum-runs case, an LCG white-noise null at
~nominal rejection, and the honest corpus reading with its
step↔sign mechanism."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.runstest_q import _N, runs_test

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731
V = synth.VOCAB


def _runs_np(y):
    """Textbook Wald–Wolfowitz at the low median, ties dropped."""
    y = np.asarray(y, dtype=np.int64)
    n = len(y)
    med = np.sort(y)[(n + 1) // 2 - 1]
    s = np.sign(y - med)
    s = s[s != 0]
    m = len(s)
    n1 = int((s > 0).sum())
    n2 = m - n1
    if m < 20 or n1 == 0 or n2 == 0:
        return None
    r = 1 + int((s[1:] != s[:-1]).sum())
    two = 2 * n1 * n2
    if two - m <= 0:
        return None
    mu = two / m + 1
    var = two * (two - m) / (m * m * (m - 1))
    return med, m, n1, n2, r, mu, (r - mu) / math.sqrt(var)


def test_matches_numpy(spark):
    out = runs_test(spark, "").toPandas().set_index("doc_id")
    loc = synth.sequences_local(_N)
    checked = 0
    for i in range(0, _N, 7):
        row_l = loc.iloc[i]
        ref = _runs_np(row_l.tokens)
        row = out.loc[row_l.doc_id]
        assert ref is not None
        med, m, n1, n2, r, mu, z = ref
        assert row.med == med and row.m == m
        assert row.n_above == n1 and row.n_below == n2
        assert row.n_runs == r
        assert abs(row.mu_runs - f6(mu)) < 1e-6
        assert abs(row.z_runs - f6(z)) < 1e-5
        checked += 1
    assert checked >= 70


def test_interleaved_levels_max_positive():
    # lows 0..49 interleaved with highs 1000..1049: every tick crosses
    # the median → R ≈ m, z near its positive maximum ≈ sqrt(m)
    y = np.empty(100, dtype=np.int64)
    y[0::2] = np.arange(50)
    y[1::2] = 1000 + np.arange(50)
    med, m, n1, n2, r, mu, z = _runs_np(y)
    assert r >= m - 2  # the dropped median element can merge one pair
    assert z > 9


def test_two_blocks_min_runs():
    # 50 lows then 50 highs: R = 2, z near its negative minimum
    y = np.concatenate([np.arange(50), 1000 + np.arange(50)]).astype(np.int64)
    med, m, n1, n2, r, mu, z = _runs_np(y)
    assert r == 2
    assert z < -9


def test_lcg_null_nominal():
    # LCG white noise: the test should reject at ~the nominal 5%
    s, rejects, total = 99991, 0, 0
    for _ in range(120):
        vals = []
        for _ in range(400):
            s = (1103515245 * s + 12345) % (1 << 31)
            vals.append(s >> 16)
        ref = _runs_np(np.array(vals, dtype=np.int64))
        if ref is None:
            continue
        total += 1
        if abs(ref[6]) > 1.959963984540054:
            rejects += 1
    assert total >= 100
    assert rejects / total < 0.12


def test_honest_corpus_step_mechanism(spark):
    out = runs_test(spark, "").toPandas().set_index("doc_id")
    # 94% reject, split symmetrically between too-few and too-many runs
    rate = out.reject_random.mean()
    assert 0.88 < rate < 0.98
    assert 0.4 < (out.z_runs > 0).mean() < 0.6
    assert out.z_runs.min() < -50 and out.z_runs.max() > 50
    # the mechanism: z's sign follows the congruential step size hm
    step = np.array(
        [min(synth.doc_hash(d) % V, V - synth.doc_hash(d) % V)
         for d in out.index]
    )
    assert np.corrcoef(step, out.z_runs)[0, 1] > 0.8
    big, small = out[step > V / 3], out[step < V / 16]
    assert len(big) > 100 and (big.z_runs > 0).all()
    assert len(small) > 50 and (small.z_runs < 0).all()
