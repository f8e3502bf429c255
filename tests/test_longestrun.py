"""Semantic gates for longestrun_q (TS106): numpy recompute of all
three lengths and both p's, the LCG null calibration of the
Erdős–Rényi approximation, closed hand cases, and the honest
anti-clustered corpus reading with its monotone-ascent surprise."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.longestrun_q import (
    _N,
    longest_run_extremes,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _runs_np(y):
    y = np.asarray(y, dtype=np.int64)
    n = len(y)
    med = np.sort(y)[(n + 1) // 2 - 1]
    s = np.sign(y - med)
    s = s[s != 0]
    m = len(s)
    l_same = cur = 0
    prev = 9
    for x in s:
        cur = cur + 1 if x == prev else 1
        l_same = max(l_same, cur)
        prev = x
    def longest(op):
        best = cur = 0
        for j in range(n - 1):
            if op(y[j + 1], y[j]):
                cur += 1
                best = max(best, cur)
            else:
                cur = 0
        return best
    l_asc = longest(lambda a, b: a > b)
    l_desc = longest(lambda a, b: a < b)
    p_long = 1 - math.exp(-m * 2.0 ** (-l_same))
    p_short = math.exp(-m * 2.0 ** (-(l_same + 1)))
    return m, l_same, l_asc, l_desc, p_long, p_short


def test_matches_numpy(spark):
    out = longest_run_extremes(spark, "").toPandas().set_index("doc_id")
    loc = synth.sequences_local(_N)
    checked = 0
    for i in range(0, _N, 7):
        row_l = loc.iloc[i]
        m, ls, la, ld, pl, ps = _runs_np(row_l.tokens)
        row = out.loc[row_l.doc_id]
        assert row.m == m and row.l_same == ls
        assert row.l_asc == la and row.l_desc == ld
        assert abs(row.p_too_long - f6(pl)) < 1e-6
        assert abs(row.p_too_short - f6(ps)) < 1e-6
        checked += 1
    assert checked >= 70


def test_lcg_null_calibration():
    # the exp(−m·2^{−k}) approximation: E[L] ≈ log2 m + 0.33,
    # two-sided rejects ~< 12%
    s, lens, rejects = 123, [], 0
    for _ in range(100):
        vals = []
        for _ in range(1024):
            s = (1103515245 * s + 12345) % (1 << 31)
            vals.append(s >> 16)
        m, ls, _, _, pl, ps = _runs_np(np.array(vals))
        lens.append(ls)
        rejects += int(pl < 0.025 or ps < 0.025)
    mean_l = float(np.mean(lens))
    assert abs(mean_l - (math.log2(1024) + 0.33)) < 1.2
    assert rejects / 100 < 0.12


def test_closed_hand_cases():
    # two-level alternation: signs alternate → longest same run = 1
    y = np.empty(100, dtype=np.int64)
    y[0::2] = np.arange(50)
    y[1::2] = 1000 + np.arange(50)
    _, ls, la, ld, _, _ = _runs_np(y)
    assert ls <= 2  # the dropped median element can merge one pair
    # strict ramp: one long − block then one long + block; every
    # step an ascent
    y2 = np.arange(200, dtype=np.int64) * 3 + 7
    m2, ls2, la2, ld2, pl2, _ = _runs_np(y2)
    assert la2 == 199 and ld2 == 0
    assert ls2 == 100  # the + half (− half is 99 after tie-strip)
    assert pl2 < 1e-6


def test_honest_anticlustered_with_ascent_surprise(spark):
    out = longest_run_extremes(spark, "").toPandas()
    assert 0.84 < out.reject_random.mean() < 0.95
    # the majority rejects on the too-SHORT side
    assert (out.p_too_short < 0.025).mean() > 0.7
    assert 0.03 < (out.p_too_long < 0.025).mean() < 0.15
    assert out.l_same.median() <= 4  # anti-clustered bulk
    assert out.l_same.max() > 500  # the smooth-excursion tail
    # the monotone-ascent surprise: hundreds of strictly rising steps
    assert out.l_asc.max() > 300
    assert out.l_desc.max() > 300
