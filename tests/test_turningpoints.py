"""Semantic gates for turningpoints_q (TS102): numpy recompute of
every emitted number, closed hand cases (alternation ceiling,
monotone zero), the LCG null at ~nominal, and the honest
asymmetric-tails + median-deficit reading vs the runs test."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.runstest_q import runs_test
from dtaidistance_spark.operators.turningpoints_q import (
    _N,
    turning_points_test,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _tp_np(y):
    y = np.asarray(y, dtype=np.int64)
    n = len(y)
    a, b, c = y[:-2], y[1:-1], y[2:]
    t = int((((a < b) & (b > c)) | ((a > b) & (b < c))).sum())
    ties = int((y[1:] == y[:-1]).sum())
    e = 2 * (n - 2) / 3.0
    v = (16 * n - 29) / 90.0
    return t, ties, e, (t - e) / math.sqrt(v)


def test_matches_numpy(spark):
    out = turning_points_test(spark, "").toPandas().set_index("doc_id")
    loc = synth.sequences_local(_N)
    checked = 0
    for i in range(0, _N, 7):
        row_l = loc.iloc[i]
        t, ties, e, z = _tp_np(row_l.tokens)
        row = out.loc[row_l.doc_id]
        assert row.tp == t and row.ties == ties
        assert abs(row.expected_tp - f6(e)) < 1e-6
        assert abs(row.z_turning - f6(z)) < 1e-5
        assert row.reject_random == int(abs(z) > 1.959963984540054)
        checked += 1
    assert checked >= 70


def test_closed_hand_cases():
    # strict alternation: every interior point is a turning point
    t, _, e, z = _tp_np(np.tile([1, 5], 100))
    assert t == 198  # = n − 2, the ceiling
    assert z > 0
    # monotone: zero turning points, the floor (2× further from E)
    t2, _, _, z2 = _tp_np(np.arange(200))
    assert t2 == 0
    assert abs(z2) > 2 * abs(z) * 0.9  # structural tail asymmetry
    # plateau: ties produce neither peak nor pit
    t3, ties3, _, _ = _tp_np(np.array([1, 3, 3, 3, 1]))
    assert t3 == 0 and ties3 == 2


def test_lcg_null_nominal():
    s, rejects = 77, 0
    for _ in range(100):
        vals = []
        for _ in range(500):
            s = (1103515245 * s + 12345) % (1 << 31)
            vals.append(s >> 16)
        _, _, _, z = _tp_np(np.array(vals))
        rejects += int(abs(z) > 1.959963984540054)
    assert rejects / 100 < 0.12


def test_honest_local_deficit_vs_runs(spark):
    tp = turning_points_test(spark, "").toPandas().set_index("doc_id")
    rt = runs_test(spark, "").toPandas().set_index("doc_id")
    assert 0.88 < tp.reject_random.mean() < 0.98
    assert tp.z_turning.min() < -100 and tp.z_turning.max() > 40
    assert tp.ties.sum() < 100  # strictness is negligible here
    j = tp.join(rt[["z_runs"]])
    # the pair correlates strongly yet reads DIFFERENT physics:
    assert np.corrcoef(j.z_turning, j.z_runs)[0, 1] > 0.9
    # the local-deficit median shift the runs test cannot see
    assert tp.z_turning.median() < -8
    assert abs(rt.z_runs.median()) < 2
    # docs that pass runs but fail turning points exist in numbers
    both = j[(j.z_runs.abs() < 1.96) & (j.z_turning.abs() > 1.96)]
    assert len(both) > 10
