"""Semantic gates for seasonalmk_q (TS69): a SEASON-LOOP numpy
recompute (the textbook per-season formulation — independent of the
elementwise stride form), the group-form tie identity, and the
ramp-isolating honest reading."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.seasonalmk_q import (
    _CAP,
    _N,
    _P,
    seasonal_mann_kendall,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _season_loop(v):
    """Textbook Hirsch-Slack: loop seasons, sum S and variance parts."""
    s = tie18 = base18 = 0
    for g in range(_P):
        xg = v[g::_P]
        m = len(xg)
        base18 += m * (m - 1) * (2 * m + 5)
        for i in range(m):
            for j in range(i + 1, m):
                s += int(np.sign(xg[j] - xg[i]))
        _vals, cnts = np.unique(xg, return_counts=True)
        tie18 += int(sum(t * (t - 1) * (2 * t + 5) for t in cnts))
    return s, tie18, base18


def test_matches_season_loop(spark, sf_dir):
    out = (
        seasonal_mann_kendall(spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
    )
    assert len(out) == _N
    loc = synth.sequences_local(_N)
    trends = set()
    n_rej = 0
    for i in range(0, _N, 11):
        row = loc.iloc[i]
        v = row.tokens[: _CAP].astype(np.int64)
        s, tie18, base18 = _season_loop(v)
        got = out.loc[row.doc_id]
        assert got.l == len(v)
        assert (got.s_stat, got.tie18, got.base18) == (s, tie18, base18)
        var = (base18 - tie18) / 18.0
        if var > 0:
            z = (s - np.sign(s)) / math.sqrt(var) if s != 0 else 0.0
            assert abs(got.z - f6(z)) < 1e-9
            want = (
                "increasing"
                if z > 1.96
                else ("decreasing" if z < -1.96 else "none")
            )
            assert got.trend == want
            trends.add(want)
            n_rej += int(want != "none")
    # honest reading: deseasonalizing by the true period isolates the
    # ramp — a middle band rejects (both directions), the rest none
    checked = len(range(0, _N, 11))
    assert {"increasing", "none"} <= trends
    assert 0.1 * checked < n_rej < 0.95 * checked


def test_hand_case():
    # 2 seasons, pure within-season ramps: P=64 here so craft via the
    # season loop directly on a stride-64 layout
    v = np.zeros(256, dtype=np.int64)
    for g in range(64):
        v[g::64] = np.arange(4) * (1 if g % 2 == 0 else -1)
    s, tie18, base18 = _season_loop(v)
    # each even season contributes +C(4,2) = +6, each odd -6 → cancel
    assert s == 0
    assert tie18 == 0  # all season values distinct
    assert base18 == 64 * (4 * 3 * 13)
    # and a tied season exercises the correction: [1,1,2,2] per season
    v2 = np.zeros(256, dtype=np.int64)
    for g in range(64):
        v2[g::64] = np.array([1, 1, 2, 2])
    s2, tie2, base2 = _season_loop(v2)
    assert s2 == 64 * 4  # per season: 4 concordant (1<2) pairs
    assert tie2 == 64 * 2 * (2 * 1 * 9)  # two tie-groups of size 2
    assert base2 == base18
