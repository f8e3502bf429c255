"""Semantic gates for friedman_q (TS73): pandas midrank recompute of
the rank sums / tie term / chi2 / W, the rank-sum conservation
identity, and the exchangeable-null honest reading."""

import math
from collections import Counter, defaultdict

import pandas as pd

from dtaidistance_spark.operators.friedman_q import _K, friedman_test

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def test_matches_pandas(spark, sf_dir):
    out = friedman_test(spark, sf_dir).toPandas().set_index("event_type")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    cells = (
        ev.assign(h=ev.ts.dt.hour)
        .groupby(["h", "event_type"])
        .size()
    )
    types = sorted(out.index)
    blocks = sorted({h for h, _ in cells.index})
    b, k = len(blocks), len(types)
    assert k == _K
    r2 = defaultdict(int)
    tie = 0
    for h in blocks:
        vals = {t: int(cells.get((h, t), 0)) for t in types}
        for t, v in vals.items():
            lt = sum(1 for w in vals.values() if w < v)
            eq = sum(1 for w in vals.values() if w == v)
            r2[t] += 2 * lt + eq + 1
        tie += sum(c**3 - c for c in Counter(vals.values()).values())
    s2 = sum((r2[t] - b * (k + 1)) ** 2 for t in types)
    chi = (3.0 * s2 / (b * k * (k + 1))) / (
        1.0 - tie / (b * (k**3 - k))
    )
    w = chi / (b * (k - 1))
    for t in types:
        g = out.loc[t]
        assert g.r2_sum == r2[t]
        assert (g.b, g.k, g.tie_sum, g.s2) == (b, k, tie, s2)
        assert abs(g.chi2_friedman - f6(chi)) < 1e-9
        assert abs(g.kendalls_w - f6(w)) < 1e-9
        assert g.reject_same_ranks == (
            1 if chi > 9.487729036781154 else 0
        )
    # rank-sum conservation: sum of doubled ranks = b*k*(k+1)
    assert sum(r2.values()) == b * k * (k + 1)
    # honest reading: exchangeable types → fail to reject, W ≈ 0
    assert out.reject_same_ranks.eq(0).all()
    assert float(out.kendalls_w.iloc[0]) < 0.2


def test_hand_case():
    # perfect agreement across 3 blocks of 3 treatments → W = 1 and
    # chi2 = b(k-1) exactly (no ties)
    b, k = 3, 3
    r2 = {t: 2 * b * (t + 1) for t in range(k)}  # doubled ranks 1,2,3
    s2 = sum((r2[t] - b * (k + 1)) ** 2 for t in range(k))
    chi = 3.0 * s2 / (b * k * (k + 1))
    assert abs(chi - b * (k - 1)) < 1e-12
    assert abs(chi / (b * (k - 1)) - 1.0) < 1e-12
