"""Semantic gates for logrank_q (TS103): an independent
lifelines-style recompute from raw parquet, the single-event
hypergeometric hand table, antisymmetry between cohort labelings,
the planted slowed-cohort rejection, and the honest exchangeable
parity reading."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.logrank_q import logrank_cohorts

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _logrank_ref(durs, evs, grps):
    """Classic per-time 2×2 route — dict of times, hypergeometric
    moments, independent of the fold machinery."""
    times = {}
    for t, e, g in zip(durs, evs, grps):
        d1, c1, d2, c2 = times.get(t, (0, 0, 0, 0))
        if g == 0:
            d1, c1 = d1 + e, c1 + (1 - e)
        else:
            d2, c2 = d2 + e, c2 + (1 - e)
        times[t] = (d1, c1, d2, c2)
    n1 = sum(1 for g in grps if g == 0)
    n2 = len(grps) - n1
    o1 = e1 = v = 0.0
    for t in sorted(times):
        d1, c1, d2, c2 = times[t]
        d = d1 + d2
        n = n1 + n2
        o1 += d1
        e1 += d * n1 / n
        if n > 1:
            v += d * n1 * n2 * (n - d) / (n * n * (n - 1))
        n1 -= d1 + c1
        n2 -= d2 + c2
    z = (o1 - e1) / math.sqrt(v) if v > 0 else None
    return o1, e1, v, z


def _durs_from_raw(sf_dir):
    raw = pd.read_parquet(f"{sf_dir}/events.parquet")
    wend = raw.ts.max().floor("d")
    durs, evs, grps = [], [], []
    for uid, g in raw.groupby("user_id"):
        d0 = g.ts.min().floor("d")
        hi = g[
            (g.event_type == "purchase")
            & (np.floor(100.0 * g.value + 0.5) > 10000)
        ]
        if len(hi):
            durs.append((hi.ts.min().floor("d") - d0).days)
            evs.append(1)
        else:
            durs.append((wend - d0).days)
            evs.append(0)
        grps.append(int(uid) % 2)
    return durs, evs, grps


def test_matches_reference(spark, sf_dir):
    out = logrank_cohorts(spark, sf_dir).toPandas().iloc[0]
    durs, evs, grps = _durs_from_raw(sf_dir)
    o1, e1, v, z = _logrank_ref(durs, evs, grps)
    assert out.n_users_even == sum(1 for g in grps if g == 0)
    assert out.observed_even == o1
    assert abs(out.expected_even - f6(e1)) < 1e-6
    assert abs(out.variance - f6(v)) < 1e-6
    assert abs(out.z_logrank - f6(z)) < 1e-5


def test_single_event_hand_table():
    # 3 even + 2 odd at risk, one event in even at t=1:
    # E1 = 1·3/5 = 0.6, V = 1·3·2·4/(25·4) = 0.24
    o1, e1, v, z = _logrank_ref(
        [1, 5, 5, 5, 5], [1, 0, 0, 0, 0], [0, 0, 0, 1, 1]
    )
    assert o1 == 1 and abs(e1 - 0.6) < 1e-12
    assert abs(v - 0.24) < 1e-12


def test_label_antisymmetry():
    durs, evs, grps = _durs_from_raw("/root/testdata/sf0.001")
    _, _, v1, z1 = _logrank_ref(durs, evs, grps)
    flipped = [1 - g for g in grps]
    _, _, v2, z2 = _logrank_ref(durs, evs, flipped)
    assert abs(v1 - v2) < 1e-12
    assert abs(z1 + z2) < 1e-12


def test_planted_slowed_cohort_rejects():
    durs, evs, grps = _durs_from_raw("/root/testdata/sf0.01")
    slowed = [
        int(d * 2.5) if g == 1 and e == 1 else d
        for d, e, g in zip(durs, evs, grps)
    ]
    _, _, _, z = _logrank_ref(slowed, evs, grps)
    assert z is not None and z * z > 3.841458820694124 * 4


def test_honest_exchangeable_parity(spark):
    for sf in ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]:
        out = logrank_cohorts(spark, sf).toPandas().iloc[0]
        assert out.reject_same_curve == 0
        assert abs(out.z_logrank) < 1.0
    big = logrank_cohorts(spark, "/root/testdata/sf0.01").toPandas().iloc[0]
    assert big.n_users_even == 75 and big.n_users_odd == 75
    assert abs(big.chi2_logrank) < 0.1  # at-risk noise only
