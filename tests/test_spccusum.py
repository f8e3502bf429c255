"""Semantic gates for spccusum_q (TS123): the windowed identity vs
the recursive definition, numpy recompute per doc, planted
in-control/shift regimes, and the 86/14 corpus split pins."""

import math

import numpy as np

from dtaidistance_spark.operators.spccusum_q import (
    _H,
    _KREF,
    spc_cusum_chart,
)
from dtaidistance_spark.synth import gen_row

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _cusum_rec(z, k=_KREF):
    cp = cm = 0.0
    cps, cms = [], []
    for x in z:
        cp = max(0.0, cp + x - k)
        cm = max(0.0, cm - x - k)
        cps.append(cp)
        cms.append(cm)
    return np.array(cps), np.array(cms)


def _cusum_win(z, k=_KREF):
    s = np.cumsum(z - k)
    cp = s - np.minimum(0.0, np.minimum.accumulate(s))
    s2 = np.cumsum(-z - k)
    cm = s2 - np.minimum(0.0, np.minimum.accumulate(s2))
    return cp, cm


def _ref(y):
    y = np.asarray(y, dtype=np.float64)
    m0 = int(math.floor(0.2 * len(y)))
    mu = y[:m0].mean()
    sig = math.sqrt(((y[:m0] - mu) ** 2).mean())
    z = (y - mu) / sig
    cp, cm = _cusum_win(z)
    t_up = int(np.argmax(cp > _H)) + 1 if (cp > _H).any() else None
    t_dn = int(np.argmax(cm > _H)) + 1 if (cm > _H).any() else None
    return mu, sig, cp.max(), cm.max(), t_up, t_dn


def test_identity_window_vs_recursive():
    s = 7
    z = np.empty(3000)
    for i in range(3000):
        acc = 0.0
        for _ in range(12):
            s = (1103515245 * s + 12345) % (1 << 31)
            acc += s / (1 << 31)
        z[i] = acc - 6.0
    z[1500:] += 0.8  # include a shift so both sides exercise
    cp_r, cm_r = _cusum_rec(z)
    cp_w, cm_w = _cusum_win(z)
    assert np.abs(cp_r - cp_w).max() < 1e-9
    assert np.abs(cm_r - cm_w).max() < 1e-9


def test_matches_numpy(spark, sf_dir):
    out = (
        spc_cusum_chart(spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    for i in range(0, 512, 61):
        doc_id, tokens, n, _, _ = gen_row(i)
        mu, sig, mcp, mcm, t_up, t_dn = _ref(tokens)
        row = out.loc[doc_id]
        assert abs(row.mu_phase1 - f6(mu)) < 1e-5
        assert abs(row.sigma_phase1 - f6(sig)) < 1e-5
        assert abs(row.max_cusum_up - f6(mcp)) < 1e-4
        assert abs(row.max_cusum_dn - f6(mcm)) < 1e-4
        if t_up is None:
            assert np.isnan(row.first_alarm_up)
        else:
            assert row.first_alarm_up == t_up


def _lcg_normal(seed, n):
    s = seed
    out = np.empty(n)
    for i in range(n):
        acc = 0.0
        for _ in range(12):
            s = (1103515245 * s + 12345) % (1 << 31)
            acc += s / (1 << 31)
        out[i] = acc - 6.0
    return out


def test_planted_regimes():
    # in-control ARL₀: the first draft asserted "no alarm over 800
    # points", forgetting that two-sided ARL₀ ≈ 465 makes an alarm
    # over 800 points MORE likely than not — measure the actual
    # mean first-alarm time instead and band it around the
    # operating point
    first = []
    for r in range(12):
        z = _lcg_normal(50 + r, 4000)
        cp, cm = _cusum_win(z)
        hits = np.where((cp > _H) | (cm > _H))[0]
        first.append(hits[0] + 1 if len(hits) else 4000)
    arl0 = np.mean(first)
    assert 150 < arl0 < 2000  # the k=.5/h=5 ARL₀ ballpark
    # planted 1σ step: detection within the textbook delay band
    delays = []
    for r in range(10):
        z = _lcg_normal(200 + r, 600)
        z[300:] += 1.0
        cp, _ = _cusum_win(z)
        alarms = np.where(cp > _H)[0]
        post = alarms[alarms >= 300]
        assert len(post) > 0
        delays.append(post[0] - 300 + 1)
    assert np.median(delays) < 25  # ARL1 ≈ 10 at 1σ


def test_honest_split_pins(spark):
    out = spc_cusum_chart(
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    assert len(out) == 512
    assert int(out.alarmed.sum()) == 70
    fa = out[["first_alarm_up", "first_alarm_dn"]].min(axis=1)
    assert fa[out.alarmed == 1].median() < 20  # immediate when real
