"""Semantic gates for records_q (TS105): numpy recompute of every
emitted number, the H_n universality on an LCG null, exact
sorted-sequence extremes, the envelope-vs-texture contrast with the
runs test, and the both-directions tail coupling."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.records_q import (
    _N,
    record_statistics,
)
from dtaidistance_spark.operators.runstest_q import runs_test

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _rec_np(y):
    y = np.asarray(y, dtype=np.int64)
    n = len(y)
    r_up = r_dn = 0
    mx, mn = -1, 1 << 40
    for x in y:
        if x > mx:
            r_up += 1
            mx = int(x)
        if x < mn:
            r_dn += 1
            mn = int(x)
    hn = sum(1.0 / j for j in range(1, n + 1))
    hn2 = sum(1.0 / (j * j) for j in range(1, n + 1))
    sd = math.sqrt(hn - hn2)
    return r_up, r_dn, hn, (r_up - hn) / sd, (r_dn - hn) / sd


def test_matches_numpy(spark):
    out = record_statistics(spark, "").toPandas().set_index("doc_id")
    loc = synth.sequences_local(_N)
    checked = 0
    for i in range(0, _N, 7):
        row_l = loc.iloc[i]
        r_up, r_dn, hn, zu, zd = _rec_np(row_l.tokens)
        row = out.loc[row_l.doc_id]
        assert row.r_up == r_up and row.r_dn == r_dn
        assert abs(row.harmonic_n - f6(hn)) < 1e-6
        assert abs(row.z_up - f6(zu)) < 1e-5
        assert abs(row.z_down - f6(zd)) < 1e-5
        checked += 1
    assert checked >= 70


def test_renyi_universality_lcg():
    # iid null: mean record count ≈ H_n ≈ ln n + γ, any distribution
    s, ups = 3, []
    n = 1000
    for _ in range(200):
        vals = []
        for _ in range(n):
            s = (1103515245 * s + 12345) % (1 << 31)
            vals.append(s >> 16)
        r_up, _, hn, _, _ = _rec_np(np.array(vals))
        ups.append(r_up)
    hn = sum(1.0 / j for j in range(1, n + 1))
    assert abs(np.mean(ups) - hn) < 0.35
    assert abs(hn - (math.log(n) + 0.5772156649)) < 0.01


def test_sorted_extremes_exact():
    r_up, r_dn, _, zu, zd = _rec_np(np.arange(100) * 7 + 1)
    assert r_up == 100 and r_dn == 1  # every point a high, one low
    assert zu > 0 and zd < 0
    r_up2, r_dn2, _, _, _ = _rec_np((np.arange(100) * 7 + 1)[::-1])
    assert r_up2 == 1 and r_dn2 == 100


def test_envelope_vs_texture_contrast(spark):
    rec = record_statistics(spark, "").toPandas().set_index("doc_id")
    rt = runs_test(spark, "").toPandas().set_index("doc_id")
    # records fire on a quarter of the corpus; runs on ~94% — the
    # extremes/texture decomposition, gated directly
    assert 0.15 < rec.reject_up.mean() < 0.35
    assert rt.reject_random.mean() > 0.88
    # docs non-random by texture yet null by extremes are the norm
    j = rec.join(rt[["reject_random"]])
    quiet_env = j[(j.reject_up == 0) & (j.reject_random == 1)]
    assert len(quiet_env) > 0.5 * len(j)


def test_trend_split_in_tail(spark):
    rec = record_statistics(spark, "").toPandas()
    # the z↑ tail is the one-way-trend signature: highs keep coming
    # while new lows are SUPPRESSED below their null
    up_tail = rec.z_up > 5
    assert up_tail.sum() > 20
    assert rec.z_down[up_tail].median() < 0
    assert (rec.z_down[up_tail] < 2).mean() > 0.9
    assert np.corrcoef(rec.z_up, rec.z_down)[0, 1] < 0.1
    # the bulk is null in both directions: no corpus-wide trend
    assert abs(rec.z_up.median()) < 1.0
    assert abs(rec.z_down.median()) < 1.0
    assert rec.ties.sum() < 100
