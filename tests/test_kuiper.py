"""Semantic gates for kuiper_q (TS117): numpy recompute per type,
the bimodal Rayleigh-blindness separation, exact rotation
invariance, the telescoping identity, LCG null calibration, and
the corpus no-fire + near-miss pins."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.kuiper_q import (
    _K,
    kuiper_watson_clock,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _stats_ref(bins):
    """(V, V*, U², U²*) from raw bin indices (0.._K−1)."""
    c = np.bincount(bins, minlength=_K).astype(np.int64)
    n = int(c.sum())
    cum = np.cumsum(c)
    j = np.arange(1, _K + 1, dtype=np.int64)
    t = _K * cum - n * j
    assert t[-1] == 0  # telescoping identity
    V = (t.max() - t.min()) / (_K * n)
    vstar = V * (math.sqrt(n) + 0.155 + 0.24 / math.sqrt(n))
    u2 = (_K * (t * t).sum() - t.sum() ** 2) / (n * float(_K) ** 4)
    u2star = (u2 - 0.1 / n + 0.1 / n**2) * (1 + 0.8 / n)
    return V, vstar, u2, u2star


def _rayleigh_rbar(bins):
    th = 2 * np.pi * np.asarray(bins) / _K
    return math.hypot(np.cos(th).sum(), np.sin(th).sum()) / len(bins)


def test_matches_numpy(spark, sf_dir):
    out = (
        kuiper_watson_clock(spark, sf_dir)
        .toPandas()
        .set_index("event_type")
    )
    raw = pd.read_parquet(f"{sf_dir}/events.parquet")
    raw["b"] = raw.ts.dt.hour * 12 + raw.ts.dt.minute // 5
    for et, sub in raw.groupby("event_type"):
        V, vstar, u2, u2star = _stats_ref(sub.b.to_numpy())
        row = out.loc[et]
        assert row.n == len(sub)
        assert abs(row.kuiper_v - f6(V)) < 1e-6
        assert abs(row.kuiper_vstar - f6(vstar)) < 1e-5
        assert abs(row.watson_u2 - f6(u2)) < 1e-6
        assert abs(row.watson_u2star - f6(u2star)) < 1e-5


def _lcg_bins(seed, n):
    s = seed
    out = np.empty(n, dtype=np.int64)
    for i in range(n):
        s = (1103515245 * s + 12345) % (1 << 31)
        out[i] = (s >> 12) % _K
    return out


def test_bimodal_rayleigh_blindness():
    # two rush hours exactly 12 h apart: the resultant cancels —
    # Rayleigh is structurally blind — while the EDF dials fire
    n = 2000
    noise = _lcg_bins(5, n) % 12 - 6
    half = np.where(_lcg_bins(7, n) % 2 == 0, 9 * 12, 21 * 12)
    bins = (half + noise) % _K
    assert _rayleigh_rbar(bins) < 0.05  # blind
    _, vstar, _, u2star = _stats_ref(bins)
    assert vstar > 1.747 * 3  # fires hard
    assert u2star > 0.187 * 3


def test_unimodal_both_fire():
    n = 2000
    bins = (9 * 12 + (_lcg_bins(11, n) % 24) - 12) % _K
    assert _rayleigh_rbar(bins) > 0.5
    _, vstar, _, u2star = _stats_ref(bins)
    assert vstar > 1.747
    assert u2star > 0.187


def test_rotation_invariance_exact():
    bins = _lcg_bins(3, 1500)
    V0, _, u20, _ = _stats_ref(bins)
    V7, _, u27, _ = _stats_ref((bins + 7 * 12) % _K)
    assert abs(V0 - V7) < 1e-12
    assert abs(u20 - u27) < 1e-12


def test_null_calibration():
    rej_v = rej_w = 0
    runs = 100
    for r in range(runs):
        bins = _lcg_bins(1000 + r, 600)
        _, vstar, _, u2star = _stats_ref(bins)
        rej_v += vstar > 1.747
        rej_w += u2star > 0.187
    assert rej_v / runs <= 0.08
    assert rej_w / runs <= 0.08


def test_honest_no_fire_and_near_miss(spark):
    out = (
        kuiper_watson_clock(spark, "/root/testdata/sf0.01")
        .toPandas()
        .set_index("event_type")
    )
    assert (out.reject_kuiper == 0).all()
    assert (out.reject_watson == 0).all()
    # 'view' is the near-miss on both EDF dials, as it was for
    # TS104's Rayleigh p = 0.073
    assert out.kuiper_vstar.idxmax() == "view"
    assert out.watson_u2star.idxmax() == "view"
    assert abs(out.loc["view"].watson_u2star - 0.172930) < 1e-5
    assert out.loc["view"].watson_u2star / 0.187 > 0.9
