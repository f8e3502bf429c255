"""Semantic gates for lombscargle_q (TS93): exact int-sum recompute
from raw parquet, an independent full-precision textbook
Lomb–Scargle (libm trig + atan2 τ — none of the query's scaled-int
or half-angle machinery), the planted irregular-sampled daily
sinusoid, the Exp(1) null calibration, and the honest
no-daily-cycle corpus reading."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.lombscargle_q import (
    _BINS,
    _ROWS,
    _SCALE,
    lomb_scargle_daily,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _ls_textbook(phases_bin, y):
    """Full-precision Scargle form on the 5-min grid phases: libm
    trig per event, τ from atan2 — independent of the query's
    pinned-table + half-angle route."""
    th = 2.0 * np.pi * np.asarray(phases_bin) / _BINS
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    yt = y - y.mean()
    var = y.var()
    if n < 16 or var <= 0:
        return None
    tau = math.atan2(np.sin(2 * th).sum(), np.cos(2 * th).sum()) / 2.0
    c, s = np.cos(th - tau), np.sin(th - tau)
    return ((yt @ c) ** 2 / (c @ c) + (yt @ s) ** 2 / (s @ s)) / (
        2 * var
    )


def _prep(raw):
    y = np.floor(100.0 * raw.value.to_numpy() + 0.5).astype(np.int64)
    p = (
        raw.ts.dt.hour.to_numpy() * 60 + raw.ts.dt.minute.to_numpy()
    ) // 5
    return p.astype(np.int64), y


def test_int_sums_and_tree_match(spark, sf_dir):
    out = (
        lomb_scargle_daily(spark, sf_dir)
        .toPandas()
        .set_index("event_type")
    )
    raw = pd.read_parquet(f"{sf_dir}/events.parquet")
    tab = {r[0]: r[1:] for r in _ROWS}
    for et, grp in raw.groupby("event_type"):
        p, y = _prep(grp)
        c1 = np.array([tab[int(b)][0] for b in p], dtype=np.int64)
        s1 = np.array([tab[int(b)][1] for b in p], dtype=np.int64)
        row = out.loc[et]
        assert row.n == len(y)
        assert row.sy == y.sum() and row.syy == (y * y).sum()
        assert row.a1 == (y * c1).sum() and row.b1 == (y * s1).sum()


def test_matches_textbook_full_precision(spark, sf_dir):
    out = (
        lomb_scargle_daily(spark, sf_dir)
        .toPandas()
        .set_index("event_type")
    )
    raw = pd.read_parquet(f"{sf_dir}/events.parquet")
    for et, grp in raw.groupby("event_type"):
        p, y = _prep(grp)
        ref = _ls_textbook(p, y)
        got = out.loc[et].lomb_power
        # table quantization at 1e-6 → agreement to ~1e-4 relative
        assert abs(got - ref) < max(2e-4, 2e-4 * ref), (et, got, ref)


def test_pinned_table_is_scaled_trig():
    for p, c1, s1, c2, s2 in _ROWS[:: 17]:
        th = 2 * math.pi * p / _BINS
        assert abs(c1 - math.cos(th) * _SCALE) <= 0.5
        assert abs(s1 - math.sin(th) * _SCALE) <= 0.5
        assert abs(c2 - math.cos(2 * th) * _SCALE) <= 0.5
        assert abs(s2 - math.sin(2 * th) * _SCALE) <= 0.5


def _lcg_times(n, seed, span=30 * 86400):
    s, out = seed, []
    for _ in range(n):
        s = (1103515245 * s + 12345) % (1 << 31)
        out.append(int(s / (1 << 31) * span))
    return np.array(out)


def test_planted_daily_cycle_irregular():
    # a pure daily sinusoid sampled at LCG-irregular instants: P ≈ n/2
    # (for a pure tone σ² = amp²/2 and the fit explains everything) —
    # the spectral line no grid-based operator can read off these times
    t = _lcg_times(2000, 77)
    y = 10000 + 5000 * np.sin(2 * np.pi * (t % 86400) / 86400.0)
    p = (t % 86400) // 300
    P = _ls_textbook(p, np.floor(y + 0.5))
    assert P > 0.35 * len(t)
    # and the null at the same instants reads Exp(1)-scale
    s, vals = 123, []
    for _ in range(2000):
        s = (1103515245 * s + 12345) % (1 << 31)
        vals.append(s >> 16)
    P0 = _ls_textbook(p, np.array(vals))
    assert P0 < 6.0


def test_exp1_null_calibration():
    # many independent nulls: mean(P) ≈ 1, rejects at ~e^{-ln20} = 5%
    powers = []
    for k in range(60):
        t = _lcg_times(500, 1000 + k)
        p = (t % 86400) // 300
        s, vals = 5000 + k, []
        for _ in range(500):
            s = (1103515245 * s + 12345) % (1 << 31)
            vals.append(s >> 16)
        powers.append(_ls_textbook(p, np.array(vals)))
    powers = np.array(powers)
    assert 0.5 < powers.mean() < 2.0
    assert (powers > math.log(20)).mean() < 0.2


def test_honest_no_daily_cycle(spark, sf_dir):
    out = lomb_scargle_daily(spark, sf_dir).toPandas()
    assert len(out) == 5
    assert (out.reject_no_daily_cycle == 0).all()
    assert out.lomb_power.max() < math.log(20)
    assert out.lomb_power.min() > 0.0
