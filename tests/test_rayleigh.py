"""Semantic gates for rayleigh_q (TS104): pandas recompute of every
emitted number on the pinned grid, the Fisher-p refinement vs
first-order, the κ approximation vs the A(κ) inversion by
numerical integration, the planted rush-hour concentration, and
the honest uniform-clock reading."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.lombscargle_q import _BINS, _ROWS
from dtaidistance_spark.operators.rayleigh_q import rayleigh_clock

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _ray_ref(bins, n_table=None):
    tab = {r[0]: (r[1], r[2]) for r in _ROWS}
    c = sum(tab[int(b)][0] for b in bins)
    s = sum(tab[int(b)][1] for b in bins)
    n = len(bins)
    rbar = math.sqrt(c * c + s * s) / (n * 1e6)
    z = n * rbar * rbar
    p = math.exp(-z) * (1 + (2 * z - z * z) / (4 * n))
    if rbar < 0.53:
        kap = 2 * rbar + rbar**3 + 5 * rbar**5 / 6
    elif rbar < 0.85:
        kap = -0.4 + 1.39 * rbar + 0.43 / (1 - rbar)
    else:
        kap = 1 / (rbar**3 - 4 * rbar**2 + 3 * rbar)
    return c, s, rbar, z, p, kap


def test_matches_pandas(spark, sf_dir):
    out = (
        rayleigh_clock(spark, sf_dir).toPandas().set_index("event_type")
    )
    raw = pd.read_parquet(f"{sf_dir}/events.parquet")
    for et, g in raw.groupby("event_type"):
        bins = (g.ts.dt.hour * 60 + g.ts.dt.minute) // 5
        c, s, rbar, z, p, kap = _ray_ref(bins.to_numpy())
        row = out.loc[et]
        assert row.sum_cos_scaled == c and row.sum_sin_scaled == s
        assert abs(row.rbar - f6(rbar)) < 1e-6
        assert abs(row.rayleigh_z - f6(z)) < 1e-5
        assert abs(row.p_uniform - f6(p)) < 1e-6
        assert abs(row.kappa_vm - f6(kap)) < 1e-5
        # mean phase consistent with atan2 of the sums
        want_h = (math.atan2(s, c) % (2 * math.pi)) * 24 / (2 * math.pi)
        assert abs(row.mean_phase_hour - want_h) < 1e-4


def test_fisher_refinement_direction():
    # the refinement shrinks p relative to e^{-z} for small z/n ratios
    bins = np.arange(2000) % _BINS
    _, _, _, z, p, _ = _ray_ref(bins)
    assert p <= math.exp(-z) + 1e-12 or z < 2  # refinement bounded


def _a_of_kappa(kappa):
    """A(κ) = I1/I0 by numerical integration (independent route)."""
    th = np.linspace(0, math.pi, 20001)
    w = np.exp(kappa * np.cos(th))
    i0 = np.trapz(w, th) / math.pi
    i1 = np.trapz(np.cos(th) * w, th) / math.pi
    return i1 / i0


def test_kappa_approximation_vs_inversion():
    # Fisher's piecewise κ̂(R̄) should invert A(κ) to a few percent
    for rbar in [0.1, 0.3, 0.5, 0.7, 0.9]:
        if rbar < 0.53:
            kap = 2 * rbar + rbar**3 + 5 * rbar**5 / 6
        elif rbar < 0.85:
            kap = -0.4 + 1.39 * rbar + 0.43 / (1 - rbar)
        else:
            kap = 1 / (rbar**3 - 4 * rbar**2 + 3 * rbar)
        assert abs(_a_of_kappa(kap) - rbar) < 0.012


def test_planted_rush_hour():
    # arrivals bunched around 9am (bin 108) ± 1h: decisive rejection
    s, bins = 77, []
    for _ in range(1500):
        s = (1103515245 * s + 12345) % (1 << 31)
        off = (s >> 16) % 25 - 12  # ±12 bins = ±1 h
        bins.append((108 + off) % _BINS)
    c, sn, rbar, z, p, kap = _ray_ref(np.array(bins))
    assert rbar > 0.5 and p < 1e-10 and kap > 1.0
    # mean phase points at 9am
    want_h = (math.atan2(sn, c) % (2 * math.pi)) * 24 / (2 * math.pi)
    assert abs(want_h - 9.0) < 0.25


def test_honest_uniform_clock(spark):
    out = rayleigh_clock(spark, "/root/testdata/sf0.01").toPandas()
    assert len(out) == 5
    assert (out.reject_uniform_clock == 0).all()
    assert out.rbar.max() < 0.05
    assert out.kappa_vm.max() < 0.1  # zero-concentration floor
    assert out.p_uniform.min() > 0.05  # 'view' brushes but clears
