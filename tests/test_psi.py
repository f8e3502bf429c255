"""Semantic gates for psi_q (TS99): pandas recompute of edges, bins,
counts and PSI per type, the planted mean-shift control, the LCG
null-floor calibration across sample sizes, and the two-scale
honest reading (quiet at n=1000, noise-paged at n=100 exactly as
psi_null_floor predicts)."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.psi_q import _BINS, psi_value_drift

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _psi_ref(cents1, cents2):
    """Textbook PSI with full-sample decile edges and the 0.5-count
    floor — independent of the query's fold machinery."""
    allc = np.sort(np.concatenate([cents1, cents2]))
    n = len(allc)
    edges = [allc[math.ceil(k * n / _BINS) - 1] for k in range(1, _BINS)]

    def binof(v):
        return 1 + sum(1 for e in edges if v > e)

    psi = 0.0
    t1, t2 = len(cents1), len(cents2)
    for b in range(1, _BINS + 1):
        c1 = max(sum(1 for v in cents1 if binof(v) == b), 0.5)
        c2 = max(sum(1 for v in cents2 if binof(v) == b), 0.5)
        p, q = c1 / t1, c2 / t2
        psi += (p - q) * math.log(p / q)
    return psi


def test_matches_pandas(spark, sf_dir):
    out = (
        psi_value_drift(spark, sf_dir).toPandas().set_index("event_type")
    )
    raw = pd.read_parquet(f"{sf_dir}/events.parquet")
    mid = raw.ts.min().floor("d") + pd.Timedelta(days=15)
    for et, g in raw.groupby("event_type"):
        cents = np.floor(100.0 * g.value.to_numpy() + 0.5).astype(
            np.int64
        )
        first = cents[(g.ts < mid).to_numpy()]
        second = cents[(g.ts >= mid).to_numpy()]
        row = out.loc[et]
        assert row.t1 == len(first) and row.t2 == len(second)
        ref = _psi_ref(first, second)
        assert abs(row.psi - f6(ref)) < 1e-6
        floor = (_BINS - 1) * (1 / len(first) + 1 / len(second))
        assert abs(row.psi_null_floor - f6(floor)) < 1e-6
        want = 2 if ref > 0.25 else (1 if ref > 0.10 else 0)
        assert row.drift_verdict == want


def _lcg_vals(n, seed):
    s, out = seed, []
    for _ in range(n):
        s = (1103515245 * s + 12345) % (1 << 31)
        out.append(s >> 16)
    return np.array(out)


def test_planted_mean_shift_fires():
    a = _lcg_vals(2000, 1)
    b = _lcg_vals(2000, 2) * 1.2 + 3000  # second half shifted +20%
    assert _psi_ref(a, b.astype(np.int64)) > 0.25


def test_null_floor_calibration_across_n():
    # E[PSI | no drift] ≈ (B−1)(1/n1 + 1/n2): check at two sizes
    for n, seed_base in [(100, 10), (1000, 50)]:
        vals = []
        for k in range(30):
            a = _lcg_vals(n, seed_base + 2 * k)
            b = _lcg_vals(n, seed_base + 2 * k + 1)
            vals.append(_psi_ref(a, b))
        floor = (_BINS - 1) * (2 / n)
        assert 0.5 * floor < float(np.mean(vals)) < 1.8 * floor


def test_honest_two_scale_reading(spark):
    big = psi_value_drift(spark, "/root/testdata/sf0.01").toPandas()
    small = psi_value_drift(spark, "/root/testdata/sf0.001").toPandas()
    # n≈1000/half: quiet, and PSI sits at/below ~2× the null floor
    assert (big.drift_verdict == 0).all()
    assert big.psi.max() < 0.06
    assert (big.psi < 3 * big.psi_null_floor).all()
    # n≈100/half: the SAME generator pages — noise crosses the
    # canonical lines exactly as the emitted floor predicts
    assert (small.drift_verdict > 0).sum() >= 3
    assert (small.psi_null_floor > 0.15).all()
    assert small.psi.median() > 0.1 * 1.0  # inside the floor's scale
