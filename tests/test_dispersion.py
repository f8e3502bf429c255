"""Semantic gates for dispersion_q (TS97): pandas recompute of the
zero-filled spine and every emitted number, the χ² ↔ Fisher-z
consistency, Poisson-null calibration, planted bursty and quota
controls, and the honest all-inside-the-band corpus reading."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.dispersion_q import poisson_dispersion

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731
_Z90 = 1.6448536269514722


def _disp_np(counts):
    c = np.asarray(counts, dtype=np.int64)
    hh, s1, s2 = len(c), int(c.sum()), int((c * c).sum())
    d = (hh * s2 - s1 * s1) / s1
    z = math.sqrt(2 * d) - math.sqrt(2 * (hh - 1) - 1)
    return hh, s1, s2, d, d / (hh - 1), z


def test_matches_pandas(spark, sf_dir):
    out = (
        poisson_dispersion(spark, sf_dir)
        .toPandas()
        .set_index("event_type")
    )
    raw = pd.read_parquet(f"{sf_dir}/events.parquet")
    h0 = raw.ts.min().floor("h")
    h1 = raw.ts.max().floor("h")
    spine = pd.date_range(h0, h1, freq="h")
    for et, grp in raw.groupby("event_type"):
        cnt = grp.ts.dt.floor("h").value_counts()
        counts = [int(cnt.get(h, 0)) for h in spine]
        hh, s1, s2, d, vmr, z = _disp_np(counts)
        row = out.loc[et]
        assert row.hh == hh and row.s1 == s1 and row.s2 == s2
        assert abs(row.dispersion - f6(d)) < 1e-6
        assert abs(row.vmr - f6(vmr)) < 1e-6
        assert abs(row.z_fisher - f6(z)) < 1e-6
        want = 1 if z > _Z90 else (-1 if z < -_Z90 else 0)
        assert row.verdict_dispersion == want


def _lcg(seed):
    s = seed
    while True:
        s = (1103515245 * s + 12345) % (1 << 31)
        yield s / (1 << 31)


def test_poisson_null_calibration():
    # uniform arrival instants over H hours ⇒ hourly counts are
    # (jointly multinomial ≈) Poisson: VMR ≈ 1, ~nominal rejects
    g = _lcg(42)
    rejects, vmrs = 0, []
    for _ in range(60):
        hours = [0] * 720
        for _ in range(2000):
            hours[int(next(g) * 720)] += 1
        _, _, _, _, vmr, z = _disp_np(hours)
        vmrs.append(vmr)
        rejects += int(abs(z) > _Z90)
    assert 0.9 < float(np.mean(vmrs)) < 1.1
    assert rejects / 60 < 0.2


def test_planted_bursty_and_quota():
    # bursty: whole clumps land in single hours → VMR ≫ 1
    g = _lcg(7)
    hours = [0] * 720
    for _ in range(100):
        hours[int(next(g) * 720)] += 20  # 20-event clumps
    _, _, _, _, vmr, z = _disp_np(hours)
    assert vmr > 5 and z > _Z90
    # quota: exactly-even schedule → VMR ≈ 0, z far negative
    _, _, _, _, vmr_q, z_q = _disp_np([3] * 720)
    assert vmr_q == 0.0 and z_q < -_Z90


def test_honest_all_inside_band(spark, sf_dir):
    out = poisson_dispersion(spark, sf_dir).toPandas()
    assert len(out) == 5
    assert (out.verdict_dispersion == 0).all()
    assert out.vmr.between(0.8, 1.2).all()
    assert out.hh.nunique() == 1  # one global spine for all types
