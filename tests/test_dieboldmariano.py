"""Semantic gates for dieboldmariano_q (TS77): pandas recompute of
the loss differentials from raw events, the DM formula identity vs
the textbook mean/variance form, the perfect-seasonal positive
control, and the honest directional reading."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.dieboldmariano_q import diebold_mariano

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _dm_from_d(d):
    n = len(d)
    s1, s2 = int(np.sum(d)), int(np.sum(d * d))
    if n * s2 - s1 * s1 <= 0:
        return None
    return s1 * math.sqrt(n) / math.sqrt(n * s2 - s1 * s1)


def test_matches_pandas(spark, sf_dir):
    out = diebold_mariano(spark, sf_dir).toPandas().set_index("event_type")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["hb"] = ev.ts.dt.floor("h")
    for et, grp in ev.groupby("event_type"):
        c = grp.groupby("hb").size().sort_index().to_numpy(dtype=np.int64)
        f1 = c[23:-1]  # lag 1 aligned to t >= 24
        f2 = c[:-24]  # lag 24
        y = c[24:]
        d = (y - f1) ** 2 - (y - f2) ** 2
        g = out.loc[et]
        assert g.n == len(d)
        assert g.s1 == int(d.sum())
        assert g.s2 == int((d * d).sum())
        assert g.sse_naive == int(((y - f1) ** 2).sum())
        assert g.sse_seasonal == int(((y - f2) ** 2).sum())
        dm = _dm_from_d(d)
        if dm is None:
            assert pd.isna(g.dm_stat)
        else:
            assert abs(g.dm_stat - f6(dm)) < 1e-9
            assert g.reject_equal_loss == (
                1 if abs(dm) > 1.959963984540054 else 0
            )
            # textbook form identity: mean(d)/sqrt(popvar(d)/n)
            mean = d.mean()
            popvar = ((d - mean) ** 2).mean()
            dm2 = mean / math.sqrt(popvar / len(d))
            assert abs(dm - dm2) < 1e-9 * max(1.0, abs(dm2))
    # honest reading: near-Poisson counts with no real 24h
    # seasonality -> both forecasters lose about equally and DM
    # fails to reject for every type
    assert out.reject_equal_loss.fillna(0).eq(0).all()
    assert out.dm_stat.abs().max() < 1.959963984540054


def test_perfect_seasonal_positive_control():
    # exact period-24 series + noise only on the naive horizon:
    # seasonal forecast is perfect, d_t = e1^2 >= 0, DM rejects
    # in favor of the seasonal forecaster
    base = np.tile(np.arange(24, dtype=np.int64) * 10, 20)
    y = base[24:]
    f2 = base[:-24]  # perfect
    f1 = base[23:-1]  # one step behind a varying series
    d = (y - f1) ** 2 - (y - f2) ** 2
    dm = _dm_from_d(d)
    assert (y == f2).all()
    assert dm is not None and dm > 1.959963984540054


def test_equal_forecasters_null():
    # identical forecasters -> zero differential -> guarded NULL
    rng = np.random.default_rng(3)
    y = rng.integers(0, 50, 200)
    f = np.roll(y, 1)
    d = (y[1:] - f[1:]) ** 2 - (y[1:] - f[1:]) ** 2
    assert _dm_from_d(d) is None
