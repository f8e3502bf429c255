"""Semantic gates for gpdtail_q (TS110): numpy recompute of every
dial, planted exponential / bounded-uniform / Pareto recovery, and
the honest zero-cluster + flat-mean-excess corpus reading."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.gpdtail_q import _K, _KP, gpd_tail_fit

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _ref(vals, k=_K):
    """All dials from the desc-sorted integer array."""
    x = np.sort(np.asarray(vals, dtype=np.float64))[::-1]
    n = len(x)
    if n <= k + 1:
        return None
    u = x[k]  # x_(k+1)
    y = x[:k] - u  # descending excesses
    a0 = y.mean()
    # desc index i=1..k ⇒ ascending weight (i − 1)
    a1 = (y * np.arange(k)).sum() / (k * (k - 1))
    den = a0 - 2 * a1
    xi = 2 - a0 / den
    sg = 2 * a0 * a1 / den
    m1 = np.log(x[:k] / u).mean()
    m2 = (np.log(x[:k] / u) ** 2).mean()
    xim = m1 + 1 - 0.5 / (1 - m1 * m1 / m2)
    xip = None
    if x[_KP - 1] - x[2 * _KP - 1] > 0 and x[2 * _KP - 1] - x[4 * _KP - 1] > 0:
        xip = math.log(
            (x[_KP - 1] - x[2 * _KP - 1]) / (x[2 * _KP - 1] - x[4 * _KP - 1])
        ) / math.log(2)
    return dict(u=u, xi=xi, sg=sg, xim=xim, xip=xip, a0=a0)


def test_matches_numpy(spark, sf_dir):
    out = gpd_tail_fit(spark, sf_dir).toPandas().iloc[0]
    raw = pd.read_parquet(f"{sf_dir}/events.parquet")
    cents = np.floor(
        100.0 * raw[raw.event_type == "purchase"].value.to_numpy() + 0.5
    ).astype(np.int64)
    r = _ref(cents)
    assert out.n_purchases == len(cents)
    assert out.threshold_u == r["u"]
    assert abs(out.xi_gpd - f6(r["xi"])) < 1e-6
    assert abs(out.sigma_gpd - f6(r["sg"])) < 1e-5
    assert abs(out.xi_moment - f6(r["xim"])) < 1e-6
    assert abs(out.xi_pickands - f6(r["xip"])) < 1e-6
    assert abs(out.mean_excess_k100 - f6(r["a0"])) < 1e-6


def test_exponential_all_zero():
    # exponential excesses: ξ = 0 for every dial, mean excess flat
    rng = np.random.RandomState(42)
    x = np.floor(-2e5 * np.log(rng.uniform(size=30000))).astype(np.int64)
    r = _ref(x)
    assert abs(r["xi"]) < 0.2
    assert abs(r["xim"]) < 0.2
    assert abs(r["xip"]) < 0.7  # Pickands at depth 25: wide noise
    r50 = _ref(x, k=50)
    assert abs(r50["a0"] / r["a0"] - 1) < 0.35  # flat-ish mean excess


def test_bounded_uniform_endpoint():
    # uniform[0, c]: GPD shape ξ = −1, endpoint = c
    rng = np.random.RandomState(7)
    c = 1_000_000
    x = rng.randint(0, c, size=50000)
    r = _ref(x)
    assert r["xi"] < -0.7
    endpoint = r["u"] + r["sg"] / (-r["xi"])
    assert abs(endpoint / c - 1) < 0.01
    assert r["xim"] < -0.5  # moment estimator sees it too


def test_pareto_half():
    # Pareto(α = 2) ⇒ ξ = 1/2 for all three dials
    rng = np.random.RandomState(13)
    u = rng.uniform(size=50000)
    x = np.floor(1e6 * u ** (-1 / 2.0)).astype(np.int64)
    # PWM/moment sd ≈ 0.15 at depth 100 (a k=100 run read 0.70 on a
    # valid seed) — gate at depth 1000 where sd ≈ 0.05
    r = _ref(x, k=1000)
    assert abs(r["xi"] - 0.5) < 0.15
    assert abs(r["xim"] - 0.5) < 0.15
    assert abs(r["xip"] - 0.5) < 0.6


def test_honest_zero_cluster(spark):
    out = gpd_tail_fit(spark, "/root/testdata/sf0.01").toPandas().iloc[0]
    # the three dials cluster at zero: exponential-class tail
    assert abs(out.xi_gpd) < 0.1
    assert abs(out.xi_moment) < 0.1
    assert abs(out.xi_pickands) < 0.5  # depth-25 noise band
    # dead-flat mean excess: the memorylessness signature
    assert abs(out.mean_excess_k50 / out.mean_excess_k100 - 1) < 0.02
    # endpoint guarded to NULL at ξ ≈ 0 — the honest output
    assert out.endpoint_est is None or np.isnan(out.endpoint_est)
    # threshold stability: k = 50 agrees with k = 100 within the band
    assert abs(out.xi_gpd_k50 - out.xi_gpd) < 0.15
