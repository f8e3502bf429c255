"""Semantic gates for hill_q (TS107): pandas recompute of the
triple, Pareto flatness + recovery, exponential drift, scale
invariance, the two-point hand case, and the honest drifting
corpus reading."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.hill_q import _KS, hill_tail_index

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _hill_ref(vals, k):
    x = np.sort(np.asarray(vals, dtype=np.float64))[::-1]
    if len(x) <= k or x[k] <= 0:
        return None
    h = float(np.log(x[:k] / x[k]).mean())
    return h, (1.0 / h if h > 0 else None)


def test_matches_pandas(spark, sf_dir):
    out = hill_tail_index(spark, sf_dir).toPandas().iloc[0]
    raw = pd.read_parquet(f"{sf_dir}/events.parquet")
    cents = np.floor(
        100.0 * raw[raw.event_type == "purchase"].value.to_numpy() + 0.5
    ).astype(np.int64)
    assert out.n_purchases == len(cents)
    for k in _KS:
        h, a = _hill_ref(cents, k)
        assert abs(out[f"hill_h_{k}"] - f6(h)) < 1e-6
        assert abs(out[f"alpha_{k}"] - f6(a)) < 1e-4


def test_pareto_flat_and_recovers():
    # exact Pareto(α = 1.5): x = u^{−1/α}; the Hill plot is FLAT and
    # recovers α — checked at k = 100/200/400 where the estimator's
    # α/√k sampling noise (±0.34 at k = 20!) no longer dominates
    rng = np.random.RandomState(11)
    u = rng.uniform(size=20000)
    x = np.floor(1e6 * u ** (-1 / 1.5)).astype(np.int64)
    alphas = [_hill_ref(x, k)[1] for k in (100, 200, 400)]
    for a in alphas:
        assert abs(a - 1.5) < 0.2
    assert max(alphas) / min(alphas) < 1.12  # flat across the plot


def test_exponential_drifts():
    rng = np.random.RandomState(23)
    x = np.floor(
        -1e5 * np.log(rng.uniform(size=20000))
    ).astype(np.int64)
    alphas = [_hill_ref(x, k)[1] for k in (100, 200, 400)]
    assert max(alphas) / min(alphas) > 1.3  # no power tail: drift


def test_scale_invariance_and_hand_case():
    vals = np.array([100, 200, 400, 800, 1600])
    h1, _ = _hill_ref(vals, 2)
    h2, _ = _hill_ref(vals * 7, 2)
    assert abs(h1 - h2) < 1e-12
    # two-point hand case: top {1600, 800} over x_(3)=400:
    # H = (ln 4 + ln 2)/2 = (3/2)·ln 2
    assert abs(h1 - 1.5 * math.log(2)) < 1e-12


def test_honest_drifting_triple(spark):
    out = hill_tail_index(
        spark, "/root/testdata/sf0.01"
    ).toPandas().iloc[0]
    alphas = [out[f"alpha_{k}"] for k in _KS]
    # monotone falling drift, ~36% swing — no power tail
    assert alphas[0] > alphas[1] > alphas[2]
    assert alphas[0] / alphas[2] > 1.25
    assert 3.0 < alphas[2] < 4.0  # the single-k trap value, pinned
