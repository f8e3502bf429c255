"""Semantic gates for gini_q (R52): pandas recompute of every
emitted number, the exact closed cases (equality, one-owner), the
Pareto 80/20 planted population, the mean-difference Gini identity,
the T ≈ CV²/2 small-inequality approximation, and the honest
light-tail reading."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.gini_q import spend_concentration

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _conc_ref(cents):
    x = np.sort(np.asarray(cents, dtype=np.int64))
    n = len(x)
    tot = int(x.sum())
    i = np.arange(1, n + 1, dtype=np.int64)
    gnum = int(((2 * i - n - 1) * x).sum())
    gini = gnum / (n * tot)
    theil = float(
        (x[x > 0] / tot * np.log(x[x > 0] * n / tot)).sum()
    )
    return {
        "n": n,
        "tot": tot,
        "gini": gini,
        "theil": theil,
        "top1": int(x[n - math.ceil(n / 100):].sum()) / tot,
        "top10": int(x[n - math.ceil(n / 10):].sum()) / tot,
        "bot50": int(x[: n // 2].sum()) / tot,
    }


def _cents_from_raw(sf_dir):
    raw = pd.read_parquet(f"{sf_dir}/events.parquet")
    p = raw[raw.event_type == "purchase"].copy()
    p["cents"] = np.floor(100.0 * p.value + 0.5).astype(np.int64)
    return p.groupby("user_id").cents.sum().to_numpy()


def test_matches_pandas(spark, sf_dir):
    out = spend_concentration(spark, sf_dir).toPandas().iloc[0]
    ref = _conc_ref(_cents_from_raw(sf_dir))
    assert out.n_users == ref["n"] and out.total_cents == ref["tot"]
    assert abs(out.gini - f6(ref["gini"])) < 1e-6
    assert abs(out.theil_t - f6(ref["theil"])) < 1e-5
    assert abs(out.top1_share - f6(ref["top1"])) < 1e-6
    assert abs(out.top10_share - f6(ref["top10"])) < 1e-6
    assert abs(out.bottom50_share - f6(ref["bot50"])) < 1e-6


def test_closed_cases():
    eq = _conc_ref([100] * 40)
    assert eq["gini"] == 0.0 and abs(eq["theil"]) < 1e-12
    assert abs(eq["bot50"] - 0.5) < 1e-12
    one = _conc_ref([0] * 39 + [1000])
    assert abs(one["gini"] - 39 / 40) < 1e-12  # (n−1)/n
    assert abs(one["theil"] - math.log(40)) < 1e-12  # ln n ceiling


def test_mean_difference_identity():
    # Gini = (Σ_i Σ_j |x_i − x_j|) / (2 n² μ) — the definitional twin
    rng = np.random.RandomState(4)
    x = rng.randint(1, 10_000, 60)
    ref = _conc_ref(x)
    md = np.abs(x[:, None] - x[None, :]).sum() / (2 * len(x) ** 2 * x.mean())
    assert abs(ref["gini"] - md) < 1e-12


def test_planted_pareto_8020():
    # Pareto(α = 1.16) ⇒ the 80/20 shape: Gini ≈ 0.76, top-10% heavy
    s, vals = 5, []
    for _ in range(2000):
        s = (1103515245 * s + 12345) % (1 << 31)
        u = (s + 1) / (1 << 31)
        vals.append(int(1000 * u ** (-1 / 1.16)))
    ref = _conc_ref(vals)
    assert ref["gini"] > 0.55
    assert ref["top10"] > 0.55
    assert ref["theil"] > 0.6


def test_cv_approximation_and_honest_light_tail(spark):
    out = spend_concentration(
        spark, "/root/testdata/sf0.01"
    ).toPandas().iloc[0]
    cents = _cents_from_raw("/root/testdata/sf0.01")
    cv2 = float(cents.var() / cents.mean() ** 2)
    # small-inequality approximation T ≈ CV²/2 (within ~12% here)
    assert abs(out.theil_t - cv2 / 2) < 0.12 * out.theil_t
    assert 0.15 < out.gini < 0.25
    assert out.top10_share < 0.25  # no whales
    assert out.bottom50_share > 0.3
    assert out.top1_share < 0.05
