"""Semantic gates for brownforsythe_q (T89): pandas recompute of
every emitted number, the k=2 BF ≡ squared-t identity, a balanced
hand case, the planted inflated-spread source, and the honest
premise-holds reading."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.brownforsythe_q import (
    brown_forsythe_sources,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _bf_ref(groups):
    """Textbook route: median-centered absolute deviations, one-way
    ANOVA F on them."""
    zs = []
    for g in groups:
        g = np.asarray(g, dtype=np.int64)
        med = np.sort(g)[(len(g) + 1) // 2 - 1]
        zs.append(np.abs(g - med))
    n = sum(len(z) for z in zs)
    k = len(zs)
    allz = np.concatenate(zs)
    gbar = allz.mean()
    betw = sum(len(z) * (z.mean() - gbar) ** 2 for z in zs)
    within = sum(((z - z.mean()) ** 2).sum() for z in zs)
    return ((n - k) / (k - 1)) * betw / within


def _groups_from_raw(sf_dir):
    raw = pd.read_parquet(f"{sf_dir}/documents.parquet")
    return [g.n_chars.to_numpy() for _, g in raw.groupby("source")]


def test_matches_pandas(spark, sf_dir):
    out = brown_forsythe_sources(spark, sf_dir).toPandas().iloc[0]
    groups = _groups_from_raw(sf_dir)
    w = _bf_ref(groups)
    assert out.n_docs == sum(len(g) for g in groups)
    assert out.k_sources == len(groups)
    # the int sums
    zs = []
    for g in groups:
        med = np.sort(g)[(len(g) + 1) // 2 - 1]
        zs.append(np.abs(np.asarray(g, dtype=np.int64) - med))
    allz = np.concatenate(zs)
    assert out.sum_absdev == int(allz.sum())
    assert out.sum_absdev_sq == int((allz * allz).sum())
    assert abs(out.bf_statistic - f6(w)) < 1e-5


def test_k2_equals_squared_t():
    # for two groups, BF W == t² of the two-sample (pooled) t on z's
    rng = np.random.RandomState(8)
    a = rng.randint(100, 400, 30)
    b = rng.randint(100, 700, 25)
    w = _bf_ref([a, b])
    za = np.abs(a - np.sort(a)[(len(a) + 1) // 2 - 1]).astype(float)
    zb = np.abs(b - np.sort(b)[(len(b) + 1) // 2 - 1]).astype(float)
    na, nb = len(za), len(zb)
    sp2 = (
        ((za - za.mean()) ** 2).sum() + ((zb - zb.mean()) ** 2).sum()
    ) / (na + nb - 2)
    t = (za.mean() - zb.mean()) / math.sqrt(sp2 * (1 / na + 1 / nb))
    assert abs(w - t * t) < 1e-10


def test_balanced_hand_case():
    # two groups with z-means 1 and 3, zero within-group z-variance
    # is impossible for abs-deviations; use a tiny constructed case
    # and verify against the formula directly
    a = [10, 12, 14]  # med 12, z = [2, 0, 2]
    b = [10, 16, 22]  # med 16, z = [6, 0, 6]
    w = _bf_ref([a, b])
    # means 4/3 and 4; grand 8/3; betw = 3(16/9)+3(16/9) = 32/3
    # within = (2·(2−4/3)² + (0−4/3)²) + (2·(6−4)² + 16) = 8/3 + 24
    want = (4 / 1) * (32 / 3) / (8 / 3 + 24)
    assert abs(w - want) < 1e-12


def test_planted_inflated_source(spark):
    groups = _groups_from_raw("/root/testdata/sf0.01")
    # triple one source's spread around its median
    g0 = groups[0]
    med = int(np.sort(g0)[(len(g0) + 1) // 2 - 1])
    groups = [med + 3 * (g0 - med)] + groups[1:]
    assert _bf_ref(groups) > 1.586501431876114 * 2


def test_honest_premise_holds(spark):
    for sf in ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]:
        out = brown_forsythe_sources(spark, sf).toPandas().iloc[0]
        assert out.reject_equal_variance == 0
        assert 0.4 < out.bf_statistic < 1.3  # W ≈ its null mean 1
