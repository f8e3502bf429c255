"""Semantic gates for cvm_q (TS122): numpy recompute per pair, the
tiny exact hand case, the diffuse-vs-local separation against KS,
null calibration, and the corpus no-fire reading."""

import math

import numpy as np

from dtaidistance_spark.operators.cvm_q import (
    cramer_von_mises_sources,
)
from dtaidistance_spark.operators.mannwhitney_q import _N
from dtaidistance_spark.synth import gen_row

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _cvm_ref(x, y):
    """Two-sample CvM T with midranks for ties."""
    x = np.asarray(x)
    y = np.asarray(y)
    n, m = len(x), len(y)
    N = n + m
    pooled = np.concatenate([x, y])
    order = np.argsort(pooled, kind="mergesort")
    ranks = np.empty(N)
    sp = pooled[order]
    i = 0
    rr = np.arange(1, N + 1, dtype=float)
    while i < N:
        j = i
        while j < N and sp[j] == sp[i]:
            j += 1
        ranks[order[i:j]] = rr[i:j].mean()
        i = j
    r = np.sort(ranks[:n])
    s = np.sort(ranks[n:])
    U = (
        n * ((r - np.arange(1, n + 1)) ** 2).sum()
        + m * ((s - np.arange(1, m + 1)) ** 2).sum()
    )
    return U / (N * n * m) - (4.0 * n * m - 1) / (6.0 * N)


def _ks_ref(x, y):
    xs = np.sort(x)
    ys = np.sort(y)
    allv = np.sort(np.concatenate([x, y]))
    fx = np.searchsorted(xs, allv, side="right") / len(x)
    fy = np.searchsorted(ys, allv, side="right") / len(y)
    return np.abs(fx - fy).max()


def test_hand_case():
    # {1,3} vs {2,4}: ranks r = (1,3), s = (2,4); U = 2·(0+1) +
    # 2·(1+4)... r−i = (0, 1), s−j = (0, 2)? s = (2,4), j = (1,2) →
    # (1, 2) → squares (1, 4). U = 2·1 + 2·5 = 12
    t = _cvm_ref([1, 3], [2, 4])
    U = 2 * 1 + 2 * 5
    want = U / (4 * 2 * 2) - (4 * 4 - 1) / (6 * 4)
    assert abs(t - want) < 1e-12


def _synth_by_source():
    out = {"web": [], "code": [], "books": []}
    for i in range(_N):
        _, tokens, _, source, _ = gen_row(i)
        out[source].append(tokens.astype(np.int64))
    return {k: np.concatenate(v) for k, v in out.items()}


def test_matches_numpy(spark, sf_dir):
    out = (
        cramer_von_mises_sources(spark, sf_dir)
        .toPandas()
        .set_index(["src_a", "src_b"])
    )
    srcs = _synth_by_source()
    for a, b in (("web", "books"), ("code", "books")):
        t = _cvm_ref(srcs[a], srcs[b])
        row = out.loc[(a, b)]
        assert row.n_a == len(srcs[a])
        assert abs(row.t_cvm - f6(t)) < 1e-4


def _lcg(seed, n, mod):
    s = seed
    out = np.empty(n, dtype=np.int64)
    for i in range(n):
        s = (1103515245 * s + 12345) % (1 << 31)
        out[i] = (s >> 12) % mod
    return out


def test_diffuse_vs_local_separation():
    # center-vs-tails reshuffle with matched medians: CvM's
    # integrated distance fires decisively while KS's single max
    # stays comparatively marginal
    n = 1500
    a = _lcg(5, n, 2001) - 1000  # ~uniform[−1000, 1000]
    # b: half the mass squeezed to the center, half pushed out
    raw = _lcg(9, n, 2001) - 1000
    b = np.where(raw % 2 == 0, raw // 3, raw * 2 - np.sign(raw) * 1000)
    t = _cvm_ref(a, b)
    d = _ks_ref(a, b)
    ks_crit = 1.358 * math.sqrt(2 / n)
    assert t > 2.0 * 0.461  # CvM fires decisively
    assert d / ks_crit < (t / 0.461) / 2  # KS relatively marginal
    # planted pure shift: both fire
    t2 = _cvm_ref(a, a + 150)
    d2 = _ks_ref(a, a + 150)
    assert t2 > 0.461 and d2 > ks_crit


def test_null_calibration():
    rej = 0
    runs = 80
    pooled = _lcg(3, 1200, 10**6)
    for r in range(runs):
        lab = _lcg(100 + r, 1200, 2)
        x, y = pooled[lab == 0], pooled[lab == 1]
        if len(x) > 50 and len(y) > 50:
            rej += _cvm_ref(x, y) > 0.461
    assert rej / runs <= 0.08


def test_honest_no_fire(spark):
    out = cramer_von_mises_sources(
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    assert (out.reject_same == 0).all()
    vals = sorted(out.t_cvm)
    # three independent null draws straddling the null mean 1/6
    assert vals[0] < 1 / 6 < vals[-1]
    assert abs(vals[-1] - 0.2227) < 1e-3
