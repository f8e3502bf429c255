"""Semantic gates for ansari_q (TS112): numpy recompute of the
tie-averaged AB statistic and Mood's table from raw synth tokens,
block-sum hand case, planted spread-change / location-shift
separations, LCG null calibration, and the corpus no-fire reads."""

import math

import numpy as np

from dtaidistance_spark.operators.ansari_q import (
    ansari_bradley_pairs,
    mood_median_sources,
)
from dtaidistance_spark.operators.mannwhitney_q import _N
from dtaidistance_spark.synth import gen_row

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _ab_z(x, y):
    """Tie-averaged Ansari–Bradley z with conditional moments."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    pooled = np.concatenate([x, y])
    N = len(pooled)
    order = np.argsort(pooled, kind="mergesort")
    ranks = np.arange(1, N + 1, dtype=np.float64)
    scores = np.minimum(ranks, N + 1 - ranks)
    # average scores over tie blocks
    sorted_vals = pooled[order]
    avg = np.empty(N)
    i = 0
    while i < N:
        j = i
        while j < N and sorted_vals[j] == sorted_vals[i]:
            j += 1
        avg[i:j] = scores[i:j].mean()
        i = j
    a = np.empty(N)
    a[order] = avg
    T = a[: len(x)].sum()
    m, n = len(x), len(y)
    abar = a.mean()
    ss = ((a - abar) ** 2).sum()
    E = m * abar
    V = m * n * ss / (N * (N - 1))
    return (T - E) / math.sqrt(V)


def _mood_chi2(samples):
    pooled = np.concatenate(samples)
    N = len(pooled)
    med = np.sort(pooled)[(N + 1) // 2 - 1]
    above = np.array([(s > med).sum() for s in samples], dtype=float)
    below = np.array([(s < med).sum() for s in samples], dtype=float)
    na, nb = above.sum(), below.sum()
    nn = na + nb
    chi2 = 0.0
    for k in range(len(samples)):
        ms = above[k] + below[k]
        for o, mtot in ((above[k], na), (below[k], nb)):
            e = mtot * ms / nn
            chi2 += (o - e) ** 2 / e
    return med, chi2


def _synth_by_source():
    out = {"web": [], "code": [], "books": []}
    for i in range(_N):
        _, tokens, _, source, _ = gen_row(i)
        out[source].append(tokens.astype(np.int64))
    return {k: np.concatenate(v) for k, v in out.items()}


def test_matches_numpy(spark, sf_dir):
    out = (
        ansari_bradley_pairs(spark, sf_dir)
        .toPandas()
        .set_index(["src_a", "src_b"])
    )
    srcs = _synth_by_source()
    for a, b in (("web", "code"), ("web", "books"), ("code", "books")):
        z = _ab_z(srcs[a], srcs[b])
        row = out.loc[(a, b)]
        assert row.n_a == len(srcs[a])
        assert row.n_b == len(srcs[b])
        # engine uses doubled scores + pinned folds; agreement to
        # float-tree tolerance
        assert abs(row.z - z) < 1e-4


def test_mood_matches_numpy(spark, sf_dir):
    out = mood_median_sources(spark, sf_dir).toPandas().iloc[0]
    srcs = _synth_by_source()
    med, chi2 = _mood_chi2(
        [srcs["web"], srcs["code"], srcs["books"]]
    )
    assert out.median_tok == med
    assert abs(out.chi2 - f6(chi2)) < 1e-5


def test_block_sum_hand_case():
    # N = 4, no ties: scores are 1,2,2,1 (Σ2a = 12, the full-block
    # doubled sum the engine's _s2 closed form must produce)
    zz = _ab_z([1, 4], [2, 3])  # x takes end scores {1,1}, y {2,2}
    a = np.array([1.0, 2.0, 2.0, 1.0])
    E = 2 * a.mean()
    V = 2 * 2 * ((a - a.mean()) ** 2).sum() / (4 * 3)
    assert abs(zz - (2 - E) / math.sqrt(V)) < 1e-12
    # and with one tie block {2,2}: averaged scores still sum to 12
    z_tie = _ab_z([1, 4], [2, 2])
    assert np.isfinite(z_tie)


def _lcg_stream(seed, n, mod):
    out = np.empty(n, dtype=np.int64)
    s = seed
    for i in range(n):
        s = (1103515245 * s + 12345) % (1 << 31)
        out[i] = s % mod
    return out


def test_planted_spread_change():
    base = _lcg_stream(77, 3000, 1000) - 500
    wide = (_lcg_stream(991, 3000, 3000) - 1500)  # ×3 spread
    assert abs(_ab_z(base + 2000, (wide + 2000))) > 3
    assert abs(_ab_z(wide + 2000, base + 2000)) > 3  # both orientations


def test_location_vs_scale_separation():
    # small location shift at equal spread: Mood fires, AB stays quiet
    a = _lcg_stream(11, 4000, 2000)
    b = _lcg_stream(23, 4000, 2000) + 100  # shift ≈ 0.17 sd
    assert abs(_ab_z(a, b)) < 1.96
    _, chi2 = _mood_chi2([a, b])
    assert chi2 > 5.99


def test_null_calibration():
    pooled = _lcg_stream(5, 2000, 5000)
    rejects = 0
    runs = 100
    for r in range(runs):
        lab = _lcg_stream(1000 + r, 2000, 2)
        x, y = pooled[lab == 0], pooled[lab == 1]
        if len(x) > 50 and len(y) > 50 and abs(_ab_z(x, y)) > 1.96:
            rejects += 1
    assert rejects <= 10  # ≤ 10% at the 5% level


def test_honest_no_fire(spark):
    ab = ansari_bradley_pairs(spark, "/root/testdata/sf0.01").toPandas()
    assert (ab.reject_scale == 0).all()
    assert ab.z.abs().max() < 1.96
    md = mood_median_sources(spark, "/root/testdata/sf0.01").toPandas()
    assert int(md.reject_median.iloc[0]) == 0
    assert float(md.chi2.iloc[0]) < 5.99
