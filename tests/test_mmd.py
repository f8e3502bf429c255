"""Semantic gates for mmd_q (E13): full numpy recompute of the
bandwidth and unbiased MMD², the label-permutation null bracketing
the emitted value (negative sign legitimate), planted mean-shift
and variance-inflation alternatives, and the isotropy-consistent
bandwidth reading."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.mmd_q import mmd_embedding_halves

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _mmd_np(X, groups):
    """Textbook route: full chord-distance matrix, exact low-median
    bandwidth, unbiased estimator."""
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    d2 = np.round(2.0 - 2.0 * (Xn @ Xn.T), 12)
    n = len(X)
    iu = np.triu_indices(n, 1)
    gam = np.sort(d2[iu])[(len(iu[0]) + 1) // 2 - 1]
    k = np.round(np.exp(-d2 / gam), 12)
    a = groups == 0
    b = ~a
    na, nb = int(a.sum()), int(b.sum())
    kaa = k[np.ix_(a, a)].sum() - np.diag(k)[a].sum()
    kbb = k[np.ix_(b, b)].sum() - np.diag(k)[b].sum()
    kab = k[np.ix_(a, b)].sum()
    return gam, (
        kaa / (na * (na - 1))
        + kbb / (nb * (nb - 1))
        - 2 * kab / (na * nb)
    )


def _load(sf_dir):
    raw = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.stack(raw.embedding.to_numpy()).astype(np.float64)
    g = (raw.vec_id.to_numpy() % 2).astype(int)
    return X, g


def test_matches_numpy(spark, sf_dir):
    out = mmd_embedding_halves(spark, sf_dir).toPandas().iloc[0]
    X, g = _load(sf_dir)
    gam, mmd = _mmd_np(X, g)
    na = int((g == 0).sum())
    nb = len(g) - na
    assert out.n_ord_pairs_a == na * (na - 1)
    assert out.n_ord_pairs_b == nb * (nb - 1)
    assert out.n_pairs_ab == na * nb
    assert abs(out.bandwidth - f6(gam)) < 1e-6
    assert abs(out.mmd2_u - f6(mmd)) < 1e-5


def test_permutation_null_brackets_emitted(spark, sf_dir):
    out = mmd_embedding_halves(spark, sf_dir).toPandas().iloc[0]
    X, g = _load(sf_dir)
    s, vals = 424242, []
    for _ in range(40):
        # deterministic LCG Fisher-Yates label shuffle
        perm = g.copy()
        for i in range(len(perm) - 1, 0, -1):
            s = (1103515245 * s + 12345) % (1 << 31)
            j = s % (i + 1)
            perm[i], perm[j] = perm[j], perm[i]
        vals.append(_mmd_np(X, perm)[1])
    vals = np.array(vals)
    lo, hi = np.percentile(vals, [2.5, 97.5])
    assert lo < out.mmd2_u < hi  # inside the null band
    assert (vals < 0).mean() > 0.2  # negatives are normal under H0


def test_planted_alternatives_fire():
    rng = np.random.RandomState(9)
    X = rng.randn(300, 64)
    g = np.arange(300) % 2
    _, null_mmd = _mmd_np(X, g)
    # mean shift on one half (before normalization)
    X2 = X.copy()
    X2[g == 1] += 0.25
    _, mmd_shift = _mmd_np(X2, g)
    # direction-concentration change on one half (×8 on 16 dims —
    # pure variance inflation is largely eaten by the normalization,
    # so the effective alternative is anisotropy, and it is weaker
    # than a mean shift: gated at 4× the null p95, not 10×)
    X3 = X.copy()
    X3[g == 1, :16] *= 8.0
    _, mmd_var = _mmd_np(X3, g)
    # null-scale estimate from a few permutations
    s, nulls = 7, []
    for _ in range(20):
        perm = g.copy()
        for i in range(len(perm) - 1, 0, -1):
            s = (1103515245 * s + 12345) % (1 << 31)
            j = s % (i + 1)
            perm[i], perm[j] = perm[j], perm[i]
        nulls.append(_mmd_np(X, perm)[1])
    p95 = np.percentile(nulls, 95)
    assert mmd_shift > 10 * max(p95, 1e-6)
    assert mmd_var > 4 * max(p95, 1e-6)
    assert abs(null_mmd) < 5 * max(abs(p95), 1e-6) + 1e-4


def test_honest_isotropy_bandwidth(spark, sf_dir):
    out = mmd_embedding_halves(spark, sf_dir).toPandas().iloc[0]
    # γ ≈ 2: the isotropic chord median — the E8/E11/E12 consensus
    assert 1.9 < out.bandwidth < 2.1
    assert abs(out.mmd2_u) < 5e-4  # same distribution, tiny |MMD²|
