"""Semantic gates for embedsample_q (E13b/TS124b): the md5 sample is
deterministic and engine-portable, the sampled statistics equal a full
numpy recompute on exactly that subset, both sampled values sit inside
their own label-permutation null bands at the SAMPLED size (the
statistical-agreement contract with the exact verification twins), the
planted mean-shift alternative still fires at m=126, and the corpus
pins (63/63 split, ~16x pair reduction, V-bias ~1/m scaling)."""

import hashlib
import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.embedsample_q import (
    energy_distance_sampled,
    mmd_sampled,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _keep(vec_id: int) -> bool:
    h = hashlib.md5(f"esub|{vec_id}".encode()).hexdigest()[:8]
    return int(h, 16) % 4 == 0


def _load_sample(sf_dir):
    raw = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    m = raw.vec_id.map(_keep)
    sub = raw[m].sort_values("vec_id")
    X = np.stack(sub.embedding.to_numpy()).astype(np.float64)
    g = (sub.vec_id.to_numpy() % 2).astype(int)
    return raw, X, g


def _mmd_np(X, groups):
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


def _energy_np(X, groups):
    """V-form: 1/n^2 within-group means, diagonal zeros included."""
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    d = np.round(
        np.sqrt(np.maximum(np.round(2.0 - 2.0 * (Xn @ Xn.T), 12), 0.0)),
        12,
    )
    a = groups == 0
    b = ~a
    na, nb = int(a.sum()), int(b.sum())
    daa = d[np.ix_(a, a)].sum() / (na * na)
    dbb = d[np.ix_(b, b)].sum() / (nb * nb)
    dab = d[np.ix_(a, b)].sum() / (na * nb)
    e = 2 * dab - daa - dbb
    t = na * nb / (na + nb) * e  # sqrt of the PAIR counts = na, nb
    return e, t


def _perm_vals(X, g, stat_fn, n_perm=40, seed=424242):
    s, vals = seed, []
    for _ in range(n_perm):
        perm = g.copy()
        for i in range(len(perm) - 1, 0, -1):
            s = (1103515245 * s + 12345) % (1 << 31)
            j = s % (i + 1)
            perm[i], perm[j] = perm[j], perm[i]
        vals.append(stat_fn(X, perm))
    return np.array(vals)


def test_sample_is_deterministic_and_even(sf_dir):
    raw, X, g = _load_sample(sf_dir)
    # the md5 rule keeps 126 of 500, and both parity classes evenly
    assert len(X) == 126
    assert (g == 0).sum() == 63 and (g == 1).sum() == 63
    frac = len(X) / len(raw)
    assert 0.18 < frac < 0.32  # ~1/4 thinning


def test_mmd_sampled_matches_numpy(spark, sf_dir):
    out = mmd_sampled(spark, sf_dir).toPandas().iloc[0]
    _, X, g = _load_sample(sf_dir)
    gam, mmd = _mmd_np(X, g)
    na = int((g == 0).sum())
    nb = len(g) - na
    assert out.n_ord_pairs_a == na * (na - 1)
    assert out.n_ord_pairs_b == nb * (nb - 1)
    assert out.n_pairs_ab == na * nb
    assert abs(out.bandwidth - f6(gam)) < 1e-6
    assert abs(out.mmd2_u - f6(mmd)) < 1e-5
    # corpus pins — measured at sf0.001 (the fixture scale; the
    # sf0.01 sweep reads bandwidth 1.999323 / mmd2_u -0.001239)
    assert abs(out.bandwidth - 1.999999) < 1e-5
    assert abs(out.mmd2_u - (-0.001791)) < 1e-5


def test_energy_sampled_matches_numpy(spark, sf_dir):
    out = energy_distance_sampled(spark, sf_dir).toPandas().iloc[0]
    _, X, g = _load_sample(sf_dir)
    e, t = _energy_np(X, g)
    assert abs(out.energy_dist - f6(e)) < 1e-5
    assert abs(out.t_stat - f6(t)) < 1e-5
    # corpus pin — measured at sf0.001 (sf0.01 reads 0.042237);
    # and the pair-reduction accounting
    assert abs(out.energy_dist - 0.041528) < 1e-5
    assert out.n_pairs_ab == 63 * 63  # vs 250*250 exact tier: ~15.8x


def test_sampled_values_inside_their_own_null_bands(spark, sf_dir):
    """The agreement contract with the exact twins: on the corpus's
    same-distribution split, the SAMPLED statistics must read null
    at the SAMPLED size (both exact tiers are gated null at n=500;
    if sampling introduced bias beyond the declared V-floor these
    bands would catch it)."""
    _, X, g = _load_sample(sf_dir)
    m_out = mmd_sampled.__wrapped__ if hasattr(mmd_sampled, "__wrapped__") else mmd_sampled
    mv = m_out(spark, sf_dir).toPandas().iloc[0].mmd2_u
    ev = energy_distance_sampled(spark, sf_dir).toPandas().iloc[0].energy_dist
    mmd_null = _perm_vals(X, g, lambda x, p: _mmd_np(x, p)[1])
    e_null = _perm_vals(X, g, lambda x, p: _energy_np(x, p)[0])
    lo, hi = np.percentile(mmd_null, [2.5, 97.5])
    assert lo < mv < hi
    lo, hi = np.percentile(e_null, [2.5, 97.5])
    assert lo < ev < hi
    # the V-bias ~1/m scaling story, pinned: null CENTER ~4x the
    # exact tier's 0.0112 center (500/126 = 3.97)
    assert 0.03 < e_null.mean() < 0.06


def test_planted_shift_fires_at_sampled_size():
    """Power retained at m=126: a +0.35-mean-shifted half reads far
    above the 95th permutation percentile for BOTH statistics."""
    rng = np.random.RandomState(11)
    X = rng.randn(126, 64)
    g = np.arange(126) % 2
    X[g == 1] += 0.35
    _, mmd = _mmd_np(X, g)
    e, _ = _energy_np(X, g)
    mmd_null = _perm_vals(X, g, lambda x, p: _mmd_np(x, p)[1], n_perm=30)
    e_null = _perm_vals(X, g, lambda x, p: _energy_np(x, p)[0], n_perm=30)
    assert mmd > np.percentile(mmd_null, 95)
    assert e > np.percentile(e_null, 95)
