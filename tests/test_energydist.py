"""Semantic gates for energydist_q (TS124): numpy recompute, the
permutation null band, planted shift/variance power, rotation
invariance, and the V-bias corpus pins."""

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.energydist_q import (
    energy_distance_halves,
)


def _chords(X):
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    return np.sqrt(np.maximum(2 - 2 * (Xn @ Xn.T), 0))


def _e_stat(D, mask):
    A = np.where(mask)[0]
    B = np.where(~mask)[0]
    return (
        2 * D[np.ix_(A, B)].mean()
        - D[np.ix_(A, A)].mean()
        - D[np.ix_(B, B)].mean()
    )


def test_matches_numpy(spark, sf_dir):
    out = energy_distance_halves(spark, sf_dir).toPandas().iloc[0]
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values(
        "vec_id"
    )
    X = np.vstack(emb.embedding.to_numpy()).astype(np.float64)
    D = _chords(X)
    g = emb.vec_id.to_numpy() % 2 == 0
    e = _e_stat(D, g)
    na, nb = int(g.sum()), int((~g).sum())
    assert out.n_pairs_aa == na * na
    assert abs(out.energy_dist - e) < 1e-4
    assert abs(out.t_stat - na * nb / (na + nb) * e) < 1e-2


def _lcg_normal(seed, shape):
    s = seed
    total = int(np.prod(shape))
    out = np.empty(total)
    for i in range(total):
        acc = 0.0
        for _ in range(12):
            s = (1103515245 * s + 12345) % (1 << 31)
            acc += s / (1 << 31)
        out[i] = acc - 6.0
    return out.reshape(shape)


def _euclid(X):
    sq = (X**2).sum(1)
    return np.sqrt(
        np.maximum(sq[:, None] + sq[None, :] - 2 * X @ X.T, 0)
    )


def test_planted_power_and_null():
    X = _lcg_normal(3, (120, 16))
    Y = _lcg_normal(9, (120, 16))
    Z = np.vstack([X, Y])
    mask = np.arange(240) < 120
    D = _euclid(Z)
    e_null = _e_stat(D, mask)
    # permutation 95th percentile
    rng = np.random.RandomState(1)
    perms = [
        _e_stat(D, rng.permutation(240) < 120) for _ in range(60)
    ]
    p95 = np.percentile(perms, 95)
    assert e_null < p95 * 2  # null inside / near the band
    # mean shift fires
    Zs = Z.copy()
    Zs[120:] += 0.6
    assert _e_stat(_euclid(Zs), mask) > 3 * p95
    # variance inflation fires
    Zv = Z.copy()
    Zv[120:] *= 1.6
    assert _e_stat(_euclid(Zv), mask) > 3 * p95


def test_rotation_invariance():
    X = _lcg_normal(5, (80, 8))
    mask = np.arange(80) < 40
    Q, _ = np.linalg.qr(_lcg_normal(7, (8, 8)))
    e1 = _e_stat(_euclid(X), mask)
    e2 = _e_stat(_euclid(X @ Q), mask)
    assert abs(e1 - e2) < 1e-9


def test_honest_v_bias_pins(spark):
    out = energy_distance_halves(
        spark, "/root/testdata/sf0.01"
    ).toPandas().iloc[0]
    assert abs(out.energy_dist - 0.011147) < 1e-5
    assert abs(out.t_stat - 1.393335) < 1e-4
    # the V-bias lesson: the observed value ≈ its null EXPECTATION
    emb = pd.read_parquet(
        "/root/testdata/sf0.01/embeddings.parquet"
    ).sort_values("vec_id")
    X = np.vstack(emb.embedding.to_numpy()).astype(np.float64)
    D = _chords(X)
    rng = np.random.RandomState(0)
    n0 = int((emb.vec_id % 2 == 0).sum())
    perms = [
        _e_stat(D, rng.permutation(len(emb)) < n0)
        for _ in range(30)
    ]
    lo, hi = np.min(perms), np.max(perms)
    assert lo <= out.energy_dist <= hi  # dead-center null
    assert np.mean(perms) > 0.008  # the bias is NOT ≈ 0
