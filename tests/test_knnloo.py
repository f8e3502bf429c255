"""Semantic gates for knnloo_q (E15): numpy recompute of all three
k rows, planted blob separability, shuffle collapse, duplicate
1-NN degeneracy, and the corpus chance-band reading."""

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.knnloo_q import (
    _KS,
    _NV,
    knn_loo_classifier,
)


def _knn_loo_ref(X, y, k):
    n = len(X)
    D = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(D, np.inf)
    correct = 0
    for i in range(n):
        order = sorted(range(n), key=lambda j: (D[i, j], j))[:k]
        votes = {}
        for o in order:
            votes[y[o]] = votes.get(y[o], 0) + 1
        # pinned tie-break: max count, then smallest label
        pred = min(votes, key=lambda c: (-votes[c], c))
        correct += pred == y[i]
    return correct


def test_matches_numpy(spark, sf_dir):
    out = (
        knn_loo_classifier(spark, sf_dir)
        .toPandas()
        .set_index("k")
        .sort_index()
    )
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    emb = emb[emb.vec_id < _NV].sort_values("vec_id")
    X = np.vstack(emb.embedding.to_numpy()).astype(np.float64)
    y = emb.label.to_numpy()
    n_maj = np.bincount(y).max()
    for k in _KS:
        row = out.loc[k]
        assert row.n == len(emb)
        assert row.n_correct == _knn_loo_ref(X, y, k)
        assert abs(row.lift - row.n_correct / n_maj) < 1e-5


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


def test_planted_blobs_and_shuffle():
    centers = np.eye(5) * 20.0
    X = np.vstack(
        [
            centers[c] + _lcg_normal(10 + c, (30, 5))
            for c in range(5)
        ]
    )
    y = np.repeat(np.arange(5), 30)
    for k in (1, 5):
        acc = _knn_loo_ref(X, y, k) / len(y)
        assert acc > 0.95  # separable blobs: the probe fires
    # label shuffle: same geometry, labels destroyed → chance
    s = 777
    perm = np.arange(len(y))
    for i in range(len(perm) - 1, 0, -1):
        s = (1103515245 * s + 12345) % (1 << 31)
        j = (s >> 12) % (i + 1)
        perm[i], perm[j] = perm[j], perm[i]
    acc_sh = _knn_loo_ref(X, y[perm], 5) / len(y)
    assert acc_sh < 0.4


def test_duplicate_1nn_degeneracy():
    base = _lcg_normal(3, (40, 4))
    X = np.vstack([base, base + 1e-9])
    y = np.concatenate([np.arange(40) % 4, np.arange(40) % 4])
    assert _knn_loo_ref(X, y, 1) == len(y)  # twin always wins


def test_honest_chance_band(spark):
    out = (
        knn_loo_classifier(spark, "/root/testdata/sf0.01")
        .toPandas()
        .set_index("k")
        .sort_index()
    )
    assert abs(out.loc[1].lift - 0.916667) < 1e-5
    assert abs(out.loc[5].lift - 1.0) < 1e-5
    assert abs(out.loc[10].lift - 0.916667) < 1e-5
    # no k shows structure: the no-leakage verdict
    assert out.lift.max() < 1.3
