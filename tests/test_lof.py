"""Semantic gates for lof_q (E14): numpy recompute of the full
LOF chain, planted singleton / two-density / uniform-grid cases,
and the measured distance-concentration corpus reading."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.lof_q import _K, _NV, lof_embeddings

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _lof_ref(X, k=_K):
    """LOF with exact-k neighborhoods and (dist, id) tie-break."""
    n = len(X)
    D = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    np.fill_diagonal(D, np.inf)
    knn = []
    kdist = np.empty(n)
    for i in range(n):
        order = sorted(range(n), key=lambda j: (D[i, j], j))[:k]
        knn.append(order)
        kdist[i] = D[i, order[-1]]
    lrd = np.empty(n)
    for i in range(n):
        s = sum(max(kdist[o], D[i, o]) for o in knn[i])
        lrd[i] = k / s
    lof = np.array(
        [sum(lrd[o] for o in knn[i]) / k / lrd[i] for i in range(n)]
    )
    return kdist, lrd, lof


def test_matches_numpy(spark, sf_dir):
    out = (
        lof_embeddings(spark, sf_dir)
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    emb = emb[emb.vec_id < _NV].sort_values("vec_id")
    X = np.vstack(emb.embedding.to_numpy()).astype(np.float64)
    kdist, lrd, lof = _lof_ref(X)
    assert len(out) == len(emb)
    ids = emb.vec_id.to_numpy()
    for idx in range(0, len(ids), 17):
        row = out.loc[ids[idx]]
        assert abs(row.k_dist - f6(kdist[idx])) < 1e-5
        assert abs(row.lrd - f6(lrd[idx])) < 1e-5
        assert abs(row.lof - f6(lof[idx])) < 1e-5


def test_planted_singleton():
    rng = np.random.RandomState(3)
    X = np.vstack(
        [rng.normal(0, 1, size=(60, 8)), np.full((1, 8), 40.0)]
    )
    _, _, lof = _lof_ref(X)
    assert lof[-1] > 2.0
    assert np.median(lof[:-1]) < 1.3


def test_two_density_property():
    rng = np.random.RandomState(9)
    tight = rng.normal(0, 0.05, size=(40, 6))
    diffuse = rng.normal(8, 2.0, size=(40, 6))
    # a point at the EDGE of the tight cluster
    edge = np.zeros((1, 6))
    edge[0, 0] = 0.4  # 8σ from the tight center, inside the
    # diffuse cluster's scale
    X = np.vstack([tight, diffuse, edge])
    _, _, lof = _lof_ref(X)
    # defining property: the edge point out-scores every diffuse
    # member even though it is globally closer to a cluster center
    assert lof[-1] > lof[40:80].max()
    assert lof[-1] > 2.0


def test_uniform_grid_null():
    g = np.stack(
        np.meshgrid(np.arange(8), np.arange(8)), -1
    ).reshape(-1, 2).astype(float)
    _, _, lof = _lof_ref(g, k=4)
    # interior of a perfect grid: density ratios cancel
    assert np.median(lof) < 1.1
    assert lof.max() < 1.6  # edges mildly elevated, never extreme


def test_honest_concentration_band(spark):
    out = lof_embeddings(spark, "/root/testdata/sf0.01").toPandas()
    assert len(out) == _NV
    assert int(out.is_outlier.sum()) == 0
    assert out.lof.min() > 0.98
    assert out.lof.max() < 1.02
    assert abs(out.lof.median() - 1.0) < 0.01
    # top score pinned: vec_id 184 at 1.0137
    top = out.nlargest(1, "lof").iloc[0]
    assert int(top.vec_id) == 184
    assert abs(top.lof - 1.013688) < 1e-5
