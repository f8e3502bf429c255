"""Semantic gates for anngraph_q (E14b/E15b/E11b): the pinned
md5-plane buckets equal a pure-Python recompute with the identical
fold order, the candidate graph's recall@10 and min-degree floors
hold, each ANN composition agrees with its brute twin within the
declared (measured) bands, and a planted far outlier still fires
through the ANN graph — the whole point of the composition."""

import hashlib
import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.anngraph_q import (
    _BITS,
    _DIM,
    _K,
    _NV_LOF,
    _PLANES,
    _TABLES,
    ann_graph_recall_check,
    intrinsic_dim_ann,
    knn_loo_ann,
    lof_ann,
)


def _py_buckets(vec):
    """The bucket rule re-derived with explicit left-fold float adds
    (the engines' op order)."""
    out = []
    for t in range(_TABLES):
        code = 0
        for r in range(_BITS):
            plane = _PLANES[t * _BITS + r]
            acc = 0.0
            for i in range(_DIM):
                acc += plane[i] * float(vec[i])
            if acc > 0.0:
                code += 1 << r
        out.append(t * 16 + code)
    return out


def _cand_sets(X):
    n = len(X)
    bks = [_py_buckets(X[i]) for i in range(n)]
    cand = [set() for _ in range(n)]
    from collections import defaultdict

    buckets = defaultdict(list)
    for i, bs in enumerate(bks):
        for b in bs:
            buckets[b].append(i)
    for mem in buckets.values():
        for i in mem:
            for j in mem:
                if i != j:
                    cand[i].add(j)
    return cand


def test_signs_are_md5_parity():
    for p in (0, 17, 63):
        for i in (0, 31, 63):
            h = int(
                hashlib.md5(f"lshp|{p}|{i}".encode()).hexdigest()[:8], 16
            )
            assert _PLANES[p][i] == (1 if h % 2 == 0 else -1)


def test_recall_check_matches_python(spark, sf_dir):
    out = ann_graph_recall_check(spark, sf_dir).toPandas().iloc[0]
    raw = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    sub = raw[raw.vec_id < _NV_LOF].sort_values("vec_id")
    X = np.stack(sub.embedding.to_numpy()).astype(np.float64)
    cand = _cand_sets(X)
    D = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    np.fill_diagonal(D, np.inf)
    brute = np.argsort(D, axis=1)[:, :_K]
    hits = sum(
        (j in cand[i]) for i in range(len(X)) for j in brute[i]
    )
    assert out.n_queries == len(X)
    assert out.n_hits == hits
    assert out.min_degree == min(len(c) for c in cand)
    assert out.n_cand_pairs == sum(len(c) for c in cand)
    # the declared floors: recall >= 0.8, every point has >= k cands
    assert out.recall_at_10 >= 0.80
    assert out.min_degree >= _K
    # corpus pins — measured (sf0.001)
    assert abs(out.recall_at_10 - 0.864) < 1e-6
    assert out.min_degree == 108


def test_lof_ann_vs_brute_band(spark, sf_dir):
    from dtaidistance_spark.operators.lof_q import lof_embeddings

    a = (
        lof_ann(spark, sf_dir)
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    b = (
        lof_embeddings(spark, sf_dir)
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    d = (a.lof - b.lof).abs()
    # measured band: concentration makes the approximation benign
    assert d.max() < 0.02
    assert (a.is_outlier == b.is_outlier).all()  # zero flag flips
    assert np.corrcoef(a.lof, b.lof)[0, 1] > 0.5


def test_loo_ann_stays_at_chance(spark, sf_dir):
    out = knn_loo_ann(spark, sf_dir).toPandas()
    assert set(out.k) == {1, 5, 10}
    assert (out.n == 300).all()
    # no label structure to lose: at or below the majority baseline
    assert (out.accuracy <= out.majority_baseline + 0.02).all()


def test_intrinsic_ann_vs_brute(spark, sf_dir):
    from dtaidistance_spark.operators.intrinsicdim_q import (
        intrinsic_dim_mle,
    )

    a = (
        intrinsic_dim_ann(spark, sf_dir)
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    b = (
        intrinsic_dim_mle(spark, sf_dir)
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    # corpus-median agreement (the saturation verdict is identical)
    assert abs(a.mle_dim.median() - 32.174496) < 1e-4
    assert abs(b.mle_dim.median() - 33.566224) < 1e-4
    rel = ((a.mle_dim - b.mle_dim).abs() / b.mle_dim.abs()).median()
    assert rel < 0.10  # measured 0.052
    # both far below ambient 64 — the E11 saturation story holds
    assert a.mle_dim.median() < 40 and b.mle_dim.median() < 40


def test_planted_outlier_fires_through_ann_graph():
    """A far singleton next to a tight cluster must keep LOF >> 2
    when neighborhoods come from the candidate graph — numpy
    recompute of the full composition."""
    rng = np.random.RandomState(3)
    X = np.vstack(
        [rng.randn(60, _DIM) * 0.05, 5.0 + np.zeros((1, _DIM))]
    )
    cand = _cand_sets(X)
    n = len(X)
    D = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    np.fill_diagonal(D, np.inf)
    Dm = D.copy()
    for i in range(n):
        mask = np.ones(n, dtype=bool)
        mask[list(cand[i])] = False
        mask[i] = True
        Dm[i, mask] = np.inf
    k = _K
    assert min(len(c) for c in cand) >= k  # tight cluster collides
    nn = np.argsort(Dm, axis=1)[:, :k]
    kd = Dm[np.arange(n), nn[:, -1]]
    reach = np.maximum(kd[nn], Dm[np.arange(n)[:, None], nn])
    lrd = k / reach.sum(1)
    lof = lrd[nn].mean(1) / lrd
    assert lof[-1] > 2.0  # the singleton fires
    assert np.median(lof[:-1]) < 1.2
