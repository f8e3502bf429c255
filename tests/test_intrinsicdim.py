"""Semantic gates for intrinsicdim_q (E11): full numpy recompute of
the brute-kNN + MLE pipeline for every point, the planted 2-D
manifold control, the high-dimension saturation asymmetry, the
duplicate-point guard, and the honest corpus bands."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.intrinsicdim_q import (
    _K,
    intrinsic_dim_mle,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _mle_np(X, k=_K):
    """Textbook Levina–Bickel on unit-sphere chord distances; returns
    per-point m̂ (nan where guarded) — independent of the SQL route."""
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    cos = Xn @ Xn.T
    n = len(X)
    out = np.full(n, np.nan)
    for i in range(n):
        order = sorted(
            (j for j in range(n) if j != i),
            key=lambda j: (-cos[i, j], j),
        )
        nn = order[:k]
        d2 = np.round(2.0 - 2.0 * cos[i, nn], 12)
        if d2.min() <= 0:
            continue
        invsum = ((k - 1) * math.log(d2[-1])
                  - np.log(d2[:-1]).sum()) / 2.0
        out[i] = (k - 1) / invsum
    return out


def test_matches_numpy(spark, sf_dir):
    out = (
        intrinsic_dim_mle(spark, sf_dir).toPandas().set_index("vec_id")
    )
    raw = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.stack(raw.embedding.to_numpy()).astype(np.float64)
    ref = _mle_np(X)
    assert len(out) == len(raw)
    diffs = []
    for i, vid in enumerate(raw.vec_id):
        row = out.loc[vid]
        assert not math.isnan(ref[i])
        diffs.append(abs(row.mle_dim - f6(ref[i])))
    diffs = np.array(diffs)
    # near-tie rank flips between numpy's dot and the pinned fold can
    # nudge a boundary neighbor; the MLE moves negligibly when they do
    assert (diffs < 1e-3).mean() > 0.97
    assert diffs.max() < 0.5


def test_planted_2d_manifold():
    # 64-D points in a 3-D linear subspace: the chord metric
    # normalizes onto the unit sphere, so the manifold the MLE sees
    # is the 2-sphere — it must read ~2.  (The first draft used a 2-D
    # subspace and was surprised by m̂ ≈ 1: normalization collapses a
    # plane through the origin to a great CIRCLE — caught live, and
    # the 1-D reading was the estimator being RIGHT.)
    rng = np.random.RandomState(7)
    M = rng.randn(64, 3)
    Z = rng.randn(400, 3)
    m = _mle_np(Z @ M.T)
    mg = 400 * (_K - 1) / ((_K - 1) / m).sum()
    assert 1.6 < mg < 2.6
    assert np.percentile(m, 95) < 4.0
    # and the great-circle case reads 1, pinned
    Z2 = rng.randn(400, 2)
    m1 = _mle_np(Z2 @ rng.randn(64, 2).T)
    mg1 = 400 * (_K - 1) / ((_K - 1) / m1).sum()
    assert 0.8 < mg1 < 1.3


def test_high_d_saturation_asymmetry():
    # full-rank 64-D gaussian: reads high but biased BELOW ambient —
    # low readings trustworthy, high readings saturate
    rng = np.random.RandomState(11)
    m = _mle_np(rng.randn(400, 64))
    mg = 400 * (_K - 1) / ((_K - 1) / m).sum()
    assert 20 < mg < 55  # far above collapse, below ambient 64
    # and the two controls are separated by an order of magnitude
    Z = rng.randn(400, 3) @ rng.randn(3, 64)
    mg2 = 400 * (_K - 1) / ((_K - 1) / _mle_np(Z)).sum()
    assert mg > 8 * mg2


def test_duplicate_point_guard():
    # a duplicated point has d2 = 0 to its twin → guarded nan
    rng = np.random.RandomState(3)
    X = rng.randn(50, 64)
    X[13] = X[7]
    m = _mle_np(X)
    assert math.isnan(m[13]) and math.isnan(m[7])
    assert np.isfinite(np.delete(m, [7, 13])).all()


def test_honest_corpus_bands(spark, sf_dir):
    out = intrinsic_dim_mle(spark, sf_dir).toPandas()
    assert out.mle_dim.notna().all()  # no duplicate embeddings
    n = len(out)
    lb = out.mle_dim.mean()
    mg = n * (_K - 1) / out.mle_inv.sum() / 2.0 * 2.0
    assert 30 < lb < 45 and 28 < mg < 40
    assert mg < lb  # inverse-averaging tempers the right tail
    assert out.mle_dim.min() > 10  # nowhere near manifold collapse
    assert out.mle_dim.max() > 80  # the heavy per-point right tail
