"""Semantic gates for jl_q (E9): numpy recompute of the pinned sign
matrix, every projection, and every distance ratio; the linearity
identity proj(a) − proj(b) = proj(a−b); sign-matrix balance; and the
honest measured distortion band at d′ = 16."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.jl_q import (
    _D,
    _DP,
    _P0,
    jl_projection_audit,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _signs():
    i = np.arange(1, _D + 1, dtype=object)[:, None]
    j = np.arange(1, _DP + 1, dtype=object)[None, :]
    h = (i * 2654435761 + j * 40503) % _P0
    return (1 - 2 * (((h * h) % _P0) % 2)).astype(np.float64)


def test_matches_numpy(spark, sf_dir):
    e = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    A = np.vstack(e.embedding.to_numpy()).astype(np.float64)
    ids = e.vec_id.to_numpy()
    S = _signs()
    P = A @ S
    out = jl_projection_audit(spark, sf_dir).toPandas().set_index("vec_a")
    idx = {v: k for k, v in enumerate(ids)}
    n_pairs = sum(1 for v in ids if v % 2 == 0 and (v + 1) in idx)
    assert len(out) == n_pairs > 0
    for va, r in out.iterrows():
        a, b = A[idx[va]], A[idx[va + 1]]
        pa, pb = P[idx[va]], P[idx[va + 1]]
        d2o = float(((a - b) ** 2).sum())
        d2p = float(((pa - pb) ** 2).sum())
        assert abs(r.d2_orig - f6(d2o)) < 2e-6
        assert abs(r.d2_proj - f6(d2p)) < max(2e-6, 1e-10 * d2p)
        ratio = d2p / (_DP * d2o)
        assert abs(r.ratio - f6(ratio)) < 1e-5
        assert r.within_2sd == (1 if abs(ratio - 1) < 0.70 else 0)
        # linearity: proj(a) − proj(b) == proj(a − b)
        assert np.allclose(pa - pb, (a - b) @ S, atol=1e-9)


def test_sign_matrix_balance_and_determinism():
    S = _signs()
    assert set(np.unique(S)) == {-1.0, 1.0}
    # near-balanced overall and per projected dimension
    assert abs(S.mean()) < 0.1
    assert (np.abs(S.mean(axis=0)) < 0.5).all()
    # deterministic: same call, same matrix
    assert (S == _signs()).all()


def test_honest_distortion_band(spark, sf_dir):
    out = jl_projection_audit(spark, sf_dir).toPandas()
    ok = out.dropna(subset=["ratio"])
    # measured at d′=16: 94.8% in the 2σ band, median 0.944 — usable
    # for prefiltering, too coarse for final scoring
    assert (ok.within_2sd == 1).mean() > 0.85
    assert 0.8 < ok.ratio.median() < 1.2
    assert ok.ratio.max() > 1.3 and ok.ratio.min() < 0.75
