"""Semantic gates for pca_q (E8): numpy full-data recompute of the
covariance spectrum and the oracled scatter cells, the distributed
proj_var ≡ λ eigenpair proof, the trace identity, the planted
rank-3 positive control, and the honest flat-spectrum reading."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.pca_q import (
    _D,
    _TOPK,
    pca_cov_cells,
    pca_embeddings,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _a(sf_dir):
    e = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    return np.vstack(e.embedding.to_numpy()).astype(np.float64)


def test_cov_cells_match_numpy(spark, sf_dir):
    a = _a(sf_dir)
    out = pca_cov_cells(spark, sf_dir).toPandas()
    assert len(out) == _D * (_D + 1) // 2
    s = a.T @ a
    marg = a.sum(axis=0)
    for _, r in out.head(200).iterrows():
        i, j = int(r.i) - 1, int(r.j) - 1
        assert abs(r.s_ij - round(s[i, j], 6)) < 2e-6
        want_diag = marg[i] if i == j else 0.0
        assert abs(r.s_i_diag - round(want_diag, 6)) < 2e-6
        assert r.n == len(a)


def test_spectrum_matches_numpy(spark, sf_dir):
    a = _a(sf_dir)
    cov = np.cov(a, rowvar=False, bias=True)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    trace = float(np.trace(cov))
    out = pca_embeddings(spark, sf_dir).toPandas().sort_values("rank")
    assert len(out) == _TOPK
    for k in range(_TOPK):
        row = out.iloc[k]
        assert abs(row.eigenvalue - f6(float(evals[k]))) < 2e-6
        assert abs(row.evr - f6(float(evals[k]) / trace)) < 2e-6
        # the distributed eigenpair proof: projection variance of the
        # k-th component, recomputed against the data, equals λ_k
        assert abs(row.proj_var - row.eigenvalue) < 3e-6
        assert abs(row.trace - f6(trace)) < 2e-6
    # cumulative EVR is the running sum and monotone
    cums = out.cum_evr.to_numpy()
    assert (np.diff(cums) > 0).all()
    assert abs(cums[0] - out.evr.iloc[0]) < 1e-9
    # trace identity: ALL eigenvalues sum to the trace
    assert abs(evals.sum() - trace) < 1e-9


def test_planted_rank3_positive_control():
    # rank-3 data: exactly 3 nonzero eigenvalues carrying everything
    rng_base = np.arange(500, dtype=np.float64)
    b1 = np.sin(rng_base * 0.1)
    b2 = np.cos(rng_base * 0.07)
    b3 = ((rng_base * 37) % 11 - 5) / 5.0
    v = np.zeros((3, _D))
    v[0, 0], v[1, 5], v[2, 17] = 3.0, 2.0, 1.0
    a = np.outer(b1, v[0]) + np.outer(b2, v[1]) + np.outer(b3, v[2])
    cov = np.cov(a, rowvar=False, bias=True)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    assert evals[2] > 1e-6
    assert abs(evals[3]) < 1e-10
    assert abs(evals[:3].sum() - np.trace(cov)) < 1e-9


def test_honest_flat_spectrum(spark, sf_dir):
    out = pca_embeddings(spark, sf_dir).toPandas().sort_values("rank")
    iso = 1.0 / _D
    # near-isotropic: top EVR barely above the 1/64 floor, and the
    # top-8 together carry ~20%, far from low-rank
    assert iso < out.evr.iloc[0] < 3 * iso
    assert out.cum_evr.iloc[-1] < 0.35
