"""Semantic gates for procrustes_q (E6): the align verdict proves the
planted rotation is recovered; the cross-gram oracled twin equals the
numpy AᵀB; and a noisy hand case shows Procrustes still finds the
best rotation when B is perturbed."""

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.procrustes_q import (
    _COS,
    _D,
    _SIN,
    _q0,
    procrustes_align,
    procrustes_cross_gram,
)


def _ab(sf_dir):
    df = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    a = np.vstack(df.embedding.to_numpy()).astype(np.float64)
    return a, a @ _q0()


def test_align_recovers_planted_rotation(spark, sf_dir):
    row = procrustes_align(spark, sf_dir).collect()[0]
    a, b = _ab(sf_dir)
    assert row.n == len(a)
    assert row.rotation_recovered == 1
    assert row.ortho_err_x1e12 < 1.0  # RtR = I to 1e-12
    assert row.recover_err_x1e6 < 1.0  # R = Q0 to 1e-6
    # aligned residual ~ 0 while the unaligned baseline is macroscopic
    assert row.resid_aligned < 1e-6
    assert row.resid_identity > 0.01 * row.fro_b
    fb = float((b * b).sum())
    assert abs(row.fro_b - fb) < 1e-4 * fb


def test_cross_gram_matches_numpy(spark, sf_dir):
    out = procrustes_cross_gram(spark, sf_dir).toPandas()
    assert len(out) == _D * _D
    a, b = _ab(sf_dir)
    m = a.T @ b
    got = out.set_index(["i", "j"]).m_ij
    for i, j in ((1, 1), (1, 2), (7, 33), (64, 64), (32, 1)):
        assert abs(got.loc[(i, j)] - round(m[i - 1, j - 1], 6)) < 2e-6


def test_noisy_hand_case():
    # B = A Q0 + noise: SVD Procrustes must beat both identity and the
    # noisy-gram naive normalization, and stay orthogonal
    rng = np.random.RandomState(5)
    a = rng.randn(300, _D)
    q0 = _q0()
    assert np.abs(q0.T @ q0 - np.eye(_D)).max() < 1e-12
    b = a @ q0 + 0.01 * rng.randn(300, _D)
    u, _s, vt = np.linalg.svd(a.T @ b)
    r = u @ vt
    assert np.abs(r.T @ r - np.eye(_D)).max() < 1e-12
    res_r = ((a @ r - b) ** 2).sum()
    res_i = ((a - b) ** 2).sum()
    assert res_r < 0.01 * res_i
    assert np.abs(r - q0).max() < 0.01
    # pinned literals really are cos/sin of the same angle
    assert abs(float(_COS) ** 2 + float(_SIN) ** 2 - 1.0) < 1e-15
