"""Semantic gates for cka_q (E17): numpy recompute of all three
views, the rotated = 1 identity, planted shared-structure and
independence cases, scale invariance, and the halves-at-the-floor
corpus reading."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.cka_q import (
    _DH,
    _PERM,
    _SIGN,
    cka_views,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _cka_ref(X, Y):
    Xc = X - X.mean(0)
    Yc = Y - Y.mean(0)
    cxy = Xc.T @ Yc
    cxx = Xc.T @ Xc
    cyy = Yc.T @ Yc
    return (cxy**2).sum() / (
        math.sqrt((cxx**2).sum()) * math.sqrt((cyy**2).sum())
    )


def _views(emb):
    X = np.vstack(emb.embedding.to_numpy()).astype(np.float64)
    x = X[:, :_DH]
    halves_y = X[:, _DH:]
    rot_y = np.column_stack(
        [_SIGN[j] * x[:, _PERM[j]] for j in range(_DH)]
    )
    mis_y = X[::-1, _DH:]
    return x, halves_y, rot_y, mis_y


def test_matches_numpy(spark, sf_dir):
    out = (
        cka_views(spark, sf_dir).toPandas().set_index("view")
    )
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values(
        "vec_id"
    )
    x, hy, ry, my = _views(emb)
    assert abs(out.loc["halves"].cka - f6(_cka_ref(x, hy))) < 1e-5
    assert abs(out.loc["rotated"].cka - f6(_cka_ref(x, ry))) < 1e-5
    assert abs(out.loc["misaligned"].cka - f6(_cka_ref(x, my))) < 1e-5


def test_rotated_identity():
    # any signed permutation is orthogonal: CKA ≡ 1
    rng = np.random.RandomState(3)
    X = rng.normal(size=(200, _DH))
    Y = np.column_stack(
        [_SIGN[j] * X[:, _PERM[j]] for j in range(_DH)]
    )
    assert abs(_cka_ref(X, Y) - 1.0) < 1e-12


def test_planted_shared_structure():
    rng = np.random.RandomState(7)
    X = rng.normal(size=(400, _DH))
    W = rng.normal(size=(_DH, _DH))
    Y = X @ W + 0.1 * rng.normal(size=(400, _DH))
    assert _cka_ref(X, Y) > 0.5  # real shared structure reads high
    # and a pure rotation of X reads ≈ 1
    Q, _ = np.linalg.qr(rng.normal(size=(_DH, _DH)))
    assert abs(_cka_ref(X, X @ Q) - 1.0) < 1e-10


def test_independence_floor():
    rng = np.random.RandomState(11)
    vals = [
        _cka_ref(
            rng.normal(size=(500, _DH)), rng.normal(size=(500, _DH))
        )
        for _ in range(10)
    ]
    # the d/n-order finite-sample floor, NOT ~0
    assert 0.03 < np.mean(vals) < 0.09


def test_scale_invariance():
    rng = np.random.RandomState(5)
    X = rng.normal(size=(150, _DH))
    Y = rng.normal(size=(150, _DH))
    assert abs(_cka_ref(X, 3.0 * Y) - _cka_ref(X, Y)) < 1e-12


def test_honest_halves_at_floor(spark):
    out = (
        cka_views(spark, "/root/testdata/sf0.01")
        .toPandas()
        .set_index("view")
    )
    assert out.loc["rotated"].cka == 1.0
    assert abs(out.loc["misaligned"].cka - 0.059247) < 1e-5
    assert abs(out.loc["halves"].cka - 0.064120) < 1e-5
    # the verdict: halves indistinguishable from the misaligned floor
    assert (
        abs(out.loc["halves"].cka - out.loc["misaligned"].cka) < 0.02
    )
