"""Semantic gates for matryoshka_q (E18): numpy recompute of the
curve, the self-identity and monotonicity invariants, the planted
decay-spectrum contrast, and the sub-proportional corpus pins."""

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.matryoshka_q import (
    _DIMS,
    _K,
    _NQ,
    matryoshka_recall_curve,
)


def _curve_ref(X, dims=_DIMS, nq=_NQ, k=_K):
    n = len(X)

    def topk(M):
        sims = (M @ M.T) / (
            np.linalg.norm(M, axis=1)[:, None]
            * np.linalg.norm(M, axis=1)[None, :]
        )
        out = {}
        for q in range(nq):
            order = sorted(
                (j for j in range(n) if j != q),
                key=lambda j: (-round(sims[q, j], 12), j),
            )[:k]
            out[q] = set(order)
        return out

    exact = topk(X)
    curve = {}
    for d in dims:
        approx = topk(X[:, :d])
        hits = sum(
            len(exact[q] & approx[q]) for q in range(nq)
        )
        curve[d] = hits / (nq * k)
    return curve


def test_matches_numpy(spark, sf_dir):
    out = (
        matryoshka_recall_curve(spark, sf_dir)
        .toPandas()
        .set_index("dims")
        .sort_index()
    )
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values(
        "vec_id"
    )
    X = np.vstack(emb.embedding.to_numpy()).astype(np.float64)
    curve = _curve_ref(X)
    for d in _DIMS:
        assert abs(out.loc[d].recall_at_k - curve[d]) < 1e-6


def test_identity_and_monotone(spark):
    out = (
        matryoshka_recall_curve(spark, "/root/testdata/sf0.01")
        .toPandas()
        .set_index("dims")
        .sort_index()
    )
    assert out.loc[64].recall_at_k == 1.0
    vals = out.recall_at_k.tolist()
    assert vals == sorted(vals)  # strict curve


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


def test_planted_decay_spectrum():
    # energy-decaying coordinates (matryoshka-like): the first 8
    # dims carry nearly all the geometry → high recall at d = 8
    Z = _lcg_normal(7, (120, 64))
    scales = np.exp(-np.arange(64) / 3.0)
    X = Z * scales
    curve = _curve_ref(X, nq=8)
    assert curve[8] > 0.85
    # generic isotropic: far lower at the same width
    curve0 = _curve_ref(Z, nq=8)
    assert curve0[8] < 0.4


def test_honest_subproportional_pins(spark):
    out = (
        matryoshka_recall_curve(spark, "/root/testdata/sf0.01")
        .toPandas()
        .set_index("dims")
        .sort_index()
    )
    assert abs(out.loc[8].recall_at_k - 0.1125) < 1e-6
    assert abs(out.loc[16].recall_at_k - 0.2125) < 1e-6
    assert abs(out.loc[32].recall_at_k - 0.35) < 1e-6
    # sub-proportional: half the dims, barely a third of the
    # neighbors
    assert out.loc[32].recall_at_k < 0.4
