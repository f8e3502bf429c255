"""Semantic gates for hubness_q (E7): numpy full-matrix recompute of
the k-occurrence counts and skew, the Σ N_k = n·k identity, the int64
bound, and the mild-positive-skew honest reading."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.hubness_q import _K, hubness_diagnostic

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def test_matches_numpy(spark, sf_dir):
    row = hubness_diagnostic(spark, sf_dir).collect()[0]
    df = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values(
        "vec_id"
    )
    e = np.vstack(df.embedding.to_numpy()).astype(np.float64)
    ids = df.vec_id.to_numpy()
    n = len(e)
    en = e / np.linalg.norm(e, axis=1, keepdims=True)
    cos = en @ en.T
    np.fill_diagonal(cos, -np.inf)
    nk = np.zeros(n, dtype=np.int64)
    for qi in range(n):
        # rank by (cos DESC, nn_id ASC): sort on (-cos, id)
        order = np.lexsort((ids, -cos[qi]))
        nk[order[:_K]] += 1
    assert row.n == n and row.k == _K
    assert row.s1 == int(nk.sum()) == n * _K  # every query hands out k
    assert row.s2 == int((nk**2).sum())
    assert row.s3 == int((nk**3).sum())
    # int64 bound far away: s3 <= n * max_nk^3
    assert n * int(nk.max()) ** 3 < 2**62
    assert row.max_nk == int(nk.max())
    assert row.n_hubs == int((nk > 2 * _K).sum())
    assert row.n_antihubs == int((nk == 0).sum())
    m2 = float(n * (nk**2).sum() - nk.sum() ** 2)
    m3 = float(
        n * n * (nk**3).sum()
        - 3 * n * nk.sum() * (nk**2).sum()
        + 2 * nk.sum() ** 3
    )
    skew = m3 / (m2 * math.sqrt(m2))
    assert abs(row.nk_skew - f6(skew)) < 1e-6
    # honest reading: near-isotropic d=64 vectors at n=500 → mild but
    # strictly positive hubness skew, a max well above k, and NO
    # antihubs yet (the pathology is only beginning at this d/n)
    assert 0.0 < row.nk_skew < 1.0
    assert row.max_nk > _K
    assert row.n_antihubs == 0


def test_hand_case():
    # 3 points on a line: the middle point is everyone's 1-NN → N_1 =
    # (0, 2, 0)... with points a=(0), b=(1), c=(3) in 1-D by euclid;
    # here just validate the skew formula on a known count vector
    nk = np.array([0, 2, 1], dtype=np.int64)
    n = 3
    m2 = n * (nk**2).sum() - nk.sum() ** 2
    m3 = (
        n * n * (nk**3).sum()
        - 3 * n * nk.sum() * (nk**2).sum()
        + 2 * nk.sum() ** 3
    )
    skew = m3 / (m2 * math.sqrt(m2))
    yc = nk - nk.mean()
    direct = (yc**3).mean() / (yc**2).mean() ** 1.5
    assert abs(skew - direct) < 1e-12
