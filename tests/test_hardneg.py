"""Semantic gates for hardneg_q (T96): numpy recompute of ranks,
cosines, and the exclusion depth; the no-same-label invariant; the
near-zero label tax on the isotropic corpus (vs the unfiltered T8
ranking); and the planted label-clustered control where mining
actually bites."""

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.hardneg_q import (
    _K,
    _NQ,
    hard_negative_mining,
)


def _mine_np(X, labels, ids, nq, k):
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    C = Xn @ Xn.T
    out = []
    for qi in range(len(X)):
        if ids[qi] >= nq:
            continue
        cands = [
            (C[qi, j], ids[j], labels[j])
            for j in range(len(X))
            if j != qi
        ]
        negs = sorted(
            [c for c in cands if c[2] != labels[qi]],
            key=lambda t: (-t[0], t[1]),
        )
        kth = negs[k - 1][0]
        n_excl = sum(
            1 for c in cands if c[2] == labels[qi] and c[0] > kth
        )
        for r, (cos, nid, nlab) in enumerate(negs[:k], 1):
            out.append(
                (ids[qi], labels[qi], r, nid, nlab, round(cos, 4), n_excl)
            )
    return pd.DataFrame(
        out,
        columns=[
            "query_id", "q_label", "rank", "nn_id", "nn_label",
            "cosine", "n_same_excluded",
        ],
    )


def _load(sf_dir):
    raw = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values(
        "vec_id"
    )
    X = np.stack(raw.embedding.to_numpy()).astype(np.float64)
    return X, raw.label.to_numpy(), raw.vec_id.to_numpy()


def test_matches_numpy(spark, sf_dir):
    out = hard_negative_mining(spark, sf_dir).toPandas()
    X, labels, ids = _load(sf_dir)
    want = _mine_np(X, labels, ids, _NQ, _K)
    got = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    want = want.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert (got.query_id == want.query_id).all()
    assert (got.nn_id == want.nn_id).all()
    assert (got["rank"] == want["rank"]).all()
    assert np.allclose(got.cosine, want.cosine, atol=1e-4)
    assert (got.n_same_excluded == want.n_same_excluded).all()


def test_no_same_label_and_shape(spark, sf_dir):
    out = hard_negative_mining(spark, sf_dir).toPandas()
    assert len(out) == _NQ * _K
    assert (out.q_label != out.nn_label).all()
    assert set(out["rank"]) == set(range(1, _K + 1))
    # the measured near-zero label tax on isotropic data
    t1 = out[out["rank"] == 1]
    assert abs(t1.cosine.mean() - 0.3566) < 1e-3
    assert out.groupby("query_id").n_same_excluded.first().mean() < 1.5


def test_planted_clusters_make_negatives_hard():
    """Label-clustered embeddings: the anchor's own cluster fills the
    top of the ranking, so mining excludes it wholesale and the kept
    hard negatives are far less similar than the unfiltered top-k."""
    rng = np.random.RandomState(6)
    centers = rng.randn(3, 64) * 3
    X, labels = [], []
    for c in range(3):
        for _ in range(10):
            X.append(centers[c] + rng.randn(64) * 0.05)
            labels.append(c)
    X = np.vstack(X)
    labels = np.array(labels)
    ids = np.arange(len(X))
    mined = _mine_np(X, labels, ids, nq=10, k=3)
    # every anchor (label 0) excluded its remaining 9 clustermates
    assert (mined.groupby("query_id").n_same_excluded.first() == 9).all()
    # and the mined negatives are dramatically less similar than the
    # unfiltered nearest neighbor (a clustermate at cos ~ 1)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    C = Xn @ Xn.T
    for qi in range(10):
        unfiltered_top = max(
            C[qi, j] for j in range(len(X)) if j != qi
        )
        hard_top = mined[
            (mined.query_id == qi) & (mined["rank"] == 1)
        ].cosine.iloc[0]
        assert unfiltered_top > 0.99
        assert hard_top < unfiltered_top - 0.5
