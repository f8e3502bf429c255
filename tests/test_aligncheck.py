"""Semantic gates for aligncheck_q (E10): numpy recompute of both
functionals, the unit-norm premise, a planted clustered-labels
positive control (alignment ≪ random when labels mean something),
and the honest labels-are-geometric-noise consistency with T69."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.aligncheck_q import (
    embed_alignment,
    embed_uniformity,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _emb(sf_dir):
    e = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    A = np.vstack(e.embedding.to_numpy()).astype(np.float64)
    return e, A


def test_unit_norm_premise(sf_dir):
    _, A = _emb(sf_dir)
    n = np.linalg.norm(A, axis=1)
    assert abs(n - 1).max() < 1e-6


def test_alignment_matches_numpy(spark, sf_dir):
    e, A = _emb(sf_dir)
    out = embed_alignment(spark, sf_dir).toPandas().set_index("label")
    for lbl in sorted(e.label.unique()):
        g = e[e.label == lbl].sort_values("vec_id")
        idx = g.index.to_numpy()
        d2 = ((A[idx[1:]] - A[idx[:-1]]) ** 2).sum(axis=1)
        d2r = np.round(d2, 12)
        r = out.loc[lbl]
        assert r.n_pairs == len(d2)
        assert abs(r.alignment - f6(d2r.sum() / len(d2r))) < 1e-6


def test_uniformity_matches_numpy(spark, sf_dir):
    e, A = _emb(sf_dir)
    ids = e.vec_id.to_numpy()
    pos = {v: k for k, v in enumerate(ids)}
    pairs = [
        (pos[v], pos[v + 1]) for v in ids if v % 2 == 0 and (v + 1) in pos
    ]
    d2 = np.array([((A[i] - A[j]) ** 2).sum() for i, j in pairs])
    out = embed_uniformity(spark, sf_dir).toPandas().iloc[0]
    assert out.n_pairs == len(pairs)
    assert abs(out.mean_d2 - f6(np.round(d2, 12).sum() / len(d2))) < 1e-6
    uni = math.log(np.round(np.exp(-2 * d2), 12).sum() / len(d2))
    assert abs(out.uniformity - f6(uni)) < 1e-6


def test_planted_clustered_labels_control():
    # when labels DO mean something, alignment drops far below the
    # random-pair level: 4 tight caps on the sphere
    centers = np.zeros((4, 64))
    for k in range(4):
        centers[k, k] = 1.0
    pts, labels = [], []
    # INTERLEAVED so consecutive indices straddle caps — the random-
    # pair sample must actually be cross-label
    for i in range(30):
        for k in range(4):
            v = centers[k].copy()
            v[(k + 7 + i) % 64] += 0.1 * ((i % 5) - 2) / 2.0
            v /= np.linalg.norm(v)
            pts.append(v)
            labels.append(k)
    P = np.vstack(pts)
    lab = np.array(labels)
    align = np.mean(
        [
            ((P[i] - P[j]) ** 2).sum()
            for k in range(4)
            for i, j in zip(
                np.nonzero(lab == k)[0][:-1], np.nonzero(lab == k)[0][1:]
            )
        ]
    )
    rand = np.mean(
        [((P[i] - P[i + 1]) ** 2).sum() for i in range(0, len(P) - 1, 2)]
    )
    assert align < 0.1
    assert rand > 0.5  # consecutive pairs straddle caps


def test_honest_labels_are_noise(spark, sf_dir):
    a = embed_alignment(spark, sf_dir).toPandas()
    u = embed_uniformity(spark, sf_dir).toPandas().iloc[0]
    # same-label alignment ≈ 2 ≈ the random-pair mean: the planted
    # labels carry no geometry (T69's silhouette ≈ 0, cross-checked)
    assert 1.8 < a.alignment.min() and a.alignment.max() < 2.2
    assert abs(a.alignment.mean() - u.mean_d2) < 0.15
    # the space itself is healthy-uniform
    assert -4.2 < u.uniformity < -3.5
