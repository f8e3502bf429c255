"""Semantic gates for mmr_q (T94): full numpy recompute of the
greedy loop with the same rounding, the λ=1 degeneration to plain
relevance top-k, the planted-cluster coverage contrast (the property
MMR exists for), first-pick-is-argmax-rel, and the corpus pins."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.mmr_q import _K, mmr_diversified_topk

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _cos_matrix(X):
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    return np.round(Xn @ Xn.T, 12)


def _mmr_np(X, ids, q_idx, k=10, lam=0.7):
    """Greedy MMR against row q_idx; candidates = all other rows.
    Uses the same round(12) cosines and float arithmetic."""
    C = _cos_matrix(X)
    cand = [i for i in range(len(X)) if i != q_idx]
    rel = {i: C[i, q_idx] for i in cand}
    maxsim = {i: 0.0 for i in cand}
    picks = []
    for j in range(1, k + 1):
        best = min(
            cand,
            key=lambda i: (-(lam * rel[i] - (1 - lam) * maxsim[i]), ids[i]),
        )
        score = lam * rel[best] - (1 - lam) * maxsim[best]
        picks.append((j, ids[best], rel[best], maxsim[best], score))
        cand.remove(best)
        for i in cand:
            maxsim[i] = max(maxsim[i], C[i, best])
    return picks


def _load(sf_dir):
    raw = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values(
        "vec_id"
    )
    X = np.stack(raw.embedding.to_numpy()).astype(np.float64)
    return X, raw.vec_id.to_numpy()


def test_matches_numpy(spark, sf_dir):
    out = mmr_diversified_topk(spark, sf_dir).toPandas()
    X, ids = _load(sf_dir)
    picks = _mmr_np(X, ids, q_idx=0, k=_K, lam=0.7)
    for row, (j, pid, rel, ms, sc) in zip(out.itertuples(), picks):
        assert row.sel_idx == j and row.vec_id == pid
        assert abs(row.rel - f6(rel)) < 1e-6
        if j == 1:
            assert pd.isna(row.maxsim)
        else:
            assert abs(row.maxsim - f6(ms)) < 1e-6
        assert abs(row.mmr_score - f6(sc)) < 1e-6


def test_corpus_pins(spark, sf_dir):
    out = mmr_diversified_topk(spark, sf_dir).toPandas()
    # measured at sf0.001: first pick, score decay, redundancy band
    assert out.iloc[0].vec_id == 17
    assert abs(out.iloc[0].mmr_score - 0.234119) < 1e-6
    assert abs(out.iloc[-1].mmr_score - 0.111116) < 1e-6
    assert out.mmr_score.is_monotonic_decreasing
    assert (out.mmr_score > 0).all()  # isotropy: MMR re-orders,
    assert out.maxsim.max() < 0.28  # never vetoes (module header)


def test_lambda_one_degenerates_to_relevance_topk(sf_dir):
    X, ids = _load(sf_dir)
    picks = _mmr_np(X, ids, q_idx=0, k=10, lam=1.0)
    C = _cos_matrix(X)
    rel = [(C[i, 0], -ids[i], ids[i]) for i in range(1, len(X))]
    top = [
        t[2]
        for t in sorted(rel, key=lambda t: (-t[0], -t[1]))[:10]
    ]
    assert [p[1] for p in picks] == top


def test_first_pick_is_argmax_rel(sf_dir):
    X, ids = _load(sf_dir)
    picks = _mmr_np(X, ids, q_idx=0, k=1, lam=0.7)
    C = _cos_matrix(X)
    rels = [(C[i, 0], ids[i]) for i in range(1, len(X))]
    best = max(rels, key=lambda t: (t[0], -t[1]))
    assert picks[0][1] == best[1]


def test_planted_clusters_covered():
    """3 tight clusters of near-duplicates + a query equidistant-ish:
    plain top-k drowns in the most query-similar cluster; MMR(0.7)
    reaches all three clusters within the first 3 picks."""
    rng = np.random.RandomState(2)
    centers = np.eye(3, 64) * 4 + rng.randn(3, 64) * 0.1
    rows = [centers[c] + rng.randn(64) * 0.02 for c in (0, 1, 2) for _ in range(8)]
    q = centers[0] * 0.45 + centers[1] * 0.35 + centers[2] * 0.25
    X = np.vstack([q] + rows)
    ids = np.arange(len(X))
    labels = {i + 1: (i // 8) for i in range(24)}
    plain = _mmr_np(X, ids, q_idx=0, k=6, lam=1.0)
    mmr = _mmr_np(X, ids, q_idx=0, k=6, lam=0.7)
    plain_cl = {labels[p[1]] for p in plain[:3]}
    mmr_cl = {labels[p[1]] for p in mmr[:3]}
    assert plain_cl == {0}  # relevance top-k stuck in one cluster
    assert mmr_cl == {0, 1, 2}  # MMR covers all three immediately
