"""Semantic gates for labelmix_q (E19): numpy recompute of
m/E_cc/K_c/r from the same bucket rule, the two-clique r=1 and
bipartite negative-exact-rational hand cases, the LCG permutation
null band bracketing the corpus value, the planted label-clustered
control, and corpus pins."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.labelmix_q import (
    label_assortativity_ann,
)
from tests.test_anngraph import _cand_sets

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _r_label(edges, labels):
    from collections import Counter

    m = len(edges)
    ecc = sum(1 for u, w in edges if labels[u] == labels[w])
    kc = Counter()
    for u, w in edges:
        kc[labels[u]] += 1
        kc[labels[w]] += 1
    sk2 = sum(c * c for c in kc.values())
    den = 4 * m * m - sk2
    return m, ecc, sk2, (None if den == 0 else (4 * m * ecc - sk2) / den)


def _graph_edges(X):
    cand = _cand_sets(X)
    return sorted(
        {(i, j) for i in range(len(X)) for j in cand[i] if i < j}
    )


def test_matches_numpy_and_pins(spark, sf_dir):
    out = label_assortativity_ann(spark, sf_dir).toPandas().iloc[0]
    raw = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values(
        "vec_id"
    )
    X = np.stack(raw.embedding.to_numpy()).astype(np.float64)
    labels = raw.label.to_numpy()
    edges = _graph_edges(X)
    m, ecc, sk2, r = _r_label(edges, labels)
    assert (out.n_edges, out.same_label_edges, out.sum_kc2) == (
        m, ecc, sk2,
    )
    assert abs(out.label_assortativity - f6(r)) < 1e-6
    # measured corpus pins (sf0.001)
    assert m == 80265 and ecc == 7979
    assert abs(out.label_assortativity - (-0.002252)) < 1e-6
    assert out.mixing == "label_neutral"


def test_hand_cases():
    # two same-label cliques, no cross edges: labels never mix, r = 1
    import itertools

    edges = list(itertools.combinations(range(4), 2)) + list(
        itertools.combinations(range(4, 8), 2)
    )
    labels = {i: ("a" if i < 4 else "b") for i in range(8)}
    _, _, _, r = _r_label(edges, labels)
    assert r == 1.0
    # complete bipartite across labels: ecc = 0, r the exact rational
    edges = [(u, w) for u in range(3) for w in range(3, 6)]
    labels = {i: ("a" if i < 3 else "b") for i in range(6)}
    m, ecc, sk2, r = _r_label(edges, labels)
    assert ecc == 0
    assert r == (0 - sk2) / (4 * m * m - sk2)  # negative, exact


def test_permutation_null_brackets_corpus(sf_dir):
    raw = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values(
        "vec_id"
    )
    X = np.stack(raw.embedding.to_numpy()).astype(np.float64)
    labels = raw.label.to_numpy().copy()
    edges = _graph_edges(X)
    _, _, _, r_obs = _r_label(edges, labels)
    s, vals = 31337, []
    for _ in range(30):
        perm = labels.copy()
        for i in range(len(perm) - 1, 0, -1):
            s = (1103515245 * s + 12345) % (1 << 31)
            j = s % (i + 1)
            perm[i], perm[j] = perm[j], perm[i]
        vals.append(_r_label(edges, {i: perm[i] for i in range(len(perm))})[3])
    lo, hi = np.percentile(vals, [2.5, 97.5])
    assert lo < r_obs < hi  # inside the label-shuffle null band


def test_planted_label_clusters_read_significant():
    """Tight same-label clusters: every within-cluster pair becomes
    an edge (buckets collide at cos ≈ 1), and although cross-cluster
    LSH collisions keep the raw r moderate (0.156 measured — 16
    tables × 4 bits collide arbitrary directions often), the value
    sits FAR outside its own label-shuffle null band — the
    significance framing, not a magnitude guess."""
    rng = np.random.RandomState(13)
    centers = rng.randn(3, 64) * 4
    X = np.vstack(
        [centers[c] + rng.randn(64) * 0.05 for c in (0, 1, 2) for _ in range(20)]
    )
    labels = {i: i // 20 for i in range(60)}
    edges = _graph_edges(X)
    m, ecc, _, r = _r_label(edges, labels)
    assert ecc == 3 * 20 * 19 // 2  # ALL within-cluster pairs edge
    assert r > 0.1
    lab = np.array([labels[i] for i in range(60)])
    s, vals = 777, []
    for _ in range(20):
        perm = lab.copy()
        for i in range(len(perm) - 1, 0, -1):
            s = (1103515245 * s + 12345) % (1 << 31)
            j = s % (i + 1)
            perm[i], perm[j] = perm[j], perm[i]
        vals.append(
            _r_label(edges, {i: perm[i] for i in range(60)})[3]
        )
    assert r > np.percentile(vals, 97.5) + 0.05
