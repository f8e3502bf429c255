"""Semantic gates for assortativity_q (T98): the star ≡ −1 integer
identity, the regular-graph NULL guard, numpy recompute on the corpus
and on LCG random graphs, planted assortative/disassortative
controls, the shared-graph census cross-check vs T90's pins, and the
measured neutral corpus reading."""

import math

import numpy as np

from dtaidistance_spark.operators.assortativity_q import (
    degree_assortativity,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _r_np(edges):
    """Newman r from an undirected edge list via the cleared form."""
    from collections import Counter

    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    m = len(edges)
    s1 = sum(deg[u] + deg[v] for u, v in edges)
    s2 = sum(deg[u] ** 2 + deg[v] ** 2 for u, v in edges)
    s3 = sum(deg[u] * deg[v] for u, v in edges)
    den = 2 * m * s2 - s1 * s1
    return (
        (m, s1, s2, s3),
        None if den == 0 else (4 * m * s3 - s1 * s1) / den,
    )


def test_star_is_exactly_minus_one():
    edges = [(0, i) for i in range(1, 9)]  # K_{1,8}
    (_, _, _, _), r = _r_np(edges)
    assert r == -1.0  # exact integer identity


def test_regular_graph_is_null():
    edges = [(0, 1), (1, 2), (2, 3), (3, 0)]  # C4: all degrees 2
    _, r = _r_np(edges)
    assert r is None


def test_planted_controls():
    # assortative: two cliques of different sizes, no cross edges
    import itertools

    k1 = list(itertools.combinations(range(8), 2))
    k2 = list(itertools.combinations(range(8, 11), 2))
    _, r_a = _r_np(k1 + k2)
    assert r_a > 0.5
    # disassortative: a forest of hub-and-spoke stars
    edges = [(h, h * 100 + i) for h in range(1, 4) for i in range(3 + h)]
    _, r_d = _r_np(edges)
    assert r_d < -0.5


def test_matches_numpy_on_corpus_and_census(spark, sf_dir):
    from dtaidistance_spark import synth
    from dtaidistance_spark.operators.triangles_q import (
        _MOD,
        _NB,
        _THRESH,
    )

    out = degree_assortativity(spark, sf_dir).toPandas().iloc[0]
    # rebuild the T90 graph locally
    from collections import Counter

    pdf = synth.gen_pdf(range(_NB))
    cnt = Counter()
    for toks in pdf.tokens:
        f = [int(t) % _MOD for t in toks]
        for a, b in zip(f, f[1:]):
            if a != b:
                cnt[(min(a, b), max(a, b))] += 1
    edges = [e for e, c in cnt.items() if c >= _THRESH]
    (m, s1, s2, s3), r = _r_np(edges)
    # shared-graph cross-check vs T90's pinned census
    assert m == 1148 == out.n_edges
    assert (out.s1, out.s2, out.s3) == (s1, s2, s3)
    assert abs(out.assortativity - f6(r)) < 1e-6
    # the measured neutral reading
    assert abs(out.assortativity - 0.009122) < 1e-6
    assert out.mixing == "neutral"
    assert abs(r) < 1 / math.sqrt(m) * 1.0  # inside the noise floor


def test_lcg_random_graphs_near_zero():
    s = 12345
    for _ in range(3):
        edges = set()
        for _ in range(400):
            s = (1103515245 * s + 12345) % (1 << 31)
            u = (s >> 16) % 60
            s = (1103515245 * s + 12345) % (1 << 31)
            v = (s >> 16) % 60
            if u != v:
                edges.add((min(u, v), max(u, v)))
        _, r = _r_np(sorted(edges))
        assert abs(r) < 0.25  # ER graphs: no mixing preference
