"""Semantic gates for triangles_q (T90): closed-form hand graphs,
orientation invariance, the G(n,p) closure band, and the pinned
corpus census."""

import numpy as np

from dtaidistance_spark.operators.triangles_q import triangle_census


def _census(edges):
    """Reference triangle census from an undirected edge list."""
    edges = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({x for e in edges for x in e})
    adj = {n: set() for n in nodes}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    tri = 0
    for u, v in edges:
        tri += len(adj[u] & adj[v])
    tri //= 3
    wedges = sum(
        len(adj[n]) * (len(adj[n]) - 1) // 2 for n in nodes
    )
    return len(nodes), len(edges), tri, wedges


def _oriented_count(edges, key):
    """Degree-ordered (or arbitrary-key) orientation count — must
    equal the reference for ANY total order."""
    edges = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    out = {}
    for u, v in edges:
        a, b = (u, v) if key(u) < key(v) else (v, u)
        out.setdefault(a, set()).add(b)
    tri = 0
    for a, nbrs in out.items():
        nl = sorted(nbrs, key=key)
        for i in range(len(nl)):
            for j in range(i + 1, len(nl)):
                if nl[j] in out.get(nl[i], ()):
                    tri += 1
    return tri


def test_k4():
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    n, m, t, w = _census(edges)
    assert (n, m, t, w) == (4, 6, 4, 12)
    assert 3 * t / w == 1.0  # transitivity of a clique


def test_star_and_pendant():
    star = [(0, i) for i in range(1, 6)]
    n, m, t, w = _census(star)
    assert t == 0 and w == 10
    tri_pendant = [(0, 1), (1, 2), (0, 2), (2, 3)]
    n, m, t, w = _census(tri_pendant)
    assert t == 1 and w == 5  # transitivity 3/5


def _lcg_graph(seed, n, m):
    # take HIGH bits: the low bits of an LCG mod a composite n have
    # short period — the first draft drew u = s % 120 and could only
    # ever reach 900 of the 7140 pairs, looping forever at m = 1400
    s = seed
    edges = set()
    guard = 0
    while len(edges) < m:
        guard += 1
        assert guard < 10**6, "generator cannot reach m edges"
        s = (1103515245 * s + 12345) % (1 << 31)
        u = (s >> 12) % n
        s = (1103515245 * s + 12345) % (1 << 31)
        v = (s >> 12) % n
        if u != v:
            edges.add(tuple(sorted((u, v))))
    return list(edges)


def test_orientation_invariance():
    edges = _lcg_graph(42, 60, 300)
    _, _, t_ref, _ = _census(edges)
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    assert _oriented_count(edges, key=lambda x: (deg[x], x)) == t_ref
    assert _oriented_count(edges, key=lambda x: x) == t_ref


def test_gnp_closure_band():
    # random graph: transitivity ≈ density (closure ratio near 1)
    edges = _lcg_graph(7, 120, 1400)
    n, m, t, w = _census(edges)
    dens = m / (n * (n - 1) / 2)
    trans = 3 * t / w
    assert 0.7 < trans / dens < 1.3


def test_corpus_census(spark, sf_dir):
    out = triangle_census(spark, sf_dir).toPandas().iloc[0]
    # pinned census of the strong fold-256 graph (corpus-fixed,
    # independent of sf_dir)
    assert out.n_nodes == 256
    assert out.n_edges == 1148
    assert out.n_triangles == 136
    assert out.n_wedges == 10464
    assert abs(out.transitivity - 3 * 136 / 10464) < 1e-6
    # honest reading: no closure excess — Erdős–Rényi-like
    assert 0.9 < out.closure_ratio < 1.35
