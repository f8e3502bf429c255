"""Switching-user façade gates: the dtaidistance-shaped API in
:mod:`dtaidistance_spark.compat` reproduces the upstream library's
documented behaviors on its own canonical examples (Spark-free)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from dtaidistance_spark.compat import (
    alignment,
    dtw,
    dtw_barycenter,
    dtw_ndim,
    ed,
    preprocessing,
    similarity,
    subsequence,
)

S1 = [0.0, 0, 1, 2, 1, 0, 1, 0, 0]
S2 = [0.0, 1, 2, 0, 0, 0, 0, 0, 0]


def test_canonical_distance():
    # the README example of upstream: distance == sqrt(2)
    assert abs(dtw.distance(S1, S2) - math.sqrt(2)) < 1e-12
    assert abs(dtw.distance_fast(S1, S2) - math.sqrt(2)) < 1e-12
    # kwargs accepted with upstream names
    assert dtw.distance(S1, S2, window=2, use_pruning=True) >= math.sqrt(2) - 1e-12


def test_distance_matrix_shapes():
    series = [np.array(S1), np.array(S2), np.array([0.0, 1, 2, 1, 0])]
    D = dtw.distance_matrix(series, parallel=True, use_c=True)  # flags ignored
    assert D.shape == (3, 3)
    # upstream default: symmetric with zero diagonal
    assert D[1, 0] == D[0, 1] and D[0, 0] == 0.0
    assert abs(D[0, 1] - math.sqrt(2)) < 1e-12
    Dt = dtw.distance_matrix(series, only_triu=True)
    assert np.isinf(Dt[1, 0])  # only_triu: inf below diagonal
    c = dtw.distance_matrix(series, compact=True)
    assert len(c) == 3
    assert abs(c[0] - D[0, 1]) < 1e-12
    # block restricts computed cells — and compact returns ONLY them
    Db = dtw.distance_matrix(series, block=((0, 1), (0, 3)))
    assert np.isfinite(Db[0, 1]) and np.isinf(Db[1, 2])
    cb = dtw.distance_matrix(series, block=((0, 1), (0, 3)), compact=True)
    assert len(cb) == 2 and abs(cb[0] - D[0, 1]) < 1e-12
    # condensed -> dense round trip == the matrix API's own default
    M = dtw.distances_array_to_matrix(c, 3, only_triu=False)
    assert M[1, 0] == M[0, 1] and M[0, 0] == 0.0
    assert np.array_equal(M, D)


def test_bounds_and_paths():
    assert dtw.ub_euclidean(S1, S2) >= dtw.distance(S1, S2) - 1e-12
    assert dtw.lb_keogh(S1, S2, window=2) <= dtw.distance(S1, S2, window=2) + 1e-12
    d, paths = dtw.warping_paths(S1, S2)
    assert abs(d - math.sqrt(2)) < 1e-12
    p = dtw.best_path(paths)
    assert p[0] == (0, 0) and p[-1] == (len(S1) - 1, len(S2) - 1)
    assert dtw.warping_amount(p) >= 0
    warped = dtw.warp(S1, S2)
    assert len(warped) == len(S2)


def test_ed_and_ndim():
    assert ed.distance([0.0, 0], [3.0, 4]) == 5.0
    a = np.array([[0.0, 0], [1, 1], [2, 2]])
    assert dtw_ndim.distance(a, a) == 0.0


def test_dba_and_mask():
    series = [np.array(S1), np.array(S2), np.array(S1)]
    c_all = dtw_barycenter.dba(series, max_it=5)
    assert len(c_all) == len(S1)
    # mask selects the two identical members -> barycenter equals them
    c_masked = dtw_barycenter.dba_loop(series, mask=[True, False, True], max_it=5)
    assert np.allclose(c_masked, S1)


def test_preprocessing_similarity_alignment_subsequence():
    d = preprocessing.differencing(S1)
    assert np.array_equal(d, np.diff(S1))
    sim = similarity.distance_to_similarity(np.array([0.0, 1.0, 2.0]), r=2.0)
    assert sim[0] == 1.0 and sim[2] < sim[1]
    sc, m = alignment.needleman_wunsch("GATTACA", "GCATGCU")
    assert sc == 0  # the textbook pair scores 0
    sa = subsequence.subsequence_alignment(
        [1.0, 2, 1], [0.0, 0, 1, 2, 1, 0, 0]
    )
    best = sa.best_match()
    assert best.value == 0.0
    assert best.segment == (2, 4)


def test_clustering_facade():
    rng = np.random.RandomState(0)
    blob_a = [np.sin(np.linspace(0, 6, 40)) * 10 + rng.normal(0, 0.2, 40) for _ in range(6)]
    blob_b = [np.cos(np.linspace(0, 6, 40)) * 10 + 40 + rng.normal(0, 0.2, 40) for _ in range(6)]
    series = blob_a + blob_b
    from dtaidistance_spark.compat import clustering

    cl, it = clustering.kmeans.KMeans(2, max_it=3).fit(series)
    # upstream semantics: performed_it is the count actually run — this
    # well-separated blob pair converges before the max_it cap
    assert 1 <= it <= 3 and len(cl) == 2
    groups = sorted(tuple(sorted(v)) for v in cl.values())
    assert groups == [tuple(range(6)), tuple(range(6, 12))]

    h = clustering.hierarchical.Hierarchical(None, {"window": 4}, max_dist=20.0).fit(series)
    hg = sorted(tuple(sorted(v)) for v in h.values())
    assert hg == [tuple(range(6)), tuple(range(6, 12))]

    km = clustering.kmedoids.KMedoids(None, {"window": 4}, k=2).fit(series)
    kg = sorted(tuple(sorted(v)) for v in km.values())
    assert kg == [tuple(range(6)), tuple(range(6, 12))]


def test_subsequence_search_kbest():
    from dtaidistance_spark.compat import subsequence

    q = [1.0, 2, 1]
    corpus = [
        [0.0, 0, 0, 0, 0, 0],        # no match
        [0.0, 1, 2, 1, 0, 0],        # exact match
        [0.0, 1.5, 2.5, 1.5, 0, 0],  # close match
    ]
    sa = subsequence.subsequence_search(q, corpus)
    best = sa.kbest_matches(2)
    assert [m.idx for m in best] == [1, 2]
    assert best[0].value == 0.0
    assert best[0].segment == (1, 3)


def test_dtw_settings_and_paths_fast():
    from dtaidistance_spark.compat import dtw

    s = dtw.DTWSettings(window=2, use_pruning=True)
    d = dtw.distance(S1, S2, **s.kwargs())
    assert abs(d - dtw.distance(S1, S2, window=2, use_pruning=True)) < 1e-12
    d2, m = dtw.warping_paths_fast(S1, S2)
    assert abs(d2 - dtw.warping_paths(S1, S2)[0]) < 1e-12


def test_hierarchical_merge_hook():
    """merge_hook fires once per effective merge, ascending by distance,
    with (merged_idx, kept_idx, dist); merging two tight blobs of 3
    yields exactly 4 in-threshold merges (2 per blob... n - #clusters)."""
    series = [
        [0.0, 0, 0], [0.1, 0.1, 0.1], [0.2, 0.2, 0.2],
        [50.0, 50, 50], [50.1, 50.1, 50.1], [50.2, 50.2, 50.2],
    ]
    calls = []
    from dtaidistance_spark.compat import clustering

    cl = clustering.hierarchical.Hierarchical(
        None, {"window": 1}, max_dist=5.0,
        merge_hook=lambda a, b, d: calls.append((a, b, d)),
    ).fit(series)
    assert len(cl) == 2  # two blobs
    assert len(calls) == 4  # 6 leaves -> 2 clusters = 4 merges
    assert [round(d, 6) for _, _, d in calls] == sorted(round(d, 6) for _, _, d in calls)
    for a, b, _ in calls:
        assert isinstance(a, int) and isinstance(b, int)


def test_hierarchical_tree_and_linkage_tree():
    """HierarchicalTree forces a full merge to ONE root and records the
    scipy-Z dendrogram on .linkage; LinkageTree computes the same Z
    (single linkage); non-single methods raise."""
    import pytest

    from dtaidistance_spark.compat import clustering

    series = [
        [0.0, 0, 0], [0.1, 0.1, 0.1], [0.2, 0.2, 0.2],
        [50.0, 50, 50], [50.1, 50.1, 50.1], [50.2, 50.2, 50.2],
    ]
    tree = clustering.hierarchical.HierarchicalTree(dists_options={"window": 1})
    cl = tree.fit(series)
    assert len(cl) == 1 and next(iter(cl.values())) == set(range(6))
    Z = tree.linkage
    assert Z.shape == (5, 4)
    assert list(Z[:, 2]) == sorted(Z[:, 2])  # ascending merge distances
    assert Z[-1, 3] == 6  # final merge spans all leaves
    # the cross-blob merge is the largest and much bigger than in-blob
    assert Z[-1, 2] > 10 * Z[-2, 2]

    lt = clustering.hierarchical.LinkageTree(None, {"window": 1})
    Z2 = lt.fit(series)
    assert np.array_equal(Z, Z2) and np.array_equal(lt.linkage, Z2)

    with pytest.raises(NotImplementedError):
        clustering.hierarchical.LinkageTree(None, {}, method="complete")


def test_linkage_tree_newick_and_ascii():
    """The dependency-free dendrogram exports: Newick is well-formed,
    ultrametric (root->leaf branch sums all equal the root height —
    the single-linkage invariant), contains every leaf exactly once;
    ASCII has one line per tree node and every label."""
    import re

    from dtaidistance_spark.clustering.hierarchical import (
        ascii_dendrogram, linkage_matrix, newick,
    )
    from dtaidistance_spark.compat import clustering

    rows = [
        {"id_a": 0, "id_b": 1, "dist": 1.0},
        {"id_a": 2, "id_b": 3, "dist": 1.5},
        {"id_a": 0, "id_b": 2, "dist": 3.0},
    ]
    Z = linkage_matrix(rows, 4)
    nw = newick(Z, ["a", "b", "c", "d"])
    assert nw == "((a:1,b:1):2,(c:1.5,d:1.5):1.5);"
    # ultrametric: walk depths by parsing parens
    depth, sums = 0.0, {}
    for label, bl in re.findall(r"([a-z]+):([0-9.]+)", nw):
        sums[label] = float(bl)
    # a,b sit under a node with branch 2 to root: 1+2 == 3 == root h
    assert sums == {"a": 1.0, "b": 1.0, "c": 1.5, "d": 1.5}
    art = ascii_dendrogram(Z, ["a", "b", "c", "d"])
    assert len(art.splitlines()) == 7  # 2n-1 nodes
    for lab in "abcd":
        assert lab in art

    # end-to-end through the compat surface
    series = [[0.0, 0, 0], [0.1, 0.1, 0.1], [5.0, 5, 5], [5.1, 5.1, 5.1]]
    lt = clustering.hierarchical.LinkageTree(None, {"window": 1})
    lt.fit(series)
    nw2 = lt.to_newick()
    assert nw2.count("(") == 3 and nw2.endswith(";")
    for leaf in "0123":
        assert f"{leaf}:" in nw2
    assert lt.to_ascii().count("\n") == 6


def test_ed_distance_matrix_conventions():
    """ed.distance_matrix mirrors the dtw matrix conventions (symmetric
    mirror, zero diagonal, compact condensed entries)."""
    from dtaidistance_spark.compat import ed

    series = [np.array([0.0, 0, 0]), np.array([1.0, 1, 1]),
              np.array([3.0, 3, 3])]
    m = ed.distance_matrix(series)
    assert m.shape == (3, 3) and np.allclose(np.diag(m), 0.0)
    assert abs(m[0, 1] - np.sqrt(3.0)) < 1e-12
    assert m[1, 0] == m[0, 1] and abs(m[0, 2] - np.sqrt(27.0)) < 1e-12
    c = ed.distance_matrix(series, compact=True)
    assert np.allclose(c, [m[0, 1], m[0, 2], m[1, 2]])


def test_similarity_squash_and_fast_aliases():
    import numpy as np

    from dtaidistance_spark.compat import dtw, similarity

    X = np.array([0.0, 1.0, 2.0, 5.0])
    sq = similarity.squash(X, r=1.0, x0=1.0, method="logistic")
    assert np.all((0 < sq) & (sq < 1)) and np.all(np.diff(sq) > 0)
    assert sq[1] == pytest.approx(0.5)
    ex = similarity.squash(X, r=2.0, method="exponential")
    assert ex[0] == 0.0 and np.all(np.diff(ex) > 0) and ex[-1] < 1.0
    # *_fast aliases delegate to the same kernels
    p1 = dtw.warping_path([0.0, 1, 2], [0.0, 2, 2])
    p2 = dtw.warping_path_fast([0.0, 1, 2], [0.0, 2, 2])
    assert p1 == p2
