"""Kernel gates for K7 (ndim DTW), P6 (Needleman-Wunsch), S2
(smoothing) — reference-semantics checks without Spark."""

import numpy as np
import pytest

from dtaidistance_spark import kernels as K


# --- K7 ---------------------------------------------------------------


def test_ndim_duplicated_dims_scale():
    """Dependent DTW with d identical dims = sqrt(d) * univariate DTW
    (cost per cell scales by d, one shared path)."""
    s1 = np.array([0.0, 0, 1, 2, 1, 0, 1, 0, 0])
    s2 = np.array([0.0, 1, 2, 0, 0, 0, 0, 0, 0])
    d1 = K.dtw_distance(s1, s2)
    for d in (2, 3):
        dn = K.dtw_ndim_distance(
            np.stack([s1] * d, axis=1), np.stack([s2] * d, axis=1)
        )
        assert abs(dn - d1 * np.sqrt(d)) < 1e-12


def test_ndim_1dim_equals_univariate():
    rng = np.random.default_rng(3)
    for _ in range(5):
        a, b = rng.normal(0, 1, 30), rng.normal(0, 1, 26)
        assert abs(
            K.dtw_ndim_distance(a[:, None], b[:, None], window=6)
            - K.dtw_distance(a, b, window=6)
        ) < 1e-12


def test_ndim_psi_relaxation_not_larger():
    rng = np.random.default_rng(4)
    a = rng.normal(0, 1, (20, 2))
    b = rng.normal(0, 1, (20, 2))
    assert K.dtw_ndim_distance(a, b, psi=3) <= K.dtw_ndim_distance(a, b) + 1e-12


def test_ndim_warping_paths_distance_matches_kernel():
    """Matrix corner (and the psi-relaxed reduction) must equal the
    two-row distance kernel across random ragged multivariate pairs."""
    rng = np.random.default_rng(11)
    for psi in (None, 2):
        for window in (None, 5):
            a = rng.normal(0, 1, (24, 3))
            b = rng.normal(0, 1, (19, 3))
            d_k = K.dtw_ndim_distance(a, b, window=window, psi=psi)
            d_m, m = K.dtw_ndim_warping_paths(a, b, window=window, psi=psi)
            assert abs(d_k - d_m) < 1e-12
            assert m.shape == (25, 20)


def test_ndim_warping_paths_1dim_equals_univariate():
    """d=1 multivariate matrix is bit-identical to the univariate
    warping_paths matrix (same DP, same sqrt contract)."""
    rng = np.random.default_rng(12)
    a, b = rng.normal(0, 1, 20), rng.normal(0, 1, 17)
    d1, m1 = K.warping_paths(a, b, window=6)
    dn, mn = K.dtw_ndim_warping_paths(a[:, None], b[:, None], window=6)
    assert abs(d1 - dn) < 1e-12
    assert np.array_equal(np.nan_to_num(m1, posinf=-1.0),
                          np.nan_to_num(mn, posinf=-1.0))
    assert K.warping_path(a, b, window=6) == K.dtw_ndim_warping_path(
        a[:, None], b[:, None], window=6
    )


def test_ndim_warping_path_valid_monotone():
    rng = np.random.default_rng(13)
    a = rng.normal(0, 1, (15, 2))
    b = rng.normal(0, 1, (22, 2))
    path = K.dtw_ndim_warping_path(a, b)
    assert path[0] == (0, 0) and path[-1] == (14, 21)
    for (i0, j0), (i1, j1) in zip(path, path[1:]):
        assert i1 - i0 in (0, 1) and j1 - j0 in (0, 1)
        assert (i1, j1) != (i0, j0)


def test_ndim_dba_1dim_equals_univariate():
    """Multivariate DBA with d=1 reproduces the univariate barycenter
    bit-exactly (shared initial-center rule, same paths)."""
    rng = np.random.default_rng(14)
    series = [rng.normal(0, 1, rng.integers(18, 25)) for _ in range(6)]
    c1 = K.dba(series, max_it=4, window=5)
    cn = K.dba([s[:, None] for s in series], max_it=4, window=5)
    assert cn.shape == (len(c1), 1)
    assert np.array_equal(c1, cn[:, 0])


def test_ndim_dba_identical_members_fixed_point():
    rng = np.random.default_rng(15)
    s = rng.normal(0, 1, (20, 3))
    c = K.dba([s.copy() for _ in range(4)], max_it=5)
    assert np.allclose(c, s, atol=1e-12)


def test_compat_dtw_ndim_surface():
    """compat.dtw_ndim mirrors the upstream module surface: distance /
    distance_matrix (+block/compact/only_triu) / warping_paths /
    warping_path, and dtw_barycenter.dba accepts multivariate series."""
    from dtaidistance_spark import compat as C

    rng = np.random.default_rng(16)
    series = [rng.normal(0, 1, (rng.integers(12, 18), 2)) for _ in range(5)]
    n = len(series)
    m = C.dtw_ndim.distance_matrix(series)
    assert m.shape == (n, n)
    assert np.array_equal(m, m.T) and np.all(np.diag(m) == 0.0)
    for i in range(n):
        for j in range(i + 1, n):
            assert abs(m[i, j] - C.dtw_ndim.distance(series[i], series[j])) < 1e-12
    cm = C.dtw_ndim.distance_matrix(series, compact=True)
    assert cm.shape == (n * (n - 1) // 2,)
    assert np.allclose(cm, m[np.triu_indices(n, 1)])
    tri = C.dtw_ndim.distance_matrix(series, only_triu=True)
    assert np.all(np.isinf(tri[np.tril_indices(n)]))
    blk = C.dtw_ndim.distance_matrix(series, block=((0, 2), (2, n)), compact=True)
    assert blk.shape == (2 * (n - 2),)
    d, mat = C.dtw_ndim.warping_paths(series[0], series[1], window=6)
    assert abs(d - C.dtw_ndim.distance(series[0], series[1], window=6)) < 1e-12
    path = C.dtw_ndim.warping_path(series[0], series[1])
    assert path[0] == (0, 0)
    c = C.dtw_barycenter.dba(series, max_it=3)
    assert c.ndim == 2 and c.shape[1] == 2


# --- P6 ---------------------------------------------------------------


def test_nw_identical_and_disjoint():
    s = list("GATTACA")
    score, _ = K.needleman_wunsch(s, s)
    assert score == len(s)  # all matches
    score2, _ = K.needleman_wunsch(list("AAAA"), list("BBBB"))
    assert score2 == -4.0  # 4 mismatches beat 8 gaps


def test_nw_classic_example():
    """GATTACA vs GCATGCU, match=1 mismatch=-1 gap=-1 -> score 0
    (the canonical textbook value)."""
    score, m = K.needleman_wunsch(list("GATTACA"), list("GCATGCU"))
    assert score == 0.0
    al = K.best_alignment(m, list("GATTACA"), list("GCATGCU"))
    # alignment covers both sequences fully and in order
    ai = [i for i, _ in al if i >= 0]
    aj = [j for _, j in al if j >= 0]
    assert ai == list(range(7)) and aj == list(range(7))
    # score reconstructable from the alignment
    s1, s2 = "GATTACA", "GCATGCU"
    rescore = sum(
        -1 if (i < 0 or j < 0) else (1 if s1[i] == s2[j] else -1)
        for i, j in al
    )
    assert rescore == 0


def test_nw_gap_recovery():
    score, m = K.needleman_wunsch(list("ABCDE"), list("ABDE"))
    al = K.best_alignment(m, list("ABCDE"), list("ABDE"))
    assert score == 3.0  # 4 matches - 1 gap
    assert (2, -1) in al  # 'C' aligned to a gap


# --- S2 ---------------------------------------------------------------


def test_smoothing_matches_naive():
    rng = np.random.default_rng(5)
    s = rng.normal(0, 1, 40)
    for w in (3, 5, 9):
        half = w // 2
        want = np.array(
            [s[max(0, i - half) : i + half + 1].mean() for i in range(len(s))]
        )
        assert np.allclose(K.smoothing(s, w), want, atol=1e-12)


def test_smoothing_flattens_noise():
    rng = np.random.default_rng(6)
    base = np.sin(np.linspace(0, 6, 200))
    noisy = base + rng.normal(0, 0.3, 200)
    sm = K.smoothing(noisy, 9)
    assert np.std(sm - base) < np.std(noisy - base) * 0.6


# --- M6 ---------------------------------------------------------------


def test_local_concurrences_finds_planted_motif():
    rng = np.random.default_rng(2)
    motif = 3 * np.sin(np.linspace(0, 3 * np.pi, 12))
    s = rng.normal(0, 1, 60)
    s[5:17] = motif + rng.normal(0, 0.1, 12)
    s[35:47] = motif + rng.normal(0, 0.1, 12)
    lcs = K.local_concurrences(s, gamma=0.5, tau=0.6, penalty=1.0, min_len=6, k=3)
    assert lcs, "no concurrences found"
    top = lcs[0]
    (i0, j0), (i1, j1) = top["path"][0], top["path"][-1]
    # the top concurrence links the two planted motif windows
    assert 3 <= i0 <= 7 and 33 <= j0 <= 37, (i0, j0)
    assert 14 <= i1 <= 19 and 44 <= j1 <= 48, (i1, j1)
    # and clearly beats anything in pure noise
    noise = rng.normal(0, 1, 60)
    lcn = K.local_concurrences(noise, gamma=0.5, tau=0.6, penalty=1.0, min_len=6, k=1)
    noise_top = lcn[0]["score"] if lcn else 0.0
    assert top["score"] > 1.5 * noise_top


def test_local_concurrences_cross_series():
    rng = np.random.default_rng(2)
    motif = 3 * np.sin(np.linspace(0, 3 * np.pi, 12))
    s1 = rng.normal(0, 1, 60)
    s1[5:17] = motif
    s2 = rng.normal(0, 1, 50)
    s2[10:22] = motif
    lcs = K.local_concurrences(s1, s2, gamma=0.5, tau=0.6, penalty=1.0, min_len=6, k=1)
    (i0, j0), (i1, j1) = lcs[0]["path"][0], lcs[0]["path"][-1]
    assert abs(i0 - 5) <= 2 and abs(j0 - 10) <= 2
    assert abs(i1 - 16) <= 2 and abs(j1 - 21) <= 2


def test_affinity_diag_band_blocks_trivial_diagonal():
    s = np.sin(np.linspace(0, 10, 40))
    A = K.warping_paths_affinity(s, s, gamma=0.5, diag_band=5)
    for i in range(1, 41):
        for off in range(-4, 5):
            j = i + off
            if 1 <= j <= 40:
                assert A[i, j] == 0.0


# --- C4 (PAM k-medoids over pair lists) -------------------------------


def test_kmedoids_separates_blobs():
    from dtaidistance_spark.clustering.hierarchical import kmedoids

    rng = np.random.default_rng(1)
    pts = {f"a{i}": rng.normal(0, 1) for i in range(6)}
    pts |= {f"b{i}": rng.normal(100, 1) for i in range(6)}
    rows = [
        {"id_a": x, "id_b": y, "dist": abs(pts[x] - pts[y])}
        for x in pts
        for y in pts
        if x < y
    ]
    assign, cost = kmedoids(rows, pts.keys(), k=2)
    groups = {}
    for i, m in assign.items():
        groups.setdefault(m, set()).add(i)
    assert sorted(map(sorted, groups.values())) == [
        sorted(f"a{i}" for i in range(6)),
        sorted(f"b{i}" for i in range(6)),
    ]
    # run twice -> identical (deterministic)
    assert kmedoids(rows, pts.keys(), k=2) == (assign, cost)
