"""Semantic gates for dtaidistance_spark.elastic (K12): every batched
kernel vs a brute-force per-pair reference DP written independently
(plain Python dicts, no shared code), metric/identity properties, the
EDR==Levenshtein identity, soft-DTW limit behavior, and the window-0
closed forms the DuckDB oracles rely on."""

import math
import random

import numpy as np
import pytest

from dtaidistance_spark import elastic as E

INF = float("inf")


def _ok(i, j, w):
    return w is None or abs(i - j) <= w


# ---------------- brute-force reference DPs (full-matrix dicts) ----


def brute_lcss(a, b, eps, w):
    r, c = len(a), len(b)
    D = {(0, 0): 0}
    for i in range(r + 1):
        for j in range(c + 1):
            if i == 0 or j == 0:
                D[i, j] = 0
                continue
            best = max(D[i - 1, j], D[i, j - 1])
            if _ok(i, j, w) and abs(a[i - 1] - b[j - 1]) <= eps:
                best = max(best, D[i - 1, j - 1] + 1)
            D[i, j] = best
    return D[r, c]


def brute_edr(a, b, eps, w):
    r, c = len(a), len(b)
    D = {}
    for i in range(r + 1):
        for j in range(c + 1):
            if not _ok(i, j, w):
                D[i, j] = INF
                continue
            if i == 0:
                D[i, j] = j
            elif j == 0:
                D[i, j] = i
            else:
                sub = 0 if abs(a[i - 1] - b[j - 1]) <= eps else 1
                D[i, j] = min(
                    D[i - 1, j - 1] + sub, D[i - 1, j] + 1, D[i, j - 1] + 1
                )
    return D[r, c]


def brute_erp(a, b, g, w):
    r, c = len(a), len(b)
    D = {}
    for i in range(r + 1):
        for j in range(c + 1):
            if not _ok(i, j, w):
                D[i, j] = INF
                continue
            if i == 0 and j == 0:
                D[i, j] = 0.0
            elif i == 0:
                D[i, j] = D[0, j - 1] + abs(b[j - 1] - g)
            elif j == 0:
                D[i, j] = D[i - 1, 0] + abs(a[i - 1] - g)
            else:
                D[i, j] = min(
                    D[i - 1, j - 1] + abs(a[i - 1] - b[j - 1]),
                    D[i - 1, j] + abs(a[i - 1] - g),
                    D[i, j - 1] + abs(b[j - 1] - g),
                )
    return D[r, c]


def _msm_c(x, y, z, c):
    if (y <= x <= z) or (z <= x <= y):
        return c
    return c + min(abs(x - y), abs(x - z))


def brute_msm(a, b, c, w):
    r, cc = len(a), len(b)
    D = {}
    for i in range(1, r + 1):
        for j in range(1, cc + 1):
            if not _ok(i, j, w):
                D[i, j] = INF
                continue
            if i == 1 and j == 1:
                D[i, j] = abs(a[0] - b[0])
            elif j == 1:
                D[i, j] = D[i - 1, 1] + _msm_c(a[i - 1], a[i - 2], b[0], c)
            elif i == 1:
                D[i, j] = D[1, j - 1] + _msm_c(b[j - 1], a[0], b[j - 2], c)
            else:
                D[i, j] = min(
                    D[i - 1, j - 1] + abs(a[i - 1] - b[j - 1]),
                    D[i - 1, j] + _msm_c(a[i - 1], a[i - 2], b[j - 1], c),
                    D[i, j - 1] + _msm_c(b[j - 1], a[i - 1], b[j - 2], c),
                )
    return D[r, cc]


def brute_twe(a, b, nu, lam, w):
    a0 = [0.0] + list(a)
    b0 = [0.0] + list(b)
    r, c = len(a), len(b)
    D = {}
    for i in range(r + 1):
        for j in range(c + 1):
            if not _ok(i, j, w):
                D[i, j] = INF
                continue
            if i == 0 and j == 0:
                D[i, j] = 0.0
            elif j == 0:
                D[i, j] = D[i - 1, 0] + abs(a0[i] - a0[i - 1]) + nu + lam
            elif i == 0:
                D[i, j] = D[0, j - 1] + abs(b0[j] - b0[j - 1]) + nu + lam
            else:
                D[i, j] = min(
                    D[i - 1, j - 1]
                    + abs(a0[i] - b0[j])
                    + abs(a0[i - 1] - b0[j - 1])
                    + 2.0 * nu * abs(i - j),
                    D[i - 1, j] + abs(a0[i] - a0[i - 1]) + nu + lam,
                    D[i, j - 1] + abs(b0[j] - b0[j - 1]) + nu + lam,
                )
    return D[r, c]


def brute_hard_sqdtw(a, b, w):
    r, c = len(a), len(b)
    D = {(0, 0): 0.0}
    for i in range(r + 1):
        for j in range(c + 1):
            if i == 0 and j == 0:
                continue
            if i == 0 or j == 0 or not _ok(i, j, w):
                D[i, j] = INF
                continue
            D[i, j] = (a[i - 1] - b[j - 1]) ** 2 + min(
                D[i - 1, j - 1], D[i - 1, j], D[i, j - 1]
            )
    return D[r, c]


def brute_soft_dtw(a, b, gamma, w):
    r, c = len(a), len(b)
    D = {(0, 0): 0.0}

    def softmin(vals):
        fin = [v for v in vals if v < INF]
        if not fin:
            return INF
        m = min(fin)
        return m - gamma * math.log(
            sum(math.exp(-(v - m) / gamma) for v in fin)
        )

    for i in range(r + 1):
        for j in range(c + 1):
            if i == 0 and j == 0:
                continue
            if i == 0 or j == 0 or not _ok(i, j, w):
                D[i, j] = INF
                continue
            D[i, j] = (a[i - 1] - b[j - 1]) ** 2 + softmin(
                [D[i - 1, j - 1], D[i - 1, j], D[i, j - 1]]
            )
    return D[r, c]


# --------------------------------------------------- fixtures ------


def _pairs(n=24, r=20, c=17, hi=40, seed=7):
    rng = random.Random(seed)
    return [
        (
            [float(rng.randrange(hi)) for _ in range(r)],
            [float(rng.randrange(hi)) for _ in range(c)],
        )
        for _ in range(n)
    ]


def _stack(pairs):
    A = np.array([p[0] for p in pairs])
    B = np.array([p[1] for p in pairs])
    return A, B


CONFIGS = [None, 4, 8]


@pytest.mark.parametrize("w", CONFIGS)
def test_lcss_vs_brute(w):
    pairs = _pairs()
    A, B = _stack(pairs)
    got = E.lcss_batch(A, B, epsilon=5.0, window=w)
    for k, (a, b) in enumerate(pairs):
        assert got[k] == brute_lcss(a, b, 5.0, w), (k, w)


@pytest.mark.parametrize("w", CONFIGS)
def test_edr_vs_brute(w):
    pairs = _pairs()
    A, B = _stack(pairs)
    got = E.edr_batch(A, B, epsilon=3.0, window=w)
    for k, (a, b) in enumerate(pairs):
        assert got[k] == brute_edr(a, b, 3.0, w), (k, w)


def test_edr_eps0_is_levenshtein():
    # textbook Levenshtein (third independent implementation)
    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, x in enumerate(a, 1):
            cur = [i]
            for j, y in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j - 1] + (x != y), prev[j] + 1, cur[j - 1] + 1
                    )
                )
            prev = cur
        return prev[-1]

    pairs = _pairs(hi=6)  # small alphabet: dense match structure
    A, B = _stack(pairs)
    got = E.edr_batch(A, B, epsilon=0.0)
    for k, (a, b) in enumerate(pairs):
        assert got[k] == lev(a, b)


@pytest.mark.parametrize("w", CONFIGS)
def test_erp_vs_brute(w):
    pairs = _pairs()
    A, B = _stack(pairs)
    got = E.erp_batch(A, B, g=3.0, window=w)
    for k, (a, b) in enumerate(pairs):
        assert got[k] == pytest.approx(brute_erp(a, b, 3.0, w), abs=1e-9)


def test_erp_g0_lower_bound():
    # |sum(a) - sum(b)| <= ERP_g=0(a, b) — Chen-Ng's pruning bound
    pairs = _pairs()
    A, B = _stack(pairs)
    got = E.erp_batch(A, B, g=0.0)
    lb = np.abs(A.sum(axis=1) - B.sum(axis=1))
    assert (lb <= got + 1e-9).all()


@pytest.mark.parametrize("w", CONFIGS)
def test_msm_vs_brute(w):
    pairs = _pairs()
    A, B = _stack(pairs)
    got = E.msm_batch(A, B, c=0.7, window=w)
    for k, (a, b) in enumerate(pairs):
        assert got[k] == pytest.approx(brute_msm(a, b, 0.7, w), abs=1e-9)


@pytest.mark.parametrize("w", CONFIGS)
def test_twe_vs_brute(w):
    pairs = _pairs()
    A, B = _stack(pairs)
    got = E.twe_batch(A, B, nu=0.3, lam=0.8, window=w)
    for k, (a, b) in enumerate(pairs):
        assert got[k] == pytest.approx(
            brute_twe(a, b, 0.3, 0.8, w), abs=1e-9
        )


@pytest.mark.parametrize("w", [None, 4])
def test_soft_dtw_vs_brute(w):
    pairs = _pairs(r=12, c=12)
    A, B = _stack(pairs)
    for gamma in (0.1, 1.0, 10.0):
        got = E.soft_dtw_batch(A, B, gamma=gamma, window=w)
        for k, (a, b) in enumerate(pairs):
            assert got[k] == pytest.approx(
                brute_soft_dtw(a, b, gamma, w), rel=1e-9
            )


def test_metric_and_identity_properties():
    pairs = _pairs(n=10, r=15, c=15)
    A, B = _stack(pairs)
    # d(s, s) = 0 for the four distances; LCSS(s, s) = len
    for fn, kw in [
        (E.edr_batch, dict(epsilon=0.0)),
        (E.erp_batch, dict(g=2.0)),
        (E.msm_batch, dict(c=0.5)),
        (E.twe_batch, dict(nu=0.2, lam=0.6)),
    ]:
        assert np.allclose(fn(A, A, **kw), 0.0)
        # symmetry
        assert np.allclose(fn(A, B, **kw), fn(B, A, **kw))
    assert (E.lcss_batch(A, A, epsilon=0.0) == A.shape[1]).all()
    # triangle inequality for the metrics (ERP, MSM, TWE) on triples
    rng = random.Random(11)
    tri = [
        [float(rng.randrange(30)) for _ in range(12)] for _ in range(12)
    ]
    T = np.array(tri)
    for fn, kw in [
        (E.erp_batch, dict(g=0.0)),
        (E.msm_batch, dict(c=0.5)),
        (E.twe_batch, dict(nu=0.2, lam=0.6)),
    ]:
        n = len(tri)
        D = np.zeros((n, n))
        for i in range(n):
            D[i] = fn(np.repeat(T[i][None], n, axis=0), T, **kw)
        for i in range(n):
            for j in range(n):
                for k in range(n):
                    assert D[i, j] <= D[i, k] + D[k, j] + 1e-9


def test_soft_dtw_limits():
    pairs = _pairs(n=8, r=10, c=10, hi=8)
    A, B = _stack(pairs)
    hard = np.array(
        [brute_hard_sqdtw(a, b, None) for a, b in pairs]
    )
    # gamma -> 0 recovers DTW^2 from below: soft <= hard always, and
    # the gap is O(gamma * path-count entropy) — at gamma = 1e-3 the
    # observed slack is ~3.5e-3 (ties contribute gamma*log K per cell)
    got = E.soft_dtw_batch(A, B, gamma=1e-3)
    assert ((hard - got) >= -1e-9).all()
    assert ((hard - got) <= 0.05).all()
    # and at gamma = 1e-6 the slack shrinks ~1000x (true convergence)
    got6 = E.soft_dtw_batch(A, B, gamma=1e-6)
    assert ((hard - got6) >= -1e-12).all()
    assert ((hard - got6) <= 1e-4).all()
    # soft-min <= hard min, monotone nonincreasing in gamma
    prev = hard + 1e-12
    for gamma in (0.01, 0.1, 1.0, 10.0):
        cur = E.soft_dtw_batch(A, B, gamma=gamma)
        assert (cur <= prev + 1e-9).all()
        prev = cur


def test_window0_closed_forms():
    pairs = _pairs(n=16, r=14, c=14)
    A, B = _stack(pairs)
    l1 = np.abs(A - B).sum(axis=1)
    assert np.allclose(E.erp_batch(A, B, g=7.0, window=0), l1)
    assert np.allclose(E.msm_batch(A, B, c=1.5, window=0), l1)
    assert np.allclose(
        E.twe_batch(A, B, nu=0.5, lam=1.0, window=0),
        2 * l1 - np.abs(A[:, -1] - B[:, -1]),
    )
    assert np.allclose(
        E.soft_dtw_batch(A, B, gamma=1.0, window=0),
        ((A - B) ** 2).sum(axis=1),
    )
    assert (
        E.lcss_batch(A, B, epsilon=2.0, window=0)
        == (np.abs(A - B) <= 2.0).sum(axis=1)
    ).all()


def test_all_pairs_guard(spark):
    from pyspark.sql import functions as F

    from dtaidistance_spark import synth

    df = synth.sequences_df(spark, 16).withColumn(
        "tokens", F.slice("tokens", 1, 8)
    )
    out = E.elastic_all_pairs(df, "erp", g=0.0, window=0).toPandas()
    assert len(out) == 16 * 15 // 2
    E._MAX_ALL_PAIRS, saved = 10, E._MAX_ALL_PAIRS
    try:
        with pytest.raises(ValueError, match="all-pairs guard"):
            E.elastic_all_pairs(df, "erp", g=0.0)
    finally:
        E._MAX_ALL_PAIRS = saved
