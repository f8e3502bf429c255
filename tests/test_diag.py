"""Gates for the band-degeneration premises behind operators/diag_q.py.

The full-value DuckDB oracles there rest on four mathematical facts
about the PRODUCTION kernels; if a kernel change breaks any of them,
these fail before the driver sweep does.
"""

from __future__ import annotations

import numpy as np
import pytest

from dtaidistance_spark import kernels as K


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n", [1, 2, 17, 256])
def test_window1_equal_length_is_euclidean(seed, n):
    """window=1 + equal lengths collapses the band to the diagonal, so
    banded DTW == Euclidean bit-for-bit (integer-valued float64)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 50257, n).astype(np.float64)
    b = rng.integers(0, 50257, n).astype(np.float64)
    assert K.dtw_distance(a, b, window=1) == np.sqrt(((a - b) ** 2).sum())
    # the batched kernel (the one dtw_pairs actually runs) agrees
    d = K.dtw_distance_batch(a, b[None, :], np.array([n]), window=1)
    assert d[0] == np.sqrt(((a - b) ** 2).sum())


def test_window1_ndim_is_euclidean():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 50257, (40, 2)).astype(np.float64)
    b = rng.integers(0, 50257, (40, 2)).astype(np.float64)
    assert K.dtw_ndim_distance(a, b, window=1) == np.sqrt(((a - b) ** 2).sum())


@pytest.mark.parametrize("k", [2, 3, 5])
def test_dba_of_identical_series_is_exact_identity(k):
    """(k*v)/k round-trips exactly in IEEE-754 for representable k*v,
    so DBA of k identical series returns the series bit-for-bit."""
    rng = np.random.default_rng(11)
    s = rng.integers(0, 50257, 64).astype(np.float64)
    assert np.array_equal(K.dba([s] * k, max_it=2), s)


def test_warping_path_identity_is_diagonal():
    rng = np.random.default_rng(3)
    s = rng.integers(0, 50257, 50).astype(np.float64)
    path = K.warping_path(s, s, window=1)
    assert len(path) == 50
    assert K.warping_amount(path) == 0
    assert K.dtw_distance(s, s, window=1) == 0.0


@pytest.mark.parametrize("n", [2, 30, 96])
def test_nw_identity_scores(n):
    """NW(s,s) = n*match; NW(s, s[1:]) = n-2 at unit costs, for any
    token content (max matches bounded by the shorter length, one gap
    mandatory)."""
    rng = np.random.default_rng(n)
    s = list(rng.integers(0, 50257, n))
    assert K.needleman_wunsch(s, s)[0] == float(n)
    assert K.needleman_wunsch(s, s[1:])[0] == float(n - 2)


def test_weighted_window1_matches_rectifier_formula():
    """C5 premise: at window=1 the weighted DP is the per-index
    rectifier sum — dead zone, per-side slopes, exact integers."""
    rng = np.random.default_rng(9)
    a = rng.integers(0, 50257, 64).astype(np.float64)
    b = rng.integers(0, 50257, 64).astype(np.float64)
    j = np.arange(64)
    W = np.stack([100.0 * (j % 3), 1.0 + (j % 2),
                  100.0 * (j % 3), 1.0 + (j % 2)], axis=1)
    d = np.abs(a - b)
    resid = np.maximum(d - 100.0 * (j % 3), 0.0) * (1.0 + (j % 2))
    assert K.dtw_weighted_distance(a, b, weights=W, window=1) == np.sqrt(
        (resid * resid).sum()
    )
    # identity weights == plain K1 (the compat contract)
    I = np.stack([np.zeros(64), np.ones(64), np.zeros(64), np.ones(64)], axis=1)
    assert K.dtw_weighted_distance(a, b, weights=I, window=1) == K.dtw_distance(
        a, b, window=1
    )


def test_warp_window1_is_source_series():
    """P4 premise: at window=1 the path is diagonal, so warping A onto
    any equal-length B returns A verbatim."""
    rng = np.random.default_rng(13)
    a = rng.integers(0, 50257, 50).astype(np.float64)
    b = rng.integers(0, 50257, 50).astype(np.float64)
    assert np.array_equal(K.warp(a, b, window=1), a)
