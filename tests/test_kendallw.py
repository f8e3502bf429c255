"""Semantic gates for kendallw_q (TS114): numpy recompute from raw
events, perfect-concordance and single-judge identities, planted
shared-profile and independent-judge bands, tie-correction
degeneracy, the χ² critical-value re-derivation, and the corpus
no-fire reading."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.kendallw_q import (
    _M,
    _NH,
    kendall_w_hours,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _midrank(a):
    a = np.asarray(a, float)
    order = np.argsort(a, kind="mergesort")
    r = np.empty(len(a))
    sa = a[order]
    i = 0
    rr = np.arange(1, len(a) + 1, dtype=float)
    while i < len(a):
        j = i
        while j < len(a) and sa[j] == sa[i]:
            j += 1
        r[order[i:j]] = rr[i:j].mean()
        i = j
    return r


def _w_ref(mat):
    """Tie-corrected W from an m × n matrix of scores."""
    m, n = mat.shape
    R = np.vstack([_midrank(mat[j]) for j in range(m)])
    S = ((R.sum(0) - m * (n + 1) / 2.0) ** 2).sum()
    T = 0.0
    for j in range(m):
        _, cnts = np.unique(mat[j], return_counts=True)
        T += ((cnts**3 - cnts).sum()) / 12.0
    W = S / (m * m * (n**3 - n) / 12.0 - m * T)
    return W, m * (n - 1) * W


def test_matches_numpy(spark, sf_dir):
    out = kendall_w_hours(spark, sf_dir).toPandas().iloc[0]
    raw = pd.read_parquet(f"{sf_dir}/events.parquet")
    raw["h"] = raw.ts.dt.hour
    types = sorted(raw.event_type.unique())
    mat = np.zeros((len(types), _NH))
    for j, t in enumerate(types):
        c = raw[raw.event_type == t].groupby("h").size()
        for h, v in c.items():
            mat[j, h] = v
    W, chi2 = _w_ref(mat)
    assert out.m_judges == len(types) == _M
    assert out.n_objects == _NH
    assert abs(out.w - f6(W)) < 1e-6
    assert abs(out.chi2_stat - f6(chi2)) < 1e-5


def test_perfect_and_single_judge():
    base = np.arange(10, dtype=float)
    mat = np.vstack([base, base, base])
    W, _ = _w_ref(mat)
    assert abs(W - 1.0) < 1e-12
    W1, _ = _w_ref(base.reshape(1, -1))
    assert abs(W1 - 1.0) < 1e-12


def test_reversed_pair_zero():
    # two judges, exactly opposite rankings: W = 0... rank sums all
    # equal ⇒ S = 0
    base = np.arange(8, dtype=float)
    W, _ = _w_ref(np.vstack([base, base[::-1]]))
    assert abs(W) < 1e-12


def _lcg(seed, n, mod):
    out = np.empty(n, dtype=np.int64)
    s = seed
    for i in range(n):
        s = (1103515245 * s + 12345) % (1 << 31)
        out[i] = s % mod
    return out


def test_planted_bands():
    # shared profile + noise: fires with high implied ρ̄
    profile = np.arange(24, dtype=float) * 10
    mat = np.vstack(
        [profile + _lcg(7 + j, 24, 30) for j in range(5)]
    )
    W, chi2 = _w_ref(mat)
    assert chi2 > 35.172461626908
    assert (5 * W - 1) / 4 > 0.5
    # independent judges: E[W] ≈ 1/m, χ² in the null band
    mat0 = np.vstack([_lcg(100 + j, 24, 10**6) for j in range(5)])
    W0, chi20 = _w_ref(mat0)
    assert W0 < 0.35
    assert chi20 < 35.172461626908


def test_tiefree_correction_degenerate():
    # tie-free scores: corrected and plain W agree
    mat = np.vstack(
        [np.random.RandomState(j).permutation(20) for j in range(4)]
    ).astype(float)
    m, n = mat.shape
    W, _ = _w_ref(mat)
    R = np.vstack([_midrank(mat[j]) for j in range(m)])
    S = ((R.sum(0) - m * (n + 1) / 2.0) ** 2).sum()
    plain = 12.0 * S / (m * m * (n**3 - n))
    assert abs(W - plain) < 1e-12


def test_crit_literal():
    # re-derive χ²₀.₉₅(23) by series + bisection
    def P(s, x):
        term = 1.0 / s
        total = term
        n = 0
        while n < 10000:
            n += 1
            term *= x / (s + n)
            total += term
            if term < 1e-18 * total:
                break
        return total * math.exp(
            -x + s * math.log(x) - math.lgamma(s)
        )

    lo, hi = 0.0, 400.0
    for _ in range(200):
        mid = (lo + hi) / 2
        if P(23 / 2.0, mid / 2.0) < 0.95:
            lo = mid
        else:
            hi = mid
    assert abs((lo + hi) / 2 - 35.172461626908) < 1e-9


def test_honest_no_fire(spark):
    out = kendall_w_hours(
        spark, "/root/testdata/sf0.01"
    ).toPandas().iloc[0]
    assert int(out.reject_concordance) == 0
    assert abs(out.w - 0.224089) < 1e-6
    assert abs(out.rho_bar - 0.030112) < 1e-6
    assert out.chi2_stat < out.crit_05
