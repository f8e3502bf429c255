"""Semantic gates for bartels_q (TS125): numpy recompute, the n=3
hand case, planted alternation/slow-walk/null regimes, variance
formula vs permutation null, and the two-sided-split corpus
pins."""

import math

import numpy as np

from dtaidistance_spark.operators.bartels_q import (
    _CAP,
    bartels_rank_vn,
)
from dtaidistance_spark.synth import gen_row

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _midrank2(x):
    x = np.asarray(x)
    order = np.argsort(x, kind="mergesort")
    r2 = np.empty(len(x), dtype=np.int64)
    sx = x[order]
    i = 0
    while i < len(x):
        j = i
        while j < len(x) and sx[j] == sx[i]:
            j += 1
        # doubled midrank: 2·rank + tie − 1 with rank = i+1
        r2[order[i:j]] = 2 * (i + 1) + (j - i) - 1
        i = j
    return r2


def _rvn_z(x):
    r2 = _midrank2(x)
    n = len(x)
    num4 = int(((r2[:-1] - r2[1:]) ** 2).sum())
    den4 = int(((r2 - (n + 1)) ** 2).sum())
    rvn = num4 / den4
    var = (
        4.0
        * (n - 2)
        * (5 * n * n - 2 * n - 9)
        / (5.0 * n * (n + 1) * (n - 1) ** 2)
    )
    return rvn, (rvn - 2.0) / math.sqrt(var)


def test_matches_numpy(spark, sf_dir):
    out = (
        bartels_rank_vn(spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    for i in range(0, 512, 61):
        doc_id, tokens, n, _, _ = gen_row(i)
        rvn, z = _rvn_z(tokens[:_CAP])
        row = out.loc[doc_id]
        assert abs(row.rvn - f6(rvn)) < 1e-6
        assert abs(row.z - f6(z)) < 1e-5


def test_hand_case_n3():
    # (1,3,2): ranks (1,3,2); num = (1−3)²+(3−2)² = 5, den =
    # Σ(r−2)² = 1+1+0 = 2 ⇒ RVN = 2.5
    rvn, _ = _rvn_z([1, 3, 2])
    assert abs(rvn - 2.5) < 1e-12


def _lcg(seed, n, mod):
    s = seed
    out = np.empty(n, dtype=np.int64)
    for i in range(n):
        s = (1103515245 * s + 12345) % (1 << 31)
        out[i] = (s >> 12) % mod
    return out


def test_planted_regimes_and_null():
    # alternation: huge positive z
    alt = np.empty(600, dtype=np.int64)
    alt[::2] = _lcg(3, 300, 100)
    alt[1::2] = _lcg(5, 300, 100) + 100000
    _, z_alt = _rvn_z(alt)
    assert z_alt > 10
    # slow walk: rank-adjacent successors, huge negative z
    walk = np.cumsum(_lcg(7, 600, 5) + 1)
    _, z_walk = _rvn_z(walk)
    assert z_walk < -10
    # iid null: ~5% rejection
    rej = 0
    for r in range(60):
        _, z = _rvn_z(_lcg(100 + r, 400, 10**6))
        rej += abs(z) > 1.96
    assert rej / 60 <= 0.12


def test_variance_formula_vs_permutation():
    # the Bartels variance matches the permutation-null spread
    n = 300
    base = _lcg(11, n, 10**6)
    zs = []
    s = 999
    for r in range(80):
        # LCG Fisher-Yates
        perm = np.arange(n)
        for i in range(n - 1, 0, -1):
            s = (1103515245 * s + 12345) % (1 << 31)
            j = (s >> 12) % (i + 1)
            perm[i], perm[j] = perm[j], perm[i]
        rvn, _ = _rvn_z(base[perm])
        zs.append(rvn)
    var_emp = np.var(zs)
    var_theory = (
        4.0
        * (n - 2)
        * (5 * n * n - 2 * n - 9)
        / (5.0 * n * (n + 1) * (n - 1) ** 2)
    )
    assert abs(math.sqrt(var_emp) / math.sqrt(var_theory) - 1) < 0.25


def test_honest_two_sided_split(spark):
    out = bartels_rank_vn(
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    rej = out[out.reject_random == 1]
    assert len(rej) == 477
    up = int((rej.z > 0).sum())
    dn = int((rej.z < 0).sum())
    assert (up, dn) == (276, 201)  # the two-sided split
    assert out.z.min() < -40  # rank-adjacent slow rotations
    assert out.z.max() > 20
    assert abs(out.rvn.median() - 2.255) < 0.01
