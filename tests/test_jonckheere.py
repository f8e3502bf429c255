"""Semantic gates for jonckheere_q (TS113): brute-force U-sum
identity, tie-corrected variance vs the textbook no-tie formula,
planted monotone trend vs V-shape, √n scaling, and the live
false-positive + replication-collapse corpus reading."""

import math

import numpy as np

from dtaidistance_spark.operators.jonckheere_q import jonckheere_trend


def _jt_ref(groups):
    """(J, E, Var, z) with the Lehmann tie-corrected variance."""
    k = len(groups)
    groups = [np.asarray(g, dtype=np.int64) for g in groups]
    J = 0.0
    for g in range(k):
        for h in range(g + 1, k):
            x, y = groups[g], groups[h]
            less = (x[:, None] < y[None, :]).sum()
            ties = (x[:, None] == y[None, :]).sum()
            J += less + 0.5 * ties
    ns = np.array([len(g) for g in groups], dtype=np.int64)
    N = int(ns.sum())
    pooled = np.concatenate(groups)
    _, tv = np.unique(pooled, return_counts=True)
    tv = tv.astype(np.int64)
    E = (N * N - (ns**2).sum()) / 4.0
    A = (
        N * (N - 1) * (2 * N + 5)
        - (ns * (ns - 1) * (2 * ns + 5)).sum()
        - (tv * (tv - 1) * (2 * tv + 5)).sum()
    )
    B = float((ns * (ns - 1) * (ns - 2)).sum()) * float(
        (tv * (tv - 1) * (tv - 2)).sum()
    )
    C = float((ns * (ns - 1)).sum()) * float((tv * (tv - 1)).sum())
    var = (
        A / 72.0
        + B / (36.0 * N * (N - 1) * (N - 2))
        + C / (8.0 * N * (N - 1))
    )
    return J, E, var, (J - E) / math.sqrt(var)


def _lcg(seed, n, mod):
    out = np.empty(n, dtype=np.int64)
    s = seed
    for i in range(n):
        s = (1103515245 * s + 12345) % (1 << 31)
        out[i] = s % mod
    return out


def test_u_sum_identity_small():
    # brute-force check of engine J2/E2 on small groups is implied by
    # the reference; here pin the reference itself on a hand case:
    # groups [1,2], [3,4]: all 4 cross pairs ascending ⇒ J = 4
    J, E, var, z = _jt_ref([[1, 2], [3, 4]])
    assert J == 4
    assert E == (16 - 8) / 4.0
    assert z > 0


def test_matches_numpy(spark, sf_dir):
    import pandas as pd

    out = (
        jonckheere_trend(spark, sf_dir)
        .toPandas()
        .set_index("event_type")
    )
    raw = pd.read_parquet(f"{sf_dir}/events.parquet")
    raw["cents"] = np.floor(100.0 * raw.value + 0.5).astype(np.int64)
    raw["grp"] = raw.ts.dt.hour // 6
    for et, sub in raw.groupby("event_type"):
        groups = [
            sub[sub.grp == g].cents.to_numpy() for g in range(4)
        ]
        J, E, var, z = _jt_ref(groups)
        row = out.loc[et]
        assert row.j2_stat == int(round(2 * J))
        assert row.e2_stat == int(round(2 * E))
        assert abs(row.var_j - math.floor(var * 1e6 + 0.5) / 1e6) < 2e-6
        assert abs(row.z - z) < 1e-4


def test_no_tie_variance_degeneracy():
    # tie-free data: Lehmann variance = textbook
    # [N²(2N+3) − Σn²(2n+3)]... the classical no-tie form is
    # Var = [N²(2N+3) − Σ n_g²(2n_g+3)]/72
    groups = [[1, 5, 9], [2, 6, 10], [3, 7, 11, 15]]
    _, _, var, _ = _jt_ref(groups)
    ns = np.array([3, 3, 4])
    N = 10
    classic = (N * N * (2 * N + 3) - (ns * ns * (2 * ns + 3)).sum()) / 72.0
    assert abs(var - classic) < 1e-9


def test_planted_trend_and_scaling():
    z_small = None
    for n, tag in ((200, "small"), (800, "big")):
        groups = [
            _lcg(g * 7 + 1, n, 1000) + 120 * g for g in range(4)
        ]
        _, _, _, z = _jt_ref(groups)
        assert z > 5
        if tag == "small":
            z_small = z
    assert z > z_small * 1.5  # grows like √n


def test_v_shape_quiet():
    # V-shaped group means: strong KW-style heterogeneity, but the
    # ORDERED statistic nets out
    groups = [
        _lcg(3, 400, 1000) + 300,
        _lcg(5, 400, 1000),
        _lcg(7, 400, 1000),
        _lcg(9, 400, 1000) + 300,
    ]
    _, _, _, z = _jt_ref(groups)
    assert abs(z) < 1.96


def test_honest_false_positive_and_collapse(spark):
    out01 = (
        jonckheere_trend(spark, "/root/testdata/sf0.01")
        .toPandas()
        .set_index("event_type")
    )
    # exactly one dial fires at sf0.01 — click, z = −2.158
    assert int(out01.reject_trend.sum()) == 1
    assert int(out01.loc["click"].reject_trend) == 1
    assert abs(out01.loc["click"].z + 2.158194) < 1e-3
    # replication ladder: at 10× data the z COLLAPSES instead of
    # growing to ≈ −6.8 — the false-positive signature
    out1 = (
        jonckheere_trend(spark, "/root/testdata/sf0.1")
        .toPandas()
        .set_index("event_type")
    )
    assert abs(out1.loc["click"].z) < 1.0
    assert int(out1.reject_trend.sum()) == 0
