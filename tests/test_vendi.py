"""Semantic gates for vendi_q (E12): the full-n×n-kernel numpy
recompute (certifying the 64×64 Gram route), the SQL-vs-eigensolve
q = 2 route equality, the exact collapse/cluster closed cases, the
Rényi monotone hierarchy, and the honest ambient-capped corpus
reading."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.vendi_q import (
    vendi_from_stats,
    vendi_order2_check,
    vendi_scores,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _vendi_full_kernel(X):
    """Eigenvalues of the FULL n×n K/n — independent of the query's
    64×64 Gram identity."""
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    K = Xn @ Xn.T
    lam = np.linalg.eigvalsh(K / len(X))
    lam = lam[lam > 1e-12]
    vs1 = math.exp(-(lam * np.log(lam)).sum())
    return lam, vs1, 1.0 / (lam @ lam), 1.0 / lam.max()


def test_matches_full_kernel(spark, sf_dir):
    out = vendi_scores(spark, sf_dir).toPandas().iloc[0]
    raw = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.stack(raw.embedding.to_numpy()).astype(np.float64)
    lam, vs1, vs2, vsi = _vendi_full_kernel(X)
    assert out.n == len(X) and out.rank_eff == len(lam)
    assert abs(out.trace - f6(lam.sum())) < 1e-6
    assert abs(out.vs_1 - f6(vs1)) < 1e-4
    assert abs(out.vs_2 - f6(vs2)) < 1e-4
    assert abs(out.vs_inf - f6(vsi)) < 1e-4


def test_sql_route_equals_eigensolve(spark, sf_dir):
    eig = vendi_scores(spark, sf_dir).toPandas().iloc[0]
    sql = vendi_order2_check(spark, sf_dir).toPandas().iloc[0]
    assert sql.n_pairs == eig.n * eig.n
    assert abs(sql.vs_2 - eig.vs_2) < 1e-4


def test_collapse_and_cluster_closed_cases():
    # n copies of one vector: K/n has one eigenvalue 1 → every VS = 1
    X = np.tile(np.arange(1.0, 65.0), (50, 1))
    _, vs1, vs2, vsi = _vendi_full_kernel(X)
    assert abs(vs1 - 1.0) < 1e-9 and abs(vsi - 1.0) < 1e-9
    # k orthogonal equal clusters: λ̄ = 1/k each → every VS = k
    k, per = 8, 25
    X = np.zeros((k * per, 64))
    for c in range(k):
        X[c * per:(c + 1) * per, c] = 1.0
    _, vs1, vs2, vsi = _vendi_full_kernel(X)
    assert abs(vs1 - k) < 1e-9 and abs(vs2 - k) < 1e-9
    # mass-duplicating ONE sample crushes diversity…
    rng = np.random.RandomState(5)
    base = rng.randn(200, 64)
    flood = np.vstack([base, np.tile(base[0], (100, 1))])
    _, v_base, _, vi_base = _vendi_full_kernel(base)
    _, v_flood, _, vi_flood = _vendi_full_kernel(flood)
    assert v_flood < 0.6 * v_base
    assert vi_flood < 3.5  # one direction holds ≥ 1/3 of the mass
    # …while duplicating the WHOLE set is a Vendi no-op (the
    # normalized spectrum is copy-count invariant — the property that
    # makes VS a per-sample effective count, not a raw count)
    _, v_dub, v2_dub, vi_dub = _vendi_full_kernel(
        np.vstack([base, base])
    )
    assert abs(v_dub - v_base) < 1e-9


def test_renyi_hierarchy(spark, sf_dir):
    out = vendi_scores(spark, sf_dir).toPandas().iloc[0]
    assert out.vs_1 >= out.vs_2 >= out.vs_inf
    assert out.vs_1 <= out.rank_eff


def test_honest_ambient_capped(spark, sf_dir):
    out = vendi_scores(spark, sf_dir).toPandas().iloc[0]
    assert out.rank_eff == 64
    assert abs(out.trace - 1.0) < 1e-6
    # 500 points read as ~60 effectively-distinct samples — the
    # ambient-dimension cap, not a data property
    assert 55 < out.vs_1 < 64
    assert 30 < out.vs_inf < 50
    assert 0.02 < out.lam_max < 0.04  # ≈1.8× the isotropic 1/64
