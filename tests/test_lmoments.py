"""Semantic gates for lmoments_q (TS109): numpy recompute per doc,
the exact {0,6,12} hand case (λ2 = half the Gini mean difference),
planted exponential/uniform fingerprint recovery, affine
equivariance, and the honest odd/even scatter-asymmetry corpus
reading."""

import math

import numpy as np

from dtaidistance_spark.operators.lmoments_q import (
    _CAP,
    _ND,
    lmoment_ratios,
)
from dtaidistance_spark.synth import gen_row

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _lmom_ref(vals):
    x = np.sort(np.asarray(vals, dtype=np.float64))
    n = len(x)
    i = np.arange(1, n + 1, dtype=np.float64)
    b0 = x.mean()
    b1 = (x * (i - 1)).sum() / (n * (n - 1))
    b2 = (x * ((i - 1) * (i - 2) / 2)).sum() / (
        n * ((n - 1) * (n - 2) / 2)
    )
    b3 = (x * ((i - 1) * (i - 2) * (i - 3) / 6)).sum() / (
        n * ((n - 1) * (n - 2) * (n - 3) / 6)
    )
    l1 = b0
    l2 = 2 * b1 - b0
    l3 = 6 * b2 - 6 * b1 + b0
    l4 = 20 * b3 - 30 * b2 + 12 * b1 - b0
    return l1, l2, l2 / l1, l3 / l2, l4 / l2


def test_matches_numpy(spark, sf_dir):
    out = (
        lmoment_ratios(spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(out) == _ND
    for i in range(0, _ND, 17):
        doc_id, tokens, n, _, _ = gen_row(i)
        v = tokens[:_CAP]
        l1, l2, lcv, t3, t4 = _lmom_ref(v)
        row = out.loc[doc_id]
        assert row.n_used == len(v)
        assert abs(row.l1 - f6(l1)) < 1e-6
        assert abs(row.l2 - f6(l2)) < 1e-6
        assert abs(row.lcv - f6(lcv)) < 1e-6
        assert abs(row.t3 - f6(t3)) < 1e-5
        assert abs(row.t4 - f6(t4)) < 1e-5


def test_hand_case():
    # {0, 6, 12}: b0 = 6, b1 = 5 ⇒ λ2 = 4 — which equals half the
    # Gini mean difference (6+12+6)/3/2; symmetric ⇒ λ3 = 0
    l1, l2, lcv, t3, _ = _lmom_ref([0, 6, 12])
    assert abs(l1 - 6) < 1e-12
    assert abs(l2 - 4) < 1e-12
    assert abs(t3) < 1e-12


def test_exponential_fingerprint():
    # exponential: population (τ3, τ4) = (1/3, 1/6), L-CV = 1/2
    rng = np.random.RandomState(5)
    x = -np.log(rng.uniform(size=50000))
    _, _, lcv, t3, t4 = _lmom_ref(x)
    assert abs(lcv - 0.5) < 0.01
    assert abs(t3 - 1 / 3) < 0.01
    assert abs(t4 - 1 / 6) < 0.01


def test_uniform_fingerprint():
    # uniform[0, c]: (τ3, τ4) = (0, 0), L-CV = 1/3
    rng = np.random.RandomState(9)
    x = rng.uniform(0, 1000, size=50000)
    _, _, lcv, t3, t4 = _lmom_ref(x)
    assert abs(lcv - 1 / 3) < 0.01
    assert abs(t3) < 0.01
    assert abs(t4) < 0.01


def test_affine_equivariance():
    rng = np.random.RandomState(3)
    x = rng.uniform(10, 50, size=2000)
    l1, l2, _, t3, t4 = _lmom_ref(x)
    l1b, l2b, _, t3b, t4b = _lmom_ref(3.0 * x + 7.0)
    assert abs(l1b - (3 * l1 + 7)) < 1e-9
    assert abs(l2b - 3 * l2) < 1e-9
    assert abs(t3b - t3) < 1e-12  # ratios shift/scale invariant
    assert abs(t4b - t4) < 1e-12


def test_honest_odd_even_scatter(spark):
    out = lmoment_ratios(spark, "/root/testdata/sf0.01").toPandas()
    # medians nail the uniform point
    assert abs(out.t3.median()) < 0.005
    assert abs(out.t4.median()) < 0.005
    assert 0.32 < out.lcv.median() < 0.345
    assert abs(out.l1.median() - 50257 / 2) < 300
    # odd ratio: lattice-tightened vs the iid sd ≈ 0.020 at these n's
    assert out.t3.std() < 0.016
    # even ratio: NOT tightened (the corrected draft guess) — iid-like
    assert 0.005 < out.t4.std() < 0.02
