"""Semantic gates for isotonic_q (TS76): the exact cone-projection
KKT characterization on real series (monotone + residual orthogonality
+ suffix dual feasibility), per-block mean preservation, the monotone
fixpoint, hand cases, and the audit-row recompute."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.isotonic_q import isotonic_fit, pava

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _check_kkt(y, fit, tol=1e-8):
    r = y - fit
    # (i) feasibility: nondecreasing
    assert (np.diff(fit) >= -tol).all()
    # (ii) orthogonality: <y - fit, fit> = 0
    assert abs(float(r @ fit)) < tol * max(1.0, float(np.abs(y).sum()))
    # (iii) dual feasibility over the cone generators:
    #   constants (both signs): sum r = 0
    #   suffix indicators: every suffix residual sum <= 0
    assert abs(float(r.sum())) < tol * max(1.0, float(np.abs(y).sum()))
    suffix = np.cumsum(r[::-1])[::-1]
    assert (suffix <= tol * max(1.0, float(np.abs(y).max()))).all()
    # per-block mean preservation: residuals sum to 0 on each maximal
    # constant block
    edges = np.flatnonzero(np.diff(fit) > tol)
    start = 0
    for e in list(edges + 1) + [len(y)]:
        assert abs(float(r[start:e].sum())) < 1e-6
        start = e


def test_kkt_on_corpus(spark, sf_dir):
    out = isotonic_fit(spark, sf_dir).toPandas().set_index("doc_id")
    pdf = synth.sequences_local(24)
    for _, row in pdf.iterrows():
        y = np.asarray(row["tokens"][:512], dtype=np.float64)
        fit = pava(y)
        _check_kkt(y, fit)
        g = out.loc[row["doc_id"]]
        r = y - fit
        assert g.l == len(y)
        assert g.fit_checksum == f6(float(np.abs(fit).sum()))
        assert g.sse == f6(float((r * r).sum()))
        assert g.n_blocks == 1 + int((np.diff(fit) > 0).sum())
        assert g.fit_min == f6(float(fit[0]))
        assert g.fit_max == f6(float(fit[-1]))
        assert g.fit_min <= g.fit_max
        # mean preservation corpus-wide
        assert abs(fit.mean() - y.mean()) < 1e-9 * max(1.0, abs(y.mean()))


def test_hand_cases():
    assert np.allclose(pava(np.array([3.0, 1.0, 2.0])), [2.0, 2.0, 2.0])
    assert np.allclose(
        pava(np.array([1.0, 3.0, 2.0, 4.0])), [1.0, 2.5, 2.5, 4.0]
    )
    # decreasing input pools to one block at the global mean
    y = np.array([5.0, 4.0, 3.0, 2.0, 1.0])
    assert np.allclose(pava(y), [3.0] * 5)
    # already-monotone input is a fixpoint
    y = np.array([1.0, 1.0, 2.0, 7.0, 9.0])
    assert np.allclose(pava(y), y)


def test_kkt_random_and_adversarial():
    rng = np.random.default_rng(5)
    for _ in range(50):
        n = int(rng.integers(2, 60))
        y = rng.normal(size=n) * rng.choice([0.1, 1.0, 100.0])
        fit = pava(y)
        _check_kkt(y, fit)
    # ties and plateaus
    _check_kkt(np.zeros(10), pava(np.zeros(10)))
    y = np.array([2.0, 2.0, 1.0, 1.0, 3.0, 3.0, 0.0])
    _check_kkt(y, pava(y))
