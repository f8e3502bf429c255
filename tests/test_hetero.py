"""Semantic gates for hetero_q (TS116): numpy recompute per doc,
planted fan / symmetric-V separation, LCG null calibration, and
the sub-null + shuffle-extinction corpus reading."""

import math

import numpy as np

from dtaidistance_spark.operators.hetero_q import (
    _CAP,
    bp_white_heteroskedasticity,
)
from dtaidistance_spark.synth import gen_row

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _lm_ref(y):
    """(LM_BP, LM_White) — Koenker aux regressions of û² on t, t²."""
    y = np.asarray(y, dtype=np.float64)
    m = len(y)
    t = np.arange(1, m + 1, dtype=np.float64)
    X = np.column_stack([np.ones(m), t])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    v = (y - X @ beta) ** 2
    syy = (v * v).sum() - v.sum() ** 2 / m
    sxx = (t * t).sum() - t.sum() ** 2 / m
    sxy = (t * v).sum() - t.sum() * v.sum() / m
    lm_bp = m * sxy**2 / (sxx * syy)
    t2 = t * t
    a12 = (t * t2).sum() - t.sum() * t2.sum() / m
    a22 = (t2 * t2).sum() - t2.sum() ** 2 / m
    b1 = sxy
    b2 = (t2 * v).sum() - t2.sum() * v.sum() / m
    det = sxx * a22 - a12 * a12
    be1 = (a22 * b1 - a12 * b2) / det
    be2 = (sxx * b2 - a12 * b1) / det
    lm_w = m * (be1 * b1 + be2 * b2) / syy
    return lm_bp, lm_w


def _lcg_normal(seed, n):
    s = seed
    out = np.empty(n)
    for i in range(n):
        acc = 0.0
        for _ in range(12):
            s = (1103515245 * s + 12345) % (1 << 31)
            acc += s / (1 << 31)
        out[i] = acc - 6.0
    return out


def test_matches_numpy(spark, sf_dir):
    out = (
        bp_white_heteroskedasticity(spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    for i in range(0, 512, 61):
        doc_id, tokens, n, _, _ = gen_row(i)
        lm_bp, lm_w = _lm_ref(tokens[:_CAP])
        row = out.loc[doc_id]
        assert row.n_used == min(n, _CAP)
        assert abs(row.lm_bp - f6(lm_bp)) < 1e-3
        assert abs(row.lm_white - f6(lm_w)) < 1e-3


def test_planted_fan_fires_both():
    m = 1000
    t = np.arange(1, m + 1, dtype=np.float64)
    e = _lcg_normal(7, m)
    y = 5 * t + e * t  # sd grows linearly with t
    lm_bp, lm_w = _lm_ref(y)
    assert lm_bp > 3.8415
    assert lm_w > 5.9915


def test_v_shape_fires_white_only():
    m = 1200
    t = np.arange(1, m + 1, dtype=np.float64)
    # EXACTLY symmetric variance bowl with deterministic ±1
    # alternation: the linear aux cancels to machine zero while the
    # quadratic aux sees everything (an LCG-noise variant leaks
    # lm_bp ≈ 4.2 through sampling asymmetry — the deterministic
    # construction makes the separation exact)
    sd = 1.0 + 4.0 * ((t - (m + 1) / 2) / (m / 2)) ** 2
    e = np.where(t % 2 == 0, 1.0, -1.0)
    y = 3 * t + e * sd
    lm_bp, lm_w = _lm_ref(y)
    assert lm_bp < 1e-20
    assert lm_w > 1000


def test_null_calibration():
    rej_bp = rej_w = 0
    runs = 60
    for r in range(runs):
        y = 2 * np.arange(800) + _lcg_normal(100 + r, 800) * 5
        lm_bp, lm_w = _lm_ref(y)
        rej_bp += lm_bp > 3.8415
        rej_w += lm_w > 5.9915
    assert rej_bp / runs < 0.15
    assert rej_w / runs < 0.15


def test_honest_subnull_and_shuffle(spark):
    out = bp_white_heteroskedasticity(
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    # sub-null bulk: phase cancellation of periodic v against t
    assert out.lm_bp.median() < 0.05
    # below-nominal rejection rates
    assert out.reject_bp.mean() < 0.06
    assert out.reject_white.mean() < 0.06
    # shuffle control: rejections are order-real — destroying the
    # time order extinguishes them at ~the nominal rate (a single
    # shuffle draw can still land past the threshold by chance, so
    # the gate counts over 5 shuffles × each sampled rejecting doc)
    rej_docs = out[out.reject_bp == 1].doc_id.tolist()[:5]
    assert rej_docs  # the 1.6% exists
    rng = np.random.RandomState(31)
    trials = fires = 0
    for doc_id in rej_docs:
        i = int(doc_id[3:])
        _, tokens, _, _, _ = gen_row(i)
        y = tokens[:_CAP].astype(np.float64)
        for _ in range(5):
            lm_shuf, _ = _lm_ref(y[rng.permutation(len(y))])
            trials += 1
            fires += lm_shuf > 3.8415
    assert fires / trials <= 0.2  # was 100% in time order
