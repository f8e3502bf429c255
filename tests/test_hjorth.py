"""Semantic gates for hjorth_q (TS90): independent numpy recompute of
every emitted number for sampled series, the exact ±1-alternation
closed case, the discrete-sinusoid and white-noise calibrations, the
ramp-kills-mobility caveat, and the honest corpus bands."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.hjorth_q import _N, hjorth_params

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _hjorth_np(y):
    """Textbook population-variance Hjorth triple (independent of the
    cleared-int64 route the query uses)."""
    y = np.asarray(y, dtype=np.float64)
    vy = y.var()
    vd = np.diff(y).var()
    ve = np.diff(y, 2).var()
    if vy <= 0 or vd <= 0 or ve <= 0 or len(y) < 4:
        return None
    mob = math.sqrt(vd / vy)
    return vy, mob, math.sqrt(ve / vd) / mob


def test_matches_numpy(spark):
    out = hjorth_params(spark, "").toPandas().set_index("doc_id")
    loc = synth.sequences_local(_N)
    checked = 0
    for i in range(0, _N, 7):
        row_l = loc.iloc[i]
        y = row_l.tokens.astype(np.int64)
        r = _hjorth_np(y)
        row = out.loc[row_l.doc_id]
        assert r is not None  # corpus series are never degenerate
        vy, mob, cpx = r
        # exact int64 sums
        d1, d2 = np.diff(y), np.diff(y, 2)
        assert row.s1 == y.sum() and row.s2 == (y * y).sum()
        assert row.t1 == d1.sum() and row.t2 == (d1 * d1).sum()
        assert row.u1 == d2.sum() and row.u2 == (d2 * d2).sum()
        assert abs(row.activity - f6(vy)) < max(1e-6, 1e-9 * vy)
        assert abs(row.mobility - f6(mob)) < 1e-5
        assert abs(row.complexity - f6(cpx)) < 1e-5
        checked += 1
    assert checked >= 70


def test_alternation_closed_case():
    # ±1 alternation: Δ alternates ∓2 (var = 4·var(y)), Δ² alternates
    # ±4 (var = 16·var(y)) → mobility = 2, complexity = 2/2 = 1 — up
    # to O(1/n) because the Δ and Δ² counts (n−1, n−2) have opposite
    # parities, so one of the two means is always ±2/(count) ≠ 0.
    y = np.tile([1, -1], 5000)
    vy, mob, cpx = _hjorth_np(y)
    assert abs(mob - 2.0) < 1e-3 and abs(cpx - 1.0) < 1e-3
    # and the deviation really is the parity term: it shrinks 100×
    # when n grows 100×
    y2 = np.tile([1, -1], 50)
    _, mob2, _ = _hjorth_np(y2)
    assert abs(mob2 - 2.0) > 50 * abs(mob - 2.0)


def test_sinusoid_and_whitenoise_calibration():
    # pure discrete sinusoid, whole cycles: mobility = 2·sin(π/P),
    # complexity = 1 (the difference operator is a pure gain on one
    # frequency).
    p = 64
    t = np.arange(8 * p)
    y = 1000.0 * np.sin(2 * np.pi * t / p)
    vy, mob, cpx = _hjorth_np(y)
    assert abs(mob - 2 * math.sin(math.pi / p)) < 1e-3
    assert abs(cpx - 1.0) < 1e-2
    # LCG white noise: var(Δ)=2σ², var(Δ²)=6σ² → mobility √2,
    # complexity √3/√2
    s, vals = 12345, []
    for _ in range(20000):
        s = (1103515245 * s + 12345) % (1 << 31)
        vals.append(s >> 16)
    vy, mob, cpx = _hjorth_np(np.array(vals, dtype=np.float64))
    assert abs(mob - math.sqrt(2)) < 0.03
    assert abs(cpx - math.sqrt(3) / math.sqrt(2)) < 0.03


def test_ramp_kills_mobility():
    # textbook caveat: an un-demeaned trend inflates var(y) but not
    # var(Δy) — mobility → 0 while complexity explodes.
    t = np.arange(2048, dtype=np.float64)
    y = 10.0 * t + 100.0 * np.sin(2 * np.pi * t / 64)
    vy, mob, cpx = _hjorth_np(y)
    assert mob < 0.02
    assert cpx > 3.0


def test_honest_corpus_bands(spark):
    out = hjorth_params(spark, "").toPandas()
    assert out.mobility.notna().all()
    # wrap jumps dominate: mobility near the alternation ceiling 2
    assert 1.3 < out.mobility.median() < 1.7
    # the corpus stays below the alternation line 2 (measured 1.767;
    # not a theorem — pinned as observed)
    assert out.mobility.max() < 2.0
    assert 1.0 < out.complexity.median() < 1.3
    # the smooth-ramp minority: low mobility, exploded complexity
    low = out[out.mobility < 0.2]
    assert 0.005 < len(low) / len(out) < 0.05
    assert low.complexity.min() > 2.0
    assert out.complexity.max() < 15.0
