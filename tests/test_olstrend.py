"""Semantic gates for olstrend_q (TS61): numpy recompute of the
cleared-denominator sufficient statistics and the t verdict."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.olstrend_q import _N, ols_trend_ttest

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def test_matches_numpy(spark, sf_dir):
    out = ols_trend_ttest(spark, sf_dir).toPandas().set_index("doc_id")
    assert len(out) == _N
    loc = synth.sequences_local(_N)
    n_rej = 0
    strong = 0
    for k, r in enumerate(loc.itertuples()):
        y = np.asarray(r.tokens, dtype=np.int64)
        n = int(r.n_tok)
        got = out.loc[r.doc_id]
        n_rej += int(got.reject_no_trend)
        strong += int(got.r2 > 0.5)
        if k % 7:
            continue
        x = np.arange(n, dtype=np.int64)
        A = int(n * np.sum(x * y) - x.sum() * y.sum())
        B = int(n * np.sum(x * x) - x.sum() ** 2)
        C = int(n * np.sum(y * y) - int(y.sum()) ** 2)
        assert (got.n, got.a_num, got.b_den, got.c_num) == (n, A, B, C)
        assert got.slope == f6(float(A) / float(B))
        assert got.r2 == f6(float(A) * float(A) / (float(B) * float(C)))
        t = float(A) * math.sqrt(
            (n - 2.0) / (float(C) * float(B) - float(A) * float(A))
        )
        assert abs(got.t_stat - f6(t)) < 1e-9
        assert got.reject_no_trend == (1 if abs(t) > 1.96 else 0)
        # cross-check against numpy's own polyfit slope
        assert abs(got.slope - np.polyfit(x, y.astype(float), 1)[0]) < 1e-3
    # honest reading: mostly trend-free sawtooths (≈ nominal rate),
    # but the unwrapped-ramp docs carry genuine strong trends
    assert n_rej < 0.15 * _N
    assert strong >= 1
    assert out.t_stat.abs().max() > 5.0


def test_hand_case():
    """y = 2x + 1 exactly → slope 2, r² = 1, t unbounded (C·B = A²
    → NULL-guarded t)."""
    x = np.arange(16, dtype=np.int64)
    y = 2 * x + 1
    n = 16
    A = int(n * np.sum(x * y) - x.sum() * y.sum())
    B = int(n * np.sum(x * x) - x.sum() ** 2)
    C = int(n * np.sum(y * y) - int(y.sum()) ** 2)
    assert A / B == 2.0
    assert A * A == B * C  # r² = 1 → the t guard fires (division by 0)
