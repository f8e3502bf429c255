"""Semantic gates for higuchi_q (TS79): textbook numpy recompute of
L(k) and the log-log slope per series, the exact-line D = 1 identity,
an LCG white-noise ≈ 2 control, and the honest out-of-band corpus
quantiles (the k_max = 4 estimator overshoots [1,2] on period-aligned
structure — pinned, not clamped)."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.higuchi_q import _KMAX, _N, higuchi_fd

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _higuchi(y, kmax=_KMAX):
    y = np.asarray(y, dtype=np.int64)
    n = len(y)
    lks = []
    for k in range(1, kmax + 1):
        lm_sum = 0.0
        for m in range(1, k + 1):
            nkm = (n - m) // k
            idx = m - 1 + np.arange(nkm + 1) * k  # 0-based sample points
            s = int(np.abs(np.diff(y[idx]).astype(object)).sum())
            lm_sum += float(s) * float(n - 1) / (float(nkm) * float(k * k))
        lks.append(lm_sum / float(k))
    if any(l <= 0 for l in lks):
        return lks, None
    x = [-math.log(k) for k in range(1, kmax + 1)]
    ly = [math.log(l) for l in lks]
    xb, yb = sum(x) / 4.0, sum(ly) / 4.0
    sxy = sum((a - xb) * (b - yb) for a, b in zip(x, ly))
    sxx = sum((a - xb) ** 2 for a in x)
    return lks, sxy / sxx


def test_matches_numpy(spark):
    out = higuchi_fd(spark, "").toPandas().set_index("doc_id")
    assert len(out) == _N
    loc = synth.sequences_local(_N)
    checked = 0
    for i in range(0, _N, 7):
        row_l = loc.iloc[i]
        y = row_l.tokens.astype(np.int64)
        lks, d = _higuchi(y)
        row = out.loc[row_l.doc_id]
        # the int64 stride sums first
        n = len(y)
        for k in range(1, _KMAX + 1):
            for m in range(1, k + 1):
                nkm = (n - m) // k
                idx = m - 1 + np.arange(nkm + 1) * k
                s = int(np.abs(np.diff(y[idx]).astype(object)).sum())
                assert row[f"s{k}_{m}"] == s
        if d is None or n < 20:
            assert np.isnan(row.higuchi_d)
            continue
        for k in range(1, _KMAX + 1):
            assert abs(row[f"l{k}"] - f6(lks[k - 1])) < 2e-6
        assert abs(row.higuchi_d - f6(d)) < 2e-6
        checked += 1
    assert checked >= 60


def test_exact_line_is_dimension_one():
    # x(t) = 7t: every stride telescope gives L(k) = 7(N-1)/k ⇒ D = 1
    y = 7 * np.arange(200, dtype=np.int64)
    lks, d = _higuchi(y)
    for k in range(1, _KMAX + 1):
        assert abs(lks[k - 1] - 7.0 * 199.0 / k) < 1e-9
    assert abs(d - 1.0) < 1e-12


def test_lcg_noise_reads_near_two():
    # deterministic LCG integers: white-noise-like ⇒ D ≈ 2
    x, vals = 12345, []
    for _ in range(2000):
        x = (1103515245 * x + 12345) % (2**31)
        vals.append(x % 10000)
    _, d = _higuchi(np.array(vals, dtype=np.int64))
    assert 1.85 < d < 2.15


def test_honest_out_of_band_quantiles(spark):
    out = higuchi_fd(spark, "").toPandas()
    ok = out.dropna(subset=["higuchi_d"])
    assert len(ok) >= 500
    med = ok.higuchi_d.median()
    assert 1.9 < med < 2.3  # measured ≈ 2.09
    assert ok.higuchi_d.min() > 0.9  # smooth docs read ≈ 1
    # the period-aligned tail overshoots the theoretical band —
    # the estimator reports it honestly
    assert ok.higuchi_d.max() > 2.5
