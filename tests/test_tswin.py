"""Gates for tswin_q: Hampel rolling median/MAD and the Kalman fold —
each verified against an independent pure-Python/numpy recompute (the
DuckDB hash-match lives in test_oracle.py; these prove the *semantics*,
not just cross-engine agreement)."""

import numpy as np
import pandas as pd
import pytest

from dtaidistance_spark import synth
from dtaidistance_spark.operators.tswin_q import (
    _HALF,
    _N,
    hampel_filter,
    kalman_filter,
)


def _lower_median(sorted_vals):
    c = len(sorted_vals)
    return sorted_vals[(c + 1) // 2 - 1]


def test_hampel_matches_pandas_recompute(spark, sf_dir):
    out = hampel_filter(spark, sf_dir).toPandas()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    s = ev[ev.event_type == "click"].copy()
    s["tu"] = s.ts.astype("datetime64[us]").astype("int64")
    s = s.sort_values(["user_id", "tu", "value", "event_id"])

    rows = {}
    for uid, g in s.groupby("user_id"):
        v = g.value.to_numpy()
        eid = g.event_id.to_numpy()
        n = len(v)
        med = np.empty(n)
        for i in range(n):
            lo, hi = max(0, i - _HALF), min(n, i + _HALF + 1)
            med[i] = _lower_median(np.sort(v[lo:hi]))
        for i in range(n):
            lo, hi = max(0, i - _HALF), min(n, i + _HALF + 1)
            devs = np.sort(np.abs(v[lo:hi] - med[lo:hi]))
            mad = _lower_median(devs)
            rows[int(eid[i])] = (med[i], mad, abs(v[i] - med[i]) > 3 * 1.4826 * mad)

    assert len(out) == len(rows)
    for r in out.itertuples():
        m, mad, spike = rows[int(r.event_id)]
        assert r.med == m and r.mad == mad, r.event_id
        assert bool(r.is_spike) == bool(spike), r.event_id


def test_hampel_spikes_are_minority(spark, sf_dir):
    out = hampel_filter(spark, sf_dir).toPandas()
    assert 0 < out.is_spike.sum() < 0.2 * len(out)


def test_kalman_matches_numpy_fold(spark, sf_dir):
    out = kalman_filter(spark, sf_dir).toPandas().set_index("doc_id")
    loc = synth.sequences_local(_N)
    q, r = 1.0, 4.0
    for row in loc.itertuples():
        x = row.tokens.astype(np.float64)
        xhat, p = x[0], 1.0
        for z in x[1:]:
            pp = p + q
            k = pp / (pp + r)
            xhat = xhat + k * (z - xhat)
            p = (1.0 - k) * pp
        got = out.loc[row.doc_id]
        assert got.level == xhat, row.doc_id
        assert got.variance == p, row.doc_id
        assert got.gain_next == (p + 1.0) / ((p + 1.0) + 4.0)


def test_kalman_variance_converges_to_fixed_point(spark, sf_dir):
    # p* solves p = (1 - K)(p + q) with K = (p+q)/(p+q+r):
    # p^2 + q p - q r = 0 -> p* = (sqrt(q^2 + 4 q r) - q)/2 = (sqrt(17)-1)/2
    out = kalman_filter(spark, sf_dir).toPandas()
    p_star = (np.sqrt(17.0) - 1.0) / 2.0
    long = out[out.n_tok >= 64]
    assert len(long) == len(out)  # synth min length is 64
    assert np.allclose(long.variance, p_star, atol=1e-9)
    assert np.allclose(long.gain_next, (p_star + 1) / (p_star + 5), atol=1e-9)


def _lower_med_np(a):
    s = np.sort(a)
    return s[(len(s) + 1) // 2 - 1]


def test_theil_sen_exact_matches_numpy(spark, sf_dir):
    from dtaidistance_spark.operators.tswin_q import _TS_M, theil_sen_slope

    out = theil_sen_slope(spark, sf_dir).toPandas().set_index("doc_id")
    loc = synth.sequences_local(32)
    for row in loc.itertuples():
        x = row.tokens.astype(np.float64)
        m = min(len(x), _TS_M)
        slopes = [
            (x[j] - x[i]) / (j - i) for i in range(m - 1) for j in range(i + 1, m)
        ]
        slope = _lower_med_np(np.array(slopes))
        icept = _lower_med_np(x[:m] - slope * np.arange(m, dtype=np.float64))
        got = out.loc[row.doc_id]
        assert got.n_pairs == m * (m - 1) // 2
        assert got.slope == slope, row.doc_id
        assert got.intercept == icept, row.doc_id


def test_theil_sen_scaled_matches_numpy(spark, sf_dir):
    from dtaidistance_spark.operators.tswin_q import _TS_GAPS, theil_sen_scaled

    out = theil_sen_scaled(spark, sf_dir).toPandas().set_index("doc_id")
    loc = synth.sequences_local(32)
    for row in loc.itertuples():
        x = row.tokens.astype(np.float64)
        n = len(x)
        slopes = np.concatenate(
            [(x[d:] - x[:-d]) / d for d in _TS_GAPS if d < n]
        )
        got = out.loc[row.doc_id]
        assert got.n_pairs == len(slopes)
        assert got.slope == _lower_med_np(slopes), row.doc_id


def test_best_split_matches_numpy_bruteforce(spark, sf_dir):
    from dtaidistance_spark.operators.tswin_q import best_split_changepoint

    out = best_split_changepoint(spark, sf_dir).toPandas().set_index("doc_id")
    loc = synth.sequences_local(32)
    for row in loc.itertuples():
        x = row.tokens.astype(np.float64)
        n = len(x)

        def sse(seg):
            return float(np.sum(seg * seg) - seg.sum() ** 2 / len(seg))

        costs = np.array([sse(x[: k + 1]) + sse(x[k + 1 :]) for k in range(n - 1)])
        k_best = int(np.argmin(costs))  # np.argmin ties -> first, same rule
        got = out.loc[row.doc_id]
        assert got.split_last_left == k_best, row.doc_id
        assert abs(got.sse - costs[k_best]) < 1e-6 * max(1.0, abs(costs[k_best]))
        assert abs(got.gain - (sse(x) - costs[k_best])) < 1e-6 * max(
            1.0, abs(got.gain)
        )
        assert got.mean_left == x[: k_best + 1].mean() or abs(
            got.mean_left - x[: k_best + 1].mean()
        ) < 1e-9


def test_binseg_matches_numpy_two_level(spark, sf_dir):
    from dtaidistance_spark.operators.tswin_q import binseg_changepoints

    out = binseg_changepoints(spark, sf_dir).toPandas().set_index("doc_id")
    loc = synth.sequences_local(24)

    def seg_sse(c1, c2, a, b):  # segment [a..b] via prefix sums
        s = c1[b + 1] - c1[a]
        q = c2[b + 1] - c2[a]
        return q - s * s / (b - a + 1)

    for row in loc.itertuples():
        x = row.tokens.astype(np.int64)
        n = len(x)
        c1p = np.concatenate([[0], np.cumsum(x)]).astype(float)
        c2p = np.concatenate([[0], np.cumsum(x * x)]).astype(float)
        cost1 = np.array(
            [seg_sse(c1p, c2p, 0, k) + seg_sse(c1p, c2p, k + 1, n - 1)
             for k in range(n - 1)]
        )
        k1 = int(np.argmin(cost1))
        best = (np.inf, None)
        for p in range(n - 1):
            if p == k1:
                continue
            if p < k1:
                c = (seg_sse(c1p, c2p, 0, p) + seg_sse(c1p, c2p, p + 1, k1)
                     + seg_sse(c1p, c2p, k1 + 1, n - 1))
            else:
                c = (seg_sse(c1p, c2p, 0, k1) + seg_sse(c1p, c2p, k1 + 1, p)
                     + seg_sse(c1p, c2p, p + 1, n - 1))
            if c < best[0] - 1e-9:
                best = (c, p)
        got = out.loc[row.doc_id]
        lo, hi = sorted((k1, best[1]))
        assert got.cp1 == lo and got.cp2 == hi, row.doc_id
        assert abs(got.sse2 - best[0]) < 1e-6 * max(1.0, abs(best[0]))
        assert got.gain2 >= -1e-9
        # three segment means recompute
        m1 = x[: lo + 1].mean()
        m2 = x[lo + 1 : hi + 1].mean()
        m3 = x[hi + 1 :].mean()
        assert abs(got.mean1 - m1) < 1e-9 and abs(got.mean2 - m2) < 1e-9
        assert abs(got.mean3 - m3) < 1e-9
