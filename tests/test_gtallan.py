"""Semantic gates for goodturing_q + allanvar_q (cross-engine hashes
live in test_oracle.py)."""

import math
from collections import Counter

import numpy as np
import pytest

from dtaidistance_spark import synth
from dtaidistance_spark.operators.allanvar_q import _TAUS, allan_variance
from dtaidistance_spark.operators.allanvar_q import _N as _NA
from dtaidistance_spark.operators.goodturing_q import (
    _N,
    _RMAX,
    good_turing_counts,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def test_good_turing_matches_counter_recompute(spark, sf_dir):
    loc = synth.sequences_local(_N)
    tc = {}
    for row in loc.itertuples():
        tc.setdefault(row.source, Counter()).update(
            int(t) for t in row.tokens.tolist()
        )
    out = good_turing_counts(spark, sf_dir).toPandas()
    for src, cnt in tc.items():
        coc = Counter(cnt.values())
        n_total = sum(cnt.values())
        n_1 = coc.get(1, 0)
        sub = out[out.source == src].set_index("r")
        want_rs = sorted(r for r in coc if r <= _RMAX)
        assert sorted(sub.index) == want_rs, src
        for r in want_rs:
            got = sub.loc[r]
            assert got.n_r == coc[r]
            assert got.n_r1 == coc.get(r + 1, 0)
            assert got.n_total == n_total
            assert got.n_1 == n_1
            if coc.get(r + 1, 0) > 0:
                assert got.r_star == pytest.approx(
                    f6((r + 1) * coc[r + 1] / coc[r]), abs=2e-6
                )
            else:
                assert np.isnan(got.r_star)
            assert got.p_unseen == pytest.approx(
                f6(n_1 / n_total), abs=2e-6
            )


def test_good_turing_consistency(spark, sf_dir):
    """Engine-internal consistency: p_unseen agrees with the emitted
    r=1 row, every defined r* satisfies the exact defining relation
    against the int64 columns, and the unseen mass is positive.  (The
    classic r* < r discount direction needs a Zipf-decreasing N_r,
    which this modular — deliberately non-Zipf — corpus does not have;
    the direction claim is intentionally NOT asserted.)"""
    out = good_turing_counts(spark, sf_dir).toPandas()
    for src, sub in out.groupby("source"):
        assert (sub["p_unseen"] > 0).all()
        r1 = sub[sub.r == 1]
        assert len(r1) == 1 and int(r1.n_r.iloc[0]) == int(
            r1.n_1.iloc[0]
        )
        d = sub.dropna(subset=["r_star"])
        want = (d["r"] + 1) * d["n_r1"] / d["n_r"]
        assert (abs(d["r_star"] - want.map(f6)) < 2e-6).all()


def test_allan_variance_matches_numpy(spark, sf_dir):
    out = allan_variance(spark, sf_dir).toPandas().set_index("doc_id")
    assert len(out) == _NA
    loc = synth.sequences_local(_NA)
    for row in list(loc.itertuples())[::5]:
        x = np.asarray(row.tokens.tolist(), dtype=np.int64)
        got = out.loc[row.doc_id]
        for tau in _TAUS:
            m = len(x) // tau
            b = x[: m * tau].reshape(m, tau).sum(axis=1)
            ssd = int(((b[1:] - b[:-1]) ** 2).sum())
            assert got[f"ssd_{tau}"] == ssd, (row.doc_id, tau)
            assert got[f"m_{tau}"] == m
            want = f6(ssd / (2 * (m - 1) * tau * tau))
            assert got[f"avar_{tau}"] == pytest.approx(want, abs=2e-6)


def test_allan_variance_white_noise_slope(spark, sf_dir):
    """For averaging-time-uncorrelated (white-ish) token series AVAR
    falls roughly like 1/τ; for the period-64 seasonal ramp it cannot
    GROW faster than τ². Sanity band: avar_4 > avar_32 for a majority
    of series (the seasonal component averages out by τ=32... window
    spans half a period at τ=32)."""
    out = allan_variance(spark, sf_dir).toPandas()
    frac = (out["avar_4"] > out["avar_32"]).mean()
    assert frac > 0.5, frac
