"""Semantic gates for kstest_q (T70): scipy-free numpy KS recompute +
the drift-family verdicts."""

import math

import numpy as np
import pytest

from dtaidistance_spark import synth
from dtaidistance_spark.operators.kstest_q import (
    _N,
    _PAIRS,
    ks_test_sources,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


@pytest.fixture(scope="module")
def samples():
    loc = synth.sequences_local(_N)
    out = {}
    for row in loc.itertuples():
        out.setdefault(row.source, []).extend(
            int(t) for t in row.tokens.tolist()
        )
    return {
        k: np.sort(np.array(v, dtype=np.int64)) for k, v in out.items()
    }


def test_matches_numpy(spark, sf_dir, samples):
    out = (
        ks_test_sources(spark, sf_dir)
        .toPandas()
        .set_index(["src_a", "src_b"])
    )
    assert len(out) == len(_PAIRS)
    for a, b in _PAIRS:
        xa, xb = samples[a], samples[b]
        na, nb = len(xa), len(xb)
        support = np.union1d(xa, xb)
        cum_a = np.searchsorted(xa, support, side="right")
        cum_b = np.searchsorted(xb, support, side="right")
        d_num = int(np.abs(cum_a * nb - cum_b * na).max())
        got = out.loc[(a, b)]
        assert got.n_a == na and got.n_b == nb
        assert got.d_num == d_num
        assert got.d == pytest.approx(f6(d_num / (na * nb)), abs=2e-6)
        crit = 1.3581015157406195 * math.sqrt((na + nb) / (na * nb))
        assert got.crit_05 == pytest.approx(f6(crit), abs=2e-6)
        assert got.reject_same == (
            1 if d_num / (na * nb) > crit else 0
        )


def test_ks_honest_null_reading(spark, sf_dir):
    """The generator assigns source by doc-id hash, independent of
    token content — the three unigram distributions are genuinely
    homogeneous, and the correctly calibrated KS test must FAIL to
    reject on every pair (a rejection here would be a false
    positive). D is positive but below crit on all pairs."""
    out = ks_test_sources(spark, sf_dir).toPandas()
    assert (out["reject_same"] == 0).all()
    assert (out["d"] > 0).all()
    assert (out["d"] < out["crit_05"]).all()
