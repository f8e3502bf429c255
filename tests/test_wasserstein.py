"""Semantic gates for wasserstein_q: W₁ recomputed two independent
ways (scipy-style sorted-sample formula via numpy, and the scaled
integer route), plus metric properties."""

import math

import numpy as np
import pytest

from dtaidistance_spark import synth
from dtaidistance_spark.operators.wasserstein_q import (
    _N,
    _PAIRS,
    wasserstein_sources,
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
    return {k: np.sort(np.array(v, dtype=np.int64)) for k, v in out.items()}


def _w1_float(a, b):
    """Float-route W1 between empirical distributions via the CDF
    integral on the merged support."""
    support = np.union1d(a, b)
    cdf_a = np.searchsorted(a, support, side="right") / len(a)
    cdf_b = np.searchsorted(b, support, side="right") / len(b)
    gaps = np.diff(support)
    return float(np.sum(np.abs(cdf_a[:-1] - cdf_b[:-1]) * gaps))


def test_emd_matches_float_route(spark, sf_dir, samples):
    out = (
        wasserstein_sources(spark, sf_dir)
        .toPandas()
        .set_index(["src_a", "src_b"])
    )
    assert len(out) == len(_PAIRS)
    for a, b in _PAIRS:
        got = out.loc[(a, b)]
        assert got.n_a == len(samples[a])
        assert got.n_b == len(samples[b])
        want = _w1_float(samples[a], samples[b])
        assert got.emd == pytest.approx(want, rel=1e-6), (a, b)
        # integer route consistency: emd == floor6(num / (Na*Nb))
        assert got.emd == pytest.approx(
            f6(got.emd_num / (got.n_a * got.n_b)), abs=1e-9
        )


def test_emd_metric_properties(spark, sf_dir, samples):
    """Nonnegativity, and the triangle inequality over the three
    sources (W1 is a metric): every pairwise W1 ≤ sum of the other
    two."""
    out = (
        wasserstein_sources(spark, sf_dir)
        .toPandas()
        .set_index(["src_a", "src_b"])["emd"]
    )
    d = {
        frozenset(k): v for k, v in out.items()
    }
    vals = list(d.values())
    assert all(v >= 0 for v in vals)
    ks = list(d)
    for i in range(3):
        others = [d[ks[j]] for j in range(3) if j != i]
        assert d[ks[i]] <= sum(others) + 1e-9
