"""Semantic gates for mannwhitney_q (TS59): numpy midrank recompute of
every sufficient statistic + the homogeneous-sources honest reading."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.mannwhitney_q import (
    _N,
    _PAIRS,
    _SRC,
    kruskal_wallis_sources,
    mannwhitney_sources,
)

VOCAB = 50257

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _counts():
    loc = synth.sequences_local(_N)
    c = {s: np.zeros(VOCAB, dtype=np.int64) for s in _SRC}
    for r in loc.itertuples():
        c[r.source] += np.bincount(r.tokens, minlength=VOCAB).astype(
            np.int64
        )
    return c


def test_mwu_matches_numpy(spark, sf_dir):
    out = (
        mannwhitney_sources(spark, sf_dir)
        .toPandas()
        .set_index(["src_a", "src_b"])
    )
    assert len(out) == 3
    c = _counts()
    cum = {s: np.cumsum(c[s]) for s in _SRC}
    for a, b in _PAIRS:
        t = c[a] + c[b]
        r2 = int(np.sum(c[a] * (2 * (cum[a] + cum[b]) - t + 1)))
        tie = int(np.sum(t.astype(object) ** 3 - t))
        na, nb = int(c[a].sum()), int(c[b].sum())
        u2 = r2 - na * (na + 1)
        got = out.loc[(a, b)]
        assert (got.n_a, got.n_b) == (na, nb)
        assert (got.r2_a, got.u2_a, got.tie_sum) == (r2, u2, tie)
        nn = float(na + nb)
        var = (na * nb / 12.0) * (
            (nn + 1.0) - tie / (nn * (nn - 1.0))
        )
        z = (u2 - float(na) * nb) / (2.0 * math.sqrt(var))
        assert abs(got.z - f6(z)) < 1e-9
        assert abs(got.r_rb - f6(1.0 - u2 / (float(na) * nb))) < 1e-9
        # honest reading: source is assigned by doc-id hash independent
        # of content — the calibrated test must NOT reject
        assert abs(got.z) < 1.96 and got.reject_shift == 0


def test_kw_matches_numpy(spark, sf_dir):
    out = kruskal_wallis_sources(spark, sf_dir).toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    c = _counts()
    cum = {s: np.cumsum(c[s]) for s in _SRC}
    ct = sum(c[s] for s in _SRC)
    cumt = sum(cum[s] for s in _SRC)
    tie = int(np.sum(ct.astype(object) ** 3 - ct))
    n = {s: int(c[s].sum()) for s in _SRC}
    nn = float(sum(n.values()))
    rsq = 0.0
    for s in _SRC:
        r2 = int(np.sum(c[s] * (2 * cumt - ct + 1)))
        assert row[f"r2_{s}"] == r2
        assert row[f"n_{s}"] == n[s]
        rs = r2 / 2.0
        rsq += rs * rs / n[s]
    assert row.tie_sum == tie
    h0 = (12.0 / (nn * (nn + 1.0))) * rsq - 3.0 * (nn + 1.0)
    h = h0 / (1.0 - tie / (nn**3 - nn))
    assert abs(row.h - f6(h)) < 1e-9
    # homogeneous by construction: fail to reject, but H must be a
    # live (positive, finite) statistic
    assert 0.0 < row.h < row.crit_05
    assert row.reject_same == 0


def test_midrank_identity():
    """The doubled-midrank identity on a tiny hand case: ranks of
    [3,1,2,2] style data recomputed both ways."""
    xa = np.array([0, 0, 2, 1, 0, 0], dtype=np.int64)  # values 2,2,3
    xb = np.array([0, 1, 1, 0, 0, 0], dtype=np.int64)  # values 1,2
    cum_a, cum_b = np.cumsum(xa), np.cumsum(xb)
    t = xa + xb
    r2 = int(np.sum(xa * (2 * (cum_a + cum_b) - t + 1)))
    # combined sorted: 1(b) 2(a) 2(a) 2(b) 3(a) → midranks of a's
    # values: 3, 3, 5 → R_a = 11 → 2R_a = 22
    assert r2 == 22
