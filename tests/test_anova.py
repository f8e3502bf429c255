"""Semantic gates for anova_q (T71): numpy recompute of the one-way
ANOVA F and the Brown-Forsythe (Levene-median) F on n_tok across
sources, plus the closed-form F crit at df1=2 and the honest
fail-to-reject reading on hash-assigned sources."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.anova_q import (
    _N,
    _SRC,
    anova_doclen_sources,
    brown_forsythe_sources,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _f_oneway(groups):
    """Classic one-way F from raw per-group arrays."""
    k = len(groups)
    n = sum(len(g) for g in groups)
    gm = sum(float(np.sum(g)) for g in groups) / n
    ssb = sum(len(g) * (float(np.mean(g)) - gm) ** 2 for g in groups)
    ssw = sum(float(np.sum((np.asarray(g, dtype=float) - np.mean(g)) ** 2)) for g in groups)
    return (ssb / (k - 1)) / (ssw / (n - k)), n


def _crit(d):
    # F_0.95(2, d) closed form: P(F<=x) = 1 - (1 + 2x/d)^(-d/2)
    return (d / 2.0) * (0.05 ** (-2.0 / d) - 1.0)


def _groups():
    loc = synth.sequences_local(_N)
    return {g: loc.loc[loc.source == g, "n_tok"].to_numpy(dtype=np.int64) for g in _SRC}


def test_anova_matches_numpy(spark, sf_dir):
    row = anova_doclen_sources(spark, sf_dir).collect()[0]
    gs = _groups()
    for g in _SRC:
        assert row[f"n_{g}"] == len(gs[g])
        assert row[f"s_{g}"] == int(gs[g].sum())
        assert row[f"q_{g}"] == int((gs[g].astype(object) ** 2).sum())
    f, n = _f_oneway([gs[g] for g in _SRC])
    assert row.n_total == n == _N
    assert abs(row.f_stat - f6(f)) < 1e-9
    crit = _crit(n - 3)
    assert abs(row.crit_05 - f6(crit)) < 1e-9
    # crit sanity: for large d, F_0.95(2, inf) = chi2_0.95(2)/2 = -ln(0.05)
    assert abs(crit - (-math.log(0.05))) < 0.02
    # honest reading: source assigned by doc-id hash independent of
    # length, so ANOVA fails to reject
    assert row.reject_same_mean == (1 if f > crit else 0) == 0


def test_brown_forsythe_matches_numpy(spark, sf_dir):
    row = brown_forsythe_sources(spark, sf_dir).collect()[0]
    gs = _groups()
    zs = {}
    for g in _SRC:
        x = np.sort(gs[g])
        n = len(x)
        med2 = int(x[(n + 1) // 2 - 1]) + int(x[n // 2])
        assert row[f"med2_{g}"] == med2
        zs[g] = np.abs(2 * gs[g] - med2)
        assert row[f"n_{g}"] == n
        assert row[f"sz_{g}"] == int(zs[g].sum())
        assert row[f"qz_{g}"] == int((zs[g].astype(object) ** 2).sum())
    f, n = _f_oneway([zs[g] for g in _SRC])
    assert row.n_total == n == _N
    assert abs(row.f_bf - f6(f)) < 1e-9
    assert abs(row.crit_05 - f6(_crit(n - 3))) < 1e-9
    assert row.reject_same_var == (1 if f > _crit(n - 3) else 0) == 0


def test_hand_case():
    # 3 groups with known F: [1,2,3], [2,3,4], [3,4,5] -> SSB=6, SSW=6,
    # F = (6/2)/(6/6) = 3
    f, n = _f_oneway([[1, 2, 3], [2, 3, 4], [3, 4, 5]])
    assert n == 9
    assert abs(f - 3.0) < 1e-12
    # doubled-median trick: even group [1,2,3,10] -> med2 = 2+3 = 5
    x = np.sort(np.array([1, 2, 3, 10]))
    assert int(x[(4 + 1) // 2 - 1]) + int(x[4 // 2]) == 5
