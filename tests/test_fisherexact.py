"""Semantic gates for fisherexact_q (R54): the canonical
tea-tasting table, hypergeometric identities, χ² agreement/
divergence regimes, numpy recompute of both corpus rows."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.fisherexact_q import (
    fisher_exact_tables,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _fisher_ref(a, b, c, d):
    """Two-sided Fisher p by the sum-of-smaller-probabilities rule
    (1e-7 relative tolerance, matching the engine)."""
    n = a + b + c + d
    r1, r2, c1 = a + b, c + d, a + c
    lf = np.zeros(n + 1)
    for k in range(1, n + 1):
        lf[k] = lf[k - 1] + math.log(k)

    def lnc(nn, kk):
        return lf[nn] - lf[kk] - lf[nn - kk]

    def lnp(k):
        return lnc(r1, k) + lnc(r2, c1 - k) - lnc(n, c1)

    lo, hi = max(0, c1 - r2), min(r1, c1)
    p_obs = lnp(a)
    return sum(
        math.exp(lnp(k))
        for k in range(lo, hi + 1)
        if lnp(k) <= p_obs + 1e-7
    )


def test_tea_tasting():
    # Fisher's 8-cup design, observed 3/1/1/3: the two-sided p is
    # P(3)+P(1)+P(4)+P(0) = (16+16+1+1)/70 = 34/70
    p = _fisher_ref(3, 1, 1, 3)
    assert abs(p - 34 / 70) < 1e-10


def test_hypergeometric_sums_to_one():
    a, b, c, d = 7, 13, 11, 19
    n = a + b + c + d
    r1, r2, c1 = a + b, c + d, a + c
    lf = np.zeros(n + 1)
    for k in range(1, n + 1):
        lf[k] = lf[k - 1] + math.log(k)

    def lnc(nn, kk):
        return lf[nn] - lf[kk] - lf[nn - kk]

    tot = sum(
        math.exp(lnc(r1, k) + lnc(r2, c1 - k) - lnc(n, c1))
        for k in range(max(0, c1 - r2), min(r1, c1) + 1)
    )
    assert abs(tot - 1.0) < 1e-12


def test_transpose_identity():
    assert abs(
        _fisher_ref(9, 5, 4, 12) - _fisher_ref(9, 4, 5, 12)
    ) < 1e-12


def test_chi2_regimes():
    # large balanced table: Fisher ≈ χ² p
    a, b, c, d = 120, 80, 100, 100
    p_f = _fisher_ref(a, b, c, d)
    n = a + b + c + d
    chi2 = (
        n
        * (a * d - b * c) ** 2
        / ((a + b) * (c + d) * (a + c) * (b + d))
    )
    p_chi = math.erfc(math.sqrt(chi2 / 2))
    assert abs(p_f - p_chi) < 0.03
    # small-cell table: χ² anti-conservative vs exact
    p_f2 = _fisher_ref(4, 1, 1, 4)
    chi2_2 = 10 * (16 - 1) ** 2 / (5 * 5 * 5 * 5)
    p_chi2 = math.erfc(math.sqrt(chi2_2 / 2))
    assert p_chi2 < p_f2  # the asymptotic overstates significance


def test_matches_numpy(spark, sf_dir):
    out = (
        fisher_exact_tables(spark, sf_dir)
        .toPandas()
        .set_index("label")
    )
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    md = docs.n_chars.median()
    en = docs.lang == "en"
    long = docs.n_chars > md
    a, b = int((en & long).sum()), int((en & ~long).sum())
    c, d = int((~en & long).sum()), int((~en & ~long).sum())
    row = out.loc["en_long"]
    assert (row.a, row.b, row.c, row.d) == (a, b, c, d)
    assert abs(row.p_fisher - f6(_fisher_ref(a, b, c, d))) < 1e-5
    zh = docs.lang == "zh"
    s0 = docs.source == "src0"
    a2 = int((zh & s0).sum())
    row2 = out.loc["zh_src0"]
    assert row2.a == a2
    assert abs(
        row2.p_fisher
        - f6(
            _fisher_ref(
                a2,
                int((zh & ~s0).sum()),
                int((~zh & s0).sum()),
                int((~zh & ~s0).sum()),
            )
        )
    ) < 1e-5


def test_honest_regime_pins(spark):
    out = (
        fisher_exact_tables(spark, "/root/testdata/sf0.01")
        .toPandas()
        .set_index("label")
    )
    assert abs(out.loc["en_long"].p_fisher - 0.928153) < 1e-5
    assert int(out.loc["en_long"].chi2_valid) == 1
    assert abs(out.loc["zh_src0"].p_fisher - 0.402792) < 1e-5
    assert int(out.loc["zh_src0"].chi2_valid) == 0  # χ² NOT legal
    assert int(out.loc["zh_src0"].a) == 2
    assert (out.reject_independence == 0).all()
