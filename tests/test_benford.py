"""Semantic gates for benford_q (T78): pandas recompute of the nine
digit counts and the order-pinned chi-square chain, the no-leading-
zero premise, the honest loud rejection on the bounded uniform-ish
totals, and the 2^k Weyl-equidistribution positive control."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.benford_q import benford_order_totals

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _chi2_chain(obs, n):
    # identical order-pinned left-to-right chain as the SQL
    total = 0.0
    for d in range(1, 10):
        e = float(n) * math.log10(1.0 + 1.0 / d)
        total = total + (float(obs[d - 1]) - e) ** 2 / e
    return total


def test_matches_pandas(spark, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cents = (o.o_totalprice * 100).round().astype("int64")
    assert cents.min() >= 100  # no leading-zero hazard
    digits = cents.astype(str).str[0].astype(int)
    obs = [int((digits == d).sum()) for d in range(1, 10)]
    n = len(o)
    out = benford_order_totals(spark, sf_dir).toPandas().iloc[0]
    assert out.n == n
    for d in range(1, 10):
        assert out[f"o{d}"] == obs[d - 1]
    assert sum(obs) == n  # every order has a first digit 1-9
    chi = _chi2_chain(obs, n)
    assert abs(out.chi2 - f6(chi)) < 1e-6
    assert abs(out.e1 - f6(n * math.log10(2.0))) < 1e-9
    # honest reading: bounded uniform-ish totals are emphatically NOT
    # Benford — rejection by orders of magnitude
    assert out.reject_benford == 1
    assert out.chi2 > 10 * 15.507


def test_powers_of_two_positive_control():
    # first digits of 2^k are Benford by Weyl equidistribution of
    # k*log10(2) mod 1 — chi2 must accept comfortably
    firsts = [int(str(2**k)[0]) for k in range(1, 2001)]
    obs = [firsts.count(d) for d in range(1, 10)]
    chi = _chi2_chain(obs, 2000)
    assert chi < 15.50731305586545


def test_digit_frequencies_shape(spark, sf_dir):
    # the measured pathology: digits 1-4 nearly equal, 5-9 starved
    out = benford_order_totals(spark, sf_dir).toPandas().iloc[0]
    lo = min(out[f"o{d}"] for d in range(1, 5))
    hi = max(out[f"o{d}"] for d in range(5, 10))
    assert lo > 3 * hi
