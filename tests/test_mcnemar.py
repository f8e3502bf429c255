"""Semantic gates for mcnemar_q (T73): pandas recompute of the
discordant counts and both chi-square forms, consistency with the
shared T67 confusion cells, and the loud reject honest reading."""

import math

import pandas as pd

from dtaidistance_spark.operators.mcnemar_q import mcnemar_filters


def _docs(sf_dir):
    return pd.read_parquet(f"{sf_dir}/documents.parquet")

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def test_matches_pandas(spark, sf_dir):
    docs = _docs(sf_dir)
    words = docs.text.str.split(" ")
    a = (words.str.len() >= 50).astype(int)
    b = (
        words.apply(lambda w: len(set(w)) / len(w)) >= 0.3
    ).astype(int)
    docs["n10"] = (a * (1 - b)).astype(int)
    docs["n01"] = ((1 - a) * b).astype(int)
    want = docs.groupby("source")[["n10", "n01"]].sum()
    out = mcnemar_filters(spark, sf_dir).toPandas().set_index("source")
    assert len(out) == len(want) >= 2
    for src, w in want.iterrows():
        got = out.loc[src]
        assert (got.n10, got.n01) == (w.n10, w.n01)
        d = w.n10 + w.n01
        if d == 0:
            assert pd.isna(got.chi2)
            continue
        chi = (w.n10 - w.n01) ** 2 / d
        chicc = (abs(w.n10 - w.n01) - 1) ** 2 / d
        assert abs(got.chi2 - f6(chi)) < 1e-9
        assert abs(got.chi2_cc - f6(chicc)) < 1e-9
        assert got.reject_same_rate == (
            1 if chi > 1.96 * 1.96 else 0
        )
    # honest reading: the two C4-type rules admit very different
    # fractions → marginal homogeneity rejected in nearly every
    # source (tiny per-source counts at sf0.001 can dip under the bar)
    assert (out.reject_same_rate == 1).mean() >= 0.8
    # consistency with T67's shared cells
    from dtaidistance_spark.operators.kappa_q import (
        filter_agreement_kappa,
    )

    kp = (
        filter_agreement_kappa(spark, sf_dir)
        .toPandas()
        .set_index("source")
    )
    for src in out.index:
        assert out.loc[src, "n10"] == kp.loc[src, "n10"]
        assert out.loc[src, "n01"] == kp.loc[src, "n01"]


def test_hand_case():
    # classic textbook 2x2: n10=25, n01=5 → chi2 = 400/30 ≈ 13.33,
    # cc = 361/30 ≈ 12.03 — both reject at 3.84
    assert abs((25 - 5) ** 2 / 30 - 13.3333333) < 1e-6
    assert abs((abs(25 - 5) - 1) ** 2 / 30 - 12.0333333) < 1e-6
