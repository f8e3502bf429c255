"""Semantic gates for kappa_q (T67): pandas confusion/κ recompute +
the agreement-measure properties."""

import math

import pandas as pd
import pytest

from dtaidistance_spark.operators.kappa_q import (
    _WMIN,
    filter_agreement_kappa,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def test_matches_pandas(spark, sf_dir):
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    words = d.text.str.split(" ")
    a = (words.str.len() >= _WMIN).astype(int)
    b = (
        words.apply(lambda w: len(set(w)) / len(w)) >= 0.3
    ).astype(int)
    df = pd.DataFrame({"source": d.source, "a": a, "b": b})
    out = filter_agreement_kappa(spark, sf_dir).toPandas().set_index(
        "source"
    )
    assert len(out) == df.source.nunique()
    for src, g in df.groupby("source"):
        n11 = int(((g.a == 1) & (g.b == 1)).sum())
        n10 = int(((g.a == 1) & (g.b == 0)).sum())
        n01 = int(((g.a == 0) & (g.b == 1)).sum())
        n00 = int(((g.a == 0) & (g.b == 0)).sum())
        n = len(g)
        got = out.loc[src]
        assert (got.n11, got.n10, got.n01, got.n00, got.n) == (
            n11,
            n10,
            n01,
            n00,
            n,
        )
        po = (n11 + n00) / n
        pe = ((n11 + n10) / n) * ((n11 + n01) / n) + (
            (n01 + n00) / n
        ) * ((n10 + n00) / n)
        assert got.p_o == pytest.approx(f6(po), abs=2e-6)
        assert got.p_e == pytest.approx(f6(pe), abs=2e-6)
        if pe < 1:
            assert got.kappa == pytest.approx(
                f6((po - pe) / (1 - pe)), abs=2e-5
            )


def test_kappa_properties(spark, sf_dir):
    """κ ≤ 1 always; p_o and p_e are probabilities; confusion counts
    account for every doc."""
    out = filter_agreement_kappa(spark, sf_dir).toPandas()
    assert (
        out.n11 + out.n10 + out.n01 + out.n00 == out.n
    ).all()
    assert out["p_o"].between(0, 1).all()
    assert out["p_e"].between(0, 1).all()
    assert (out["kappa"].dropna() <= 1 + 1e-9).all()
