"""Semantic gates for tempsample_q (T66): numpy recompute + the
rebalancing properties temperature sampling exists to provide."""

import math

import pytest

from dtaidistance_spark import synth
from dtaidistance_spark.operators.tempsample_q import (
    _BUDGET,
    _N,
    temperature_sampling,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def test_matches_numpy(spark, sf_dir):
    loc = synth.sequences_local(_N)
    per = {}
    for row in loc.itertuples():
        d = per.setdefault(row.source, [0, 0])
        d[0] += 1
        d[1] += int(row.n_tok)
    n_total = sum(v[1] for v in per.values())
    z = sum(v[1] ** 0.3 for k, v in sorted(per.items()))
    out = temperature_sampling(spark, sf_dir).toPandas().set_index(
        "source"
    )
    assert len(out) == len(per)
    for src, (nd, nt) in per.items():
        got = out.loc[src]
        assert got.n_docs == nd and got.n_tokens == nt
        assert got.n_total == n_total
        assert got.p_raw == pytest.approx(f6(nt / n_total), abs=2e-6)
        pa = nt**0.3 / z
        assert got.p_alpha == pytest.approx(f6(pa), abs=2e-6)
        assert got.boost == pytest.approx(
            f6(pa / (nt / n_total)), abs=2e-6
        )
        assert got.epochs == pytest.approx(
            f6(_BUDGET * pa / nt), abs=2e-5
        )


def test_rebalancing_direction(spark, sf_dir):
    """α < 1 compresses: the largest source is DOWN-weighted
    (boost < 1), the smallest UP-weighted (boost > 1); tempered
    shares still sum to 1; epochs highest for the smallest source."""
    out = temperature_sampling(spark, sf_dir).toPandas()
    big = out.loc[out.n_tokens.idxmax()]
    small = out.loc[out.n_tokens.idxmin()]
    assert big.boost < 1 < small.boost
    assert out["p_alpha"].sum() == pytest.approx(1.0, abs=1e-5)
    assert out["p_raw"].sum() == pytest.approx(1.0, abs=1e-5)
    assert small.epochs == out["epochs"].max()
