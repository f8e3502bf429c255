"""Semantic gates for tailvr_q (TS54 Hill, TS55 variance ratio)."""

import math

import numpy as np
import pandas as pd
import pytest

from dtaidistance_spark import synth
from dtaidistance_spark.operators.tailvr_q import (
    _K,
    _N,
    _QS,
    hill_tail_index,
    variance_ratio,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def test_hill_matches_numpy(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev[ev.value > 0.0].copy()
    ev["cents"] = (100.0 * ev.value + 0.5).apply(int)
    out = hill_tail_index(spark, sf_dir).toPandas().set_index("event_type")
    for et, g in ev.groupby("event_type"):
        if len(g) < _K + 1:
            assert et not in out.index
            continue
        top = (
            g.sort_values(["cents", "event_id"], ascending=[False, True])
            .cents.to_numpy()[: _K + 1]
        )
        hsum = float(np.log(top[:_K] / top[_K]).sum())
        got = out.loc[et]
        assert got.xmin_cents == top[_K]
        assert got.hill_sum == pytest.approx(f6(hsum), abs=2e-6)
        assert got.alpha == pytest.approx(f6(_K / hsum), abs=2e-5)
        # exponential-spanning values: a genuinely heavy tail, alpha
        # in a physical band
        assert 0.05 < got.alpha < 20


def test_variance_ratio_matches_numpy(spark, sf_dir):
    out = variance_ratio(spark, sf_dir).toPandas().set_index("doc_id")
    assert len(out) == _N
    loc = synth.sequences_local(_N)
    for row in list(loc.itertuples())[::9]:
        x = np.asarray(row.tokens.tolist(), dtype=np.int64)
        n = len(x)
        s1 = int(((x[1:] - x[:-1]) ** 2).sum())
        got = out.loc[row.doc_id]
        assert got.ssd_1 == s1
        for q in _QS:
            sq = int(((x[q:] - x[:-q]) ** 2).sum())
            assert got[f"ssd_{q}"] == sq
            want = (sq / (n - q)) / (q * s1 / (n - 1))
            assert got[f"vr_{q}"] == pytest.approx(
                f6(want), abs=2e-6
            )


def test_variance_ratio_reading(spark, sf_dir):
    """The modular ramps are strongly mean-reverting at q-step
    horizons (the wrap pulls increments back), so VR(q) must sit
    BELOW 1 for the overwhelming majority — and fall with q."""
    out = variance_ratio(spark, sf_dir).toPandas()
    assert (out["vr_2"] < 1).mean() > 0.8
    med = [out[f"vr_{q}"].median() for q in _QS]
    assert med[0] > med[-1]
    for q in _QS:
        assert (out[f"vr_{q}"] > 0).all()
