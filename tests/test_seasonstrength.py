"""Semantic gates for seasonstrength_q (TS53): strengths recomputed
from the ALREADY-GATED seasonal_decompose output rows (component
consistency across two independent queries) + the honest corpus
reading."""

import math

import numpy as np
import pytest

from dtaidistance_spark.operators.seasonstrength_q import (
    seasonal_strength,
)
from dtaidistance_spark.operators.tsanalytics_q import seasonal_decompose

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


@pytest.fixture(scope="module")
def out(spark, sf_dir):
    return seasonal_strength(spark, sf_dir).toPandas().set_index("doc_id")


def test_strengths_match_decompose_components(spark, sf_dir, out):
    dec = seasonal_decompose(spark, sf_dir).toPandas()
    n_checked = 0
    for doc_id, g in dec.groupby("doc_id"):
        if int(doc_id[3:]) % 11:
            continue
        r = g.remainder.to_numpy()
        sr = (g.seasonal + g.remainder).to_numpy()
        tr = (g.trend + g.remainder).to_numpy()
        v_rem, v_detr, v_deseas = r.var(), sr.var(), tr.var()
        got = out.loc[doc_id]
        assert got.m == len(g)
        assert got.var_rem == pytest.approx(v_rem, abs=1e-4)
        assert got.var_detr == pytest.approx(v_detr, abs=1e-4)
        assert got.var_deseas == pytest.approx(v_deseas, abs=1e-4)
        fs = max(0.0, 1 - v_rem / v_detr)
        ft = max(0.0, 1 - v_rem / v_deseas)
        assert got.f_seasonal == pytest.approx(fs, abs=1e-4)
        assert got.f_trend == pytest.approx(ft, abs=1e-4)
        n_checked += 1
    assert n_checked > 20


def test_strength_reading(out):
    """Strengths live in [0,1]; measured corpus truth (see module
    docstring): the mod-wrap discontinuities dominate the remainder so
    F_T is near zero, while the planted period-64 component keeps F_S
    positive on every series with a saturated tail."""
    assert out["f_seasonal"].between(0, 1).all()
    assert out["f_trend"].between(0, 1).all()
    assert out["f_seasonal"].median() > out["f_trend"].median()
    assert (out["f_seasonal"] > 0.01).all()
    assert out["f_seasonal"].max() > 0.9
    assert (out["var_rem"] >= 0).all()
