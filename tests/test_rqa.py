"""Semantic gates for rqa_q (cross-engine hashes live in
test_oracle.py): RQA counts and SampEn recomputed with naive numpy
double loops, plus the structural relations of each measure."""

import math

import numpy as np
import pytest

from dtaidistance_spark import synth
from dtaidistance_spark.operators.rqa_q import (
    _EPS,
    _N,
    _NT,
    _W,
    recurrence_quant,
    sample_entropy,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


@pytest.fixture(scope="module")
def loc():
    return synth.sequences_local(_N)


def _naive_rqa(v):
    R = np.abs(v[:, None] - v[None, :]) <= _EPS
    n_all = int(R.sum())
    off = R.copy()
    np.fill_diagonal(off, False)
    n_off = int(off.sum())
    n_det = n_lam = 0
    for i in range(_W):
        for j in range(_W):
            if i == j or not R[i, j]:
                continue
            if (i > 0 and j > 0 and R[i - 1, j - 1]) or (
                i < _W - 1 and j < _W - 1 and R[i + 1, j + 1]
            ):
                n_det += 1
            if (j > 0 and R[i, j - 1]) or (j < _W - 1 and R[i, j + 1]):
                n_lam += 1
    return n_all, n_off, n_det, n_lam


def test_rqa_matches_naive(spark, sf_dir, loc):
    out = recurrence_quant(spark, sf_dir).toPandas().set_index("doc_id")
    assert len(out) == _N
    for row in list(loc.itertuples())[::9]:
        v = np.asarray(row.tokens.tolist()[:_W], dtype=np.int64)
        n_all, n_off, n_det, n_lam = _naive_rqa(v)
        got = out.loc[row.doc_id]
        assert got.n_rec_all == n_all
        assert got.n_rec_off == n_off
        assert got.n_det_off == n_det
        assert got.n_lam_off == n_lam
        assert got.rr == pytest.approx(f6(n_all / (_W * _W)), abs=2e-6)
        if n_off:
            assert got.det == pytest.approx(f6(n_det / n_off), abs=2e-6)
            assert got.lam == pytest.approx(f6(n_lam / n_off), abs=2e-6)


def test_rqa_structure(spark, sf_dir):
    """LOI always recurrent (n_all ≥ n_off + 64); DET/LAM in [0,1];
    the deterministic ramp corpus has high determinism (diagonal
    structure dominates): median DET > 0.8."""
    out = recurrence_quant(spark, sf_dir).toPandas()
    assert (out["n_rec_all"] == out["n_rec_off"] + _W).all()
    assert out["det"].between(0, 1).all()
    assert out["lam"].between(0, 1).all()
    assert out["det"].median() > 0.8


def test_sampen_matches_naive(spark, sf_dir, loc):
    out = sample_entropy(spark, sf_dir).toPandas().set_index("doc_id")
    assert len(out) == _N
    for row in list(loc.itertuples())[::9]:
        v = np.asarray(row.tokens.tolist()[:_W], dtype=np.int64)
        a = b = 0
        for i in range(_NT):
            for j in range(i + 1, _NT):
                if max(abs(v[i] - v[j]), abs(v[i + 1] - v[j + 1])) <= _EPS:
                    b += 1
                    if abs(v[i + 2] - v[j + 2]) <= _EPS:
                        a += 1
        got = out.loc[row.doc_id]
        assert got.b_cnt == b and got.a_cnt == a
        if a and b:
            assert got.sampen == pytest.approx(
                f6(-math.log(a / b)), abs=2e-6
            )


def test_sampen_nonnegative_and_detects_regularity(spark, sf_dir):
    """A ≤ B by construction ⇒ SampEn ≥ 0 wherever defined; the
    strongly periodic ramps should mostly score LOW (< ln 2) —
    regularity is what SampEn measures."""
    out = sample_entropy(spark, sf_dir).toPandas()
    assert (out["a_cnt"] <= out["b_cnt"]).all()
    d = out.dropna(subset=["sampen"])
    assert (d["sampen"] >= 0).all()
    assert (d["sampen"] < math.log(2)).mean() > 0.5
