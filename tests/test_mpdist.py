"""Semantic gates for mpdist_q (MP8): naive recompute + the metric
properties MPdist exists to have (shared-subsequence sensitivity)."""

import numpy as np
import pytest

from dtaidistance_spark import synth
from dtaidistance_spark.operators.mpdist_q import (
    _CAP,
    _M,
    _ND,
    mpdist_pairs,
)


def _naive(a, b):
    a = np.asarray(a[:_CAP], dtype=np.int64)
    b = np.asarray(b[:_CAP], dtype=np.int64)
    Wa = np.lib.stride_tricks.sliding_window_view(a, _M)
    Wb = np.lib.stride_tricks.sliding_window_view(b, _M)
    D = ((Wa[:, None, :] - Wb[None, :, :]) ** 2).sum(axis=2)
    allp = np.concatenate([D.min(axis=1), D.min(axis=0)])
    q2 = allp.size
    k = (q2 + 19) // 20
    return q2, k, int(np.sort(allp)[k - 1])


def test_mpdist_matches_naive(spark, sf_dir):
    out = (
        mpdist_pairs(spark, sf_dir)
        .toPandas()
        .set_index(["doc_a", "doc_b"])
    )
    assert len(out) == _ND * (_ND - 1) // 2
    loc = synth.sequences_local(_ND)
    toks = {r.doc_id: r.tokens.tolist() for r in loc.itertuples()}
    ids = sorted(toks)
    for i in range(0, _ND, 3):
        for j in range(i + 1, _ND, 5):
            q2, k, mp = _naive(toks[ids[i]], toks[ids[j]])
            got = out.loc[(ids[i], ids[j])]
            assert got.q2 == q2 and got.k == k
            assert got.mpdist2 == mp, (ids[i], ids[j])


def test_mpdist_shared_subsequence_sensitivity(spark, sf_dir):
    """MPdist's defining behavior: self-distance is 0 (every window
    finds itself), and a series vs its own prefix-shifted copy scores
    far below unrelated pairs.  Checked via the naive kernel on
    constructed inputs + nonnegativity/symmetry-of-contract on the
    emitted pairs."""
    out = mpdist_pairs(spark, sf_dir).toPandas()
    assert (out["mpdist2"] >= 0).all()
    assert (out["k"] >= 1).all()
    assert (out["q2"] == 2 * (out["q2"] // 2)).all()
    loc = synth.sequences_local(_ND)
    x = loc.iloc[0].tokens.tolist()
    q2, k, self_d = _naive(x, x)
    assert self_d == 0
    shifted = x[5:] + x[:5]
    _, _, near = _naive(x, shifted)
    _, _, far = _naive(x, loc.iloc[1].tokens.tolist())
    assert near < far
