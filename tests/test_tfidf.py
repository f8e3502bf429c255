"""Semantic gates for tfidf_q (T61): full numpy TF-IDF recompute of
the pairwise cosine matrix, top-k set equality under the declared
total order, and vector-space sanity."""

import math

import numpy as np
import pytest

from dtaidistance_spark import synth
from dtaidistance_spark.operators.tfidf_q import (
    _CAP,
    _MOD,
    _ND,
    _TOPK,
    tfidf_cosine_topk,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


@pytest.fixture(scope="module")
def ref():
    loc = synth.sequences_local(_ND)
    ids = []
    tf = np.zeros((_ND, _MOD), dtype=np.int64)
    for r, row in enumerate(loc.itertuples()):
        ids.append(row.doc_id)
        for t in row.tokens.tolist()[:_CAP]:
            tf[r, t % _MOD] += 1
    df = (tf > 0).sum(axis=0)
    idf = np.where(df > 0, np.log(_ND / np.maximum(df, 1)), 0.0)
    w = tf * idf
    nrm = np.sqrt((w * w).sum(axis=1))
    pairs = {}
    for i in range(_ND):
        for j in range(i + 1, _ND):
            if nrm[i] > 0 and nrm[j] > 0:
                c = float((w[i] * w[j]).sum() / (nrm[i] * nrm[j]))
            else:
                c = 0.0
            pairs[(ids[i], ids[j])] = f6(c)
    return pairs


def test_topk_matches_numpy(spark, sf_dir, ref):
    out = tfidf_cosine_topk(spark, sf_dir).toPandas()
    assert len(out) == _TOPK
    ranked = sorted(
        ref.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
    )[:_TOPK]
    want = {k: v for k, v in ranked}
    got = {
        (r.doc_a, r.doc_b): r.cosine for r in out.itertuples()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=2e-6), k


def test_cosine_sanity(spark, sf_dir, ref):
    """All cosines in [0,1] (non-negative vectors), the emitted top-64
    sits above the corpus median, and the scores are non-degenerate
    (a real spread, not one collapsed value)."""
    out = tfidf_cosine_topk(spark, sf_dir).toPandas()
    assert out["cosine"].between(0, 1 + 1e-9).all()
    med = float(np.median(list(ref.values())))
    assert (out["cosine"] >= med).all()
    assert out["cosine"].nunique() > 10
