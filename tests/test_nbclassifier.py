"""Semantic gates for nbclassifier_q (cross-engine hashes live in
test_oracle.py): the multinomial-NB quality classifier re-trained and
re-scored in pure Python/numpy, plus the separation guarantee the
planted pathology exists to provide."""

import math

import numpy as np
import pytest

from dtaidistance_spark import synth
from dtaidistance_spark.operators.nbclassifier_q import (
    _D,
    _NDOC,
    _NTRAIN,
    nb_quality_classifier,
)


@pytest.fixture(scope="module")
def out(spark, sf_dir):
    return (
        nb_quality_classifier(spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
    )


def _reference():
    """Pure-Python NB: identical corpus, split, smoothing, fold order."""
    loc = synth.sequences_local(_NDOC)
    corpus = []
    for row in loc.itertuples():
        toks = row.tokens.tolist()
        twin = [t - (t % 4) for t in toks]
        idx = int(row.doc_id[3:])
        corpus.append((row.doc_id, 1, toks, idx < _NTRAIN))
        corpus.append((row.doc_id + "_deg", 0, twin, idx < _NTRAIN))
    c = {1: np.zeros(_D, dtype=np.int64), 0: np.zeros(_D, dtype=np.int64)}
    for _, label, toks, is_train in corpus:
        if is_train:
            np.add.at(c[label], np.asarray(toks) % _D, 1)
    n1, n0 = int(c[1].sum()), int(c[0].sum())
    w = np.array(
        [
            math.log((int(c[1][j]) + 1) / (n1 + _D))
            - math.log((int(c[0][j]) + 1) / (n0 + _D))
            for j in range(_D)
        ]
    )
    scores = {}
    for doc_id, label, toks, is_train in corpus:
        if not is_train:
            s = 0.0
            for t in toks:
                s += w[t % _D]
            scores[doc_id] = (label, s)
    return scores


def test_scores_match_python_retrain(out):
    ref = _reference()
    assert len(out) == len(ref) == 2 * (_NDOC - _NTRAIN)
    for doc_id, (label, s) in ref.items():
        got = out.loc[doc_id]
        assert got.label == label, doc_id
        assert got.score == pytest.approx(s, abs=1e-5), (
            doc_id,
            got.score,
            s,
        )


def test_heldout_separation_is_perfect(out):
    """The planted support collapse concentrates twin mass on 16 of 64
    folds; NB must classify every held-out doc correctly, with a real
    margin (no score within 1.0 of the boundary)."""
    assert (out["pred"] == out["label"]).all()
    assert (out.loc[out.label == 1, "score"] > 1.0).all()
    assert (out.loc[out.label == 0, "score"] < -1.0).all()
