"""Semantic gates for rrf_q (T93): numpy recompute of both lanes
and the fusion, monotone-invariance, the dominance property, and
the winner/rescue corpus pins."""

import math
from collections import Counter

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.rrf_q import (
    _B,
    _K1,
    _MU,
    _RRFK,
    _TERMS,
    _TOPK,
    rrf_hybrid_retrieval,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _lanes_ref(docs):
    words = {r.doc_id: r.text.split(" ") for r in docs.itertuples()}
    dl = {d: len(w) for d, w in words.items()}
    n_docs = len(words)
    avgdl = sum(dl.values()) / n_docs
    coll = sum(dl.values())
    tf = {
        d: Counter(t for t in w if t in _TERMS)
        for d, w in words.items()
    }
    dfq = {
        t: sum(1 for d in tf if tf[d][t] > 0) for t in _TERMS
    }
    ctf = {
        t: sum(tf[d][t] for d in tf) for t in _TERMS
    }
    bm = {}
    ql = {}
    for d in words:
        s = 0.0
        for t in _TERMS:
            f = tf[d][t]
            if f:
                idf = math.log(
                    (n_docs - dfq[t] + 0.5) / (dfq[t] + 0.5) + 1.0
                )
                s += (
                    idf
                    * f
                    * (_K1 + 1)
                    / (f + _K1 * (1 - _B + _B * dl[d] / avgdl))
                )
        bm[d] = s
        ql[d] = sum(
            math.log(
                (tf[d][t] + _MU * ctf[t] / coll) / (dl[d] + _MU)
            )
            for t in _TERMS
        )
    def ranks(score):
        order = sorted(
            score, key=lambda d: (-round(score[d], 6), d)
        )
        return {d: i + 1 for i, d in enumerate(order)}
    return ranks(bm), ranks(ql)


def test_matches_numpy(spark, sf_dir):
    out = rrf_hybrid_retrieval(spark, sf_dir).toPandas()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    rb, rq = _lanes_ref(docs)
    fused = {
        d: 1.0 / (_RRFK + rb[d]) + 1.0 / (_RRFK + rq[d])
        for d in rb
    }
    order = sorted(fused, key=lambda d: (-fused[d], d))[:_TOPK]
    assert out.doc_id.tolist() == order
    for row in out.itertuples():
        assert row.rank_bm25 == rb[row.doc_id]
        assert row.rank_ql == rq[row.doc_id]
        assert abs(row.rrf_score - f6(fused[row.doc_id])) < 1e-9


def test_monotone_invariance():
    # cubing one lane's scores changes nothing: RRF is rank-only
    scores = {i: float((i * 37) % 100) + 1 for i in range(50)}
    cubed = {d: s**3 for d, s in scores.items()}
    r1 = sorted(scores, key=lambda d: (-scores[d], d))
    r2 = sorted(cubed, key=lambda d: (-cubed[d], d))
    assert r1 == r2


def test_dominance_property():
    # top-in-both beats top-in-one-weak-in-other
    a = 1.0 / (_RRFK + 2) + 1.0 / (_RRFK + 2)
    b = 1.0 / (_RRFK + 1) + 1.0 / (_RRFK + 50)
    assert a > b


def test_hand_arithmetic():
    assert abs(
        1.0 / (_RRFK + 3) + 1.0 / (_RRFK + 1) - (1 / 63 + 1 / 61)
    ) < 1e-15


def test_honest_winner_and_rescues(spark):
    out = rrf_hybrid_retrieval(
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    assert len(out) == _TOPK
    top = out.iloc[0]
    # winner: consistently-high (3, 1) beats single-lane-first (1, 4)
    assert top.doc_id == 394
    assert (top.rank_bm25, top.rank_ql) == (3, 1)
    second = out.iloc[1]
    assert second.doc_id == 289
    assert (second.rank_bm25, second.rank_ql) == (1, 4)
    # 12/20 in both lanes' top-20; 4 rescued from bm25 ranks 21–29
    both = ((out.rank_bm25 <= 20) & (out.rank_ql <= 20)).sum()
    assert int(both) == 12
    rescued = out[out.rank_bm25 > 20]
    assert len(rescued) == 4
    assert rescued.rank_ql.max() <= 13
