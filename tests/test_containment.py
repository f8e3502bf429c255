"""Semantic gates for containment_q (T81): set-based pandas recompute
of every pair's shingle/word intersections and ratios, the
zero-overlap LEFT-join restoration, the asymmetry hand case
(A ⊂ B ⇒ containment 1, Jaccard < 1), and the honest
words-saturate / shingles-separate reading."""

import math

import pandas as pd

from dtaidistance_spark.operators.containment_q import (
    _K,
    shingle_containment,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _sets(text):
    w = text.split(" ")
    sh = {" ".join(w[i : i + _K]) for i in range(len(w) - _K + 1)}
    return set(w), sh


def test_matches_sets(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet").set_index(
        "doc_id"
    )
    out = shingle_containment(spark, sf_dir).toPandas().set_index("doc_a")
    ids = sorted(docs.index)
    expect_pairs = [
        i for i in ids if i % 2 == 0 and (i + 1) in docs.index
    ]
    assert sorted(out.index) == expect_pairs
    for a in expect_pairs:
        wa, sa = _sets(docs.loc[a].text)
        wb, sb = _sets(docs.loc[a + 1].text)
        r = out.loc[a]
        assert r.doc_b == a + 1
        assert (r.na4, r.nb4) == (len(sa), len(sb))
        assert (r.na1, r.nb1) == (len(wa), len(wb))
        assert r.inter4 == len(sa & sb)
        assert r.inter1 == len(wa & wb)
        assert abs(r.containment1 - f6(len(wa & wb) / len(wa))) < 1e-9
        assert abs(r.jaccard1 - f6(len(wa & wb) / len(wa | wb))) < 1e-9
        if len(sa & sb) == 0:
            assert r.containment4 == 0.0 and r.jaccard4 == 0.0
        else:
            assert abs(r.containment4 - f6(len(sa & sb) / len(sa))) < 1e-9


def test_asymmetry_hand_case():
    # A strictly contained in B: containment(A→B) = 1, Jaccard < 1
    a = "x1 x2 x3 x4 x5 x6"
    b = a + " y1 y2 y3 y4 y5 y6 y7 y8"
    wa, sa = _sets(a)
    wb, sb = _sets(b)
    assert sa <= sb and wa <= wb
    assert len(sa & sb) / len(sa) == 1.0
    assert len(sa & sb) / len(sa | sb) < 1.0


def test_honest_words_saturate_shingles_separate(spark, sf_dir):
    out = shingle_containment(spark, sf_dir).toPandas()
    # 31-word shared vocabulary: word-level overlap near-total...
    assert out.containment1.median() > 0.7
    assert (out.containment1 > 0).all()
    # ...while 4-gram shingles fully separate independent docs —
    # order structure carries the dedup signal
    assert (out.jaccard4 == 0).mean() > 0.95
