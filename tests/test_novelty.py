"""Semantic gates for novelty_q (T83): set-based sequential replay of
the entire corpus (the definition: first occurrence in doc_id order),
the Σ novel = |corpus shingles| conservation identity, a planted
duplicate hand case, and the honest high-novelty reading."""

import math

import pandas as pd

from dtaidistance_spark.operators.novelty_q import _K, ngram_novelty

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _shingles(text):
    w = text.split(" ")
    return {" ".join(w[i : i + _K]) for i in range(len(w) - _K + 1)}


def test_matches_sequential_replay(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet").sort_values(
        "doc_id"
    )
    out = ngram_novelty(spark, sf_dir).toPandas().set_index("doc_id")
    assert len(out) == len(docs)
    seen = set()
    total_novel = 0
    for _, d in docs.iterrows():
        sh = _shingles(d.text)
        novel = sh - seen
        seen |= sh
        r = out.loc[d.doc_id]
        assert r.n_shingles == len(sh)
        assert r.n_novel == len(novel)
        assert r.n_dup == len(sh) - len(novel)
        if len(sh):
            assert abs(r.novelty - f6(len(novel) / len(sh))) < 1e-9
        total_novel += len(novel)
    # conservation: every corpus shingle is novel exactly once
    assert total_novel == len(seen)
    assert int(out.n_novel.sum()) == len(seen)


def test_planted_duplicate_hand_case():
    # doc B = doc A ⇒ B's novelty 0; C half-borrows ⇒ in between
    a = "q w e r t y u i"
    seen = set()
    rows = []
    for text in (a, a, a + " z1 z2 z3 z4"):
        sh = _shingles(text)
        rows.append(len(sh - seen) / len(sh))
        seen |= sh
    assert rows[0] == 1.0
    assert rows[1] == 0.0
    assert 0.0 < rows[2] < 1.0


def test_honest_high_novelty(spark, sf_dir):
    out = ngram_novelty(spark, sf_dir).toPandas()
    # independent synthetic docs: collisions exist (tiny vocabulary)
    # but are rare — dedup would not save much here, and the audit
    # says so
    assert out.novelty.mean() > 0.85
    dup_frac = out.n_dup.sum() / out.n_shingles.sum()
    assert dup_frac < 0.15
    assert out.n_dup.sum() > 0  # collisions are real, not zero
