"""Semantic gates for readability_q (T91): formula hand cases,
syllable-heuristic pins, numpy recompute per doc, and the
unsegmented-corpus length-trap reading."""

import math
import re

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.readability_q import (
    readability_indices,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _syl(word):
    return max(1, len(re.findall(r"[aeiouy]+", word.lower())))


def _ref(text):
    words = [w for w in re.split(r"\s+", text) if w != ""]
    W = len(words)
    S = max(1, len(re.findall(r"[.!?]+", text)))
    L = len(re.sub(r"[^A-Za-z]", "", text))
    C = len(re.sub(r"[^A-Za-z0-9]", "", text))
    Sy = sum(_syl(w) for w in words)
    fre = 206.835 - 1.015 * W / S - 84.6 * Sy / W
    fkgl = 0.39 * W / S + 11.8 * Sy / W - 15.59
    cl = 0.0588 * (100 * L / W) - 0.296 * (100 * S / W) - 15.8
    ari = 4.71 * C / W + 0.5 * W / S - 21.43
    return W, S, Sy, L, fre, fkgl, cl, ari


def test_syllable_pins():
    # vowel-group rule, NOT dictionary syllables — divergences
    # documented ('queue' → 2 groups 'ueue'... actually u,e,u,e is
    # one maximal group 'ueue' → 1, floored to 1)
    assert _syl("cat") == 1
    assert _syl("difficult") == 3  # i, i, u
    assert _syl("rhythm") == 1  # y
    assert _syl("strength") == 1
    assert _syl("queue") == 1  # 'ueue' is ONE maximal group
    assert _syl("banana") == 3
    assert _syl("xyz") == 1  # y counts as vowel
    assert _syl("bcdfg") == 1  # floor 1


def test_hand_paragraph():
    text = "The cat sat on the mat. It was happy!"
    W, S, Sy, L, fre, fkgl, cl, ari = _ref(text)
    assert W == 9 and S == 2
    # syllables: the cat sat on the mat it was hap-py(2)
    assert Sy == 10
    assert abs(fre - (206.835 - 1.015 * 4.5 - 84.6 * 10 / 9)) < 1e-12


def test_matches_numpy(spark, sf_dir):
    out = (
        readability_indices(spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet").set_index(
        "doc_id"
    )
    for doc_id in list(docs.index)[::17]:
        W, S, Sy, L, fre, fkgl, cl, ari = _ref(docs.loc[doc_id].text)
        row = out.loc[doc_id]
        assert row.n_words == W
        assert row.n_sentences == S
        assert row.n_syllables == Sy
        assert row.n_letters == L
        assert abs(row.flesch_reading_ease - f6(fre)) < 1e-6
        assert abs(row.fk_grade - f6(fkgl)) < 1e-6
        assert abs(row.coleman_liau - f6(cl)) < 1e-6
        assert abs(row.ari - f6(ari)) < 1e-6


def test_honest_length_trap(spark):
    out = readability_indices(
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    # unsegmented corpus: every doc is ONE run-on sentence
    assert (out.n_sentences == 1).all()
    # the dial collapses to length
    assert np.corrcoef(out.fk_grade, out.n_words)[0, 1] > 0.99
    # CL (sentence-light) spreads far less than FKGL
    assert out.fk_grade.std() / out.coleman_liau.std() > 5
    # syllable-rate axis stays meaningful
    assert 1.3 < (out.n_syllables / out.n_words).median() < 1.6
    # level disagreement, order agreement
    r_f = out.fk_grade.rank()
    r_a = out.ari.rank()
    assert np.corrcoef(r_f, r_a)[0, 1] > 0.95
