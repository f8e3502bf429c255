"""Semantic gates for loopdetect_q (T97): numpy recompute (plant
semantics included), the flagged-set ≡ planted-set identity, the
broken-cycle near-miss reading, short-window handling, and the
measured clean-corpus pins (best_rate exactly 1.0, argmin at p=1)."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.loopdetect_q import (
    _N,
    _W,
    repetition_loop_screen,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _screen_np(tokens, doc_num):
    w = [int(t) for t in tokens[-_W:]] if len(tokens) >= _W else [
        int(t) for t in tokens
    ]
    if doc_num % 50 == 0:
        w = [w[i % 3] for i in range(len(w))]
    n = len(w)
    marr, rarr = [], []
    for p in range(1, n):
        m = sum(1 for i in range(p, n) if w[i] != w[i - p])
        marr.append(m)
        rarr.append(m / (n - p))
    lp = marr.index(0) + 1 if 0 in marr else None
    bp = rarr.index(min(rarr)) + 1
    return n, lp, bp, min(rarr)


def test_matches_numpy(spark, sf_dir):
    out = (
        repetition_loop_screen(spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
    )
    pdf = synth.gen_pdf(list(range(0, _N, 73)) + [50, 100])
    for row in pdf.itertuples():
        num = int(row.doc_id[3:])
        n, lp, bp, br = _screen_np(list(row.tokens), num)
        got = out.loc[row.doc_id]
        assert got.n_win == n
        if lp is None:
            assert np.isnan(got.loop_period)
        else:
            assert got.loop_period == lp
        assert got.best_period == bp
        assert abs(got.best_rate - f6(br)) < 1e-6
        assert got.planted == int(num % 50 == 0)


def test_flagged_set_is_exactly_the_planted_set(spark, sf_dir):
    out = repetition_loop_screen(spark, sf_dir).toPandas()
    assert int(out.planted.sum()) == 11
    fl = out[out.is_degenerate == 1]
    assert len(fl) == 11
    assert (fl.planted == 1).all()
    assert (fl.loop_period == 3).all()
    assert (fl.best_rate == 0.0).all()


def test_clean_corpus_pins(spark, sf_dir):
    out = repetition_loop_screen(spark, sf_dir).toPandas()
    up = out[out.planted == 0]
    # mod-50257 values virtually never coincide: rates saturate at
    # exactly 1.0 for the median doc and argmin tie-breaks to p=1
    assert up.best_rate.median() == 1.0
    assert up.best_period.median() == 1.0
    assert (up.is_degenerate == 0).all()


def test_broken_cycle_is_near_miss_not_flagged():
    """Break the cycle at the LAST two positions — a mid-window break
    escapes the comparison span of large periods (measured while
    building this gate: a defect at index 40 leaves p = 42 exactly
    periodic, which is correct screen behavior), but an end break is
    seen by every period."""
    base = [7, 11, 13] * 30
    w = list(base[:_W])
    w[-2], w[-1] = 9998, 9999
    tokens = [0] * 100 + w  # tail = w
    n, lp, bp, br = _screen_np(tokens, doc_num=1)
    assert lp is None  # not an exact loop anywhere
    assert bp == 3  # the 3-cycle is the best near-loop
    assert abs(br - 2 / (_W - 3)) < 1e-12  # exactly two mismatches


def test_short_window():
    tokens = [5, 6, 5, 6, 5, 6]
    n, lp, bp, br = _screen_np(tokens, doc_num=1)
    assert n == 6 and lp == 2 and br == 0.0
