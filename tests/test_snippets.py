"""Semantic gates for snippets_q (MP9): naive per-doc recompute + the
greedy-coverage properties snippets exist to have."""

import numpy as np
import pytest

from dtaidistance_spark import synth
from dtaidistance_spark.operators.snippets_q import (
    _B,
    _CAP,
    _M,
    _NB,
    _ND,
    snippet_selection,
)


def _naive(toks):
    a = np.asarray(toks[:_CAP], dtype=np.int64)
    W = np.lib.stride_tricks.sliding_window_view(a, _M)
    q = W.shape[0]
    profs = {}
    for c in range(_NB):
        lo = c * _B
        if lo >= q:
            continue
        hi = min(lo + _B - _M + 1, q)
        D = ((W[:, None, :] - W[None, lo:hi, :]) ** 2).sum(axis=2)
        profs[c] = D.min(axis=1)
    areas = {c: int(p.sum()) for c, p in profs.items()}
    p1 = min(areas, key=lambda c: (areas[c], c))
    joint = {
        c: int(np.minimum(profs[p1], profs[c]).sum())
        for c in profs
        if c != p1
    }
    p2 = min(joint, key=lambda c: (joint[c], c))
    n1 = int((profs[p1] <= profs[p2]).sum())
    return p1, areas[p1], p2, joint[p2], q, n1


def test_snippets_match_naive(spark, sf_dir):
    out = snippet_selection(spark, sf_dir).toPandas().set_index("doc_id")
    loc = synth.sequences_local(_ND)
    n_checked = 0
    for row in loc.itertuples():
        if len(row.tokens) < 2 * _B + _M:
            assert row.doc_id not in out.index
            continue
        p1, a1, p2, a2, q, n1 = _naive(row.tokens.tolist())
        got = out.loc[row.doc_id]
        assert got.snip1 == p1 and got.area1 == a1, row.doc_id
        assert got.snip2 == p2 and got.area2 == a2, row.doc_id
        assert got.n_win == q
        assert got.frac1 == pytest.approx(n1 / q, abs=2e-6)
        n_checked += 1
    assert n_checked == len(out) > 0


def test_snippet_coverage_properties(spark, sf_dir):
    """Greedy coverage: adding the second snippet can only shrink the
    area (area2 ≤ area1); the first snippet covers the majority of
    windows by construction of the tie rule; picks are valid block
    indices."""
    out = snippet_selection(spark, sf_dir).toPandas()
    assert (out["area2"] <= out["area1"]).all()
    assert out["snip1"].between(0, _NB - 1).all()
    assert out["snip2"].between(0, _NB - 1).all()
    assert (out["snip1"] != out["snip2"]).all()
    assert (out["frac1"] >= 0.5 - 1e-9).any()
    assert out["frac1"].between(0, 1).all()
