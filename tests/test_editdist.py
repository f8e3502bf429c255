"""Semantic gates for editdist_q (T65): an independent pure-Python
Levenshtein DP on sampled pairs + the twin/unrelated separation the
fuzzy-dup tier exists to provide."""

import pytest

from dtaidistance_spark import synth
from dtaidistance_spark.operators.editdist_q import (
    _CAP,
    _MOD,
    _ND,
    _NEDIT,
    edit_distance_pairs,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(
                    prev[j] + 1,
                    cur[-1] + 1,
                    prev[j - 1] + (ca != cb),
                )
            )
        prev = cur
    return prev[-1]


def _render(toks):
    return "".join(chr(33 + int(t) % _MOD) for t in toks[:_CAP])


@pytest.fixture(scope="module")
def out(spark, sf_dir):
    return edit_distance_pairs(spark, sf_dir).toPandas()


def test_matches_python_dp(out):
    loc = synth.sequences_local(_ND)
    toks = {r.doc_id: r.tokens.tolist() for r in loc.itertuples()}
    checked = 0
    for r in out.itertuples():
        if r.pair_kind == "twin":
            if int(r.doc_a[3:]) % 9:
                continue
            a = _render(toks[r.doc_a])
            tw = [
                (t + 1) % 50257 if i < _NEDIT else t
                for i, t in enumerate(toks[r.doc_a])
            ]
            b = _render(tw)
        else:
            if int(r.doc_a[3:]) % 13:
                continue
            a = _render(toks[r.doc_a])
            b = _render(toks[r.doc_b])
        assert r.la == len(a) and r.lb == len(b)
        assert r.edit_dist == _lev(a, b), (r.doc_a, r.doc_b)
        checked += 1
    assert checked >= 10


def test_twin_vs_unrelated_separation(out):
    """Twins: distance ≤ 8 (only 8 substituted positions; some
    substitutions may not move the fold-64 char). Unrelated: distance
    near the string length. The tiers must not overlap."""
    tw = out[out.pair_kind == "twin"]
    un = out[out.pair_kind == "unrelated"]
    assert len(tw) == _ND and len(un) == _ND - 1
    assert (tw["edit_dist"] <= _NEDIT).all()
    assert (tw["edit_sim"] >= 0.875 - 1e-9).all()  # d<=8, len>=64
    assert (un["edit_dist"] > 50).all()
    assert un["edit_sim"].max() < tw["edit_sim"].min()
