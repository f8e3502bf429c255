"""Semantic gates for bleu_q (T72): Counter-based clipped-overlap
recompute of every row, the exact p1 = 56/64 positive-control
identity, the near-zero cross-doc honest reading, and a hand case
validating the occurrence-rank clipping identity on ties."""

import math
from collections import Counter

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.bleu_q import (
    _CAP,
    _ND,
    _V,
    bleu_rouge_pairs,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _clip(cand, ref, n):
    cc = Counter(tuple(cand[i : i + n]) for i in range(len(cand) - n + 1))
    cr = Counter(tuple(ref[i : i + n]) for i in range(len(ref) - n + 1))
    return sum(min(c, cr[g]) for g, c in cc.items())


def test_matches_counter(spark, sf_dir):
    out = bleu_rouge_pairs(spark, sf_dir).toPandas()
    assert len(out) == _ND
    loc = synth.sequences_local(_ND)
    toks = {r.doc_id: r.tokens.tolist()[:_CAP] for r in loc.itertuples()}
    ids = sorted(toks)
    idx = out.set_index(["doc_id", "kind"])
    cross_bleu = []
    for p in range(_ND // 2):
        da, db = ids[2 * p], ids[2 * p + 1]
        ref = toks[da]
        mut = [
            (x + 1) % _V if (j + 1) % 8 == 0 else x
            for j, x in enumerate(ref)
        ]
        for kind, cand in (("self_mut", mut), ("cross", toks[db])):
            got = idx.loc[(da, kind)]
            ovs = {n: _clip(cand, ref, n) for n in (1, 2, 4)}
            assert (got.ov1, got.ov2, got.ov4) == (
                ovs[1],
                ovs[2],
                ovs[4],
            ), (da, kind)
            ps = {n: ovs[n] / (_CAP - n + 1) for n in (1, 2, 4)}
            for n in (1, 2, 4):
                assert abs(got[f"p{n}"] - f6(ps[n])) < 1e-9
            assert abs(got.rouge1 - f6(ps[1])) < 1e-9
            bleu = (
                math.exp(sum(math.log(ps[n]) for n in (1, 2, 4)) / 3.0)
                if all(ovs[n] > 0 for n in (1, 2, 4))
                else 0.0
            )
            assert abs(got.bleu - f6(bleu)) < 1e-9
        # positive control: exactly 8 mutations → p1 = 56/64 unless a
        # bump collides with an existing token's count budget
        g = idx.loc[(da, "self_mut")]
        assert g.ov1 >= _CAP - 8
        assert g.ov2 >= _CAP - 1 - 16
        cross_bleu.append(float(idx.loc[(da, "cross")].bleu))
    # honest null reading: independent docs don't leak n-grams
    assert float(np.mean(cross_bleu)) < 0.01
    cr = out[out.kind == "cross"]
    assert int(cr.ov4.max()) == 0
    # positive control is loud everywhere
    sm = out[out.kind == "self_mut"]
    assert float(sm.bleu.min()) > 0.5


def test_clip_identity_hand_case():
    # candidate has 3 'a', reference has 2 → clip keeps exactly 2;
    # the occurrence-rank identity must agree with the Counter route
    cand = ["a", "a", "b", "a"]
    ref = ["a", "b", "a", "c"]
    assert _clip(cand, ref, 1) == 3  # min(3,2) for 'a' + min(1,1) 'b'
    ranks = []
    for i, g in enumerate(cand):
        rank = cand[: i + 1].count(g)
        ranks.append(1 if rank <= ref.count(g) else 0)
    assert sum(ranks) == 3
