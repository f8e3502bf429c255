"""Semantic gates for knlm_q (cross-engine hashes live in
test_oracle.py): KN model statistics recomputed with Counter, the
full-vocabulary normalization Σ_w2 P_KN(w2|w1) = 1 (the property that
distinguishes KN from broken backoff), and discount-mass accounting."""

import math
from collections import Counter

import pytest

from dtaidistance_spark import synth
from dtaidistance_spark.operators.knlm_q import (
    _MOD,
    _NB,
    _TOPK,
    kn_bigram_model,
    kn_doc_logprob,
)


@pytest.fixture(scope="module")
def stats():
    loc = synth.sequences_local(_NB)
    bi = Counter()
    per_doc = {}
    for row in loc.itertuples():
        toks = [int(t) % _MOD for t in row.tokens.tolist()]
        pairs = list(zip(toks[:-1], toks[1:]))
        bi.update(pairs)
        per_doc[row.doc_id] = pairs
    c1 = Counter()
    nfollow = Counter()
    nprec = Counter()
    for (a, b), c in bi.items():
        c1[a] += c
        nfollow[a] += 1
        nprec[b] += 1
    ntypes = len(bi)
    return bi, c1, nfollow, nprec, ntypes, per_doc


def _pkn(bi, c1, nfollow, nprec, ntypes, a, b):
    disc = max(bi.get((a, b), 0) - 0.75, 0.0) / c1[a]
    lam = 0.75 * nfollow[a] / c1[a]
    return disc + lam * (nprec.get(b, 0) / ntypes)


def test_model_rows_match_counter_recompute(spark, sf_dir, stats):
    bi, c1, nfollow, nprec, ntypes, _ = stats
    out = kn_bigram_model(spark, sf_dir).toPandas()
    assert len(out) == _TOPK
    # the emitted set IS the deterministic top-k
    ranked = sorted(bi.items(), key=lambda kv: (-kv[1], kv[0]))[:_TOPK]
    want = {k for k, _ in ranked}
    got = {(int(r.w1), int(r.w2)) for r in out.itertuples()}
    assert got == want
    for r in out.itertuples():
        a, b = int(r.w1), int(r.w2)
        assert r.c12 == bi[(a, b)]
        assert r.c1 == c1[a]
        assert r.nfollow == nfollow[a]
        assert r.nprec == nprec[b]
        assert r.ntypes == ntypes
        assert r.p_kn == pytest.approx(
            _pkn(bi, c1, nfollow, nprec, ntypes, a, b), abs=2e-6
        )


def test_full_vocab_normalization(stats):
    """Σ over ALL 256 w2 (seen and unseen under each context) of
    P_KN(w2|w1) must be exactly 1 — the KN design invariant."""
    bi, c1, nfollow, nprec, ntypes, _ = stats
    for a in list(c1)[:16]:
        s = sum(
            _pkn(bi, c1, nfollow, nprec, ntypes, a, b)
            for b in range(_MOD)
        )
        assert s == pytest.approx(1.0, abs=1e-9), a


def test_doc_logprob_matches_recompute(spark, sf_dir, stats):
    bi, c1, nfollow, nprec, ntypes, per_doc = stats
    out = kn_doc_logprob(spark, sf_dir).toPandas().set_index("doc_id")
    assert len(out) == _NB
    for doc_id, pairs in list(per_doc.items())[::7]:
        nll = [
            -math.log(_pkn(bi, c1, nfollow, nprec, ntypes, a, b))
            for a, b in pairs
        ]
        got = out.loc[doc_id]
        assert got.n_bigrams == len(pairs)
        assert got.avg_neg_logprob == pytest.approx(
            sum(nll) / len(nll), abs=5e-4
        )
        assert bool(got.keep) == (
            sum(nll) / len(nll) <= math.log(_MOD)
        )
