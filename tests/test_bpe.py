"""Semantic gates for bpe_q: the distributed merge-learning loop must
equal a pure-Python reference BPE trainer (counts, tie rule, leftmost-
non-overlapping application) on the same 16-symbol corpus."""

from collections import Counter

import pytest

from dtaidistance_spark import synth
from dtaidistance_spark.operators.bpe_q import (
    _K,
    _N,
    _NID0,
    bpe_apply_stats,
    bpe_train_merges,
)


def _merge_once(seq, a, b, nid):
    out, i, applied = [], 0, 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(nid)
            applied += 1
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out, applied


def _reference_bpe(corpus, k):
    merges = []
    cur = {d: list(s) for d, s in corpus.items()}
    for r in range(k):
        cnt = Counter()
        for s in cur.values():
            cnt.update(zip(s[:-1], s[1:]))
        (a, b), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        nid = _NID0 + r
        merges.append((r + 1, a, b, c, nid))
        for d in cur:
            cur[d], _ = _merge_once(cur[d], a, b, nid)
    return merges, cur


@pytest.fixture(scope="module")
def ref():
    loc = synth.sequences_local(_N)
    corpus = {
        row.doc_id: [int(t) % 16 for t in row.tokens]
        for row in loc.itertuples()
    }
    src = {row.doc_id: row.source for row in loc.itertuples()}
    merges, final = _reference_bpe(corpus, _K)
    return corpus, src, merges, final


def test_bpe_merge_table_matches_reference(spark, sf_dir, ref):
    _, _, merges, _ = ref
    out = bpe_train_merges(spark, sf_dir).toPandas().sort_values("round")
    got = [
        (int(r.round), int(r.a), int(r.b), int(r.cnt), int(r.new_id))
        for r in out.itertuples()
    ]
    assert got == merges


def test_bpe_apply_stats_match_reference(spark, sf_dir, ref):
    corpus, src, _, final = ref
    out = bpe_apply_stats(spark, sf_dir).toPandas().set_index("source")
    before, after, docs = {}, {}, {}
    for d, s in corpus.items():
        so = src[d]
        before[so] = before.get(so, 0) + len(s)
        after[so] = after.get(so, 0) + len(final[d])
        docs[so] = docs.get(so, 0) + 1
    for so in before:
        row = out.loc[so]
        assert row.n_docs == docs[so]
        assert row.tok_before == before[so]
        assert row.tok_after == after[so]
        assert row.tok_after < row.tok_before  # merges actually applied
        assert row.ratio == pytest.approx(after[so] / before[so], abs=2e-6)


def test_bpe_overlap_rule_is_leftmost():
    # runs of a repeated symbol: aaaa + (a,a) -> NN (leftmost pairs),
    # aaaaa -> NNa
    out, n = _merge_once([7, 7, 7, 7], 7, 7, 99)
    assert out == [99, 99] and n == 2
    out, n = _merge_once([7, 7, 7, 7, 7], 7, 7, 99)
    assert out == [99, 99, 7] and n == 2


def test_bpe_holdout_encode_matches_reference(spark, sf_dir, ref):
    import hashlib

    from dtaidistance_spark.operators.bpe_q import _NE, bpe_encode_holdout

    _, _, merges, _ = ref
    loc = synth.sequences_local(_NE)
    out = bpe_encode_holdout(spark, sf_dir).toPandas().set_index("doc_id")
    assert len(out) == _NE - _N
    n_checked = 0
    for row in loc.itertuples():
        if int(row.doc_id[3:]) < _N:
            continue
        seq = [int(t) % 16 for t in row.tokens]
        for _, a, b, _, nid in merges:
            seq, _ = _merge_once(seq, a, b, nid)
        got = out.loc[row.doc_id]
        assert got.n_before == row.n_tok
        assert got.n_after == len(seq)
        want = hashlib.md5(",".join(str(v) for v in seq).encode()).hexdigest()
        assert got.enc_md5 == want, row.doc_id
        n_checked += 1
    assert n_checked == _NE - _N
