"""Semantic gates for cdc_q (cross-engine hashes live in the sweep):
a pure-numpy CDC reference recomputes every boundary, chunk hash,
shift-robustness count, and the chunk-store savings — then the
shift-robustness PROPERTY itself (CDC re-syncs after a prefix edit,
fixed-width never does) is asserted quantitatively."""

import hashlib

import numpy as np
import pytest

from dtaidistance_spark import synth
from dtaidistance_spark.operators.cdc_q import (
    _B,
    _D,
    _FIX,
    _M,
    _N,
    _POW,
    _V,
    _W,
    cdc_chunk_summary,
    cdc_dedup_stats,
    cdc_shift_robustness,
)


def _boundaries(toks):
    t = toks.astype(np.int64)
    n = len(t)
    acc = np.zeros(n - _W + 1, dtype=np.int64)
    for i in range(_W):
        acc += t[i : n - _W + 1 + i] * _POW[i]
    h = acc % _M  # position j = _W-1+idx
    js = np.nonzero(h % _D == 0)[0] + (_W - 1)
    return [int(j) for j in js if j <= n - 2]


def _md5(arr):
    return hashlib.md5(",".join(str(int(x)) for x in arr).encode()).hexdigest()


def _cdc_chunks(toks):
    b = _boundaries(toks)
    starts = [0] + [x + 1 for x in b]
    ends = b + [len(toks) - 1]
    return [(_md5(toks[s : e + 1]), e - s + 1) for s, e in zip(starts, ends)]


def _fix_chunks(toks):
    n = len(toks)
    return [
        (_md5(toks[c * _FIX : min((c + 1) * _FIX, n)]),
         min((c + 1) * _FIX, n) - c * _FIX)
        for c in range((n + _FIX - 1) // _FIX)
    ]


def _twin(doc_id, toks):
    h = int(hashlib.md5(doc_id.encode()).hexdigest()[:15], 16)
    k = 1 + h % 7
    pre = np.array(
        [(h % _V + s * 7919) % _V for s in range(1, k + 1)], dtype=toks.dtype
    )
    return np.concatenate([pre, toks])


@pytest.fixture(scope="module")
def loc():
    return synth.sequences_local(_N)


def test_chunk_summary_matches_numpy_reference(spark, sf_dir, loc):
    out = cdc_chunk_summary(spark, sf_dir).toPandas().set_index("doc_id")
    assert len(out) == _N
    for row in loc.itertuples():
        ch = _cdc_chunks(row.tokens)
        got = out.loc[row.doc_id]
        lens = [l for _, l in ch]
        assert got.n_chunks == len(ch), row.doc_id
        assert got.sum_len == sum(lens) == row.n_tok, row.doc_id
        assert got.min_len == min(lens) and got.max_len == max(lens)
        chain = hashlib.md5("|".join(m for m, _ in ch).encode()).hexdigest()
        assert got.chunks_md5 == chain, row.doc_id


def test_shift_robustness_matches_and_proves_the_point(spark, sf_dir, loc):
    out = cdc_shift_robustness(spark, sf_dir).toPandas().set_index("doc_id")
    assert len(out) == _N
    for row in loc.itertuples():
        tw = _twin(row.doc_id, row.tokens)
        oc = {m for m, _ in _cdc_chunks(row.tokens)}
        sc = {m for m, _ in _cdc_chunks(tw)}
        of = {m for m, _ in _fix_chunks(row.tokens)}
        sf = {m for m, _ in _fix_chunks(tw)}
        got = out.loc[row.doc_id]
        assert got.n_cdc == len(oc) and got.n_fix == len(of), row.doc_id
        assert got.shared_cdc == len(oc & sc), row.doc_id
        assert got.shared_fix == len(of & sf), row.doc_id
    # the property CDC exists for: after a 1..7-token prefix edit the
    # content-defined boundaries re-synchronize (only chunks touching
    # the edit change), while every fixed-width offset shifts.
    cdc_share = (out.shared_cdc / out.n_cdc).mean()
    fix_share = (out.shared_fix / out.n_fix).mean()
    assert cdc_share > 0.8, cdc_share
    assert fix_share < 0.05, fix_share


def test_dedup_stats_matches_exact_chunk_store(spark, sf_dir, loc):
    out = cdc_dedup_stats(spark, sf_dir).toPandas().set_index("scheme")
    store = {"cdc": {}, "fix": {}}
    for row in loc.itertuples():
        for toks in (row.tokens, _twin(row.doc_id, row.tokens)):
            for m, l in _cdc_chunks(toks):
                c, _ = store["cdc"].get(m, (0, l))
                store["cdc"][m] = (c + 1, l)
            for m, l in _fix_chunks(toks):
                c, _ = store["fix"].get(m, (0, l))
                store["fix"][m] = (c + 1, l)
    import math

    for scheme, per in store.items():
        got = out.loc[scheme]
        total = sum(c * l for c, l in per.values())
        saved = sum((c - 1) * l for c, l in per.values())
        assert got.total_chunks == sum(c for c, _ in per.values())
        assert got.distinct_chunks == len(per)
        assert got.total_tokens == total
        assert got.stored_tokens == sum(l for _, l in per.values())
        assert got.saved_tokens == saved
        assert got.saved_ratio == math.floor(saved / total * 1e4 + 0.5) / 1e4
    # the storage story: the twin universe is ~half redundant — CDC
    # recovers nearly all of it, fixed-width recovers ~none.
    assert out.loc["cdc"].saved_ratio > 0.4
    assert out.loc["fix"].saved_ratio < 0.01


def test_provenance_matches_chunk_store_replay(spark, sf_dir, loc):
    """T50: per-doc reused/net-new token accounting equals a Python
    replay of the content-addressed store in stream order."""
    import math

    from dtaidistance_spark.operators.cdc_q import cdc_provenance

    out = cdc_provenance(spark, sf_dir).toPandas().set_index(
        ["doc_id", "variant"]
    )
    stream = [(row.doc_id, "o", row.tokens) for row in loc.itertuples()] + [
        (row.doc_id, "s", _twin(row.doc_id, row.tokens))
        for row in loc.itertuples()
    ]
    first = {}
    for idx, (doc_id, var, toks) in enumerate(stream):
        for m, _l in _cdc_chunks(toks):
            first.setdefault(m, idx)
    for idx, (doc_id, var, toks) in enumerate(stream):
        ch = _cdc_chunks(toks)
        total = sum(l for _, l in ch)
        reused = sum(l for m, l in ch if first[m] != idx)
        new_store = sum(
            l for m, l in {(m, l) for m, l in ch if first[m] == idx}
        )
        got = out.loc[(doc_id, var)]
        assert got.total_tokens == total
        assert got.n_chunks == len(ch)
        assert got.reused_tokens == reused, (doc_id, var)
        assert got.new_store_tokens == new_store, (doc_id, var)
        assert got.frac_reused == math.floor(reused / total * 1e6 + 0.5) / 1e6
    # the accounting tells the dedup story: originals pay ~full price,
    # twins pay only their edit-touched chunks
    orig = out.xs("o", level="variant")
    twin = out.xs("s", level="variant")
    assert orig.frac_reused.median() == 0.0
    assert twin.frac_reused.median() > 0.8
