"""SAX-word index gates: window/stride layout, identical windows share
a word, the verbatim probe returns itself at rank 1 with d2 exactly 0,
and bucket probing == brute ranking restricted to the bucket."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators import saxindex as SI


def test_index_layout_and_word_consistency(spark):
    seqs = synth.sequences_df(spark, 6)
    idx = SI.sax_window_index(seqs, max_len=96).collect()
    pdf = synth.sequences_local(6)
    for doc_id, toks in zip(pdf["doc_id"], pdf["tokens"]):
        n = min(len(toks), 96)
        want = list(range(0, n - SI.L + 1, SI.STRIDE))
        got = sorted(r.pos for r in idx if r.doc_id == doc_id)
        assert got == want, doc_id
    for r in idx:
        assert len(r.w) == SI.L and len(r.word) == SI.SEGS
        assert set(r.word) <= set("abcd")
    # identical windows -> identical words (use a constructed repeat)
    rep = spark.createDataFrame(
        [("r", list(range(16)) * 3)], "doc_id string, tokens array<int>"
    )
    rows = SI.sax_window_index(rep).collect()
    by_pos = {r.pos: r.word for r in rows}
    assert by_pos[0] == by_pos[16] == by_pos[32]


def test_verbatim_probe_rank1_zero(spark):
    seqs = synth.sequences_df(spark, 12)
    idx = SI.sax_window_index(seqs, max_len=128)
    probe = idx.where(
        (F.col("doc_id") == "doc000000000003") & (F.col("pos") == 16)
    ).select(F.lit("q").alias("query_id"), "w")
    top = SI.sax_subseq_search(idx, probe, k=5).collect()
    best = [r for r in top if r.rank == 1][0]
    assert best.doc_id == "doc000000000003" and best.pos == 16
    # sqrt(va)^2 can land an ulp either side of va: the clip only
    # catches overshoot, so a verbatim match is within ulps of 0
    assert 0.0 <= best.d2 < 1e-12
    assert all(r.d2 >= 0 for r in top)


def test_bucket_probe_equals_brute_within_bucket(spark):
    seqs = synth.sequences_df(spark, 10)
    idx = SI.sax_window_index(seqs, max_len=80)
    rows = idx.collect()
    probe_row = rows[7]
    probe = spark.createDataFrame(
        [("q", list(probe_row.w))], "query_id string, w array<int>"
    )
    got = {
        (r.doc_id, r.pos): (r.rank, r.d2)
        for r in SI.sax_subseq_search(idx, probe, k=10**6).collect()
    }
    # brute: znorm d2 against every window sharing the word
    def znd2(a, b):
        a = np.asarray(a, float); b = np.asarray(b, float)
        L = a.size
        va = L * (a * a).sum() - a.sum() ** 2
        vb = L * (b * b).sum() - b.sum() ** 2
        if va == 0 and vb == 0:
            return 0.0
        if va == 0 or vb == 0:
            return 2.0 * L
        corr = (L * (a * b).sum() - a.sum() * b.sum()) / (
            np.sqrt(va) * np.sqrt(vb)
        )
        return 2.0 * L * (1.0 - min(1.0, max(-1.0, corr)))

    bucket = [r for r in rows if r.word == probe_row.word]
    assert set(got) == {(r.doc_id, r.pos) for r in bucket}
    order = sorted(
        ((znd2(probe_row.w, r.w), r.doc_id, r.pos) for r in bucket)
    )
    for rank, (d2, doc_id, pos) in enumerate(order, start=1):
        grank, gd2 = got[(doc_id, pos)]
        assert grank == rank and abs(gd2 - d2) < 1e-9
