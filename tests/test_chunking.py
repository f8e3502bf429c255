"""Semantic gates for chunking_q (T95): exact byte-for-byte document
reconstruction from the chunks, the O > L coverage/overlap invariants
on every consecutive pair, snap correctness vs a Python rfind
recompute, the hard-cut branch on a constructed spaceless doc, the
chunk-count law, and the corpus pins."""

import hashlib
import math

import pandas as pd

from dtaidistance_spark.operators.chunking_q import (
    _L,
    _O,
    _STRIDE,
    _W,
    doc_chunking,
)


def _py_chunks(text):
    """Reference recompute of the declared variant."""
    n = len(text)
    nck = max(1, math.ceil((n - _O) / _STRIDE))
    out = []
    for i in range(nck):
        s1 = i * _STRIDE + 1
        if i == nck - 1:
            e1, snapped = n, 0
        else:
            he = i * _STRIDE + _W
            seg = text[he - _L : he]  # 0-based [he-L, he)
            p = seg.rfind(" ")
            if p >= 0:
                e1, snapped = he - _L + p + 1, 1
            else:
                e1, snapped = he, 0
        out.append((i, s1, e1, snapped, text[s1 - 1 : e1]))
    return out


def _load(sf_dir):
    return pd.read_parquet(f"{sf_dir}/documents.parquet")[
        ["doc_id", "text"]
    ]


def test_matches_python_and_md5(spark, sf_dir):
    out = doc_chunking(spark, sf_dir).toPandas()
    docs = _load(sf_dir).set_index("doc_id")
    for did, g in out.groupby("doc_id"):
        text = docs.loc[did].text
        want = _py_chunks(text)
        g = g.sort_values("chunk_idx")
        assert len(g) == len(want)
        for row, (i, s1, e1, snapped, chunk) in zip(
            g.itertuples(), want
        ):
            assert (row.chunk_idx, row.start1, row.end1) == (i, s1, e1)
            assert row.snapped == snapped
            assert row.n_chunk_chars == len(chunk)
            assert row.chunk_md5 == hashlib.md5(chunk.encode()).hexdigest()


def test_reconstruction_and_overlap(sf_dir):
    """Losslessness + the O > L guarantees: consecutive chunks always
    overlap, and taking each chunk's first `stride` chars (final
    chunk whole) rebuilds the document exactly."""
    docs = _load(sf_dir)
    for text in docs.text.head(200):
        ch = _py_chunks(text)
        for (i, s1, e1, _, _), (j, s2, e2, _, _) in zip(ch, ch[1:]):
            assert e1 >= s2  # coverage: no gap
            assert e1 - s2 + 1 >= _O - _L  # overlap floor
        rebuilt = "".join(
            c[4] if k == len(ch) - 1 else text[c[1] - 1 : c[1] - 1 + _STRIDE]
            for k, c in enumerate(ch)
        )
        # equivalent, stronger: chunk prefixes themselves rebuild it
        rebuilt2 = "".join(
            c[4][: _STRIDE] if k < len(ch) - 1 else c[4]
            for k, c in enumerate(ch)
        )
        assert rebuilt == text
        if all(c[2] - c[1] + 1 >= _STRIDE for c in ch[:-1]):
            assert rebuilt2 == text


def test_hard_cut_branch():
    """A spaceless doc: every non-final end must hard-cut at the
    window edge with snapped = 0."""
    text = "x" * 400
    ch = _py_chunks(text)
    assert len(ch) == math.ceil((400 - _O) / _STRIDE)
    for i, s1, e1, snapped, _ in ch[:-1]:
        assert snapped == 0 and e1 == i * _STRIDE + _W
    assert ch[-1][2] == 400


def test_chunk_count_law():
    for n in (1, 47, _O, _O + 1, _W, _W + 1, 558, 1000):
        text = ("ab cd " * 200)[:n]
        assert len(_py_chunks(text)) == max(
            1, math.ceil((n - _O) / _STRIDE)
        )


def test_corpus_pins(spark, sf_dir):
    out = doc_chunking(spark, sf_dir).toPandas()
    assert len(out) == 1401 and out.doc_id.nunique() == 500
    mx = out.groupby("doc_id").chunk_idx.max().rename("mx")
    nf = out.merge(mx, on="doc_id")
    nf = nf[nf.chunk_idx < nf.mx]
    assert nf.snapped.mean() == 1.0  # zero hard cuts on this corpus
    assert abs(out.n_chunk_chars.mean() - 138.7) < 0.1
