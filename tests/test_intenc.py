"""Semantic gates for intenc_q (cross-engine hashes live in the
driver sweep): byte accounting reproduced by ACTUALLY ENCODING each
series in Python — the varint bytes are counted by running LEB128,
not by re-deriving the ladder."""

import math

import numpy as np
import pytest

from dtaidistance_spark import synth
from dtaidistance_spark.operators.intenc_q import _B, _N, int_encoding_bytes


def _leb128_len(z: int) -> int:
    n = 1
    while z >= 128:
        z >>= 7
        n += 1
    return n


def _encode_bytes(x):
    x = [int(v) for v in x]
    deltas = [x[0]] + [b - a for a, b in zip(x, x[1:])]
    var = sum(
        _leb128_len(2 * d if d >= 0 else -2 * d - 1) for d in deltas
    )
    bp = 0
    for s in range(0, len(x), _B):
        blk = x[s : s + _B]
        rng = max(blk) - min(blk)
        w = rng.bit_length()
        bp += 5 + 8 * w
    nd = len(set(x))
    dc = 4 * nd + (len(x) * (nd - 1).bit_length() + 7) // 8
    return var, bp, dc


def test_byte_accounting_matches_real_encoder(spark, sf_dir):
    out = (
        int_encoding_bytes(spark, sf_dir).toPandas().set_index("doc_id")
    )
    assert len(out) == _N
    loc = synth.sequences_local(_N)
    f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731
    for row in list(loc.itertuples())[::5]:
        var, bp, dc = _encode_bytes(row.tokens.tolist())
        got = out.loc[row.doc_id]
        assert got.varint_bytes == var, row.doc_id
        assert got.bitpack_bytes == bp, row.doc_id
        assert got.dict_bytes == dc, row.doc_id
        assert got.raw_bytes == 4 * len(row.tokens)
        best = min(
            [(var, "varint"), (bp, "bitpack"), (dc, "dict")],
            key=lambda t: t[0],
        )
        # declared tie order varint > bitpack > dict
        if var == best[0]:
            assert got.winner == "varint"
        elif bp == best[0]:
            assert got.winner == "bitpack"
        else:
            assert got.winner == "dict"
        assert got.varint_ratio == pytest.approx(
            f6(var / (4 * len(row.tokens))), abs=2e-6
        )


def test_encodings_actually_compress(spark, sf_dir):
    """The smooth modular-ramp series must beat raw 4-byte storage
    under delta-varint on every row (deltas are small), and the best
    encoding must average well under 0.8x raw."""
    out = int_encoding_bytes(spark, sf_dir).toPandas()
    assert (out["varint_bytes"] < out["raw_bytes"]).all()
    best = out[["varint_ratio", "bitpack_ratio", "dict_ratio"]].min(
        axis=1
    )
    assert best.mean() < 0.8
