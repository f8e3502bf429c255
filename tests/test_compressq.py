"""Semantic gates for compressq_q (T92): exact zlib recompute per
doc, the constructed ordering triple, determinism, the input-twin
md5 pin, and the warm-up length-trap corpus reading."""

import math
import zlib

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.compressq_q import (
    _LEVEL,
    zlib_compressibility,
    zlib_input_check,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def test_matches_zlib_exactly(spark, sf_dir):
    out = (
        zlib_compressibility(spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet").set_index(
        "doc_id"
    )
    assert len(out) == len(docs)
    for doc_id in list(docs.index)[::13]:
        raw = docs.loc[doc_id].text.encode()
        z = len(zlib.compress(raw, _LEVEL))
        row = out.loc[doc_id]
        assert row.n_bytes == len(raw)
        assert row.z_bytes == z  # EXACT compressed length
        assert abs(row.ratio - f6(z / len(raw))) < 1e-9


def test_constructed_ordering():
    n = 4000
    const = b"a" * n
    english = (
        b"the quick brown fox jumps over the lazy dog and then "
    ) * (n // 53)
    s = 12345
    rnd = bytearray()
    for _ in range(n):
        s = (1103515245 * s + 12345) % (1 << 31)
        rnd.append((s >> 16) & 0xFF)
    r_const = len(zlib.compress(const, _LEVEL)) / len(const)
    r_eng = len(zlib.compress(english, _LEVEL)) / len(english)
    r_rnd = len(zlib.compress(bytes(rnd), _LEVEL)) / len(rnd)
    assert r_const < 0.01
    assert r_const < r_eng < r_rnd
    assert r_rnd > 0.95


def test_determinism():
    data = b"determinism check " * 100
    assert zlib.compress(data, _LEVEL) == zlib.compress(data, _LEVEL)


def test_input_twin(spark, sf_dir):
    out = zlib_input_check(spark, sf_dir).toPandas().set_index(
        "doc_id"
    )
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet").set_index(
        "doc_id"
    )
    import hashlib

    for doc_id in list(docs.index)[::37]:
        assert (
            out.loc[doc_id].text_md5
            == hashlib.md5(docs.loc[doc_id].text.encode()).hexdigest()
        )


def test_honest_warmup_trap(spark):
    out = zlib_compressibility(
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    docs = pd.read_parquet(
        "/root/testdata/sf0.01/documents.parquet"
    )
    # the measured band, short docs above 1.0
    assert out.ratio.min() > 0.35
    assert out.ratio.max() > 1.0
    # warm-up transient: log-length explains the per-doc ratio
    m = out.merge(docs[["doc_id"]], on="doc_id")
    assert (
        np.corrcoef(out.ratio, np.log(out.n_bytes))[0, 1] < -0.95
    )
    # the screen trap: a 0.30 boilerplate screen rejects NOTHING
    assert int((out.ratio < 0.30).sum()) == 0
    # while the true asymptotic redundancy is ~0.19
    big = " ".join(docs.text).encode()
    whole = len(zlib.compress(big, _LEVEL)) / len(big)
    assert 0.15 < whole < 0.25
