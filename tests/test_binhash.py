"""Semantic gates for binhash_q (E16): pack round-trip exactness,
the Goemans–Williamson angle identity, Hamming metric checks, and
the recall-frontier corpus pins."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.binhash_q import (
    _DIM,
    _NQ,
    embed_b1_recall_check,
    embed_b1_topk,
)


def _pack_ref(x):
    bits = (np.asarray(x) > 0).astype(np.int64)
    lo = sum(int(bits[j]) << j for j in range(32))
    hi = sum(int(bits[j]) << (j - 32) for j in range(32, _DIM))
    return lo, hi


def _ham(a, b):
    la, ha = _pack_ref(a)
    lb, hb = _pack_ref(b)
    return bin(la ^ lb).count("1") + bin(ha ^ hb).count("1")


def test_pack_roundtrip_and_spark_match(spark, sf_dir):
    out = embed_b1_topk(spark, sf_dir).toPandas()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet").set_index(
        "vec_id"
    )
    # recompute hamming for every emitted row
    for row in out.itertuples():
        a = np.asarray(emb.loc[row.query_id].embedding, dtype=float)
        b = np.asarray(emb.loc[row.nn_id].embedding, dtype=float)
        assert row.hamming == _ham(a, b)
    # ranks are 1..10 per query
    assert (
        out.groupby("query_id")["rank"].apply(
            lambda r: sorted(r) == list(range(1, 11))
        )
    ).all()
    assert out.query_id.nunique() == _NQ


def _lcg_unit(seed, d):
    s = seed
    v = np.empty(d)
    for i in range(d):
        acc = 0.0
        for _ in range(12):
            s = (1103515245 * s + 12345) % (1 << 31)
            acc += s / (1 << 31)
        v[i] = acc - 6.0
    return v / np.linalg.norm(v)


def test_goemans_williamson_identity():
    # planted pairs at angle θ: E[hamming]/d = θ/π
    for theta in (0.3, 0.9, 1.5):
        hams = []
        for r in range(60):
            a = _lcg_unit(1000 + r, _DIM)
            # orthonormal partner
            b0 = _lcg_unit(5000 + r, _DIM)
            b0 = b0 - (a @ b0) * a
            b0 /= np.linalg.norm(b0)
            b = math.cos(theta) * a + math.sin(theta) * b0
            hams.append(_ham(a, b))
        got = np.mean(hams) / _DIM
        want = theta / math.pi
        assert abs(got - want) < 3 * math.sqrt(
            want * (1 - want) / (_DIM * 60)
        ) + 0.02


def test_hamming_metric():
    a = _lcg_unit(1, _DIM)
    b = _lcg_unit(2, _DIM)
    c = _lcg_unit(3, _DIM)
    assert _ham(a, b) == _ham(b, a)
    assert _ham(a, a) == 0
    assert _ham(a, c) <= _ham(a, b) + _ham(b, c)


def test_honest_recall_frontier(spark):
    out = embed_b1_recall_check(
        spark, "/root/testdata/sf0.01"
    ).toPandas().iloc[0]
    assert abs(out.recall_at_k - 0.2625) < 1e-6
    assert bool(out.met)
    # frontier ordering vs the sister tiers' measured numbers
    assert out.recall_at_k < 0.9  # SQ8 at 8 bits/dim
    assert out.recall_at_k < 0.86  # multi-probe LSH
