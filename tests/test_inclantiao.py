"""Semantic gates for inclantiao_q (TS120): numpy recompute per
doc, planted variance break with located k̂, LCG null calibration,
location equivariance, and the sub-null-bulk + real-tail corpus
reading."""

import math

import numpy as np

from dtaidistance_spark.operators.inclantiao_q import (
    inclan_tiao_cusumsq,
)
from dtaidistance_spark.synth import gen_row

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _ref(y):
    v = np.asarray(y, dtype=np.int64)
    r = np.diff(v)
    rr = (r * r).astype(np.int64)
    qm = int(rr.sum())
    m = len(r)
    qk = np.cumsum(rr)
    k = np.arange(1, m + 1)
    score = np.abs(m * qk - k * qm)
    mx = int(score.max())
    ak = int(k[score.argmax()])
    it = math.sqrt(m / 2.0) * mx / (m * qm)
    return qm, mx, ak, it


def test_matches_numpy(spark, sf_dir):
    out = (
        inclan_tiao_cusumsq(spark, sf_dir)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    for i in range(0, 512, 61):
        doc_id, tokens, n, _, _ = gen_row(i)
        qm, mx, ak, it = _ref(tokens)
        row = out.loc[doc_id]
        assert row.q_total == qm
        assert row.k_hat == ak
        assert abs(row.it_stat - f6(it)) < 1e-6


def _lcg_normal(seed, n):
    s = seed
    out = np.empty(n)
    for i in range(n):
        acc = 0.0
        for _ in range(12):
            s = (1103515245 * s + 12345) % (1 << 31)
            acc += s / (1 << 31)
        out[i] = acc - 6.0
    return out


def test_planted_variance_break():
    n = 2000
    e = _lcg_normal(7, n)
    y = np.cumsum(
        np.where(np.arange(n) < 1200, e * 100, e * 800)
    )
    y = np.floor(y).astype(np.int64)
    _, _, ak, it = _ref(y)
    assert it > 1.358
    assert abs(ak - 1200) < 0.02 * n  # break located


def test_null_calibration():
    rej = 0
    runs = 60
    for r in range(runs):
        y = np.floor(
            np.cumsum(_lcg_normal(100 + r, 800)) * 100
        ).astype(np.int64)
        _, _, _, it = _ref(y)
        rej += it > 1.358
    assert rej / runs <= 0.08


def test_location_equivariance():
    y = np.floor(
        np.cumsum(_lcg_normal(3, 500)) * 50
    ).astype(np.int64)
    a = _ref(y)
    b = _ref(y + 12345)
    assert a == b  # diffs absorb the shift exactly


def test_honest_subnull_bulk_and_real_tail(spark):
    out = inclan_tiao_cusumsq(
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    # super-stationary bulk: far below even the random null median
    assert out.it_stat.median() < 0.1
    # 27 rejects — numerically ≈ α...
    assert int(out.reject_var_const.sum()) == 27
    # ...but the magnitudes prove they are real regimes, not draws
    assert out.it_stat.max() > 20
    top = out.nlargest(1, "it_stat").iloc[0]
    assert top.doc_id == "doc000000000116"
    # the mechanism: the top doc's halves differ 1000× in
    # diff-variance (rare wrap spikes clustered in one half)
    _, tokens, _, _, _ = gen_row(116)
    r = np.diff(tokens.astype(np.int64))
    m = len(r)
    v1, v2 = r[: m // 2].var(), r[m // 2 :].var()
    assert max(v1, v2) / min(v1, v2) > 100
