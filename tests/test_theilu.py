"""Semantic gates for theilu_q (R53): numpy recompute, the
perfect-determination identity, independence-below-floor on LCG
tables, the λ-blindness demonstration, and the scale-ladder corpus
reading."""

import math

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.theilu_q import theil_u_lang_source

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _ref(table):
    """All emitted numbers from an r×c count table."""
    table = np.asarray(table, dtype=np.int64)
    n = table.sum()
    rm = table.sum(1)
    cm = table.sum(0)

    def H(counts):
        c = counts[counts > 0].astype(float)
        return math.log(n) - (c * np.log(c)).sum() / n

    hr, hc, hrc = H(rm), H(cm), H(table.ravel())
    mi = hr + hc - hrc
    floor = (len(rm) - 1) * (len(cm) - 1) / (2.0 * n)
    lam_r = (table.max(0).sum() - rm.max()) / (n - rm.max())
    lam_c = (table.max(1).sum() - cm.max()) / (n - cm.max())
    return mi, floor, mi / hr, mi / hc, lam_r, lam_c


def test_matches_numpy(spark, sf_dir):
    out = theil_u_lang_source(spark, sf_dir).toPandas().iloc[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    table = pd.crosstab(docs.lang, docs.source).to_numpy()
    mi, floor, ul, us, lam_r, lam_c = _ref(table)
    assert out.n == table.sum()
    assert abs(out.mi_nats - f6(mi)) < 1e-6
    assert abs(out.mi_bias_floor - f6(floor)) < 1e-6
    assert abs(out.u_lang_given_source - f6(ul)) < 1e-6
    assert abs(out.u_source_given_lang - f6(us)) < 1e-6
    assert abs(out.lambda_lang_given_source - f6(lam_r)) < 1e-6
    assert abs(out.lambda_source_given_lang - f6(lam_c)) < 1e-6


def test_perfect_determination():
    # diagonal table: each col determines the row exactly
    t = np.diag([10, 20, 30, 40])
    mi, _, ul, us, lam_r, lam_c = _ref(t)
    assert abs(ul - 1.0) < 1e-12
    assert abs(us - 1.0) < 1e-12
    assert abs(lam_r - 1.0) < 1e-12


def _lcg_table(seed, n, r, c):
    s = seed
    t = np.zeros((r, c), dtype=np.int64)
    for _ in range(n):
        s = (1103515245 * s + 12345) % (1 << 31)
        i = (s >> 12) % r
        s = (1103515245 * s + 12345) % (1 << 31)
        j = (s >> 12) % c
        t[i, j] += 1
    return t


def test_independence_below_floor():
    hits = 0
    for seed in range(20):
        t = _lcg_table(100 + seed, 4000, 5, 20)
        mi, floor, *_ = _ref(t)
        hits += mi < 1.8 * floor  # within twice the expected bias
    assert hits >= 18


def test_lambda_blindness():
    # REAL association (U far above floor) with a mode that never
    # moves: λ stays exactly 0 while U sees everything
    #   col 0: 60/20, col 1: 40/39 — row 0 modal in both
    t = np.array([[60, 40], [20, 39]])
    mi, floor, ul, _, lam_r, _ = _ref(t)
    assert lam_r == 0.0
    assert mi > 5 * floor
    assert ul > 0.01


def test_honest_scale_ladder(spark):
    o1 = theil_u_lang_source(
        spark, "/root/testdata/sf0.01"
    ).toPandas().iloc[0]
    o10 = theil_u_lang_source(
        spark, "/root/testdata/sf0.1"
    ).toPandas().iloc[0]
    # n=500: measurement sits just above its own bias (unstable coin)
    assert abs(o1.mi_nats - 0.090441) < 1e-5
    assert int(o1.below_floor) == 0
    assert o1.mi_nats / o1.mi_bias_floor < 1.5
    # n=5000: floor drops 10×, MI collapses WITH it — pure bias
    assert int(o10.below_floor) == 1
    assert o10.mi_nats < o1.mi_nats / 5
    # λ(lang|source) exactly zero at both scales
    assert o1.lambda_lang_given_source == 0.0
    assert o10.lambda_lang_given_source == 0.0
