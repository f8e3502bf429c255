"""Semantic gates for lz76_q (TS82): an independent O(n³)
window-comparison parser reproduces every count on real series, the
Kaspar-Schuster worked example, closed constant/alternation cases,
and the LCG-noise c_norm ≈ 1 calibration vs the corpus's
compressible ≪ 1 reading."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.lz76_q import (
    _ALPHA,
    _N,
    lz76_complexity,
    lz76_count,
)


def _lz76_naive(s: str) -> int:
    """Independent parser: the phrase test is an explicit window scan
    (no str.find) — s[i:i+l] occurs in s[0:i+l-1] iff some start
    p ≤ i-1 matches elementwise."""
    n = len(s)
    c = 0
    i = 0
    while i < n:
        l = 1
        while i + l <= n:
            phrase = s[i : i + l]
            hay = s[0 : i + l - 1]
            found = any(
                hay[p : p + l] == phrase for p in range(0, len(hay) - l + 1)
            )
            if not found:
                break
            l += 1
        c += 1
        i += l
    return c


def test_matches_independent_parser(spark):
    out = lz76_complexity(spark, "").toPandas().set_index("doc_id")
    assert len(out) == _N
    loc = synth.sequences_local(_N)
    checked = 0
    for i in range(0, _N, 21):  # O(n³) checker: sample + truncate
        row_l = loc.iloc[i]
        sym = (row_l.tokens.astype(np.int64) % _ALPHA)[:600]
        s = "".join(chr(33 + int(x)) for x in sym)
        row = out.loc[row_l.doc_id]
        if row.l <= 600:
            assert row.c_lz == _lz76_naive(s)
            assert row.n_distinct == len(set(s))
            n = int(row.l)
            want = math.floor(
                row.c_lz * math.log(n) / (n * math.log(_ALPHA)) * 1e6 + 0.5
            ) / 1e6
            assert abs(row.c_norm - want) < 1e-9
            checked += 1
        else:
            # long doc: check the fast parser against the naive one on
            # the truncation only
            assert lz76_count(s) == _lz76_naive(s)
            checked += 1
    assert checked >= 20


def test_kaspar_schuster_worked_example():
    # the PRA'87 example: 0001101001000101 parses into 6 productions
    assert lz76_count("0001101001000101") == 6


def test_closed_cases():
    assert lz76_count("a" * 100) == 2  # 'a' | 'aaa…a'
    assert lz76_count("ab" * 50) == 3  # 'a' | 'b' | 'abab…'
    assert lz76_count("a") == 1
    assert lz76_count("") == 0


def test_lcg_noise_norm_near_one_vs_corpus(spark):
    x, syms = 99991, []
    for _ in range(4000):
        x = (1103515245 * x + 12345) % (2**31)
        # HIGH bits: a power-of-two-modulus LCG's low k bits have
        # period 2^k (x % 64 cycles every ≤128 steps and parses as
        # near-constant, c_norm ≈ 0.03 — measured before this fix)
        syms.append(chr(33 + ((x >> 16) % _ALPHA)))
    s = "".join(syms)
    c = lz76_count(s)
    norm = c * math.log(4000) / (4000 * math.log(_ALPHA))
    assert 0.8 < norm < 1.2
    out = lz76_complexity(spark, "").toPandas()
    med = out.c_norm.median()
    # measured: median 0.80, max 0.88 — below the noise bound but far
    # from the draft's "highly compressible" guess; the periodic
    # minority drops to 0.06
    assert 0.7 < med < 0.9
    assert out.c_norm.max() < 1.0
    assert out.c_norm.min() < 0.2
    # the cautionary LOW-bit LCG case: period-2^k lows parse as
    # near-constant
    x, lo = 99991, []
    for _ in range(2000):
        x = (1103515245 * x + 12345) % (2**31)
        lo.append(chr(33 + (x % _ALPHA)))
    c_lo = lz76_count("".join(lo))
    assert c_lo * math.log(2000) / (2000 * math.log(_ALPHA)) < 0.1
