"""Semantic gates for markov_q (TS100): pandas recompute of the
pooled transition counts and all emitted numbers, the exact
G = 2N·(H_iid − H_rate) algebraic identity, the planted sticky
chain, the deterministic-cycle H_rate = 0 case, and the honest
memoryless corpus reading."""

import math
from collections import Counter

import numpy as np
import pandas as pd

from dtaidistance_spark.operators.markov_q import markov_event_chain

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731
_CHI16 = 26.29622760486423


def _markov_np(pairs):
    """Textbook route from a list of (prev, cur) transitions."""
    jc = Counter(pairs)
    ic = Counter(p for p, _ in pairs)
    mc = Counter(c for _, c in pairs)
    n = len(pairs)
    g = 2 * sum(
        c * math.log(c * n / (ic[p] * mc[q]))
        for (p, q), c in jc.items()
    )
    h_rate = (
        sum(c * math.log(c) for c in ic.values())
        - sum(c * math.log(c) for c in jc.values())
    ) / n
    h_iid = math.log(n) - sum(
        c * math.log(c) for c in mc.values()
    ) / n
    return n, g, h_rate, h_iid


def _pairs_from_raw(sf_dir):
    raw = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    pairs = []
    for _, g in raw.groupby("user_id"):
        ts = g.event_type.tolist()
        pairs += list(zip(ts[:-1], ts[1:]))
    return pairs


def test_matches_pandas(spark, sf_dir):
    out = markov_event_chain(spark, sf_dir).toPandas().iloc[0]
    n, g, h_rate, h_iid = _markov_np(_pairs_from_raw(sf_dir))
    assert out.n_transitions == n
    assert abs(out.g_markov - f6(g)) < 1e-5
    assert abs(out.h_rate - f6(h_rate)) < 1e-6
    assert abs(out.h_iid - f6(h_iid)) < 1e-6
    assert out.reject_memoryless == int(g > _CHI16)


def test_g_entropy_identity(spark, sf_dir):
    # G = 2N·(H_iid − H_rate) exactly (both clear the same ln sums)
    out = markov_event_chain(spark, sf_dir).toPandas().iloc[0]
    lhs = out.g_markov
    rhs = 2 * out.n_transitions * (out.h_iid - out.h_rate)
    assert abs(lhs - rhs) < 1e-2  # f6 rounding on three terms


def _lcg(seed):
    s = seed
    while True:
        s = (1103515245 * s + 12345) % (1 << 31)
        yield (s >> 16) / 32768.0


def test_planted_sticky_chain():
    # P(stay) = 0.7, else uniform: strongly Markov, H-gap worth a model
    g = _lcg(17)
    state, seq = 0, []
    for _ in range(5000):
        seq.append(state)
        state = state if next(g) < 0.7 else int(next(g) * 5) % 5
    n, G, h_rate, h_iid = _markov_np(list(zip(seq[:-1], seq[1:])))
    assert G > 50 * _CHI16
    assert h_iid - h_rate > 0.3


def test_deterministic_cycle_zero_entropy():
    seq = [i % 5 for i in range(1000)]
    n, G, h_rate, h_iid = _markov_np(list(zip(seq[:-1], seq[1:])))
    assert abs(h_rate) < 1e-12  # next state fully determined
    assert h_iid > 1.6  # margin still near-uniform ln 5


def test_honest_memoryless(spark):
    for sf in ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]:
        out = markov_event_chain(spark, sf).toPandas().iloc[0]
        assert out.reject_memoryless == 0
        assert out.g_markov < _CHI16
        # the H-gap is ~0.05% of the ln 5 ceiling: don't build the model
        assert out.h_iid - out.h_rate < 0.01
        assert 1.59 < out.h_iid < math.log(5) + 1e-6
