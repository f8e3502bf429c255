"""Semantic gates for itemset_q (cross-engine hash in test_oracle.py):
an independent Counter-based A-Priori recompute of the full frequent-
pair set, the anti-monotone property the prune relies on, and the
measured candidate reduction cited in the module docstring."""

from collections import Counter
from itertools import combinations

from dtaidistance_spark import synth
from dtaidistance_spark.operators.itemset_q import (
    _MINSUP,
    _MOD,
    _NB,
    freq_itemset_pairs,
)


def _baskets():
    loc = synth.sequences_local(_NB)
    return [
        sorted(set(int(t) % _MOD for t in r.tokens)) for r in loc.itertuples()
    ]


def test_freq_pairs_match_counter(spark, sf_dir):
    out = freq_itemset_pairs(spark, sf_dir).toPandas()
    got = {(int(r.a), int(r.b)): int(r.cnt) for r in out.itertuples()}
    baskets = _baskets()
    single = Counter(i for b in baskets for i in b)
    freq = {i for i, c in single.items() if c >= _MINSUP}
    pc = Counter()
    cand_pruned = 0
    cand_all = 0
    for b in baskets:
        fb = [i for i in b if i in freq]
        cand_pruned += len(fb) * (len(fb) - 1) // 2
        cand_all += len(b) * (len(b) - 1) // 2
        pc.update(combinations(fb, 2))
    want = {p: c for p, c in pc.items() if c >= _MINSUP}
    assert got == want
    assert len(got) > 0
    # support column = cnt / N (floor-1e6 exact at these magnitudes)
    for r in out.itertuples():
        assert abs(r.support - r.cnt / _NB) < 1e-6
    # anti-monotonicity: both members of every frequent pair are
    # frequent singletons (the property the prune is CORRECT under)
    for a, b in got:
        assert single[a] >= _MINSUP and single[b] >= _MINSUP
    # the prune is worth doing: >3x fewer candidate rows (docstring 3.9x)
    assert cand_all > 3 * cand_pruned
