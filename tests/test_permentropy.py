"""Semantic gates for permentropy_q (TS75): numpy stable-argsort
recompute of the ordinal patterns (the definition, independent of the
pairwise-comparison encoding), entropy bounds, impossible-code
absence, and the monotone / alternating hand cases."""

import math

import numpy as np

from dtaidistance_spark import synth
from dtaidistance_spark.operators.permentropy_q import (
    _CODES,
    _L,
    _MOD,
    _NT,
    permutation_entropy,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _pattern_counts(vals):
    """Bandt-Pompe patterns via stable argsort (order-of-appearance
    tie-break) — the textbook definition, mapped to the pairwise code
    4*(x<=y) + 2*(y<=z) + (x<=z)."""
    counts = {k: 0 for k in _CODES}
    for j in range(len(vals) - 2):
        x, y, z = vals[j], vals[j + 1], vals[j + 2]
        code = 4 * (x <= y) + 2 * (y <= z) + (x <= z)
        # independent route: stable argsort permutation -> code
        perm = tuple(np.argsort([x, y, z], kind="stable"))
        code2 = {
            (2, 1, 0): 0,
            (1, 2, 0): 2,
            (1, 0, 2): 3,
            (2, 0, 1): 4,
            (0, 2, 1): 5,
            (0, 1, 2): 7,
        }[perm]
        assert code == code2, (x, y, z, perm)
        counts[code] += 1
    return counts


def _entropy(counts):
    n = sum(counts.values())
    h = 0.0
    for k in _CODES:
        c = counts[k]
        if c > 0:
            h += -(c / n) * math.log(c / n)
    return h / math.log(6.0)


def test_matches_numpy(spark, sf_dir):
    out = permutation_entropy(spark, sf_dir).toPandas().set_index("doc_id")
    pdf = synth.sequences_local(128)
    for _, row in pdf.iterrows():
        vals = [int(t) % _MOD for t in row["tokens"][:_L]]
        counts = _pattern_counts(vals)
        g = out.loc[row["doc_id"]]
        for k in _CODES:
            assert g[f"c{k}"] == counts[k]
        assert sum(counts.values()) == _NT
        assert abs(g.pe_norm - f6(_entropy(counts))) < 1e-9
        assert 0.0 <= g.pe_norm <= 1.0
    # fold-8 symbols on this generator explore the pattern space:
    # corpus-median entropy should be high (honest reading: the
    # token stream is close to ordinally random at lag 1)
    assert out.pe_norm.median() > 0.8


def test_hand_cases():
    # strictly monotone -> single pattern (code 7) -> PE = 0
    counts = _pattern_counts(list(range(20)))
    assert counts[7] == 18 and _entropy(counts) == 0.0
    # period-2 alternation 0,1,0,1,... -> patterns alternate between
    # (x<=y,y>z,?) and (x>y,y<=z,?): exactly two codes, PE = ln2/ln6
    counts = _pattern_counts([0, 1] * 10)
    used = [k for k in _CODES if counts[k] > 0]
    assert len(used) == 2
    assert abs(_entropy(counts) - math.log(2) / math.log(6)) < 1e-12
    # constant series: ties everywhere -> stable tie-break makes it
    # "monotone" (earlier ranks lower) -> single pattern, PE = 0
    counts = _pattern_counts([5] * 20)
    assert counts[7] == 18 and _entropy(counts) == 0.0
