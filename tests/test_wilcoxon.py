"""Semantic gates for wilcoxon_q (TS60): naive signed-rank recompute
of every pair + the nominal-rate honest reading on null data."""

import math

from dtaidistance_spark import synth
from dtaidistance_spark.operators.wilcoxon_q import (
    _CAP,
    _ND,
    wilcoxon_signed_rank,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _naive(xa, xb):
    d = [xa[i] - xb[i] for i in range(_CAP)]
    kept = [x for x in d if x != 0]
    m = len(kept)
    w2 = tie = 0
    for di in d:
        if di == 0:
            continue
        lt = sum(1 for dj in d if dj != 0 and abs(dj) < abs(di))
        eq = sum(1 for dj in d if abs(dj) == abs(di))
        tie += eq * eq - 1
        if di > 0:
            w2 += 2 * lt + eq + 1
    return m, w2, tie


def test_matches_naive(spark, sf_dir):
    out = (
        wilcoxon_signed_rank(spark, sf_dir)
        .toPandas()
        .set_index("doc_a")
    )
    assert len(out) == _ND // 2
    loc = synth.sequences_local(_ND)
    toks = {r.doc_id: r.tokens.tolist()[:_CAP] for r in loc.itertuples()}
    ids = sorted(toks)
    n_rej = 0
    signs = set()
    for p in range(_ND // 2):
        da, db = ids[2 * p], ids[2 * p + 1]
        m, w2, tie = _naive(toks[da], toks[db])
        got = out.loc[da]
        assert got.doc_b == db
        assert (got.m, got.w2_pos, got.tie_sum) == (m, w2, tie)
        var = m * (m + 1) * (2 * m + 1) / 24.0 - tie / 48.0
        z = (2.0 * w2 - m * (m + 1.0)) / (4.0 * math.sqrt(var))
        assert abs(got.z - f6(z)) < 1e-9
        assert got.reject_equal == (1 if abs(z) > 1.96 else 0)
        n_rej += int(got.reject_equal)
        signs.add(got.z > 0)
    # honest reading: independent paired series → the calibrated test
    # rejects at ≈ the nominal 5% rate with both z signs present
    assert n_rej <= 0.15 * (_ND // 2)
    assert signs == {True, False}


def test_signed_rank_identity():
    """Hand case: xa-xb = [3, -1, 0, 2, 2] → kept |d| = 3,1,2,2;
    midranks: 1→1, 2→2.5, 2→2.5, 3→4; W+ = 4 + 2.5 + 2.5 = 9."""
    xa = [13, 9, 5, 12, 12]
    xb = [10, 10, 5, 10, 10]
    d = [a - b for a, b in zip(xa, xb)]
    w2 = tie = 0
    for di in d:
        if di == 0:
            continue
        lt = sum(1 for dj in d if dj != 0 and abs(dj) < abs(di))
        eq = sum(1 for dj in d if abs(dj) == abs(di))
        tie += eq * eq - 1
        if di > 0:
            w2 += 2 * lt + eq + 1
    assert w2 == 18  # 2·W⁺ = 2·9
    assert tie == 6  # one tie group of size 2: t³−t = 6 = Σ(eq²−1)
