"""Semantic gates for lepage_q (TS129): cross-query consistency with
the parent registry queries' own emitted z columns, planted
location-only / scale-only / combined alternatives (the last firing L
when neither component crosses 1.96 alone — the case the combination
exists for), and the measured corpus pins."""

import math

import numpy as np

from dtaidistance_spark.operators.lepage_q import lepage_location_scale

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731
CHI2 = 5.991464547107982


def _z_w(x, y):
    """Tie-corrected MWU z (normal approx), midranks."""
    import collections

    n1, n2 = len(x), len(y)
    pooled = sorted(x + y)
    cnt = collections.Counter(pooled)
    ranks, start = {}, 1
    for v in sorted(cnt):
        c = cnt[v]
        ranks[v] = start + (c - 1) / 2
        start += c
    r1 = sum(ranks[v] for v in x)
    u1 = r1 - n1 * (n1 + 1) / 2
    n = n1 + n2
    tie = sum(c**3 - c for c in cnt.values())
    var = n1 * n2 / 12 * ((n + 1) - tie / (n * (n - 1)))
    return (u1 - n1 * n2 / 2) / math.sqrt(var)


def _z_ab(x, y):
    """Tie-averaged Ansari-Bradley z with conditional moments."""
    import collections

    n1, n2 = len(x), len(y)
    n = n1 + n2
    pooled = sorted(x + y)
    # midrank AB scores per value: average of a_r = min(r, N+1-r)
    cnt = collections.Counter(pooled)
    scores, start = {}, 1
    for v in sorted(cnt):
        c = cnt[v]
        block = [min(r, n + 1 - r) for r in range(start, start + c)]
        scores[v] = sum(block) / c
        start += c
    t = sum(scores[v] for v in x)
    all_sc = [scores[v] for v in pooled]
    e = n1 * sum(all_sc) / n
    ss = sum(s * s for s in all_sc) - sum(all_sc) ** 2 / n
    var = n1 * n2 * ss / (n * (n - 1))
    return (t - e) / math.sqrt(var)


def test_consistency_with_parent_queries(spark, sf_dir):
    """L recomputed from the PARENT registry queries' emitted z
    columns equals the module's L (cross-query gate, the TS53
    precedent) — floor-1e6 of z's makes this a ~1e-5 band."""
    from dtaidistance_spark.operators.ansari_q import (
        ansari_bradley_pairs,
    )
    from dtaidistance_spark.operators.mannwhitney_q import (
        mannwhitney_sources,
    )

    lp = (
        lepage_location_scale(spark, sf_dir)
        .toPandas()
        .set_index(["src_a", "src_b"])
    )
    mw = (
        mannwhitney_sources(spark, sf_dir)
        .toPandas()
        .set_index(["src_a", "src_b"])
    )
    ab = (
        ansari_bradley_pairs(spark, sf_dir)
        .toPandas()
        .set_index(["src_a", "src_b"])
    )
    for key in lp.index:
        assert abs(lp.loc[key].z_w - mw.loc[key].z) < 1e-6
        assert abs(lp.loc[key].z_ab - ab.loc[key].z) < 1e-6
        l_re = mw.loc[key].z ** 2 + ab.loc[key].z ** 2
        assert abs(lp.loc[key].lepage_l - l_re) < 1e-4


def test_corpus_pins(spark, sf_dir):
    lp = lepage_location_scale(spark, sf_dir).toPandas()
    assert (lp.reject_same == 0).all()  # jointly null, measured
    wc = lp[(lp.src_a == "web") & (lp.src_b == "code")].iloc[0]
    assert abs(wc.lepage_l - 2.696800) < 1e-6
    assert abs(wc.z_w - 1.288819) < 1e-6
    assert abs(wc.z_ab - (-1.017716)) < 1e-6


def test_planted_alternatives():
    rng = np.random.RandomState(8)
    base = list(rng.randint(100, 200, size=400))
    # location only: shift fires z_w, not z_ab
    shifted = [v + 30 for v in base]
    zw, zab = _z_w(base, shifted), _z_ab(base, shifted)
    assert abs(zw) > 1.96 and zw**2 + zab**2 > CHI2
    # scale only: symmetric stretch fires z_ab, z_w stays small
    med = 150
    stretched = [int(med + 3 * (v - med)) for v in base]
    zw2, zab2 = _z_w(base, stretched), _z_ab(base, stretched)
    assert abs(zab2) > 1.96 and abs(zw2) < 1.96
    assert zw2**2 + zab2**2 > CHI2


def test_combined_fires_when_neither_component_does():
    """The case Lepage exists for: a mild shift PLUS a mild stretch,
    each tuned under 1.96, jointly over chi2(2)."""
    rng = np.random.RandomState(21)
    base = list(rng.randint(100, 201, size=300))
    med = 150
    both = [int(med + 1.085 * (v - med) + 5) for v in base]
    zw, zab = _z_w(base, both), _z_ab(base, both)
    assert abs(zw) < 1.96 and abs(zab) < 1.96, (zw, zab)
    assert zw**2 + zab**2 > CHI2, (zw, zab)  # L = 6.34 measured
