"""Semantic gates for keyness_q (T79/T80): full pandas/Counter
recomputes of the Dunning 2×2 G² for every emitted (source, word),
top-5 rank verification, the textbook hand 2×2, and exact
repeat-structure sums + closed forms for Yule's K / Simpson's D."""

import math
from collections import Counter

import pandas as pd

from dtaidistance_spark.operators.keyness_q import (
    _TOPK,
    dunning_keyness,
    lexical_diversity,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _docs(sf_dir):
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _g2(a, stot, tot, n):
    cells = [
        (a, stot * tot / n),
        (tot - a, (n - stot) * tot / n),
        (stot - a, stot * (n - tot) / n),
        (n - stot - (tot - a), (n - stot) * (n - tot) / n),
    ]
    return 2.0 * sum(o * math.log(o / e) for o, e in cells if o > 0)


def test_keyness_matches_counter(spark, sf_dir):
    docs = _docs(sf_dir)
    sw = Counter()
    for _, r in docs.iterrows():
        for w in r.text.split(" "):
            sw[(r.source, w)] += 1
    wt = Counter()
    st = Counter()
    for (s, w), c in sw.items():
        wt[w] += c
        st[s] += c
    n = sum(sw.values())
    out = dunning_keyness(spark, sf_dir).toPandas()
    assert len(out) == docs.source.nunique() * _TOPK
    assert (out.groupby("source").rnk.max() == _TOPK).all()
    for _, r in out.iterrows():
        a = sw[(r.source, r.word)]
        assert r.a == a and r.stot == st[r.source] and r.tot == wt[r.word]
        assert r.n == n
        g = _g2(a, st[r.source], wt[r.word], n)
        assert abs(r.g2 - f6(g)) < 1e-6
        assert r.overused == (1 if a * n > st[r.source] * wt[r.word] else 0)
    # rank verification: the emitted top-5 really are the source's top
    # G² words under the (G² desc, word asc) order
    for src in out.source.unique():
        scored = sorted(
            (
                (-_g2(sw[(src, w)], st[src], wt[w], n), w)
                for w in {w for (s, w) in sw if s == src}
            ),
        )[:_TOPK]
        want = [w for _, w in scored]
        got = list(out[out.source == src].sort_values("rnk").word)
        assert got == want, src


def test_keyness_hand_2x2():
    # word appears 30/100 in source, 10/300 elsewhere
    g = _g2(30, 100, 40, 400)
    # independent recompute via the entropy identity:
    # G2 = 2*(Σ O lnO − Σ row lnrow − Σ col lncol + N lnN)
    a, b, c, d = 30, 10, 70, 290
    n = 400
    g_alt = 2 * (
        sum(x * math.log(x) for x in (a, b, c, d))
        - sum(x * math.log(x) for x in (a + c, b + d))
        - sum(x * math.log(x) for x in (a + b, c + d))
        + n * math.log(n)
    )
    assert abs(g - g_alt) < 1e-9
    assert g > 30  # decisive over-use


def test_lexical_diversity_matches_counter(spark, sf_dir):
    docs = _docs(sf_dir)
    out = lexical_diversity(spark, sf_dir).toPandas().set_index("doc_id")
    assert len(out) == len(docs)
    for _, r in docs.iterrows():
        c = Counter(r.text.split(" "))
        nt = sum(c.values())
        row = out.loc[r.doc_id]
        assert row.nt == nt
        assert row.vt == len(c)
        assert row.sc2 == sum(v * v for v in c.values())
        assert row.scc1 == sum(v * (v - 1) for v in c.values())
        assert row.hapax == sum(1 for v in c.values() if v == 1)
        if nt < 2:
            assert pd.isna(row.yule_k)
            continue
        assert abs(row.yule_k - f6(1e4 * (row.sc2 - nt) / nt**2)) < 1e-9
        assert abs(row.simpson_d - f6(row.scc1 / (nt * (nt - 1)))) < 1e-9
        assert abs(row.ttr - f6(row.vt / nt)) < 1e-9


def test_honest_small_vocab_readings(spark, sf_dir):
    # 31-word shared vocabulary: keyness modest but nonzero; K near
    # the uniform-31 baseline 1e4/31 ≈ 322.6
    k = dunning_keyness(spark, sf_dir).toPandas()
    assert 1.0 < k.g2.median() < 10.0
    assert k.g2.max() < 100.0  # no source owns a word
    l = lexical_diversity(spark, sf_dir).toPandas()
    assert l.vt.max() <= 31
    assert 250 < l.yule_k.median() < 400
