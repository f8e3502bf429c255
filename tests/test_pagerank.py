"""Semantic gates for pagerank_q: the 8 integer iterations replayed
exactly in pure Python, mass accounting, and the centrality reading."""

from collections import Counter

import pytest

from dtaidistance_spark import synth
from dtaidistance_spark.operators.pagerank_q import (
    _K,
    _MOD,
    _NB,
    _R,
    _T,
    token_pagerank,
)


@pytest.fixture(scope="module")
def ref():
    loc = synth.sequences_local(_NB)
    edges = Counter()
    for row in loc.itertuples():
        toks = [int(t) % _MOD for t in row.tokens.tolist()]
        edges.update(zip(toks[:-1], toks[1:]))
    w_out = Counter()
    w_in = Counter()
    for (a, b), c in edges.items():
        w_out[a] += c
        w_in[b] += c
    pr = {v: _T // _MOD for v in range(_MOD)}
    for _ in range(_K):
        nxt = {v: _R for v in range(_MOD)}
        for (a, b), c in edges.items():
            nxt[b] += (pr[a] * c * 17) // (20 * w_out[a])
        pr = nxt
    return edges, w_out, w_in, pr


def test_pagerank_matches_exact_python_replay(spark, sf_dir, ref):
    edges, w_out, w_in, pr = ref
    out = token_pagerank(spark, sf_dir).toPandas().set_index("fold")
    assert len(out) == _MOD
    for v in range(_MOD):
        got = out.loc[v]
        assert got.pr_final == pr[v], v
        assert got.w_out == w_out.get(v, 0)
        assert got.w_in == w_in.get(v, 0)


def test_pagerank_mass_and_centrality(spark, sf_dir, ref):
    """Total mass stays within the floor-loss bound of T (each round
    loses < #edges units + nothing else — no dangling nodes on this
    dense graph), and rank correlates with in-weight (the centrality
    signal PageRank exists to extract)."""
    edges, w_out, w_in, _ = ref
    out = token_pagerank(spark, sf_dir).toPandas()
    total = out["pr_final"].sum()
    assert total <= _T
    assert total >= _T - _K * (len(edges) + _MOD)
    assert (out["w_out"] > 0).all()  # no dangling nodes
    # spearman by hand (scipy absent in this container): rank, then
    # pearson on the ranks
    r = out["pr_final"].rank().corr(out["w_in"].rank())
    assert r > 0.9, r
