"""Semantic gates for kendall_q (TS58): naive O(n^2) concordance
recompute + tau-b identities."""

import math

import pytest

from dtaidistance_spark import synth
from dtaidistance_spark.operators.kendall_q import (
    _CAP,
    _ND,
    kendall_tau_pairs,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _naive(xa, xb):
    c = d = tx = ty = 0
    for i in range(_CAP - 1):
        for j in range(i + 1, _CAP):
            dx = xa[i] - xa[j]
            dy = xb[i] - xb[j]
            if dx * dy > 0:
                c += 1
            elif dx * dy < 0:
                d += 1
            elif dx == 0 and dy != 0:
                tx += 1
            elif dy == 0 and dx != 0:
                ty += 1
    return c, d, tx, ty


def test_matches_naive(spark, sf_dir):
    out = (
        kendall_tau_pairs(spark, sf_dir)
        .toPandas()
        .set_index("doc_a")
    )
    assert len(out) == _ND // 2
    loc = synth.sequences_local(_ND)
    toks = {r.doc_id: r.tokens.tolist()[:_CAP] for r in loc.itertuples()}
    ids = sorted(toks)
    for p in range(0, _ND // 2, 5):
        da, db = ids[2 * p], ids[2 * p + 1]
        c, d, tx, ty = _naive(toks[da], toks[db])
        got = out.loc[da]
        assert got.doc_b == db
        assert (got.c_cnt, got.d_cnt, got.tx_cnt, got.ty_cnt) == (
            c,
            d,
            tx,
            ty,
        )
        tau = (c - d) / math.sqrt((c + d + ty) * (c + d + tx))
        assert got.tau_b == pytest.approx(f6(tau), abs=2e-6)


def test_tau_identities(spark, sf_dir):
    """|tau| <= 1; pair accounting: C+D+Tx+Ty <= n0 = CAP*(CAP-1)/2
    (both-tied pairs are the slack); self-correlation sanity via the
    naive kernel (tau(x, x) = 1 on a tie-free slice)."""
    out = kendall_tau_pairs(spark, sf_dir).toPandas()
    n0 = _CAP * (_CAP - 1) // 2
    assert (out.c_cnt + out.d_cnt + out.tx_cnt + out.ty_cnt <= n0).all()
    assert out["tau_b"].abs().max() <= 1 + 1e-9
    loc = synth.sequences_local(2)
    x = loc.iloc[0].tokens.tolist()[:_CAP]
    if len(set(x)) == len(x):
        c, d, tx, ty = _naive(x, x)
        assert d == tx == ty == 0 and c == n0
