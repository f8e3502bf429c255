"""Semantic gates for cochranq_q (T76) and pagetrend_q (TS74):
pandas recomputes from raw documents/events, the k=2 Cochran ≡
McNemar identity, rank-sum conservation, and the perfect-order Page
hand case (z maximal, L = b·Σj²)."""

import math
from collections import defaultdict

import pandas as pd

from dtaidistance_spark.operators.cochranq_q import cochran_q_filters
from dtaidistance_spark.operators.kappa_q import _WMIN
from dtaidistance_spark.operators.pagetrend_q import page_trend_test

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def _filters(text):
    words = text.split(" ")
    nw = len(words)
    a = 1 if nw >= _WMIN else 0
    b = 1 if len(set(words)) / nw >= 0.3 else 0
    c = 1 if 2 * (len(text) - nw + 1) >= 9 * nw else 0
    return a, b, c


def test_cochran_matches_pandas(spark, sf_dir):
    out = cochran_q_filters(spark, sf_dir).toPandas().set_index("source")
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    for src, grp in docs.groupby("source"):
        votes = [_filters(t) for t in grp.text]
        ca = sum(v[0] for v in votes)
        cb = sum(v[1] for v in votes)
        cc = sum(v[2] for v in votes)
        nn = ca + cb + cc
        sr2 = sum(sum(v) ** 2 for v in votes)
        g = out.loc[src]
        assert (g.ca, g.cb, g.cc, g.nn, g.sr2) == (ca, cb, cc, nn, sr2)
        assert g.n_docs == len(grp)
        den = 3 * nn - sr2
        if den > 0:
            q = 2.0 * (3 * (ca**2 + cb**2 + cc**2) - nn**2) / den
            assert abs(g.q_cochran - f6(q)) < 1e-9
            assert g.reject_same_rates == (
                1 if q > 5.991464547107979 else 0
            )
        else:
            assert pd.isna(g.q_cochran)


def test_cochran_k2_is_mcnemar():
    # k=2 Cochran's Q == McNemar's uncorrected chi2 on any 2x2 table:
    # Q = (2(Ca^2+Cb^2) - N^2) / (2N - SR2) with
    # Ca = n11+n10, Cb = n11+n01, N = Ca+Cb,
    # SR2 = 4*n11 + n10 + n01  ==  (n10-n01)^2 / (n10+n01)
    for n11, n10, n01, n00 in [
        (5, 9, 2, 4),
        (0, 7, 3, 10),
        (12, 1, 6, 0),
        (3, 8, 8, 3),
    ]:
        ca, cb = n11 + n10, n11 + n01
        nn = ca + cb
        sr2 = 4 * n11 + n10 + n01
        q = (2 * (ca**2 + cb**2) - nn**2) / (2 * nn - sr2)
        mcnemar = (n10 - n01) ** 2 / (n10 + n01)
        assert abs(q - mcnemar) < 1e-12


def test_page_matches_pandas(spark, sf_dir):
    out = page_trend_test(spark, sf_dir).toPandas().set_index("event_type")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    cells = (
        ev.assign(h=ev.ts.dt.hour)
        .groupby(["h", "event_type"])
        .size()
    )
    types = sorted(out.index)
    blocks = sorted({h for h, _ in cells.index})
    b, k = len(blocks), len(types)
    r2 = defaultdict(int)
    tie = 0
    for h in blocks:
        vals = {t: int(cells.get((h, t), 0)) for t in types}
        for t, v in vals.items():
            lt = sum(1 for w in vals.values() if w < v)
            eq = sum(1 for w in vals.values() if w == v)
            r2[t] += 2 * lt + eq + 1
        from collections import Counter

        tie += sum(c**3 - c for c in Counter(vals.values()).values())
    l2 = sum((types.index(t) + 1) * r2[t] for t in types)
    z = (6 * l2 - 3 * b * k * (k + 1) ** 2) / (
        k * (k + 1) * math.sqrt(b * (k - 1))
    )
    for t in types:
        g = out.loc[t]
        assert g.j == types.index(t) + 1
        assert g.r2_sum == r2[t]
        assert (g.b, g.k, g.tie_sum, g.l2) == (b, k, tie, l2)
        assert abs(g.page_z - f6(z)) < 1e-9
        assert g.reject_predicted_order == (
            1 if z > 1.6448536269514722 else 0
        )
    # rank-sum conservation survives the j-weighting bounds:
    # b*k*(k+1) <= L2/avg(j) sanity via direct sum
    assert sum(r2.values()) == b * k * (k + 1)
    # honest reading: alphabetical order predicts nothing on
    # exchangeable types -> fail to reject
    assert out.reject_predicted_order.eq(0).all()
    assert abs(float(out.page_z.iloc[0])) < 3.0


def test_page_hand_perfect_order():
    # treatments already in predicted order in EVERY block:
    # L = b * sum(j^2), z = sqrt(b) * 3 * (k-1) / ... maximal; for
    # b=4, k=5 the z clears the one-sided bar decisively
    b, k = 4, 5
    l = b * sum(j * j for j in range(1, k + 1))
    l2 = 2 * l
    z = (6 * l2 - 3 * b * k * (k + 1) ** 2) / (
        k * (k + 1) * math.sqrt(b * (k - 1))
    )
    # closed form: z = sqrt(b*(k-1)) * (k+1) * ... verify positivity
    # and the exact value against the direct formula
    e_l = b * k * (k + 1) ** 2 / 4
    var_l = b * k**2 * (k + 1) ** 2 * (k - 1) / 144
    z_direct = (l - e_l) / math.sqrt(var_l)
    assert abs(z - z_direct) < 1e-12
    assert z > 1.6448536269514722
