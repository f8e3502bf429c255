"""Semantic gates for tpchpred_q (R49/R50): pandas recomputes of the
disjunctive branch revenue and the conditional priority pivot, the
branch-disjointness invariant, and all-branches/all-modes coverage."""

import math

import pandas as pd

from dtaidistance_spark.operators.tpchpred_q import (
    _BRANCHES,
    _LATE_DAYS,
    disjunctive_promo_revenue,
    shipmode_priority_counts,
)


def _t(sf_dir, name):
    return pd.read_parquet(f"{sf_dir}/{name}.parquet")


def _r2(v):
    return math.floor(v * 100 + 0.5) / 100


def _ru(df):
    return (df.l_extendedprice * 100).round().astype("int64") * (
        100 - (df.l_discount * 100).round().astype("int64")
    )


def test_disjunctive_matches_pandas(spark, sf_dir):
    li = _t(sf_dir, "lineitem")
    part = _t(sf_dir, "part").set_index("p_partkey")
    j = li.join(part, on="l_partkey")
    j["ru"] = _ru(j)
    out = (
        disjunctive_promo_revenue(spark, sf_dir)
        .toPandas()
        .set_index("branch")
    )
    # branches are disjoint on the part side (first-match CASE), and
    # every branch fires even at sf0.001 (brands chosen for that)
    assert sorted(out.index) == [1, 2, 3]
    seen_parts = set()
    for i, (b, slo, shi, qlo, qhi) in enumerate(_BRANCHES):
        pmask = (j.p_brand == b) & j.p_size.between(slo, shi)
        # exclude parts claimed by an earlier branch (CASE first-match)
        for bb, s2, h2, _, _ in _BRANCHES[:i]:
            pmask &= ~((j.p_brand == bb) & j.p_size.between(s2, h2))
        m = j[pmask & j.l_quantity.between(qlo, qhi)]
        r = out.loc[i + 1]
        assert r.n_lines == len(m)
        assert r.rev_units == int(m.ru.sum())
        assert abs(r.revenue - _r2(m.ru.sum() / 10000.0)) < 1e-9
        pk = set(m.l_partkey)
        assert not (pk & seen_parts)
        seen_parts |= pk


def test_shipmode_matches_pandas(spark, sf_dir):
    li = _t(sf_dir, "lineitem")
    o = _t(sf_dir, "orders").set_index("o_orderkey")
    j = li.join(o, on="l_orderkey")
    late = j[
        j.l_shipdate > j.o_orderdate + pd.Timedelta(days=_LATE_DAYS)
    ].copy()
    late["mode"] = late.l_returnflag + "-" + late.l_linestatus
    late["high"] = late.o_orderpriority.isin(["1-URGENT", "2-HIGH"]).astype(
        int
    )
    want = late.groupby("mode").agg(
        high_line_count=("high", "sum"),
        n_late=("high", "size"),
    )
    out = (
        shipmode_priority_counts(spark, sf_dir)
        .toPandas()
        .set_index("ship_mode")
    )
    assert set(out.index) == set(want.index)
    for mode, w in want.iterrows():
        r = out.loc[mode]
        assert r.high_line_count == w.high_line_count
        assert r.low_line_count == w.n_late - w.high_line_count
        assert r.n_late == w.n_late
    # all six proxy modes appear
    assert len(out) == 6
