"""Semantic gates for tpchmore_q (R45–R48): full pandas recomputes of
all four TPC-H shapes from the raw parquet, the exactness premises
(integral quantities, cent prices, percent discounts), tie survival
in the Q15/Q2 equality joins, and Q7's both-directions coverage."""

import math

import pandas as pd

from dtaidistance_spark.operators.tpchmore_q import (
    _N1,
    _N2,
    _QTY_THRESHOLD,
    large_volume_customers,
    min_cost_supplier,
    top_revenue_supplier,
    two_nation_volume,
)


def _t(sf_dir, name):
    return pd.read_parquet(f"{sf_dir}/{name}.parquet")


def _r2(v):
    # HALF_UP to 2 places — Spark/DuckDB round(), not Python banker's
    return math.floor(v * 100 + 0.5) / 100


def test_exactness_premises(sf_dir):
    li = _t(sf_dir, "lineitem")
    assert (li.l_quantity == li.l_quantity.round()).all()
    assert ((li.l_extendedprice * 100).round() - li.l_extendedprice * 100).abs().max() < 1e-6
    assert ((li.l_discount * 100).round() - li.l_discount * 100).abs().max() < 1e-6


def _rev_units(li):
    return (li.l_extendedprice * 100).round().astype("int64") * (
        100 - (li.l_discount * 100).round().astype("int64")
    )


def test_large_volume_customers(spark, sf_dir):
    li, o, c = (_t(sf_dir, t) for t in ("lineitem", "orders", "customer"))
    sums = li.groupby("l_orderkey").l_quantity.sum().astype("int64")
    winners = sums[sums > _QTY_THRESHOLD]
    out = large_volume_customers(spark, sf_dir).toPandas()
    assert len(out) == len(winners) > 0
    out = out.set_index("o_orderkey")
    omap = o.set_index("o_orderkey")
    cmap = c.set_index("c_custkey")
    for ok, q in winners.items():
        row = out.loc[ok]
        assert row.sum_qty == q
        assert row.c_custkey == omap.loc[ok].o_custkey
        assert row.c_name == cmap.loc[omap.loc[ok].o_custkey].c_name
        assert abs(row.o_totalprice - _r2(omap.loc[ok].o_totalprice)) < 1e-9


def test_top_revenue_supplier(spark, sf_dir):
    li = _t(sf_dir, "lineitem")
    win = li[(li.l_shipdate >= "1996-01-01") & (li.l_shipdate < "1996-04-01")].copy()
    win["ru"] = _rev_units(win)
    rev = win.groupby("l_suppkey").ru.sum()
    mx = rev.max()
    ties = rev[rev == mx]
    out = top_revenue_supplier(spark, sf_dir).toPandas()
    # every supplier at the exact max survives (WITH TIES semantics)
    assert sorted(out.s_suppkey) == sorted(ties.index)
    assert (out.rev_units == mx).all()
    assert abs(out.total_revenue.iloc[0] - _r2(mx / 10000.0)) < 1e-9


def test_min_cost_supplier(spark, sf_dir):
    li, s, n = (_t(sf_dir, t) for t in ("lineitem", "supplier", "nation"))
    li = li.copy()
    li["cents"] = (li.l_extendedprice * 100).round().astype("int64")
    ps = li.groupby(["l_partkey", "l_suppkey"]).cents.min()
    pmin = ps.groupby(level=0).min()
    want = {
        (pk, sk)
        for (pk, sk), cost in ps.items()
        if cost == pmin.loc[pk]
    }
    out = min_cost_supplier(spark, sf_dir).toPandas()
    got = set(zip(out.p_partkey, out.s_suppkey))
    assert got == want
    # every part appears at least once; min cost matches
    assert set(out.p_partkey) == set(pmin.index)
    smap = s.set_index("s_suppkey")
    nmap = n.set_index("n_nationkey").n_name
    for _, r in out.head(50).iterrows():
        assert r.min_cost_cents == pmin.loc[r.p_partkey]
        assert r.s_name == smap.loc[r.s_suppkey].s_name
        assert r.n_name == nmap.loc[smap.loc[r.s_suppkey].s_nationkey]


def test_two_nation_volume(spark, sf_dir):
    li, o, c, s = (
        _t(sf_dir, t) for t in ("lineitem", "orders", "customer", "supplier")
    )
    j = (
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(s, left_on="l_suppkey", right_on="s_suppkey")
    )
    j = j[
        ((j.s_nationkey == _N1) & (j.c_nationkey == _N2))
        | ((j.s_nationkey == _N2) & (j.c_nationkey == _N1))
    ].copy()
    j["ru"] = _rev_units(j)
    j["l_year"] = j.l_shipdate.dt.year
    want = (
        j.groupby(["s_nationkey", "c_nationkey", "l_year"])
        .agg(n_lines=("ru", "size"), rev_units=("ru", "sum"))
        .reset_index()
    )
    out = two_nation_volume(spark, sf_dir).toPandas()
    assert len(out) == len(want) > 0
    # both directions present (the pair was chosen so even sf0.001 has both)
    dirs = set(zip(out.supp_nation, out.cust_nation))
    assert (f"NATION_{_N1}", f"NATION_{_N2}") in dirs
    assert (f"NATION_{_N2}", f"NATION_{_N1}") in dirs
    nn = lambda k: f"NATION_{k}"  # noqa: E731
    got = out.set_index(["supp_nation", "cust_nation", "l_year"])
    for _, w in want.iterrows():
        r = got.loc[(nn(w.s_nationkey), nn(w.c_nationkey), w.l_year)]
        assert r.n_lines == w.n_lines
        assert r.rev_units == w.rev_units
        assert abs(r.volume - _r2(w.rev_units / 10000.0)) < 1e-9
