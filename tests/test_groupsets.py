"""Semantic gates for groupsets_q (R39 grouping sets, TS50 Markov
entropy rate)."""

import math

import numpy as np
import pandas as pd
import pytest

from dtaidistance_spark.operators.groupsets_q import (
    markov_entropy_rate,
    revenue_grouping_sets,
)

f6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731


def test_grouping_sets_matches_pandas(spark, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
        n, left_on="c_nationkey", right_on="n_nationkey"
    )
    j["yr"] = pd.DatetimeIndex(j.o_orderdate).year
    out = revenue_grouping_sets(spark, sf_dir).toPandas()
    # gid 0 = (nation, yr); 1 = (nation); 2 = (yr); 3 = ()
    g0 = j.groupby(["n_name", "yr"]).o_totalprice.agg(["size", "sum"])
    sub = out[out.gid == 0]
    assert len(sub) == len(g0)
    for (nat, yr), row in g0.iterrows():
        m = sub[(sub.nation == nat) & (sub.yr == yr)]
        assert len(m) == 1
        assert int(m.n_orders.iloc[0]) == row["size"]
        assert m.revenue.iloc[0] == pytest.approx(
            round(row["sum"], 2), abs=0.02
        )
    g1 = j.groupby("n_name").o_totalprice.size()
    sub1 = out[out.gid == 1]
    assert len(sub1) == len(g1) and sub1.yr.isna().all()
    g2 = j.groupby("yr").o_totalprice.size()
    sub2 = out[out.gid == 2]
    assert len(sub2) == len(g2) and sub2.nation.isna().all()
    sub3 = out[out.gid == 3]
    assert len(sub3) == 1
    assert int(sub3.n_orders.iloc[0]) == len(j)
    assert len(out) == len(g0) + len(g1) + len(g2) + 1


def test_entropy_rate_matches_numpy(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["tu"] = ev.ts.astype("int64")  # us resolution
    ev = ev.sort_values(["user_id", "tu", "event_id"])
    trans = {}
    for _, g in ev.groupby("user_id"):
        ets = g.event_type.tolist()
        for a, b in zip(ets, ets[1:]):
            trans[(a, b)] = trans.get((a, b), 0) + 1
    out = markov_entropy_rate(spark, sf_dir).toPandas().set_index("src")
    srcs = sorted({a for a, _ in trans})
    n_total = sum(trans.values())
    rate = 0.0
    for s in srcs:
        cs = sum(c for (a, _), c in trans.items() if a == s)
        h = -sum(
            (c / cs) * math.log(c / cs)
            for (a, _), c in sorted(trans.items())
            if a == s
        )
        got = out.loc[s]
        assert got.cs == cs
        assert got.h_state == pytest.approx(f6(h), abs=2e-6)
        assert got.n_total == n_total
        rate += (cs / n_total) * h
    assert (out["entropy_rate"] == out["entropy_rate"].iloc[0]).all()
    assert out["entropy_rate"].iloc[0] == pytest.approx(
        f6(rate), abs=2e-6
    )
    # rate is a convex combination of state entropies
    assert (
        out["h_state"].min() - 1e-9
        <= out["entropy_rate"].iloc[0]
        <= out["h_state"].max() + 1e-9
    )
