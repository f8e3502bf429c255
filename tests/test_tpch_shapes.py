"""Semantic gates for tpch_q (R36 Q21-shape, R37 Q22-shape): full
pandas recomputes of both queries at sf0.001 plus the quantifier
semantics the shapes exist to exercise."""

import pandas as pd
import pytest

from dtaidistance_spark.operators.tpch_q import (
    _IDLE_DAYS,
    _LATE_DAYS,
    idle_rich_customers,
    late_sole_supplier,
)


@pytest.fixture(scope="module")
def tabs(sf_dir):
    return {
        t: pd.read_parquet(f"{sf_dir}/{t}.parquet")
        for t in ["lineitem", "orders", "customer", "supplier", "nation"]
    }


def test_late_sole_supplier_matches_pandas(spark, sf_dir, tabs):
    li, o = tabs["lineitem"], tabs["orders"]
    s, n = tabs["supplier"], tabs["nation"]
    m = li.merge(
        o[o.o_orderstatus == "F"][["o_orderkey", "o_orderdate"]],
        left_on="l_orderkey",
        right_on="o_orderkey",
    )
    m["is_late"] = m.l_shipdate > m.o_orderdate + pd.Timedelta(
        days=_LATE_DAYS
    )
    g = m.groupby("l_orderkey").agg(
        n_supp=("l_suppkey", "nunique"),
        n_late_supp=(
            "l_suppkey",
            lambda x: m.loc[x.index][m.loc[x.index].is_late][
                "l_suppkey"
            ].nunique(),
        ),
    )
    w = (
        m[m.is_late]
        .merge(g, on="l_orderkey")
        .query("n_supp > 1 and n_late_supp == 1")[
            ["l_orderkey", "l_suppkey"]
        ]
        .drop_duplicates()
    )
    want = (
        w.merge(s, left_on="l_suppkey", right_on="s_suppkey")
        .merge(n, left_on="s_nationkey", right_on="n_nationkey")
        .groupby(["s_name", "n_name"])
        .size()
        .reset_index(name="numwait")
    )
    got = late_sole_supplier(spark, sf_dir).toPandas()
    gm = got.set_index(["s_name", "n_name"])["numwait"].to_dict()
    wm = want.set_index(["s_name", "n_name"])["numwait"].to_dict()
    assert gm == wm
    # sole-late semantics: every winner order has EXACTLY one late supplier
    assert (got["numwait"] >= 1).all()


def test_idle_rich_customers_matches_pandas(spark, sf_dir, tabs):
    c, o, n = tabs["customer"], tabs["orders"], tabs["nation"]
    ab = c[c.c_acctbal > 0].c_acctbal.sum() / (c.c_acctbal > 0).sum()
    cutoff = o.o_orderdate.max() - pd.Timedelta(days=_IDLE_DAYS)
    recent = set(o[o.o_orderdate > cutoff].o_custkey)
    sel = c[(c.c_acctbal > ab) & (~c.c_custkey.isin(recent))]
    want = (
        sel.merge(n, left_on="c_nationkey", right_on="n_nationkey")
        .groupby("n_name")
        .agg(
            numcust=("c_custkey", "size"),
            totacctbal=("c_acctbal", "sum"),
        )
        .reset_index()
    )
    got = idle_rich_customers(spark, sf_dir).toPandas()
    assert len(got) == len(want) > 0
    gm = got.set_index("n_name")
    for r in want.itertuples():
        g = gm.loc[r.n_name]
        assert g.numcust == r.numcust
        assert g.totacctbal == pytest.approx(
            round(r.totacctbal, 2), abs=0.02
        )


def test_order_priority_check_matches_pandas(spark, sf_dir, tabs):
    from dtaidistance_spark.operators.tpch4_q import (
        _LATE,
        order_priority_check,
    )

    o, li = tabs["orders"], tabs["lineitem"]
    o = o[
        (o.o_orderdate >= pd.Timestamp("1996-01-01"))
        & (o.o_orderdate < pd.Timestamp("1997-01-01"))
    ]
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    late_keys = set(
        m[m.l_shipdate > m.o_orderdate + pd.Timedelta(days=_LATE)]
        .o_orderkey
    )
    want = (
        o[o.o_orderkey.isin(late_keys)]
        .groupby("o_orderpriority")
        .size()
        .to_dict()
    )
    got = {
        r.o_orderpriority: r.order_count
        for r in order_priority_check(spark, sf_dir)
        .toPandas()
        .itertuples()
    }
    assert got == want and sum(got.values()) > 0


def test_cust_order_distribution_matches_pandas(spark, sf_dir, tabs):
    from dtaidistance_spark.operators.custdist_q import (
        cust_order_distribution,
    )

    c, o = tabs["customer"], tabs["orders"]
    keep = o[~o.o_orderpriority.str.startswith("1-")]
    per = keep.groupby("o_custkey").size()
    counts = c.c_custkey.map(per).fillna(0).astype(int)
    want = counts.value_counts().to_dict()
    got = {
        r.c_count: r.custdist
        for r in cust_order_distribution(spark, sf_dir)
        .toPandas()
        .itertuples()
    }
    assert got == want
    assert sum(got.values()) == len(c)
    # the Q13 essence — zero-order customers land in the 0 bucket —
    # exercised on a constructed mini-case (at this SF every customer
    # has orders, so the parquet run can't show it)
    cdf = spark.createDataFrame([(1,), (2,), (3,)], ["c_custkey"])
    odf = spark.createDataFrame(
        [(10, 1, "2-HIGH"), (11, 1, "3-MEDIUM"), (12, 2, "1-URGENT")],
        ["o_orderkey", "o_custkey", "o_orderpriority"],
    )
    from pyspark.sql import functions as F

    per = (
        odf.where(~F.col("o_orderpriority").like("1-%"))
        .groupBy("o_custkey")
        .agg(F.count("o_orderkey").alias("cnt"))
    )
    mini = (
        cdf.join(per, cdf.c_custkey == per.o_custkey, "left")
        .select(F.coalesce("cnt", F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .count()
    )
    dist = {r.c_count: r["count"] for r in mini.collect()}
    # cust 1 -> 2 kept orders; cust 2 -> only an urgent order (filtered
    # in the ON clause, so it still appears, at 0); cust 3 -> no orders
    assert dist == {2: 1, 0: 2}


def test_nation_market_share_matches_pandas(spark, sf_dir, tabs):
    from dtaidistance_spark.operators.tpch8_q import (
        _NATION,
        _PTYPE,
        _REGION,
        nation_market_share,
    )

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    o, c = tabs["orders"], tabs["customer"]
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")
    r = pd.read_parquet(f"{sf_dir}/region.parquet")
    p = pd.read_parquet(f"{sf_dir}/part.parquet")
    s = pd.read_parquet(f"{sf_dir}/supplier.parquet")
    o = o[
        (o.o_orderdate >= pd.Timestamp("1996-01-01"))
        & (o.o_orderdate < pd.Timestamp("1998-01-01"))
    ]
    rk = r.loc[r.r_name == _REGION, "r_regionkey"].iloc[0]
    cust_keys = set(
        c.merge(n, left_on="c_nationkey", right_on="n_nationkey")
        .loc[lambda d: d.n_regionkey == rk, "c_custkey"]
    )
    part_keys = set(p.loc[p.p_type == _PTYPE, "p_partkey"])
    sup_nat = s.merge(
        n, left_on="s_nationkey", right_on="n_nationkey"
    ).set_index("s_suppkey")["n_name"]
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    m = m[m.o_custkey.isin(cust_keys) & m.l_partkey.isin(part_keys)]
    m["volume"] = m.l_extendedprice * (1 - m.l_discount)
    m["supp_nation"] = m.l_suppkey.map(sup_nat)
    m["o_year"] = m.o_orderdate.dt.year
    got = {
        row.o_year: row
        for row in nation_market_share(spark, sf_dir)
        .toPandas()
        .itertuples()
    }
    want = m.groupby("o_year").apply(
        lambda g: (
            g.loc[g.supp_nation == _NATION, "volume"].sum(),
            g.volume.sum(),
        ),
        include_groups=False,
    )
    assert set(got) == set(want.index)
    assert len(got) == 2  # 1996, 1997
    for yr, (nv, tv) in want.items():
        g = got[yr]
        assert g.nation_volume == pytest.approx(round(nv, 2), abs=0.02)
        assert g.total_volume == pytest.approx(round(tv, 2), abs=0.02)
        assert g.mkt_share == pytest.approx(round(nv / tv, 4), abs=2e-4)
        assert 0.0 < g.mkt_share < 1.0
