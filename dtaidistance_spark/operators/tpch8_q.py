"""R44 — national market share (the TPC-H Q8 shape): the LARGEST join
tree in the relational registry — lineitem ⋈ orders ⋈ customer ⋈
part ⋈ supplier, with NATION playing TWO DIFFERENT ROLES (the
customer's nation places the order in the region; the supplier's
nation is the one whose market share we measure) — the query shape
that exercises join reordering, multi-broadcast, and the
conditional-aggregate ratio.

Semantics (Q8 with this schema's columns): over 'PROMO'-type parts
ordered 1996–1997 by customers in region 'ASIA', per order year:
share = Σ volume from NATION_12 suppliers / Σ volume, with
volume = l_extendedprice·(1 − l_discount).

Scale shape: every dimension side (part filtered to one type,
supplier+nation, customer+nation+region) BROADCASTS onto the lineitem
stream; orders join on orderkey (the one potentially-large side —
AQE picks broadcast at this SF and a shuffle join at 100×); ONE final
aggregate on year.  The ratio is a conditional-sum-over-sum in the
same aggregate — no second pass, no self-join.

Floats: volume sums rounded(2) and the share rounded(4) in BOTH
engines (the established money-sum convention).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_REGION = "ASIA"
_NATION = "NATION_12"
_PTYPE = "PROMO"


@register(
    "nation_market_share",
    oracle=f"""
    WITH vol AS (
      SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
      JOIN region r   ON cn.n_regionkey = r.r_regionkey
      JOIN part p     ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
      WHERE r.r_name = '{_REGION}'
        AND p.p_type = '{_PTYPE}'
        AND o.o_orderdate >= DATE '1996-01-01'
        AND o.o_orderdate < DATE '1998-01-01'
    )
    SELECT CAST(o_year AS BIGINT) AS o_year,
           round(sum(CASE WHEN supp_nation = '{_NATION}'
                          THEN volume ELSE 0 END), 2) AS nation_volume,
           round(sum(volume), 2) AS total_volume,
           round(sum(CASE WHEN supp_nation = '{_NATION}'
                          THEN volume ELSE 0 END) / sum(volume), 4)
             AS mkt_share
    FROM vol GROUP BY o_year
    """,
)
def nation_market_share(spark, sf_dir):
    """R44: TPC-H Q8 market-share shape (module header) — all
    dimension sides broadcast onto lineitem, nation joined in two
    roles, conditional-sum ratio in ONE aggregate."""
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "volume"
        ),
    )
    o = T(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year"))
    cn = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("cn_region"),
    )
    reg = T(spark, sf_dir, "region").where(
        F.col("r_name") == _REGION
    ).select("r_regionkey")
    cust = (
        T(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(reg), F.col("cn_region") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    part = T(spark, sf_dir, "part").where(
        F.col("p_type") == _PTYPE
    ).select("p_partkey")
    sn = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    supp = (
        T(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .select("s_suppkey", "supp_nation")
    )
    vol = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .select("o_year", "volume", "supp_nation")
    )
    nat_vol = F.sum(
        F.when(F.col("supp_nation") == _NATION, F.col("volume")).otherwise(
            0.0
        )
    )
    return vol.groupBy("o_year").agg(
        F.round(nat_vol, 2).alias("nation_volume"),
        F.round(F.sum("volume"), 2).alias("total_volume"),
        F.round(nat_vol / F.sum("volume"), 4).alias("mkt_share"),
    ).select(
        F.col("o_year").cast("long").alias("o_year"),
        "nation_volume",
        "total_volume",
        "mkt_share",
    )
