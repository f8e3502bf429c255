"""R36/R37 — the two hardest TPC-H access-path shapes not yet in the
relational inventory: Q21 (correlated EXISTS + NOT EXISTS against the
same fact table) and Q22 (anti-join + decorrelated scalar-average
subquery).  The spec columns this dataset lacks (l_commitdate /
l_receiptdate, c_phone) are substituted with declared proxies —
lateness = shipped > 60 days after order date; grouping = nation —
keeping the ACCESS PATHS identical to the spec queries.

R36 ``late_sole_supplier`` (Q21 shape): suppliers who were the SOLE
late shipper on multi-supplier finalized orders —
EXISTS(another supplier in the order) AND NOT EXISTS(another LATE
supplier in the order).  Both quantifiers are decorrelated into
per-order aggregates over one scan of lineitem: n_supp = distinct
suppliers, n_late_supp = distinct late suppliers — a line wins iff
it is late AND n_supp > 1 AND n_late_supp = 1 (sole ⇒ it is the one).
One map-side-combined per-order aggregate replaces BOTH correlated
subqueries; the result joins orders (status filter pushed down) and
broadcast supplier/nation dims.

R37 ``idle_rich_customers`` (Q22 shape): per nation, customers with
above-average positive balance and NO orders — the global average is
ONE broadcast single-row aggregate (scalar subquery decorrelated),
no-orders is a LEFT ANTI join against the distinct-custkey projection
of orders (distinct first = map-side combined, so the anti-join probe
side is key-sized, not fact-sized).

Money sums round(2), the average spelled sum/count so both engines
share the float tree (the Q17 precedent).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_LATE_DAYS = 60


@register(
    "late_sole_supplier",
    oracle=f"""
    WITH li AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CASE WHEN l.l_shipdate > o.o_orderdate
                    + INTERVAL {_LATE_DAYS} DAY
                  THEN 1 ELSE 0 END AS is_late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
    ),
    per_order AS (
      SELECT l_orderkey,
             CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
             CAST(count(DISTINCT CASE WHEN is_late = 1
                    THEN l_suppkey END) AS BIGINT) AS n_late_supp
      FROM li GROUP BY l_orderkey
    ),
    winners AS (
      SELECT DISTINCT li.l_orderkey, li.l_suppkey
      FROM li JOIN per_order p ON p.l_orderkey = li.l_orderkey
      WHERE li.is_late = 1 AND p.n_supp > 1 AND p.n_late_supp = 1
    )
    SELECT s.s_name, n.n_name,
           CAST(count(*) AS BIGINT) AS numwait
    FROM winners w
    JOIN supplier s ON s.s_suppkey = w.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY s.s_name, n.n_name
    """,
)
def late_sole_supplier(spark, sf_dir):
    """R36: TPC-H Q21 shape (module header) — the EXISTS / NOT EXISTS
    pair decorrelated into ONE per-order distinct-supplier aggregate;
    status filter pushed into the orders scan; supplier + nation dims
    broadcast."""
    o = (
        T(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = (
        T(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            F.when(
                F.col("l_shipdate")
                > F.date_add(F.col("o_orderdate"), _LATE_DAYS),
                1,
            )
            .otherwise(0)
            .alias("is_late"),
        )
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").cast("long").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("is_late") == 1, F.col("l_suppkey"))
        )
        .cast("long")
        .alias("n_late_supp"),
    )
    winners = (
        li.where(F.col("is_late") == 1)
        .join(per_order, "l_orderkey")
        .where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    return (
        winners.join(
            F.broadcast(s),
            winners.l_suppkey == s.s_suppkey,
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name", "n_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


_IDLE_DAYS = 90


@register(
    "idle_rich_customers",
    oracle=f"""
    WITH avg_bal AS (
      SELECT sum(c_acctbal) / count(*) AS ab
      FROM customer WHERE c_acctbal > 0.0
    ),
    mx AS (SELECT max(o_orderdate) AS m FROM orders),
    recent AS (
      SELECT DISTINCT o_custkey FROM orders, mx
      WHERE o_orderdate > m - INTERVAL {_IDLE_DAYS} DAY
    )
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey, avg_bal
    WHERE c.c_acctbal > avg_bal.ab
      AND c.c_custkey NOT IN (SELECT o_custkey FROM recent)
    GROUP BY n.n_name
    """,
)
def idle_rich_customers(spark, sf_dir):
    """R37: TPC-H Q22 shape (module header) — every customer here has
    SOME order, so the spec's "no orders at all" is empty by
    construction; the declared proxy is "no orders in the final 90
    days of the date range", which keeps the anti-join genuinely
    selective (493 of 1 500 customers at sf0.01).  TWO decorrelated
    scalars (global avg balance as sum/count, global max order date)
    each a broadcast single-row aggregate; NOT-IN as a LEFT ANTI join
    against the distinct-recent-custkey projection (map-side-combined
    distinct first, so the probe side is key-sized); nation dim
    broadcast; money round(2)."""
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    o = T(spark, sf_dir, "orders")
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        (F.sum("c_acctbal") / F.count(F.lit(1))).alias("ab")
    )
    mx = o.agg(F.max("o_orderdate").alias("m"))
    recent = (
        o.crossJoin(F.broadcast(mx))
        .where(
            F.col("o_orderdate")
            > F.expr(f"m - INTERVAL {_IDLE_DAYS} DAY")
        )
        .select("o_custkey")
        .distinct()
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(
            recent,
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )
