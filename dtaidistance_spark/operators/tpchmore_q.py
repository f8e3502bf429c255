"""R45–R48 — the four remaining classic TPC-H access-path shapes
missing from the relational inventory (the registry already carries
Q1 scan-agg, Q4 EXISTS, Q5 join-agg, Q8 two-role dimension, Q13
left-join distribution, Q17 decorrelated scalar-avg, Q21 double
quantifier, Q22 anti-join):

R45 ``large_volume_customers`` (Q18 shape): HAVING on a fact-table
aggregate, then join the SURVIVORS back to the dimension chain — the
aggregate runs map-side-combined over lineitem FIRST, the >300
filter cuts ~0.3% of orders, and only that tiny winner set joins
orders/customer (both joins broadcast the winner side / dim side).
The anti-pattern this shape exists to catch — joining first and
aggregating the wide rows after — never materializes.

R46 ``top_revenue_supplier`` (Q15 shape): a view-aggregate topped by
a scalar-max equality (RETURNING TIES, which ``orderBy().limit(1)``
would drop).  Revenue is cleared to EXACT INT64 "cent-percent" units
(price cents × (100 − discount percent) — both factors integral in
this corpus, gated in pytest) so the max-equality join is exact in
both engines; a float revenue max-join would be engine-dependent.
The max crosses as a broadcast single-row join.

R47 ``min_cost_supplier`` (Q2 shape): the correlated
min-cost-per-part subquery, decorrelated.  The dataset has no
partsupp table, so the DECLARED proxy is ps_supplycost(part, supp) =
min line price cents for that (part, supp) pair in lineitem; the
spec's access path — per-part min over the ps relation, equality
join back to find the achieving suppliers, then broadcast dims —
is preserved exactly.

R48 ``two_nation_volume`` (Q7 shape): the two-role nation join with
a symmetric pair predicate — (supp_nation, cust_nation) ∈
{(13,19),(19,13)} — grouped by both nations and ship year.  Nation
keys filter BEFORE the join (pushed into the supplier/customer dim
scans), the dims broadcast onto the lineitem stream, and orders is
the one sizable join AQE handles.

Exactness: quantities are integral (cast long), prices cent-valued,
discounts percent-valued (all gated in tests/test_tpchmore.py), so
every aggregate here is INT64 until the final round-2 dollar
projection.  At true 100 TB scale the cent-percent unit sums would
need DECIMAL(38,0) headroom (int64 overflows past ~10^9 rows of max
price; declared).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

# exact int64 revenue in cent-percent units: cents * (100 - disc_pct)
_REV_UNITS_SQL = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
)

_QTY_THRESHOLD = 300


@register(
    "large_volume_customers",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS BIGINT)) > {_QTY_THRESHOLD}
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
           round(o.o_totalprice, 2) AS o_totalprice,
           b.sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def large_volume_customers(spark, sf_dir):
    """R45 (TPC-H Q18 shape): aggregate-HAVING-then-join — the
    per-order quantity sum runs map-side-combined over lineitem
    first; only the ~0.3% of orders above the threshold join back
    to orders/customer (winner side broadcast)."""
    li = T(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .where(F.col("sum_qty") > _QTY_THRESHOLD)
    )
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    return (
        F.broadcast(big)
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(c.select("c_custkey", "c_name")),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "sum_qty",
        )
    )


_Q15_LO = "1996-01-01"
_Q15_HI = "1996-04-01"


@register(
    "top_revenue_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(sum({_REV_UNITS_SQL}) AS BIGINT) AS rev_units
      FROM lineitem
      WHERE l_shipdate >= DATE '{_Q15_LO}' AND l_shipdate < DATE '{_Q15_HI}'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.rev_units,
           round(CAST(r.rev_units AS DOUBLE) / 10000.0, 2) AS total_revenue
    FROM rev r
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.rev_units = (SELECT max(rev_units) FROM rev)
    """,
)
def top_revenue_supplier(spark, sf_dir):
    """R46 (TPC-H Q15 shape): max-over-view WITH TIES — per-supplier
    exact int64 cent-percent revenue over the 1996Q1 ship window,
    a broadcast single-row max, and an equality filter (exact because
    the units are integers; ties survive, unlike limit(1))."""
    li = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit(_Q15_LO))
        & (F.col("l_shipdate") < F.lit(_Q15_HI))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.expr(_REV_UNITS_SQL)).cast("long").alias("rev_units")
    )
    mx = rev.agg(F.max("rev_units").alias("max_units"))
    s = T(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx))
        .where(F.col("rev_units") == F.col("max_units"))
        .join(
            F.broadcast(s.select("s_suppkey", "s_name")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            "rev_units",
            F.round(F.col("rev_units").cast("double") / 10000.0, 2).alias(
                "total_revenue"
            ),
        )
    )


@register(
    "min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             CAST(min(CAST(round(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cost_cents
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    pmin AS (
      SELECT l_partkey, CAST(min(cost_cents) AS BIGINT) AS min_cost_cents
      FROM ps GROUP BY l_partkey
    )
    SELECT ps.l_partkey AS p_partkey, pm.min_cost_cents,
           s.s_suppkey, s.s_name, n.n_name
    FROM ps
    JOIN pmin pm ON pm.l_partkey = ps.l_partkey
               AND ps.cost_cents = pm.min_cost_cents
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    """,
)
def min_cost_supplier(spark, sf_dir):
    """R47 (TPC-H Q2 shape): correlated per-part min decorrelated —
    the partsupp proxy (min line price cents per (part, supp)) is one
    map-side-combined aggregate, the per-part min a second, and the
    achieving suppliers come back by exact int64 equality join; dims
    broadcast.  Ties (several suppliers at the min) all survive, as
    in the spec query."""
    li = T(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
        .cast("long")
        .alias("cost_cents")
    )
    pmin = (
        ps.groupBy("l_partkey")
        .agg(F.min("cost_cents").cast("long").alias("min_cost_cents"))
        .withColumnRenamed("l_partkey", "pm_partkey")
    )
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    return (
        ps.join(
            pmin,
            (F.col("l_partkey") == F.col("pm_partkey"))
            & (F.col("cost_cents") == F.col("min_cost_cents")),
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "min_cost_cents",
            "l_suppkey",
        )
        .join(
            F.broadcast(s.select("s_suppkey", "s_name", "s_nationkey")),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(
            F.broadcast(
                n.select("n_nationkey", "n_name")
            ),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .select("p_partkey", "min_cost_cents", "s_suppkey", "s_name", "n_name")
    )


_N1, _N2 = 13, 19  # both directions non-empty even at sf0.001 (gated)


@register(
    "two_nation_volume",
    oracle=f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum({_REV_UNITS_SQL}) AS BIGINT) AS rev_units,
           round(CAST(sum({_REV_UNITS_SQL}) AS DOUBLE) / 10000.0, 2)
             AS volume
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    WHERE (s.s_nationkey = {_N1} AND c.c_nationkey = {_N2})
       OR (s.s_nationkey = {_N2} AND c.c_nationkey = {_N1})
    GROUP BY 1, 2, 3
    """,
)
def two_nation_volume(spark, sf_dir):
    """R48 (TPC-H Q7 shape): symmetric two-nation pair predicate with
    nation in two roles — supplier and customer dims pre-filtered to
    the two nations BEFORE joining (pushdown), both broadcast onto
    lineitem; orders is the one sizable join.  Exact int64
    cent-percent revenue, round-2 dollar projection."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    c = (
        T(spark, sf_dir, "customer")
        .where(F.col("c_nationkey").isin(_N1, _N2))
        .select("c_custkey", "c_nationkey")
    )
    s = (
        T(spark, sf_dir, "supplier")
        .where(F.col("s_nationkey").isin(_N1, _N2))
        .select("s_suppkey", "s_nationkey")
    )
    joined = (
        li.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .where(
            (
                (F.col("s_nationkey") == _N1)
                & (F.col("c_nationkey") == _N2)
            )
            | (
                (F.col("s_nationkey") == _N2)
                & (F.col("c_nationkey") == _N1)
            )
        )
        .join(
            F.broadcast(n.withColumnRenamed("n_name", "supp_nation")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .drop("n_nationkey")
        .join(
            F.broadcast(n.withColumnRenamed("n_name", "cust_nation")),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("long").alias("l_year"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.expr(_REV_UNITS_SQL)).cast("long").alias("rev_units"),
        F.round(
            F.sum(F.expr(_REV_UNITS_SQL)).cast("double") / 10000.0, 2
        ).alias("volume"),
    )
