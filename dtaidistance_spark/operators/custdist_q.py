"""R41 — customer order-count distribution (the TPC-H Q13 shape):
LEFT OUTER join with an ON-clause predicate + TWO stacked
aggregations — the one classic TPC-H plan shape the relational
registry was missing (Q1 scan-agg, Q4 EXISTS, Q5 join-agg, Q22
anti-join, grouping sets / cube already present).  Zero-order
customers MUST appear in the c_count = 0 bucket — the part naive
inner-join rewrites get wrong.

The predicate stands in for Q13's ``o_comment NOT LIKE
'%special%requests%'`` (the synthetic orders table carries no comment
column): non-urgent orders only, ``o_orderpriority NOT LIKE '1-%'``.

Scale shape: the Spark plan AGGREGATES ORDERS FIRST — counts per
custkey with map-side combine — and LEFT-joins customer to the
(much smaller) per-customer counts, so the join input shrinks from
|orders| rows to |customers-with-orders| rows before any wide row is
shuffled; coalesce(cnt, 0) restores the zero bucket.  The final
histogram GROUP BY c_count is a second map-side-combined aggregate
over |customers| rows.  The oracle states the textbook
LEFT-JOIN-then-count form; both reduce to the same distribution.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register


@register(
    "cust_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey,
             count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority NOT LIKE '1-%'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def cust_order_distribution(spark, sf_dir):
    """R41: TPC-H Q13 shape (module header) — orders pre-aggregated
    per custkey before the LEFT join (map-side combine shrinks the
    join input), coalesce(cnt, 0) keeps the zero-order bucket."""
    cust = T(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        T(spark, sf_dir, "orders")
        .where(~F.col("o_orderpriority").like("1-%"))
        .groupBy("o_custkey")
        .agg(F.count("o_orderkey").alias("cnt"))
    )
    counts = cust.join(
        per_cust, cust.c_custkey == per_cust.o_custkey, "left"
    ).select(F.coalesce("cnt", F.lit(0)).alias("c_count"))
    return counts.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )
