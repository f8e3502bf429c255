"""R40 — TPC-H Q4 access-path shape: order-priority checking —
COUNT of orders per priority having AT LEAST ONE late lineitem (the
correlated EXISTS whose decorrelation is a LEFT SEMI join carrying a
cross-table predicate; distinct from R36's EXISTS+NOT-EXISTS pair and
R37's anti-join).  Lateness proxy (declared, the R36 precedent):
l_shipdate > o_orderdate + 45 days — the dataset has no commit/receipt
dates.

Plan: the date window filter pushes into the orders scan; the EXISTS
becomes ONE left-semi hash join orders ⋉ lineitem on the order key
with the lateness predicate as the join residual — the probe side
never duplicates (semi-join semantics give exactly-once per order,
which a plain inner join + distinct would have to re-deduplicate);
one map-side-combined priority count after.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_LATE = 45


@register(
    "order_priority_check",
    oracle=f"""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL {_LATE} DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def order_priority_check(spark, sf_dir):
    """R40: TPC-H Q4 shape (module header) — date window pushed into
    the scan, EXISTS as one LEFT SEMI join with the lateness residual,
    map-side-combined priority count."""
    o = T(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    sel = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.date_add(F.col("o_orderdate"), _LATE)
        ),
        "left_semi",
    )
    return sel.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("order_count")
    )
