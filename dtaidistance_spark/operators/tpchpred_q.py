"""R49/R50 — the two TPC-H PREDICATE shapes still missing from the
relational inventory (the access-path shapes are now complete:
Q1/Q2/Q4/Q5/Q7/Q8/Q13/Q15/Q17/Q18/Q21/Q22):

R49 ``disjunctive_promo_revenue`` (Q19 shape): an OR of three
conjunctive (brand, size-range, quantity-range) branches spanning
BOTH join sides — the classic disjunctive-pushdown stress test.  The
scale plan makes the pushdown explicit rather than hoping: the part
side is prefiltered to the UNION of the three (brand, size) branch
predicates and BROADCAST with a branch tag, so the fact scan joins a
dim that is already branch-pruned, and only the lineitem-side
quantity condition for the tagged branch evaluates post-join.
Grouped by branch so each conjunct's contribution is auditable.
Exact int64 cent-percent revenue units (the R46 convention),
round-2 dollars.

R50 ``shipmode_priority_counts`` (Q12 shape): the
conditional-count-after-join pivot — per ship mode, how many lines
belong to high-priority orders vs not, restricted to LATE lines.
The dataset has no l_shipmode / commit dates, so the DECLARED
proxies are mode = l_returnflag ∥ '-' ∥ l_linestatus (six values)
and late = shipped > 60 days after order date (the R36 lateness
proxy).  Plan: priority flags are computed as codegen CASE
expressions on the orders side BEFORE the join (map-side), the join
is the one fact-sized operation, then ONE aggregate with both
conditional sums — the Q12 anti-pattern (a second pass per
priority class) never appears.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_REV_UNITS_SQL = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
)

# (brand, size_lo, size_hi, qty_lo, qty_hi) — three Q19-style branches
_BRANCHES = [
    ("Brand#12", 1, 15, 1, 15),
    ("Brand#23", 10, 30, 10, 25),
    ("Brand#9", 20, 50, 20, 35),
]


def _branch_case(eng: str) -> str:
    # branch tag on the part side: which (brand, size) conjunct matched
    whens = " ".join(
        f"WHEN p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi}"
        f" THEN {i + 1}"
        for i, (b, slo, shi, _, _) in enumerate(_BRANCHES)
    )
    return f"CASE {whens} ELSE 0 END"


@register(
    "disjunctive_promo_revenue",
    oracle=f"""
    WITH p AS (
      SELECT p_partkey, {_branch_case("duck")} AS branch
      FROM part
      WHERE {_branch_case("duck")} > 0
    ),
    j AS (
      SELECT p.branch, l.l_quantity,
             {_REV_UNITS_SQL} AS ru
      FROM lineitem l JOIN p ON p.p_partkey = l.l_partkey
    ),
    k AS (
      SELECT branch, ru FROM j
      WHERE {" OR ".join(
        f"(branch = {i + 1} AND l_quantity BETWEEN {qlo} AND {qhi})"
        for i, (_, _, _, qlo, qhi) in enumerate(_BRANCHES))}
    )
    SELECT branch, CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(ru) AS BIGINT) AS rev_units,
           round(CAST(sum(ru) AS DOUBLE) / 10000.0, 2) AS revenue
    FROM k GROUP BY branch
    """,
)
def disjunctive_promo_revenue(spark, sf_dir):
    """R49 (TPC-H Q19 shape): OR-of-conjuncts spanning both join
    sides — part prefiltered to the branch UNION and broadcast with
    a branch tag; per-branch quantity ranges evaluate post-join;
    grouped by branch for auditability."""
    part = (
        T(spark, sf_dir, "part")
        .withColumn("branch", F.expr(_branch_case("spark")))
        .where(F.col("branch") > 0)
        .select("p_partkey", "branch")
    )
    li = T(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    cond = " OR ".join(
        f"(branch = {i + 1} AND l_quantity BETWEEN {qlo} AND {qhi})"
        for i, (_, _, _, qlo, qhi) in enumerate(_BRANCHES)
    )
    return (
        j.where(F.expr(cond))
        .groupBy("branch")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.expr(_REV_UNITS_SQL)).cast("long").alias("rev_units"),
            F.round(
                F.sum(F.expr(_REV_UNITS_SQL)).cast("double") / 10000.0, 2
            ).alias("revenue"),
        )
    )


_LATE_DAYS = 60
_HIGH = "o_orderpriority IN ('1-URGENT', '2-HIGH')"


@register(
    "shipmode_priority_counts",
    oracle=f"""
    SELECT (l.l_returnflag || '-' || l.l_linestatus) AS ship_mode,
           CAST(sum(CASE WHEN {_HIGH.replace("o_", "o.o_")}
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN {_HIGH.replace("o_", "o.o_")}
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count,
           CAST(count(*) AS BIGINT) AS n_late
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL {_LATE_DAYS} DAY
    GROUP BY 1
    """,
)
def shipmode_priority_counts(spark, sf_dir):
    """R50 (TPC-H Q12 shape): conditional priority counts per ship
    mode over LATE lines (proxies declared in the module header) —
    the high/low flags are ONE aggregate's conditional sums, never a
    second pass; the priority flag is computed map-side on orders
    before the join."""
    o = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        F.expr(f"CASE WHEN {_HIGH} THEN 1 ELSE 0 END").alias("is_high"),
    )
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_shipdate",
        F.expr("l_returnflag || '-' || l_linestatus").alias("ship_mode"),
    )
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(
            F.col("l_shipdate")
            > F.expr(f"o_orderdate + INTERVAL {_LATE_DAYS} DAY")
        )
        .groupBy("ship_mode")
        .agg(
            F.sum("is_high").cast("long").alias("high_line_count"),
            F.sum(1 - F.col("is_high")).cast("long").alias("low_line_count"),
            F.count(F.lit(1)).cast("long").alias("n_late"),
        )
    )
