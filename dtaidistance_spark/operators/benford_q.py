"""T78 — Benford first-significant-digit audit over order totals
(Newcomb Am.J.Math 1881 / Benford Proc.APS'38; Nigrini's forensic
screen): does the leading digit of o_totalprice follow
P(d) = log₁₀(1 + 1/d)?  The standard data-forensics / synthetic-data
smell test a pipeline runs over any money-like column — naturally
grown multi-scale amounts follow Benford; clipped, uniform, or
fabricated ones don't.

First digit is EXACT: the leading character of the integer cent value
(cents ≥ 101370 here, so no leading-zero hazard — gated).  One
map-side-combined aggregate produces the nine conditional counts as
COLUMNS of a single row (not nine rows), so the χ² sum is an explicit
order-pinned chain c₁→c₉ — no engine-dependent SUM() accumulation
order anywhere.  Expected counts n·log₁₀(1+1/d) share the identical
float tree in both engines; χ² vs the tabulated χ²₀.₉₅(8) = 15.50731
literal; floor-1e6.

Honest (gated) reading: the synthetic order totals are a bounded
uniform-ish mix over [1013.70, 499978.59] — digits 1–4 nearly equal,
5–9 starved (the [1e5, 5e5) decade stops at 4!) — emphatically NOT
Benford, and χ² rejects by orders of magnitude.  The positive control
(first digits of 2^k, equidistributed by Weyl ⇒ Benford) accepts in
pytest.

Scale shape: one scan, ONE aggregate, a single row out — zero
exchanges beyond the 1-row reduce at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_CHI_CRIT_8 = "15.50731305586545"  # chi2_{0.95}(8)

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

def _digit(eng: str) -> str:
    # string type name is the one engine-syntax difference
    st = "STRING" if eng == "spark" else "VARCHAR"
    return (
        "CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)"
        f" AS {st}), 1, 1) AS BIGINT)"
    )


def _counts(eng: str) -> str:
    return ", ".join(
        f"CAST(sum(CASE WHEN {_digit(eng)} = {d} THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS o{d}"
        for d in range(1, 10)
    )


def _e(d: int) -> str:
    # CAST(... AS DOUBLE) literals: Spark parses bare 1.0 as DECIMAL,
    # and decimal 1.0/9.0 truncates — the engines would diverge
    return (
        f"(CAST(n AS DOUBLE) * log10(CAST(1 AS DOUBLE)"
        f" + CAST(1 AS DOUBLE) / CAST({d} AS DOUBLE)))"
    )


def _term(d: int) -> str:
    o = f"CAST(o{d} AS DOUBLE)"
    return f"(({o} - {_e(d)}) * ({o} - {_e(d)}) / {_e(d)})"


# order-pinned left-to-right chain 1..9
_CHI2 = "(" + " + ".join(_term(d) for d in range(1, 10)) + ")"


@register(
    "benford_order_totals",
    oracle=f"""
    WITH counts AS (
      SELECT CAST(count(*) AS BIGINT) AS n, {_counts("duck")}
      FROM orders
    )
    SELECT n, o1, o2, o3, o4, o5, o6, o7, o8, o9,
           {_F6.format(x=_e(1))} AS e1,
           {_F6.format(x=_e(9))} AS e9,
           {_F6.format(x=_CHI2)} AS chi2,
           CAST(CASE WHEN {_CHI2} > {_CHI_CRIT_8}
                THEN 1 ELSE 0 END AS BIGINT) AS reject_benford
    FROM counts
    """,
)
def benford_order_totals(spark, sf_dir):
    """T78: Benford first-digit χ² over o_totalprice (module header)
    — nine conditional counts as one-row columns from a single
    map-side-combined aggregate, order-pinned χ² chain, shared
    log₁₀ float tree, floor-1e6."""
    counts = T(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[
            F.expr(
                f"CAST(sum(CASE WHEN {_digit('spark')} = {d} THEN 1 ELSE 0 END)"
                " AS BIGINT)"
            ).alias(f"o{d}")
            for d in range(1, 10)
        ],
    )
    return counts.selectExpr(
        "n",
        *[f"o{d}" for d in range(1, 10)],
        f"{_F6.format(x=_e(1))} AS e1",
        f"{_F6.format(x=_e(9))} AS e9",
        f"{_F6.format(x=_CHI2)} AS chi2",
        f"CAST(CASE WHEN {_CHI2} > {_CHI_CRIT_8}"
        " THEN 1 ELSE 0 END AS BIGINT) AS reject_benford",
    )
