"""T67 — inter-filter agreement (Cohen's κ, Cohen'60): when a
pipeline stacks quality filters (T13/T23/T56...), the question before
adding one more is "does it MEASURE anything new, or does it agree
with what we have by construction?"  κ answers it — agreement
corrected for chance (κ = 1 identical, 0 = no better than chance,
< 0 systematic disagreement).

Raters here (declared, computed in-query so the operator is
self-contained): filter A = length gate (word count ≥ 50), filter B =
lexical-diversity gate (distinct-word ratio ≥ 0.3) — two REAL C4-type
rules that measure different things.  Per source: the 2×2 confusion
counts (all int64 from one map-side-combined aggregate), observed
agreement p_o, chance agreement p_e from the marginals, and κ — one
shared float tree over five int64s, floor-1e6.

Scale shape: one documents scan with both verdicts as codegen
expressions, ONE (source) aggregate — 3 rows out at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_WMIN = 50
_DIV = "CAST(0.3 AS DOUBLE)"

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

# κ tree over n11, n10, n01, n00, n (int64 columns)
_PO = "(CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE))"
_PE = (
    "((CAST(n11 + n10 AS DOUBLE) / CAST(n AS DOUBLE))"
    " * (CAST(n11 + n01 AS DOUBLE) / CAST(n AS DOUBLE))"
    " + (CAST(n01 + n00 AS DOUBLE) / CAST(n AS DOUBLE))"
    " * (CAST(n10 + n00 AS DOUBLE) / CAST(n AS DOUBLE)))"
)
_KAPPA = (
    f"CASE WHEN {_PE} < CAST(1 AS DOUBLE) THEN"
    f" (({_PO}) - ({_PE})) / (CAST(1 AS DOUBLE) - ({_PE}))"
    f" ELSE CAST(NULL AS DOUBLE) END"
)


@register(
    "filter_agreement_kappa",
    oracle=f"""
    WITH v AS (
      SELECT source,
             CASE WHEN len(string_split(text, ' ')) >= {_WMIN}
                  THEN 1 ELSE 0 END AS a,
             CASE WHEN CAST(len(list_distinct(string_split(text, ' ')))
                    AS DOUBLE)
                    / CAST(len(string_split(text, ' ')) AS DOUBLE)
                    >= {_DIV}
                  THEN 1 ELSE 0 END AS b
      FROM documents
    ),
    c AS (
      SELECT source,
             CAST(sum(a * b) AS BIGINT) AS n11,
             CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
             CAST(sum((1 - a) * b) AS BIGINT) AS n01,
             CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00,
             CAST(count(*) AS BIGINT) AS n
      FROM v GROUP BY source
    )
    SELECT source, n11, n10, n01, n00, n,
           {_F6.format(x=_PO)} AS p_o,
           {_F6.format(x=_PE)} AS p_e,
           {_F6.format(x=_KAPPA)} AS kappa
    FROM c
    """,
)
def filter_agreement_kappa(spark, sf_dir):
    """T67: Cohen's κ between the length gate and the diversity gate
    per source (module header) — int64 confusion counts from one
    map-side-combined aggregate, κ one shared float tree, floor-1e6."""
    docs = T(spark, sf_dir, "documents").select(
        "source",
        F.expr(
            f"CASE WHEN size(split(text, ' ')) >= {_WMIN}"
            f" THEN 1 ELSE 0 END"
        ).alias("a"),
        F.expr(
            f"CASE WHEN CAST(size(array_distinct(split(text, ' ')))"
            f" AS DOUBLE) / CAST(size(split(text, ' ')) AS DOUBLE)"
            f" >= {_DIV} THEN 1 ELSE 0 END"
        ).alias("b"),
    )
    c = docs.groupBy("source").agg(
        F.sum(F.col("a") * F.col("b")).cast("long").alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("long").alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("long").alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b")))
        .cast("long")
        .alias("n00"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    return c.select(
        "source",
        "n11",
        "n10",
        "n01",
        "n00",
        "n",
        F.expr(_F6.format(x=_PO)).alias("p_o"),
        F.expr(_F6.format(x=_PE)).alias("p_e"),
        F.expr(_F6.format(x=_KAPPA)).alias("kappa"),
    )
