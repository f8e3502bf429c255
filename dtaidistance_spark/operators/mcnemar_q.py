"""T73 — McNemar's test between the two quality filters (McNemar
Psychometrika'47, with Edwards' continuity correction): the MARGINAL
complement of T67's κ — κ asks "do the filters AGREE beyond chance",
McNemar asks "is one filter systematically STRICTER" (same pass rate
vs not), and only the discordant cells carry information:

    χ² = (n10 − n01)² / (n10 + n01)                 (asymptotic)
    χ²_cc = (|n10 − n01| − 1)² / (n10 + n01)         (Edwards'48)

both ~ χ²(1) under marginal homogeneity, so the critical value is the
1.96² literal (χ²₀.₉₅(1) = z²₀.₉₇₅).  Filters and 2×2 counts are
EXACTLY T67's (length gate vs lexical-diversity gate per source, all
int64 from one map-side-combined aggregate — the two queries share
their sufficient statistics by construction); both statistics are ONE
float divide over int64s, floor-1e6, NULL-guarded at n10 + n01 = 0.

Honest (gated) reading: the length gate passes far more docs than the
diversity gate on this corpus (n01 ≫ n10 or vice versa per source),
so McNemar rejects marginal homogeneity in nearly every source
(sources with tiny discordant counts can dip under the bar) —
correct: the two REAL C4-type rules measure different things and
admit different fractions.  κ (T67) reads their agreement; McNemar
their calibration difference.

Scale shape: one documents scan with both verdicts as codegen
expressions, ONE (source) aggregate — 3 rows out at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.kappa_q import _DIV, _WMIN
from dtaidistance_spark.operators.queries import T, register

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_CHI = "(CAST((n10 - n01) * (n10 - n01) AS DOUBLE) / CAST(n10 + n01 AS DOUBLE))"
_CHICC = (
    "(CAST((abs(n10 - n01) - 1) * (abs(n10 - n01) - 1) AS DOUBLE)"
    " / CAST(n10 + n01 AS DOUBLE))"
)
_GUARD = "CASE WHEN n10 + n01 > 0 THEN {x} ELSE CAST(NULL AS DOUBLE) END"
_REJ = (
    "CAST(CASE WHEN n10 + n01 = 0 THEN NULL"
    f" WHEN ({_CHI}) > 1.96 * 1.96 THEN 1 ELSE 0 END AS BIGINT)"
)


@register(
    "mcnemar_filters",
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
             CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
             CAST(sum((1 - a) * b) AS BIGINT) AS n01,
             CAST(count(*) AS BIGINT) AS n
      FROM v GROUP BY source
    )
    SELECT source, n10, n01, n,
           {_F6.format(x=_GUARD.format(x=_CHI))} AS chi2,
           {_F6.format(x=_GUARD.format(x=_CHICC))} AS chi2_cc,
           {_REJ} AS reject_same_rate
    FROM c
    """,
)
def mcnemar_filters(spark, sf_dir):
    """T73: McNemar marginal-homogeneity test between the T67 filters
    per source (module header) — discordant int64 counts from one
    aggregate, χ² and the continuity-corrected χ² one divide each,
    verdict vs the 1.96² literal."""
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
        F.sum(F.col("a") * (1 - F.col("b"))).cast("long").alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("long").alias("n01"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    return c.select(
        "source",
        "n10",
        "n01",
        "n",
        F.expr(_F6.format(x=_GUARD.format(x=_CHI))).alias("chi2"),
        F.expr(_F6.format(x=_GUARD.format(x=_CHICC))).alias("chi2_cc"),
        F.expr(_REJ).alias("reject_same_rate"),
    )
