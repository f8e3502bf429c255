"""T76 — Cochran's Q across k=3 quality filters (Cochran
Biometrika'50): the k-filter generalization of T73's McNemar —
McNemar asks whether TWO binary filters have the same marginal pass
rate; Cochran's Q asks it for k filters jointly, blocks = documents,
treatments = filters.  k=2 Cochran's Q IS McNemar's uncorrected χ²
(pytest-gated identity).

Filters (declared, computed in-query so the operator is
self-contained): A and B are EXACTLY T67/T73's length and
lexical-diversity gates (shared sufficient-statistic lineage); C is a
mean-word-length gate kept INTEGER-EXACT by clearing the divide —
mean word length = (chars − (nw − 1)) / nw ≥ 4.5 becomes
2·(chars − nw + 1) ≥ 9·nw over int64s (spaces excluded: nw − 1
separators).

With per-filter pass totals C_j, N = ΣC_j, and per-doc row sums R_i,
the statistic clears to one float divide over int64 sufficient
statistics:

    Q = (k−1) · (k·ΣC_j² − N²) / (k·N − ΣR_i²)   ~ χ²(k−1) under H0

so the ONLY floats are the final divide (floor-1e6) and the verdict
vs the tabulated χ²₀.₉₅(2) = 5.991464547107979 literal.  NULL-guarded
at k·N = ΣR_i² (every doc passes all-or-none: no discordance, no
information — the k-filter analogue of McNemar's empty n10+n01 cell).

Honest (gated) reading: the three REAL C4-type gates admit very
different fractions of this corpus (the diversity gate is strict
where the length gate is lenient — T73's finding), so Q rejects
marginal homogeneity per source, consistent with T73's pairwise
verdicts.

Scale shape: one documents scan with all three verdicts as codegen
expressions, ONE (source) map-side-combined aggregate carrying seven
int64s — 3 rows out at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.kappa_q import _DIV, _WMIN
from dtaidistance_spark.operators.queries import T, register

_K = 3
_CHI2_95_2 = "5.991464547107979"  # chi2.ppf(0.95, 2), tabulated

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

# Q over int64 columns (ca, cb, cc, nn = N, sr2 = sum R_i^2), k = 3
_NUM = (
    f"CAST(({_K} - 1) * ({_K} * (ca * ca + cb * cb + cc * cc)"
    " - nn * nn) AS DOUBLE)"
)
_DEN = f"CAST({_K} * nn - sr2 AS DOUBLE)"
_Q = (
    f"CASE WHEN {_K} * nn - sr2 > 0 THEN ({_NUM}) / ({_DEN})"
    " ELSE CAST(NULL AS DOUBLE) END"
)
_REJ = (
    f"CAST(CASE WHEN {_K} * nn - sr2 = 0 THEN NULL"
    f" WHEN ({_NUM}) / ({_DEN}) > CAST('{_CHI2_95_2}' AS DOUBLE)"
    f" THEN 1 ELSE 0 END AS BIGINT)"
)

# filter C: mean word length >= 4.5, cleared to int64
#   (chars - (nw - 1)) / nw >= 4.5  <=>  2*(chars - nw + 1) >= 9*nw
_C_SPARK = (
    "CASE WHEN 2 * (length(text) - size(split(text, ' ')) + 1)"
    " >= 9 * size(split(text, ' ')) THEN 1 ELSE 0 END"
)
_C_DUCK = (
    "CASE WHEN 2 * (length(text) - len(string_split(text, ' ')) + 1)"
    " >= 9 * len(string_split(text, ' ')) THEN 1 ELSE 0 END"
)


@register(
    "cochran_q_filters",
    oracle=f"""
    WITH v AS (
      SELECT source,
             CASE WHEN len(string_split(text, ' ')) >= {_WMIN}
                  THEN 1 ELSE 0 END AS a,
             CASE WHEN CAST(len(list_distinct(string_split(text, ' ')))
                    AS DOUBLE)
                    / CAST(len(string_split(text, ' ')) AS DOUBLE)
                    >= {_DIV}
                  THEN 1 ELSE 0 END AS b,
             {_C_DUCK} AS c
      FROM documents
    ),
    s AS (
      SELECT source,
             CAST(sum(a) AS BIGINT) AS ca,
             CAST(sum(b) AS BIGINT) AS cb,
             CAST(sum(c) AS BIGINT) AS cc,
             CAST(sum(a + b + c) AS BIGINT) AS nn,
             CAST(sum((a + b + c) * (a + b + c)) AS BIGINT) AS sr2,
             CAST(count(*) AS BIGINT) AS n_docs
      FROM v GROUP BY source
    )
    SELECT source, ca, cb, cc, nn, sr2, n_docs,
           {_F6.format(x=_Q)} AS q_cochran,
           {_REJ} AS reject_same_rates
    FROM s
    """,
)
def cochran_q_filters(spark, sf_dir):
    """T76: Cochran's Q across the length / diversity / word-length
    gates per source (module header) — seven int64 sufficient
    statistics from one map-side-combined aggregate, Q one float
    divide, floor-1e6."""
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
        F.expr(_C_SPARK).alias("c"),
    )
    s = docs.groupBy("source").agg(
        F.sum("a").cast("long").alias("ca"),
        F.sum("b").cast("long").alias("cb"),
        F.sum("c").cast("long").alias("cc"),
        F.sum(F.col("a") + F.col("b") + F.col("c"))
        .cast("long")
        .alias("nn"),
        F.sum(
            (F.col("a") + F.col("b") + F.col("c"))
            * (F.col("a") + F.col("b") + F.col("c"))
        )
        .cast("long")
        .alias("sr2"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    return s.select(
        "source",
        "ca",
        "cb",
        "cc",
        "nn",
        "sr2",
        "n_docs",
        F.expr(_F6.format(x=_Q)).alias("q_cochran"),
        F.expr(_REJ).alias("reject_same_rates"),
    )
