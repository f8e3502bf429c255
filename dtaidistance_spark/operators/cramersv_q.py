"""T75 — Cramér's V effect size + adjusted standardized residuals for
the T68 contingency table (Cramér'46; Haberman'73 / Agresti §2.4.5):
the DRILL-DOWN the χ² verdict needs — T68 says "the event mix differs
across day-parts", V says HOW MUCH on a 0..1 scale
(V = √(χ²/(n·min(R−1, C−1)))), and the adjusted residuals

    d_ij = (o − e) / √(e·(1 − r/n)·(1 − c/n)),  e = r·c/n

say WHICH cells drive it (each d ~ N(0,1) under homogeneity, so the
|d| > 1.96 flag reads per-cell significance).

Machinery is EXACTLY T68's: int64 contingency counts + marginals from
one aggregate and two broadcast joins, per-cell shared float trees,
the table χ² one ORDER-PINNED fold over the (type, part)-sorted term
array; V and each residual floor-1e6.  20 rows, each carrying the
table-level V so the output is self-contained.

Honest (gated) reading: T68 rejects homogeneity, and this query
grades it: V lands in the SMALL-effect band (≈0.02–0.2 by Cohen's
convention — the mix differs detectably but mildly), with a minority
of cells individually significant in both directions.

Scale shape: identical to T68 — the corpus crosses the wire once
(cell counts); everything after is the 20-cell table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.chisq_q import _TERM, _fold
from dtaidistance_spark.operators.queries import T, register

_MIN_DF = 3  # min(R-1, C-1) = min(4, 3)

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_E = "(CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
_RESID = (
    f"((CAST(o AS DOUBLE) - {_E})"
    f" / sqrt({_E} * (1.0 - CAST(r AS DOUBLE) / CAST(n AS DOUBLE))"
    f" * (1.0 - CAST(c AS DOUBLE) / CAST(n AS DOUBLE))))"
)
_V = (
    f"sqrt(chi2_raw / (CAST(n AS DOUBLE) * {_MIN_DF}.0))"
)
_CELL_SIG = (
    f"CAST(CASE WHEN abs({_RESID}) > 1.96 THEN 1 ELSE 0 END AS BIGINT)"
)


@register(
    "cramers_v_residuals",
    oracle=f"""
    WITH cells AS (
      SELECT event_type, (hour(ts) // 6) AS day_part,
             CAST(count(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ),
    rows_ AS (
      SELECT event_type, CAST(sum(o) AS BIGINT) AS r FROM cells
      GROUP BY event_type
    ),
    cols_ AS (
      SELECT day_part, CAST(sum(o) AS BIGINT) AS c FROM cells
      GROUP BY day_part
    ),
    tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
    terms AS (
      SELECT cells.event_type, cells.day_part, cells.o,
             rows_.r, cols_.c, tot.n, {_TERM} AS term
      FROM cells JOIN rows_ USING (event_type)
      JOIN cols_ USING (day_part), tot
    ),
    packed AS (
      SELECT list(term ORDER BY event_type, day_part) AS tl
      FROM terms
    ),
    chi AS (SELECT {_fold('duck')} AS chi2_raw FROM packed)
    SELECT t.event_type, CAST(t.day_part AS BIGINT) AS day_part,
           t.o, t.r, t.c, t.n,
           {_F6.format(x=_E)} AS expected,
           {_F6.format(x=_RESID)} AS adj_residual,
           {_CELL_SIG} AS cell_sig,
           {_F6.format(x=_V)} AS cramers_v
    FROM terms t, chi
    """,
)
def cramers_v_residuals(spark, sf_dir):
    """T75: Cramér's V + Haberman adjusted residuals on the T68 table
    (module header) — shared contingency machinery, per-cell trees,
    V from the order-pinned table χ², floor-1e6."""
    cells = (
        T(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr("hour(ts) DIV 6").alias("day_part"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
    )
    rows_ = cells.groupBy("event_type").agg(
        F.sum("o").cast("long").alias("r")
    )
    cols_ = cells.groupBy("day_part").agg(
        F.sum("o").cast("long").alias("c")
    )
    tot = cells.agg(F.sum("o").cast("long").alias("n"))
    terms = (
        cells.join(F.broadcast(rows_), "event_type")
        .join(F.broadcast(cols_), "day_part")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            F.col("day_part").cast("long").alias("day_part"),
            "o",
            "r",
            "c",
            "n",
            F.expr(_TERM).alias("term"),
        )
    )
    packed = terms.groupBy().agg(
        F.expr(
            "transform(array_sort(collect_list("
            "struct(event_type, day_part, term AS tt))), z -> z.tt)"
        ).alias("tl")
    )
    chi = packed.select(F.expr(_fold("spark")).alias("chi2_raw"))
    return terms.crossJoin(F.broadcast(chi)).select(
        "event_type",
        "day_part",
        "o",
        "r",
        "c",
        "n",
        F.expr(_F6.format(x=_E)).alias("expected"),
        F.expr(_F6.format(x=_RESID)).alias("adj_residual"),
        F.expr(_CELL_SIG).alias("cell_sig"),
        F.expr(_F6.format(x=_V)).alias("cramers_v"),
    )
