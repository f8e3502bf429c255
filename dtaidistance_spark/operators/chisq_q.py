"""T68/TS56 — χ² test of homogeneity (Pearson 1900): is the event-type
MIX the same across day-parts?  The inference-grade drift test
completing the trio next to T40's Jensen-Shannon (overlap geometry)
and T59's Wasserstein (metric transport): χ² gives an actual
reject/accept verdict with degrees of freedom.

Contingency table: event_type × day-part (hour DIV 6 → 4 parts).  All
observed counts, row/column marginals, and N are int64 from ONE
map-side-combined aggregate + two broadcast marginal joins.  Each
cell's term (o − rc/N)²/(rc/N) is a shared per-row float tree; the
table-level χ² is an ORDER-PINNED fold over the (type, part)-sorted
term array — no float aggregate — compared against the
χ²₀.₉₅((R−1)(C−1)) literal.  Every cell row also carries the verdict
columns so the output is a single self-contained table.

Scale shape: the corpus crosses the wire once (the cell count); the
R×C table (20 cells) is driver-scale thereafter.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_CHI2_95_12 = "21.02606981748307"  # chi2.ppf(0.95, 12), 5 types x 4 parts

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_TERM = (
    "((CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * CAST(c AS DOUBLE)"
    " / CAST(n AS DOUBLE))"
    " * (CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * CAST(c AS DOUBLE)"
    " / CAST(n AS DOUBLE)))"
    " / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
)


def _fold(eng: str) -> str:
    if eng == "spark":
        return "aggregate(tl, CAST(0 AS DOUBLE), (a, x) -> a + x)"
    return (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), tl),"
        " (a, x) -> a + x)"
    )


@register(
    "chisq_homogeneity",
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
      SELECT list(term ORDER BY event_type, day_part) AS tl,
             CAST(count(*) AS BIGINT) AS n_cells
      FROM terms
    ),
    chi AS (
      SELECT n_cells, {_fold('duck')} AS chi2_raw FROM packed
    )
    SELECT t.event_type, CAST(t.day_part AS BIGINT) AS day_part,
           t.o, t.r, t.c, t.n,
           {_F6.format(x="t.term")} AS term,
           chi.n_cells,
           {_F6.format(x="chi.chi2_raw")} AS chi2,
           CAST(CASE WHEN chi.chi2_raw
                  > CAST('{_CHI2_95_12}' AS DOUBLE)
                THEN 1 ELSE 0 END AS BIGINT) AS reject_homogeneous
    FROM terms t, chi
    """,
)
def chisq_homogeneity(spark, sf_dir):
    """T68/TS56: Pearson χ² homogeneity of the event-type mix across
    day-parts (module header) — int64 contingency algebra, per-cell
    float trees, table χ² as one order-pinned fold, verdict vs the
    χ²₀.₉₅(12) literal."""
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
        ).alias("tl"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )
    chi = packed.select(
        "n_cells", F.expr(_fold("spark")).alias("chi2_raw")
    )
    return terms.crossJoin(F.broadcast(chi)).select(
        "event_type",
        "day_part",
        "o",
        "r",
        "c",
        "n",
        F.expr(_F6.format(x="term")).alias("term"),
        "n_cells",
        F.expr(_F6.format(x="chi2_raw")).alias("chi2"),
        F.expr(
            f"CAST(CASE WHEN chi2_raw > CAST('{_CHI2_95_12}' AS DOUBLE)"
            f" THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("reject_homogeneous"),
    )
