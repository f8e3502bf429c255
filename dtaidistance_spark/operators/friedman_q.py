"""TS73 — Friedman test + Kendall's W over blocked hourly event
counts (Friedman JASA'37; Kendall & Babington Smith'39): the
BLOCKED-DESIGN rank test the location family was missing — MWU/KW
(TS59) compare unpaired groups, Wilcoxon (TS60) two paired series;
Friedman asks whether k treatments (event types) rank consistently
across b blocks (hours of day), with Kendall's W = χ²/(b(k−1)) the
agreement effect size on 0..1.

Ranks are the TS59/TS60 DOUBLED-MIDRANK machinery in window form:
r2 = 2·RANK() + eq − 1 over (block PARTITION, count ORDER) with eq the
block-value tie count — every rank statistic int64.  Tie correction
Σ(t³ − t) via the per-element identity Σ_rows (eq² − 1).  With doubled
rank sums R2_j the tie-corrected statistic clears to

    χ² = 3·Σ_j (R2_j − b(k+1))² / (b·k·(k+1)) / C ,
    C  = 1 − Σ(t³−t)/(b(k³−k))

ONE shared float tree (floor-1e6), verdict vs the tabulated
χ²₀.₉₅(k−1 = 4) = 9.487729036781154 literal.  Output: one row per
event type carrying its R2 plus the shared table-level columns.

Honest (gated) reading: hourly counts of the five event types are
exchangeable by construction, so Friedman correctly FAILS to reject
(χ² ≈ 0.66 at sf0.01 against the 9.49 bar) and W ≈ 0.007 — near-zero
agreement, the blocked complement of TS59's unpaired null.

Scale shape: the corpus crosses the wire once (the (hour, type) cell
count); everything after is the b×k = 120-cell table — windows and
aggregates over driver-scale data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_K = 5
_CHI2_95_4 = "9.487729036781154"  # chi2.ppf(0.95, 4), tabulated

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_CHI = (
    "((3.0 * CAST(s2 AS DOUBLE)"
    " / (CAST(b AS DOUBLE) * CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0)))"
    " / (1.0 - CAST(tie_sum AS DOUBLE)"
    " / (CAST(b AS DOUBLE) * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE)"
    " * CAST(k AS DOUBLE) - CAST(k AS DOUBLE)))))"
)
_W = f"({_CHI} / (CAST(b AS DOUBLE) * (CAST(k AS DOUBLE) - 1.0)))"
_REJ = (
    f"CAST(CASE WHEN ({_CHI}) > CAST('{_CHI2_95_4}' AS DOUBLE)"
    f" THEN 1 ELSE 0 END AS BIGINT)"
)


@register(
    "friedman_test",
    oracle=f"""
    WITH cells AS (
      SELECT hour(ts) AS h, event_type,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    rk AS (
      SELECT h, event_type, c,
             CAST(2 * rank() OVER (PARTITION BY h ORDER BY c)
                  + count(*) OVER (PARTITION BY h, c) - 1
                  AS BIGINT) AS r2,
             CAST(count(*) OVER (PARTITION BY h, c) AS BIGINT) AS eq
      FROM cells
    ),
    agg AS (
      SELECT event_type, CAST(sum(r2) AS BIGINT) AS r2_sum
      FROM rk GROUP BY event_type
    ),
    tab AS (
      SELECT CAST(count(DISTINCT h) AS BIGINT) AS b,
             CAST({_K} AS BIGINT) AS k,
             CAST(sum(eq * eq - 1) AS BIGINT) AS tie_sum
      FROM rk
    ),
    s AS (
      SELECT CAST(sum((a.r2_sum - t.b * (t.k + 1))
                      * (a.r2_sum - t.b * (t.k + 1))) AS BIGINT) AS s2
      FROM agg a, tab t
    )
    SELECT a.event_type, a.r2_sum, t.b, t.k, t.tie_sum, s.s2,
           {_F6.format(x=_CHI)} AS chi2_friedman,
           {_F6.format(x=_W)} AS kendalls_w,
           {_REJ} AS reject_same_ranks
    FROM agg a, tab t, s
    """,
)
def friedman_test(spark, sf_dir):
    """TS73: Friedman blocked rank test + Kendall's W over hourly
    event-type counts (module header) — doubled-midrank windows, int64
    rank sums and tie terms, one shared float tree, floor-1e6."""
    cells = (
        T(spark, sf_dir, "events")
        .groupBy(F.hour("ts").alias("h"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    from pyspark.sql import Window

    wb = Window.partitionBy("h").orderBy("c")
    we = Window.partitionBy("h", "c")
    rk = cells.select(
        "h",
        "event_type",
        "c",
        (2 * F.rank().over(wb) + F.count(F.lit(1)).over(we) - 1)
        .cast("long")
        .alias("r2"),
        F.count(F.lit(1)).over(we).cast("long").alias("eq"),
    )
    agg = rk.groupBy("event_type").agg(
        F.sum("r2").cast("long").alias("r2_sum")
    )
    tab = rk.agg(
        F.countDistinct("h").cast("long").alias("b"),
        F.lit(_K).cast("long").alias("k"),
        F.sum(F.col("eq") * F.col("eq") - 1).cast("long").alias("tie_sum"),
    )
    s = agg.crossJoin(F.broadcast(tab)).agg(
        F.sum(
            (F.col("r2_sum") - F.col("b") * (F.col("k") + 1))
            * (F.col("r2_sum") - F.col("b") * (F.col("k") + 1))
        )
        .cast("long")
        .alias("s2")
    )
    return (
        agg.crossJoin(F.broadcast(tab))
        .crossJoin(F.broadcast(s))
        .select(
            "event_type",
            "r2_sum",
            "b",
            "k",
            "tie_sum",
            "s2",
            F.expr(_F6.format(x=_CHI)).alias("chi2_friedman"),
            F.expr(_F6.format(x=_W)).alias("kendalls_w"),
            F.expr(_REJ).alias("reject_same_ranks"),
        )
    )
