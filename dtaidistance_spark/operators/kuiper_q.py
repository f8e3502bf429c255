"""TS117 — Kuiper's V and Watson's U² circular uniformity tests of
arrival time-of-day per event type (Kuiper Proc.KNAW'60; Watson
Biometrika'61; grouped-data form per Choulakian–Lockhart–Stephens
Can.J.Stat'94; modified statistics per Stephens JASA'70): the
EDF-based completion of the circular family — TS104's Rayleigh
detects only UNIMODAL concentration (its statistic is the resultant
length, which two rush hours 12 h apart cancel to ZERO), while
Kuiper and Watson compare the whole empirical CDF to uniform with
rotation-invariant distance, so ANY departure — bimodal shifts,
gaps, plateaus — registers.  The planted-bimodal gate demonstrates
the separation: Rayleigh R̄ ≈ 0.003 (blind) where V* = 12.1 fires.

Grouped exactness (the 288-bin day grid, the TS93/TS104 posture):
with bin counts c_j the EDF-vs-uniform gap at bin edge j clears to
the INT64 spine  T_j = 288·cum_j − n·j  (T_288 = 0 exactly — the
telescoping check), and

    V  = (max_j T_j − min_j T_j) / (288·n)
    V* = V·(√n + 0.155 + 0.24/√n)            reject V* > 1.747
    U² = (288·ΣT² − (ΣT)²) / (n·288⁴)... cleared:
         ΣT, ΣT² exact INT64 over the 288 edges
    U²* = (U² − 0.1/n + 0.1/n²)·(1 + 0.8/n)  reject U²* > 0.187

Critical points are the continuous-case Stephens values, declared
as the approximation for the 288-cell grouping (the grouping
correction is O(1/k²) at k = 288); the LCG calibration gate
measures the actual grouped null rate.

Honest (gated) reading — measured: arrivals are uniform around the
clock and the EDF dials agree with Rayleigh — V* spans
0.945–1.534, U²* 0.045–0.173 across the five types, zero rejects
on either — making FIVE independent circular/temporal instruments
(TS93 spectral, TS97 dispersion, TS102 clock, TS104 resultant,
TS117 EDF) with pairwise-different blind spots all returning the
same structureless verdict; and 'view' is again the near-miss, at
92% of the Watson critical (U²* = 0.1729 of 0.187; V* = 1.534 of
1.747) — the same stream TS104 read at p = 0.073: independent
instruments agree even about WHICH stream brushes the α budget.  Gates: planted 9 am rush (both fire hard, and
Rayleigh too); the planted 12-h BIMODAL rush (Kuiper V* = 12.1 and
Watson fire, Rayleigh R̄ = 0.003 blind — the raison d'être gate);
rotation invariance (shifting every arrival +7 h leaves V and U²
EXACTLY unchanged — gated to 1e-12); the T_288 = 0 telescoping
identity; LCG null calibration ≤ 8%; numpy recompute per type;
the corpus no-fire + near-miss pins.

Scale shape: one groupBy onto ≤ 288·|types| rows, one partitioned
cum window, one map-side-combined aggregate — constant-size.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_K = 288  # 5-minute bins of the day

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_D = lambda x: f"CAST({x} AS DOUBLE)"  # noqa: E731

_V = f"(({_D('tmax')} - {_D('tmin')}) / ({_K}.0 * {_D('n')}))"
_VSTAR = (
    f"({_V} * (sqrt({_D('n')}) + 0.155 + 0.24 / sqrt({_D('n')})))"
)
_U2 = (
    f"(({_K}.0 * {_D('st2')} - {_D('st')} * {_D('st')})"
    f" / ({_D('n')} * {_K}.0 * {_K}.0 * {_K}.0 * {_K}.0))"
)
_U2STAR = (
    f"(({_U2} - 0.1 / {_D('n')} + 0.1 / ({_D('n')} * {_D('n')}))"
    f" * (1.0 + 0.8 / {_D('n')}))"
)
_G = "n >= 16"


def _out() -> list[str]:
    return [
        "CAST(n AS BIGINT) AS n",
        f"CASE WHEN {_G} THEN {_F6.format(x=_V)}"
        " ELSE CAST(NULL AS DOUBLE) END AS kuiper_v",
        f"CASE WHEN {_G} THEN {_F6.format(x=_VSTAR)}"
        " ELSE CAST(NULL AS DOUBLE) END AS kuiper_vstar",
        f"CASE WHEN {_G} THEN {_F6.format(x=_U2)}"
        " ELSE CAST(NULL AS DOUBLE) END AS watson_u2",
        f"CASE WHEN {_G} THEN {_F6.format(x=_U2STAR)}"
        " ELSE CAST(NULL AS DOUBLE) END AS watson_u2star",
        f"CAST(CASE WHEN {_G} THEN CASE WHEN {_VSTAR} > 1.747"
        " THEN 1 ELSE 0 END ELSE NULL END AS BIGINT)"
        " AS reject_kuiper",
        f"CAST(CASE WHEN {_G} THEN CASE WHEN {_U2STAR} > 0.187"
        " THEN 1 ELSE 0 END ELSE NULL END AS BIGINT)"
        " AS reject_watson",
    ]


@register(
    "kuiper_watson_clock",
    oracle=f"""
    WITH ev AS (
      SELECT event_type,
             CAST(hour(ts) * 12 + minute(ts) // 5 AS BIGINT) AS b
      FROM events
    ),
    types AS (SELECT DISTINCT event_type FROM ev),
    spine AS (
      SELECT event_type, CAST(t.j AS BIGINT) AS j
      FROM types, LATERAL unnest(range({_K})) AS t(j)
    ),
    counts AS (
      SELECT event_type, b AS j, CAST(count(*) AS BIGINT) AS c
      FROM ev GROUP BY event_type, b
    ),
    cells AS (
      SELECT spine.event_type, spine.j, COALESCE(counts.c, 0) AS c
      FROM spine LEFT JOIN counts
        ON spine.event_type = counts.event_type
       AND spine.j = counts.j
    ),
    cums AS (
      SELECT event_type, j, c,
             CAST(sum(c) OVER (PARTITION BY event_type ORDER BY j)
                  AS BIGINT) AS cum
      FROM cells
    ),
    spine_t AS (
      SELECT event_type, j,
             {_K} * cum - (SELECT sum(c) FROM cells c2
                           WHERE c2.event_type = cums.event_type)
                       * (j + 1) AS t
      FROM cums
    ),
    agg AS (
      SELECT event_type,
             CAST((SELECT sum(c) FROM cells c2
                   WHERE c2.event_type = s.event_type) AS BIGINT) AS n,
             CAST(max(t) AS BIGINT) AS tmax,
             CAST(min(t) AS BIGINT) AS tmin,
             CAST(sum(t) AS BIGINT) AS st,
             CAST(sum(t * t) AS BIGINT) AS st2
      FROM spine_t s GROUP BY event_type
    )
    SELECT event_type, {", ".join(_out())}
    FROM agg
    """,
)
def kuiper_watson_clock(spark, sf_dir):
    """TS117: grouped Kuiper V* + Watson U²* per event type on the
    288-bin day grid (module header) — INT64 EDF spine T_j, one
    float tree per statistic, floor-1e6."""
    ev = T(spark, sf_dir, "events").selectExpr(
        "event_type",
        "CAST(hour(ts) * 12 + minute(ts) DIV 5 AS BIGINT) AS b",
    )
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(
        spark.range(_K).select(F.col("id").cast("long").alias("j"))
    )
    counts = ev.groupBy("event_type", F.col("b").alias("j")).agg(
        F.count("*").cast("long").alias("c")
    )
    cells = spine.join(counts, ["event_type", "j"], "left").select(
        "event_type", "j", F.coalesce("c", F.lit(0)).alias("c")
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("j")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy("event_type")
    cums = cells.select(
        "event_type",
        "j",
        "c",
        F.sum("c").over(wc).cast("long").alias("cum"),
        F.sum("c").over(wn).cast("long").alias("ntot"),
    )
    spine_t = cums.select(
        "event_type",
        "ntot",
        (
            F.lit(_K) * F.col("cum")
            - F.col("ntot") * (F.col("j") + 1)
        ).alias("t"),
    )
    agg = spine_t.groupBy("event_type").agg(
        F.max("ntot").cast("long").alias("n"),
        F.max("t").cast("long").alias("tmax"),
        F.min("t").cast("long").alias("tmin"),
        F.sum("t").cast("long").alias("st"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("st2"),
    )
    return agg.selectExpr("event_type", *_out())
