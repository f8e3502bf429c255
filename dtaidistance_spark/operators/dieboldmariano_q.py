"""TS77 — Diebold-Mariano forecast-comparison test per event-type
series (Diebold & Mariano JBES'95): the test a rollup pipeline runs
before SWITCHING downsample representatives or forecasters — are two
predictors' losses actually different, or is the observed gap noise?
Complements the forecast family: Croston/Holt/Theta-style ops FIT
forecasters; DM decides BETWEEN two of them.

Forecasters (declared, computed in-query so the operator is
self-contained): f₁ = row-naive (previous observed hourly bucket),
f₂ = seasonal row-naive (24 observed buckets back) over hourly event
counts per type — row-shift semantics over the sorted buckets, so
gaps in the grid shift rows rather than inject NULL hours.  Loss =
squared error; the differential d_t = e₁² − e₂² is INT64 (counts are
integers), so the sufficient statistics are three exact int64s
(n, S₁ = Σd, S₂ = Σd²) from one aggregate, and the lag-0 DM statistic
clears to

    DM = S₁·√n / √(n·S₂ − S₁²)     (~ N(0,1) under equal loss)

ONE float tree (floor-1e6), two-sided verdict vs 1.959963984540054,
NULL-guarded at zero loss-differential variance.

Honest (gated) reading: the synthetic hourly counts are near-Poisson
with NO real 24-hour seasonality, so both row-naive forecasters incur
essentially the same loss and DM correctly FAILS to reject for every
type (|DM| < 1 on this corpus) — the forecast-comparison null,
measured, not assumed.  The perfect-seasonal positive control (DM
rejects decisively when f₂ is exact) lives in pytest.

Scale shape: the corpus crosses the wire once as the (type, hour)
cell counts; windows and aggregates after run over the tiny bucket
table (PARTITIONED windows — no partition-less WindowExec).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_Z_975 = "1.959963984540054"

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_DM = (
    "(CAST(s1 AS DOUBLE) * sqrt(CAST(n AS DOUBLE))"
    " / sqrt(CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)"
    " - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)))"
)
_GUARD = "n * s2 - s1 * s1 > 0"
_DM_COL = (
    f"CASE WHEN {_GUARD} THEN {_F6.format(x=_DM)}"
    " ELSE CAST(NULL AS DOUBLE) END"
)
_REJ = (
    f"CAST(CASE WHEN NOT ({_GUARD}) THEN NULL"
    f" WHEN abs({_DM}) > CAST('{_Z_975}' AS DOUBLE)"
    " THEN 1 ELSE 0 END AS BIGINT)"
)


@register(
    "diebold_mariano",
    oracle=f"""
    WITH buckets AS (
      SELECT event_type, date_trunc('hour', ts) AS hb,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    fc AS (
      SELECT event_type, c,
             lag(c, 1) OVER (PARTITION BY event_type ORDER BY hb) AS f1,
             lag(c, 24) OVER (PARTITION BY event_type ORDER BY hb) AS f2
      FROM buckets
    ),
    d AS (
      SELECT event_type,
             (c - f1) * (c - f1) - (c - f2) * (c - f2) AS dt,
             (c - f1) * (c - f1) AS e1sq,
             (c - f2) * (c - f2) AS e2sq
      FROM fc WHERE f1 IS NOT NULL AND f2 IS NOT NULL
    ),
    s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(dt) AS BIGINT) AS s1,
             CAST(sum(dt * dt) AS BIGINT) AS s2,
             CAST(sum(e1sq) AS BIGINT) AS sse_naive,
             CAST(sum(e2sq) AS BIGINT) AS sse_seasonal
      FROM d GROUP BY event_type
    )
    SELECT event_type, n, s1, s2, sse_naive, sse_seasonal,
           {_DM_COL} AS dm_stat,
           {_REJ} AS reject_equal_loss
    FROM s
    """,
)
def diebold_mariano(spark, sf_dir):
    """TS77: Diebold-Mariano between the row-naive and seasonal
    row-naive hourly forecasters per event type (module header) —
    int64 loss-differential sufficient statistics, one float tree,
    floor-1e6."""
    from pyspark.sql import Window

    buckets = (
        T(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hb"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = Window.partitionBy("event_type").orderBy("hb")
    fc = buckets.select(
        "event_type",
        "c",
        F.lag("c", 1).over(w).alias("f1"),
        F.lag("c", 24).over(w).alias("f2"),
    ).where(F.col("f1").isNotNull() & F.col("f2").isNotNull())
    d = fc.select(
        "event_type",
        (
            (F.col("c") - F.col("f1")) * (F.col("c") - F.col("f1"))
            - (F.col("c") - F.col("f2")) * (F.col("c") - F.col("f2"))
        ).alias("dt"),
        ((F.col("c") - F.col("f1")) * (F.col("c") - F.col("f1"))).alias(
            "e1sq"
        ),
        ((F.col("c") - F.col("f2")) * (F.col("c") - F.col("f2"))).alias(
            "e2sq"
        ),
    )
    s = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dt").cast("long").alias("s1"),
        F.sum(F.col("dt") * F.col("dt")).cast("long").alias("s2"),
        F.sum("e1sq").cast("long").alias("sse_naive"),
        F.sum("e2sq").cast("long").alias("sse_seasonal"),
    )
    return s.select(
        "event_type",
        "n",
        "s1",
        "s2",
        "sse_naive",
        "sse_seasonal",
        F.expr(_DM_COL).alias("dm_stat"),
        F.expr(_REJ).alias("reject_equal_loss"),
    )
