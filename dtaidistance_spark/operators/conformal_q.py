"""TS49 — split conformal prediction intervals (Vovk's inductive
conformal; Lei et al. JASA'18; the distribution-free-coverage recipe
production forecasting now ships): wrap TS38's seasonal-naive
forecast with intervals whose finite-sample coverage is guaranteed
≥ 1−α WITHOUT any distributional assumption — q̂ = the
⌈(n_cal+1)(1−α)⌉-th smallest calibration residual, interval =
forecast ± q̂.

Exactness: daily means are floored 1e-6 FIRST (the TS38 precedent),
so residuals are exact differences of identical doubles; the
⌈·⌉-quantile index is pure integer algebra (k = (4·(n_cal+1)+4) DIV 5
at α = 0.2), and the k-th smallest VALUE of the residual multiset is
tie-free (the MPdist argument) — selected via a PARTITIONED
row_number with (residual, day) total-order ties.  Coverage flags are
integers.

Calibration = days with a defined forecast before the 7-day test
window; test = the last 7 days per type (the TS38 split).

Scale shape: per-type windows only (one event_type exchange shared by
all of them), one calibration aggregate, broadcast q̂ join back.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_P = 7  # seasonal lag
_TEST = 7  # held-out days
# k = ceil((n_cal + 1) * (1 - alpha)) at alpha = 1/5
_K_DUCK = "(4 * (n_cal + 1) + 4) // 5"
_K_SPARK = "(4 * (n_cal + 1) + 4) DIV 5"

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


@register(
    "conformal_forecast",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             {_F6.format(x="(sum(value) / CAST(count(*) AS DOUBLE))")}
               AS dm
      FROM events GROUP BY 1, 2
    ),
    idx AS (
      SELECT event_type, day, dm,
             row_number() OVER (PARTITION BY event_type ORDER BY day) - 1
               AS t,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM daily
    ),
    lagd AS (
      SELECT event_type, day, t, n, dm,
             lag(dm, {_P}) OVER (PARTITION BY event_type ORDER BY t)
               AS fcst
      FROM idx
    ),
    cal AS (
      SELECT event_type, day, abs(dm - fcst) AS resid
      FROM lagd WHERE fcst IS NOT NULL AND t < n - {_TEST}
    ),
    ncal AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_cal
      FROM cal GROUP BY event_type
    ),
    rk AS (
      SELECT c.event_type, c.resid,
             row_number() OVER (PARTITION BY c.event_type
                                ORDER BY c.resid, c.day) AS rn,
             n.n_cal
      FROM cal c JOIN ncal n USING (event_type)
    ),
    qh AS (
      SELECT event_type, n_cal, resid AS qhat
      FROM rk WHERE rn = {_K_DUCK}
    ),
    test AS (
      SELECT l.event_type, l.day, l.dm AS actual, l.fcst,
             q.n_cal, q.qhat
      FROM lagd l JOIN qh q USING (event_type)
      WHERE l.t >= l.n - {_TEST} AND l.fcst IS NOT NULL
    )
    SELECT event_type, day, actual, fcst, n_cal,
           {_F6.format(x="qhat")} AS qhat,
           {_F6.format(x="(fcst - qhat)")} AS lo,
           {_F6.format(x="(fcst + qhat)")} AS hi,
           CAST(CASE WHEN actual >= fcst - qhat
                      AND actual <= fcst + qhat
                THEN 1 ELSE 0 END AS BIGINT) AS covered
    FROM test
    """,
)
def conformal_forecast(spark, sf_dir):
    """TS49: split conformal intervals around the seasonal-naive
    forecast (module header) — q̂ = the ⌈(n_cal+1)·0.8⌉-th smallest
    calibration residual (integer index, tie-free value), intervals
    fcst ± q̂ on the 7 held-out days, integer coverage flags."""
    daily = (
        T(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr(
                "unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000"
            ).alias("day"),
        )
        .agg(
            F.expr(
                _F6.format(x="(sum(value) / CAST(count(1) AS DOUBLE))")
            ).alias("dm")
        )
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    wt = Window.partitionBy("event_type")
    idx = daily.withColumn(
        "t", F.row_number().over(wo) - F.lit(1)
    ).withColumn("n", F.count(F.lit(1)).over(wt))
    lagd = idx.withColumn("fcst", F.lag("dm", _P).over(wo))
    cal = lagd.where(
        F.col("fcst").isNotNull() & (F.col("t") < F.col("n") - _TEST)
    ).select(
        "event_type", "day", F.abs(F.col("dm") - F.col("fcst")).alias("resid")
    )
    ncal = cal.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_cal")
    )
    wr = Window.partitionBy("event_type").orderBy("resid", "day")
    rk = cal.join(F.broadcast(ncal), "event_type").withColumn(
        "rn", F.row_number().over(wr)
    )
    qh = rk.where(F.expr(f"rn = {_K_SPARK}")).select(
        "event_type", "n_cal", F.col("resid").alias("qhat")
    )
    test = (
        lagd.where(
            (F.col("t") >= F.col("n") - _TEST)
            & F.col("fcst").isNotNull()
        )
        .join(F.broadcast(qh), "event_type")
    )
    return test.select(
        "event_type",
        "day",
        F.col("dm").alias("actual"),
        "fcst",
        "n_cal",
        F.expr(_F6.format(x="qhat")).alias("qhat"),
        F.expr(_F6.format(x="(fcst - qhat)")).alias("lo"),
        F.expr(_F6.format(x="(fcst + qhat)")).alias("hi"),
        F.expr(
            "CAST(CASE WHEN dm >= fcst - qhat AND dm <= fcst + qhat"
            " THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("covered"),
    )
