"""TS114 — Kendall's coefficient of concordance W (Kendall–Babington
Smith Ann.Math.Stat.'39; tie correction per Kendall'48): do m
independent "judges" agree on the ranking of n objects?  Here the
five event-type streams judge the 24 hours of the day by activity
volume — the "do all streams share one daily profile?" dial, the
m-way generalization the pairwise correlation family (TS15/TS58)
cannot express (W is the variance of rank SUMS, algebraically the
average Spearman ρ over all m(m−1)/2 judge pairs:
ρ̄ = (mW − 1)/(m − 1)).

    W = S / [ m²(n³−n)/12 − m·ΣT_j ],   S = Σ_h (R_h − m(n+1)/2)²,
    T_j = Σ_ties (t³−t)/12,   χ² = m(n−1)·W  (df = n−1)

Exactness: the full type × hour spine (missing cells count 0, so
the object set is always exactly n = 24); within-judge midranks
DOUBLED to stay integer (R2 = 2·rank() + tie − 1, the TS15
posture) — then S2 = Σ_h (R2_h − m(n+1))² and T2 = Σ(t³−t) are
exact INT64 and W = 3·S2/(m²(n³−n) − m·T2) is ONE float division;
χ² = m(n−1)·W, floor-1e6, verdict vs the pinned
χ²₀.₉₅(23) = 35.172461626908 literal (series-evaluated regularized
incomplete gamma, re-derived in the gate).

Honest (gated) reading — measured: the five streams do NOT share a
daily profile — W = 0.2241, χ² = 25.77 < 35.17, and the average
pairwise Spearman implied is ρ̄ = (5W − 1)/4 = 0.030 ≈ 0 — the
FOURTH independent temporal dial (after TS93's pinned-trig clock,
TS102's Rayleigh and TS113's five JT dials) to conclude the event
stream carries no shared time-of-day structure; four instruments
of four different families agreeing is the calibration story the
registry builds.  Gates: the no-tie identity W = 1 for m copies of
one ranking; the single-judge degeneracy (W ≡ 1 at m = 1); planted
shared-profile-plus-noise firing hard with ρ̄ > 0.5; planted
independent judges landing in the null band E[W] ≈ 1/m; the
tie-corrected W vs plain W on tie-free data (equal); the corpus
no-fire + ρ̄ ≈ 0 reads pinned.

Scale shape: one pivot-count exchange to m·n = 120 rows, two
partitioned windows inside one exchange, one final single-row
aggregate — constant-size whatever the corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_M = 5
_NH = 24
_CRIT = "35.172461626908"  # χ²₀.₉₅(23)

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_W = (
    f"(3.0 * CAST(s2 AS DOUBLE)"
    f" / (CAST({_M} AS DOUBLE) * CAST({_M} AS DOUBLE)"
    f" * CAST({_NH}*{_NH}*{_NH} - {_NH} AS DOUBLE)"
    f" - CAST({_M} AS DOUBLE) * CAST(t2 AS DOUBLE)))"
)
_CHI2 = f"(CAST({_M} AS DOUBLE) * CAST({_NH} - 1 AS DOUBLE) * {_W})"
_RHOBAR = f"((CAST({_M} AS DOUBLE) * {_W} - 1.0) / CAST({_M} - 1 AS DOUBLE))"


def _out() -> list[str]:
    return [
        f"CAST({_M} AS BIGINT) AS m_judges",
        f"CAST({_NH} AS BIGINT) AS n_objects",
        "CAST(s2 AS BIGINT) AS s2_stat",
        "CAST(t2 AS BIGINT) AS tie2_sum",
        _F6.format(x=_W) + " AS w",
        _F6.format(x=_CHI2) + " AS chi2_stat",
        f"CAST('{_CRIT}' AS DOUBLE) AS crit_05",
        f"CAST(CASE WHEN {_CHI2} > CAST('{_CRIT}' AS DOUBLE)"
        " THEN 1 ELSE 0 END AS BIGINT) AS reject_concordance",
        _F6.format(x=_RHOBAR) + " AS rho_bar",
    ]


@register(
    "kendall_w_hours",
    oracle=f"""
    WITH types AS (
      SELECT DISTINCT event_type FROM events
    ),
    spine AS (
      SELECT event_type, CAST(t.h AS BIGINT) AS h
      FROM types, LATERAL unnest(range({_NH})) AS t(h)
    ),
    counts AS (
      SELECT event_type, CAST(hour(ts) AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY event_type, hour(ts)
    ),
    cells AS (
      SELECT spine.event_type, spine.h,
             COALESCE(counts.cnt, 0) AS cnt
      FROM spine LEFT JOIN counts
        ON spine.event_type = counts.event_type AND spine.h = counts.h
    ),
    ranked AS (
      SELECT event_type, h, cnt,
        2 * rank() OVER (PARTITION BY event_type ORDER BY cnt)
          + count(*) OVER (PARTITION BY event_type, cnt) - 1 AS r2,
        count(*) OVER (PARTITION BY event_type, cnt) AS tsz
      FROM cells
    ),
    hsums AS (
      SELECT h, CAST(sum(r2) AS BIGINT) AS r2h FROM ranked GROUP BY h
    ),
    s2v AS (
      SELECT CAST(sum((r2h - {_M} * ({_NH} + 1))
                  * (r2h - {_M} * ({_NH} + 1))) AS BIGINT) AS s2
      FROM hsums
    ),
    tie AS (
      SELECT CAST(COALESCE(sum(tsz * tsz * tsz - tsz), 0) AS BIGINT)
               AS t2_raw
      FROM (
        SELECT event_type, cnt, any_value(tsz) AS tsz
        FROM ranked GROUP BY event_type, cnt
      )
    )
    SELECT {", ".join(_out())}
    FROM (SELECT s2, t2_raw AS t2 FROM s2v, tie)
    """,
)
def kendall_w_hours(spark, sf_dir):
    """TS114: Kendall's W of the five event-type hourly-activity
    rankings (module header) — full spine, doubled midranks, INT64
    S2/T2, one float division, floor-1e6."""
    ev = T(spark, sf_dir, "events")
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(
        spark.range(_NH).select(F.col("id").cast("long").alias("h"))
    )
    counts = ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("h")
    ).agg(F.count("*").cast("long").alias("cnt"))
    cells = spine.join(counts, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    wr = Window.partitionBy("event_type").orderBy("cnt")
    wt = Window.partitionBy("event_type", "cnt")
    ranked = cells.select(
        "event_type",
        "h",
        "cnt",
        (2 * F.rank().over(wr) + F.count("*").over(wt) - 1).alias("r2"),
        F.count("*").over(wt).alias("tsz"),
    )
    hsums = ranked.groupBy("h").agg(
        F.sum("r2").cast("long").alias("r2h")
    )
    s2v = hsums.agg(
        F.sum(
            (F.col("r2h") - _M * (_NH + 1))
            * (F.col("r2h") - _M * (_NH + 1))
        )
        .cast("long")
        .alias("s2")
    )
    tie = (
        ranked.groupBy("event_type", "cnt")
        .agg(F.expr("any_value(tsz)").alias("tsz"))
        .agg(
            F.coalesce(
                F.sum(
                    F.col("tsz") * F.col("tsz") * F.col("tsz")
                    - F.col("tsz")
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("t2")
        )
    )
    return s2v.crossJoin(F.broadcast(tie)).selectExpr(*_out())
