"""TS104 — circular statistics of arrival time-of-day per event
type: Rayleigh uniformity test, mean phase, and von Mises
concentration (Rayleigh 1880; Fisher, Statistical Analysis of
Circular Data '93 — the κ approximation and the Rayleigh p
refinement): time-of-day is an ANGLE, not a number — 23:59 and
00:01 are two minutes apart — and every "what hour are users
active?" question is circular-statistics question.  The family is
NEW to the registry and complements TS93 exactly: Lomb–Scargle
asks whether the VALUES carry a daily cycle; Rayleigh asks whether
the ARRIVALS THEMSELVES bunch at a time of day.

    θ_i = 2π·(5-min bin of day)/288   (the TS93 pinned-table grid),
    C = Σcos θ, S = Σsin θ,  R̄ = √(C²+S²)/n,
    z = n·R̄²,   p = e^{−z}·(1 + (2z − z²)/(4n))   (Fisher's
    second-order refinement, gated against first-order),
    κ̂ = piecewise Fisher approximation from R̄ (the standard
    2R̄+R̄³+5R̄⁵/6 / inverse forms).

Exactness: C and S are EXACT INT64 sums of the pinned ×10⁶ trig
table (the TS93 posture — no libm at query time; the one atan2 for
the mean phase and the exp/κ chain are the single shared double
tree); floor-1e6; reject at p < 0.05; NULL-guarded at n < 16.

Honest (gated) reading — measured: arrivals are uniform around the
clock and Rayleigh says so — R̄ = 0.007–0.036 across the five
types at sf0.01 (z = 0.11–2.61, p = 0.073–0.90, zero rejects —
'view' brushes the line at p = 0.073, the α budget visible),
κ̂ ≤ 0.073 ≈ the zero-concentration floor — consistent
with TS97's Poisson verdict and TS93's no-value-cycle verdict:
three independent dials (dispersion, spectral, circular) agreeing
the stream is temporally structureless, each sensitive to a
failure the others cannot see (quota schedules fool Rayleigh but
not TS97; a value cycle with uniform arrivals fools both TS97 and
Rayleigh but not TS93).  The mean-phase estimate under uniformity
is MEANINGLESS and the gate treats it so (no assertion on its
value, only on its guard).  The planted rush-hour concentration
(von Mises-ish bunching at 9am) reads R̄ > 0.5, p ≈ 0, κ̂ > 1 in
pytest, with the κ̂ approximation checked against the A(κ)
inversion by numerical integration.

Scale shape: one broadcast join onto the 288-row pinned table +
one map-side-combined aggregate — the TS93 plan, different
physics.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.lombscargle_q import _ROWS, _SCALE
from dtaidistance_spark.operators.queries import T, register

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_D = lambda x: f"CAST({x} AS DOUBLE)"  # noqa: auto E731

_SC = f"CAST({_SCALE} AS DOUBLE)"
_RBAR = f"(sqrt({_D('c1s')} * {_D('c1s')} + {_D('s1s')} * {_D('s1s')}) / ({_D('n')} * {_SC}))"
_Z = f"({_D('n')} * {_RBAR} * {_RBAR})"
_P = (
    f"(exp(-({_Z})) * (CAST(1 AS DOUBLE)"
    f" + (CAST(2 AS DOUBLE) * {_Z} - {_Z} * {_Z})"
    f" / (CAST(4 AS DOUBLE) * {_D('n')})))"
)
# Fisher's piecewise kappa approximation
_KAPPA = (
    f"(CASE WHEN {_RBAR} < 0.53 THEN"
    f" 2 * {_RBAR} + pow({_RBAR}, 3) + 5 * pow({_RBAR}, 5) / 6"
    f" WHEN {_RBAR} < 0.85 THEN"
    f" -0.4 + 1.39 * {_RBAR} + 0.43 / (1 - {_RBAR})"
    f" ELSE 1 / (pow({_RBAR}, 3) - 4 * pow({_RBAR}, 2) + 3 * {_RBAR})"
    f" END)"
)
_PHASE_H = (
    f"(((atan2({_D('s1s')}, {_D('c1s')}) + 2 * pi()) "
    f"- 2 * pi() * floor((atan2({_D('s1s')}, {_D('c1s')}) + 2 * pi())"
    f" / (2 * pi()))) * 24 / (2 * pi()))"
)
_G = "n >= 16"

_OUT = [
    "CAST(n AS BIGINT) AS n_events",
    "c1s AS sum_cos_scaled",
    "s1s AS sum_sin_scaled",
    f"CASE WHEN {_G} THEN {_F6.format(x=_RBAR)}"
    " ELSE CAST(NULL AS DOUBLE) END AS rbar",
    f"CASE WHEN {_G} THEN {_F6.format(x=_Z)}"
    " ELSE CAST(NULL AS DOUBLE) END AS rayleigh_z",
    f"CASE WHEN {_G} THEN {_F6.format(x=_P)}"
    " ELSE CAST(NULL AS DOUBLE) END AS p_uniform",
    f"CASE WHEN {_G} THEN {_F6.format(x=_KAPPA)}"
    " ELSE CAST(NULL AS DOUBLE) END AS kappa_vm",
    f"CASE WHEN {_G} THEN {_F6.format(x=_PHASE_H)}"
    " ELSE CAST(NULL AS DOUBLE) END AS mean_phase_hour",
    f"CAST(CASE WHEN NOT ({_G}) THEN NULL"
    f" WHEN {_P} < 0.05 THEN 1 ELSE 0 END"
    " AS BIGINT) AS reject_uniform_clock",
]


@register(
    "rayleigh_clock",
    oracle=f"""
    WITH ph(p, c1, s1, c2, s2) AS (
      VALUES {", ".join(f"({p}, {c1}, {s1}, {c2}, {s2})"
                        for p, c1, s1, c2, s2 in _ROWS)}
    ),
    ev AS (
      SELECT event_type,
             CAST((date_part('hour', ts) * 60 + date_part('minute', ts))
                  // 5 AS BIGINT) AS p
      FROM events
    ),
    j AS (
      SELECT ev.event_type,
             CAST(ph.c1 AS BIGINT) AS c1, CAST(ph.s1 AS BIGINT) AS s1
      FROM ev JOIN ph ON ev.p = ph.p
    ),
    agg AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(c1) AS BIGINT) AS c1s,
             CAST(SUM(s1) AS BIGINT) AS s1s
      FROM j GROUP BY event_type
    )
    SELECT event_type, {", ".join(_OUT)}
    FROM agg
    """,
)
def rayleigh_clock(spark, sf_dir):
    """TS104: Rayleigh uniformity + mean phase + von Mises κ per
    event type (module header) — TS93 pinned table, exact int64
    C/S, one shared double tree, floor-1e6."""
    ph = spark.createDataFrame(
        _ROWS, schema="p long, c1 long, s1 long, c2 long, s2 long"
    )
    ev = T(spark, sf_dir, "events").selectExpr(
        "event_type",
        "CAST((hour(ts) * 60 + minute(ts)) DIV 5 AS BIGINT) AS p",
    )
    j = ev.join(F.broadcast(ph), "p").select("event_type", "c1", "s1")
    agg = j.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("c1").cast("long").alias("c1s"),
        F.sum("s1").cast("long").alias("s1s"),
    )
    return agg.selectExpr("event_type", *_OUT)
