"""Rolling-window robust filtering + recursive state estimation,
round-3 batch: the Hampel filter (rolling median/MAD despiker — the
standard robust alternative to a rolling-mean z-score, cf. Pearson et
al. 2016) and a 1-D random-walk Kalman filter — both BIT-EXACT
driver-oracled (no rounding tolerance anywhere).

TS22 — Hampel: medians are computed POSITIONALLY (lower median
``sorted[(c+1) div 2]``, 1-indexed) over the centered ROWS frame, so
there is no engine quantile interpolation to reconcile; the frame is
made deterministic by a TOTAL order (ts, value, event_id).  The
deviation |x − med| is one subtraction, MAD a positional pick over
those, and the spike test |x − med| > 3·1.4826·MAD one shared
multiply — every output column hashes with no tolerance.  Plan: one
hash shuffle on user_id; the single window sort is shared by the
frame aggregate (no partition-less window anywhere).

TS23 — Kalman (random-walk state, q = 1, r = 4): the per-series
recursion
    p⁻ = p + q;   K = p⁻/(p⁻ + r);   x̂' = x̂ + K·(z − x̂);
    p' = (1 − K)·p⁻
is a two-state left fold exactly like the Holt fold in tshyper_q —
Spark ``aggregate`` and DuckDB ``list_reduce`` walk the IDENTICAL
inlined op tree (no let-binding in SQL lambdas, so p⁻ and K are
spelled out verbatim in both engines), making the terminal level,
variance and next-step gain bit-identical.  Note p converges to the
fixed point of p' = (p+1)·4/(p+5) (golden-ratio-style quadratic), so
the emitted steady-state gain also doubles as a convergence probe.
Zero shuffles — the fold runs inside the scan projection.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import T, register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 256

# ---------------------------------------------------------------------------
# TS22 — Hampel filter (rolling median / MAD despike)
# ---------------------------------------------------------------------------

_HALF = 5  # centered window: 5 preceding + current + 5 following
_K_SIGMA = "CAST(3 AS DOUBLE) * CAST(1.4826 AS DOUBLE)"


@register(
    "hampel_filter",
    oracle=f"""
    WITH s AS (
      SELECT event_id, user_id, epoch_us(ts) AS tu, value
      FROM events WHERE event_type = 'click'
    ),
    w AS (
      SELECT event_id, user_id, tu, value,
             list_sort(list(value) OVER (
               PARTITION BY user_id ORDER BY tu, value, event_id
               ROWS BETWEEN {_HALF} PRECEDING AND {_HALF} FOLLOWING
             )) AS frame
      FROM s
    ),
    m AS (
      SELECT event_id, user_id, tu, value,
             len(frame) AS frame_n,
             frame[(len(frame) + 1) // 2] AS med
      FROM w
    ),
    d AS (
      SELECT *, list_sort(list(abs(value - med)) OVER (
               PARTITION BY user_id ORDER BY tu, value, event_id
               ROWS BETWEEN {_HALF} PRECEDING AND {_HALF} FOLLOWING
             )) AS devs
      FROM m
    )
    SELECT event_id, user_id, tu, value, frame_n, med,
           devs[(len(devs) + 1) // 2] AS mad,
           abs(value - med) AS dev,
           (abs(value - med) > {_K_SIGMA} * devs[(len(devs) + 1) // 2])
             AS is_spike
    FROM d
    """,
)
def hampel_filter(spark, sf_dir):
    """TS22: Hampel despike filter over each user's 'click' series —
    rolling lower-median and lower-median absolute deviation over a
    centered 11-row frame (total order ts, value, event_id so both
    engines see identical frames), spike when
    |x − med| > 3·1.4826·MAD.  All columns are positional picks /
    single-op float expressions — bit-exact, no rounding.  NOTE: the
    second window (MAD) deliberately re-frames over the rolling
    median's OWN deviations (the classic two-pass Hampel), and both
    windows share one shuffle + sort on (user_id, tu, value,
    event_id).  At 100 TB this is the shape you want: one exchange,
    frames bounded at 11 rows, no global sort."""
    s = T(spark, sf_dir, "events").where(
        F.col("event_type") == "click"
    ).select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tu"),
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tu", "value", "event_id")
        .rowsBetween(-_HALF, _HALF)
    )
    m = s.withColumn(
        "frame", F.sort_array(F.collect_list("value").over(w))
    ).select(
        "event_id",
        "user_id",
        "tu",
        "value",
        F.size("frame").alias("frame_n"),
        F.expr("element_at(frame, CAST((size(frame) + 1) DIV 2 AS INT))").alias(
            "med"
        ),
    )
    d = m.withColumn(
        "devs",
        F.sort_array(F.collect_list(F.abs(F.col("value") - F.col("med"))).over(w)),
    )
    return d.select(
        "event_id",
        "user_id",
        "tu",
        "value",
        "frame_n",
        "med",
        F.expr("element_at(devs, CAST((size(devs) + 1) DIV 2 AS INT))").alias(
            "mad"
        ),
        F.abs(F.col("value") - F.col("med")).alias("dev"),
        (
            F.abs(F.col("value") - F.col("med"))
            > F.expr(_K_SIGMA)
            * F.expr("element_at(devs, CAST((size(devs) + 1) DIV 2 AS INT))")
        ).alias("is_spike"),
    )


# ---------------------------------------------------------------------------
# TS23 — 1-D Kalman filter fold (random walk + noisy observation)
# ---------------------------------------------------------------------------

# state s = [xhat, p]; observation z = e[0]; q = 1, r = 4, inlined so the
# op tree is spelled identically in Spark and DuckDB (no let-binding in
# SQL lambdas). p- = p + 1 appears three times, K = p-/(p- + 4) twice.
_KAL_SPARK = """
aggregate(
  slice(transform(tokens, t -> CAST(t AS DOUBLE)), 2, n_tok - 1),
  array(CAST(element_at(tokens, 1) AS DOUBLE), CAST(1 AS DOUBLE)),
  (s, z) -> array(
    element_at(s, 1)
      + ((element_at(s, 2) + CAST(1 AS DOUBLE))
         / ((element_at(s, 2) + CAST(1 AS DOUBLE)) + CAST(4 AS DOUBLE)))
        * (z - element_at(s, 1)),
    (CAST(1 AS DOUBLE)
     - ((element_at(s, 2) + CAST(1 AS DOUBLE))
        / ((element_at(s, 2) + CAST(1 AS DOUBLE)) + CAST(4 AS DOUBLE))))
      * (element_at(s, 2) + CAST(1 AS DOUBLE))))
"""

_KAL_DUCK = """
list_reduce(
  list_transform(tokens, t -> [CAST(t AS DOUBLE), CAST(1 AS DOUBLE)]),
  (s, e) -> [
    s[1] + ((s[2] + CAST(1 AS DOUBLE))
            / ((s[2] + CAST(1 AS DOUBLE)) + CAST(4 AS DOUBLE)))
           * (e[1] - s[1]),
    (CAST(1 AS DOUBLE)
     - ((s[2] + CAST(1 AS DOUBLE))
        / ((s[2] + CAST(1 AS DOUBLE)) + CAST(4 AS DOUBLE))))
      * (s[2] + CAST(1 AS DOUBLE))])
"""


@register(
    "kalman_filter",
    oracle=synth_sql(_N)
    + f"""
    , kq AS (SELECT doc_id, n_tok, {_KAL_DUCK} AS st FROM synth)
    SELECT doc_id, n_tok, st[1] AS level, st[2] AS variance,
           (st[2] + CAST(1 AS DOUBLE))
             / ((st[2] + CAST(1 AS DOUBLE)) + CAST(4 AS DOUBLE)) AS gain_next
    FROM kq
    """,
)
def kalman_filter(spark, sf_dir):
    """TS23: 1-D Kalman filter (random-walk state, process noise q = 1,
    observation noise r = 4) folded over each token series with an
    ``array<double>`` [level, variance] state — Spark ``aggregate``
    mirrors DuckDB ``list_reduce`` op-for-op (module docstring), so the
    terminal level, posterior variance, and next-step Kalman gain are
    driver-hashed bit-exactly with no tolerance.  The variance fixed
    point solves p² + qp − qr = 0, i.e. p* = (√17 − 1)/2 ≈ 1.5616, so
    gain_next ≈ 0.3904 for every long series — an in-data convergence
    check (gated in tests).  Zero shuffles; the
    fold runs inside the scan projection (whole-stage codegen)."""
    df = synth.sequences_df(spark, _N)
    out = df.select("doc_id", "n_tok", F.expr(_KAL_SPARK).alias("st"))
    return out.select(
        "doc_id",
        "n_tok",
        F.expr("element_at(st, 1)").alias("level"),
        F.expr("element_at(st, 2)").alias("variance"),
        F.expr(
            "(element_at(st, 2) + CAST(1 AS DOUBLE))"
            " / ((element_at(st, 2) + CAST(1 AS DOUBLE)) + CAST(4 AS DOUBLE))"
        ).alias("gain_next"),
    )
