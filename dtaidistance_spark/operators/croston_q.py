"""TS52 — Croston's method for intermittent demand (Croston OR
Quarterly 1972; Syntetos-Boylan IJF'05 bias correction): the standard
forecaster for SPARSE series — separate exponential smoothing of the
non-zero demand SIZES and of the INTER-demand INTERVALS, forecast
rate = ẑ/q̂ (SBA multiplies by 1−α/2).  Purchase events per user are
exactly this shape; naive SES on the raw (mostly-zero) daily series
is biased — Croston exists to fix that.

Exactness: demand sizes integerized to cents (exact for 2-dp values,
the stream_counter_agg precedent), intervals in integer DAYS; each
user's demand history is collected into ONE time-sorted array and
both SES recursions (α = 1/4, z₀ = first size, q₀ = first interval)
are computed closed-form per position with bounded O(n²) order-pinned
folds (the TS51 pattern) — no float aggregate anywhere.  The final
rates are single divides (floor-1e6).

Scale shape: one (user) exchange for the collect; per-user state
bounded by that user's demand count.  Users with < 4 purchases are
excluded (declared: Croston needs a history).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_MINP = 4
_BET = "CAST(0.75 AS DOUBLE)"  # 1 - alpha
_ALP = "CAST(0.25 AS DOUBLE)"

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _ses_final(eng: str, arr: str) -> str:
    """Final SES level after folding the whole int64 array ``arr``:
    s_last = β^(n−1)·x₁ + α·Σ_{k=2..n} β^(n−k)·x_k (s₀ = x₁),
    spelled as one order-pinned fold over positions 1..n−1."""
    sp = eng == "spark"
    n = f"size({arr})" if sp else f"len({arr})"
    el = (
        (lambda i: f"element_at({arr}, {i})")
        if sp
        else (lambda i: f"{arr}[{i}]")
    )
    seq = (
        f"sequence(1, {n} - 1)" if sp else f"range(1, {n})"
    )
    term = (
        f"pow({_BET}, CAST({n} - 1 - k AS DOUBLE))"
        f" * CAST({el('k + 1')} AS DOUBLE)"
    )
    if sp:
        fold = (
            f"aggregate({seq}, CAST(0 AS DOUBLE), (a, k) -> a + {term})"
        )
    else:
        fold = (
            f"list_reduce(list_prepend(CAST(0 AS DOUBLE),"
            f" list_transform({seq}, k -> {term})), (a, x) -> a + x)"
        )
    return (
        f"(pow({_BET}, CAST({n} - 1 AS DOUBLE))"
        f" * CAST({el('1')} AS DOUBLE) + {_ALP} * ({fold}))"
    )


_RATE = "(zhat / qhat)"
_SBA = f"((CAST(1 AS DOUBLE) - {_ALP} / CAST(2 AS DOUBLE)) * zhat / qhat)"


@register(
    "croston_demand",
    oracle=f"""
    WITH p AS (
      SELECT user_id, epoch_us(ts) // 86400000000 AS day,
             CAST(floor(100.0 * value + 0.5) AS BIGINT) AS cents,
             epoch_us(ts) AS tu, event_id
      FROM events WHERE event_type = 'purchase'
    ),
    o AS (
      SELECT user_id, day, cents,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY tu, event_id) AS rn,
             lag(day) OVER (PARTITION BY user_id
                            ORDER BY tu, event_id) AS prev_day
      FROM p
    ),
    packed AS (
      SELECT user_id,
             list(cents ORDER BY rn) AS sizes,
             list(greatest(day - prev_day, 1) ORDER BY rn)
               FILTER (WHERE prev_day IS NOT NULL) AS gaps,
             CAST(count(*) AS BIGINT) AS n_demands
      FROM o GROUP BY user_id
      HAVING count(*) >= {_MINP}
    ),
    sm AS (
      SELECT user_id, n_demands,
             {_ses_final('duck', 'sizes')} AS zhat,
             {_ses_final('duck', 'gaps')} AS qhat
      FROM packed
    )
    SELECT user_id, n_demands,
           {_F6.format(x="zhat")} AS z_hat,
           {_F6.format(x="qhat")} AS q_hat,
           {_F6.format(x=_RATE)} AS croston_rate,
           {_F6.format(x=_SBA)} AS sba_rate
    FROM sm
    """,
)
def croston_demand(spark, sf_dir):
    """TS52: Croston/SBA intermittent-demand forecast per user
    (module header) — cents-integer sizes, integer day gaps
    (floor 1 for same-day repeat demand), closed-form SES folds,
    floor-1e6 outputs."""
    from pyspark.sql import Window

    p = (
        T(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.expr(
                "unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000"
            ).alias("day"),
            F.expr(
                "CAST(floor(100.0 * value + CAST(0.5 AS DOUBLE))"
                " AS BIGINT)"
            ).alias("cents"),
            F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("tu"),
            "event_id",
        )
    )
    w = Window.partitionBy("user_id").orderBy("tu", "event_id")
    o = p.withColumn("rn", F.row_number().over(w)).withColumn(
        "prev_day", F.lag("day").over(w)
    )
    packed = (
        o.groupBy("user_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list("
                "struct(rn, cents AS c))), z -> z.c)"
            ).alias("sizes"),
            F.expr(
                "transform(array_sort(collect_list(CASE WHEN prev_day"
                " IS NOT NULL THEN struct(rn,"
                " greatest(day - prev_day, CAST(1 AS BIGINT)) AS g)"
                " END)), z -> z.g)"
            ).alias("gaps"),
            F.count(F.lit(1)).cast("long").alias("n_demands"),
        )
        .where(F.col("n_demands") >= _MINP)
    )
    sm = packed.select(
        "user_id",
        "n_demands",
        F.expr(_ses_final("spark", "sizes")).alias("zhat"),
        F.expr(_ses_final("spark", "gaps")).alias("qhat"),
    )
    return sm.select(
        "user_id",
        "n_demands",
        F.expr(_F6.format(x="zhat")).alias("z_hat"),
        F.expr(_F6.format(x="qhat")).alias("q_hat"),
        F.expr(_F6.format(x=_RATE)).alias("croston_rate"),
        F.expr(_F6.format(x=_SBA)).alias("sba_rate"),
    )
