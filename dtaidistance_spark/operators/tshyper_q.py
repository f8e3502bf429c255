"""TimescaleDB-hyperfunction analogs, round-2 batch 4: Holt linear
(double-exponential) smoothing, time-weighted average, heartbeat/uptime
aggregation, and the M4 visualization downsampler — all fully
DuckDB-oracled; Holt and heartbeat with NO rounding tolerance.

Holt exactness: the two-state recursion (level, trend) folds left with
an ``array<double>`` state — Spark ``aggregate`` and DuckDB
``list_reduce`` walk the identical op sequence, alpha = beta = 1/2
keeps every scale step an exact division, so terminal states are
bit-identical. (DuckDB 1.0's STRUCT-state lambda mis-evaluates the
second field — verified against a hand fold — hence the list state;
list-state results match a strict Python left fold bit-for-bit in both
engines.)

Time arithmetic: event timestamps carry microseconds, so all deltas
use integer-microsecond epochs (Spark ``unix_micros`` == DuckDB
``epoch_us``, exact int64). The time-weighted average's cross-row
float sum is order-sensitive (ulp(1e13) > 1e-6), so only the FINAL
ratio is emitted, where the relative sum noise (~1e-13) collapses far
below the round(6) grain — the raw integral would not hash.

Scale: Holt is a scan-side fold (zero shuffles); TWA / heartbeat / M4
are one hash shuffle onto the entity key with a single window sort.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import T, register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 256

# ---------------------------------------------------------------------------
# TS6 — Holt linear smoothing (bit-exact list-state fold)
# ---------------------------------------------------------------------------

_HOLT_SPARK = """
aggregate(
  slice(transform(tokens, t -> CAST(t AS DOUBLE)), 2, n_tok - 1),
  array(CAST(element_at(tokens, 1) AS DOUBLE), CAST(0 AS DOUBLE)),
  (s, x) -> array(
    (x + (element_at(s, 1) + element_at(s, 2))) / CAST(2 AS DOUBLE),
    (element_at(s, 2)
     + (((x + (element_at(s, 1) + element_at(s, 2))) / CAST(2 AS DOUBLE))
        - element_at(s, 1))) / CAST(2 AS DOUBLE)))
"""

_HOLT_DUCK = """
list_reduce(
  list_transform(tokens, t -> [CAST(t AS DOUBLE), CAST(0 AS DOUBLE)]),
  (s, e) -> [
    (e[1] + (s[1] + s[2])) / CAST(2 AS DOUBLE),
    (s[2] + (((e[1] + (s[1] + s[2])) / CAST(2 AS DOUBLE)) - s[1]))
      / CAST(2 AS DOUBLE)])
"""


@register(
    "holt_smooth",
    oracle=synth_sql(_N)
    + f"""
    , hq AS (SELECT doc_id, n_tok, {_HOLT_DUCK} AS st FROM synth)
    SELECT doc_id, n_tok, st[1] AS level, st[2] AS trend,
           st[1] + st[2] AS forecast1
    FROM hq
    """,
)
def holt_smooth(spark, sf_dir):
    """TS6: Holt linear-trend (double-exponential) smoothing per series
    at alpha = beta = 1/2: l' = (x + (l + b))/2, b' = (b + (l' - l))/2,
    initialized (l, b) = (x_1, 0). The two-state left fold is
    bit-identical across engines (see module docstring), so level,
    trend, AND the one-step forecast l+b are driver-hashed with no
    tolerance. Zero shuffles — the fold runs inside the scan
    projection. (DuckDB's list_reduce seeds with the first element;
    Spark mirrors it with an explicit init + slice-from-2.)"""
    df = synth.sequences_df(spark, _N)
    out = df.select(
        "doc_id", "n_tok", F.expr(_HOLT_SPARK).alias("st")
    )
    return out.select(
        "doc_id",
        "n_tok",
        F.expr("element_at(st, 1)").alias("level"),
        F.expr("element_at(st, 2)").alias("trend"),
        F.expr("element_at(st, 1) + element_at(st, 2)").alias("forecast1"),
    )


# ---------------------------------------------------------------------------
# TS7 — time-weighted average (TimescaleDB time_weight 'LOCF')
# ---------------------------------------------------------------------------


@register(
    "time_weighted_avg",
    oracle="""
    WITH s AS (
      SELECT user_id, epoch_us(ts) AS tu, value
      FROM events WHERE event_type = 'error'
    ),
    l AS (
      SELECT *, lead(tu) OVER (PARTITION BY user_id ORDER BY tu, value)
               AS nxt
      FROM s
    ),
    a AS (
      SELECT user_id,
             count(*) AS n_samples,
             sum(CASE WHEN nxt IS NULL THEN 0
                      ELSE value * CAST(nxt - tu AS DOUBLE) END) AS num,
             sum(CASE WHEN nxt IS NULL THEN 0 ELSE nxt - tu END)::BIGINT
               AS span_us
      FROM l GROUP BY user_id
    )
    SELECT user_id, n_samples, span_us,
           round(num / CAST(span_us AS DOUBLE), 6) AS twa
    FROM a WHERE span_us > 0
    """,
)
def time_weighted_avg(spark, sf_dir):
    """TS7: time-weighted average over irregular samples (TimescaleDB
    ``time_weight('LOCF')`` + ``average``): each sample's value holds
    until the next one, so twa = sum(v_i * dt_i) / sum(dt_i) over
    consecutive deltas — the honest mean for unevenly-spaced telemetry
    where a plain avg() over-weights bursts. Integer-microsecond
    deltas; only the final ratio is emitted (see module docstring for
    why the raw integral cannot hash), round(6) both sides. One
    shuffle on user_id; the lead() and the aggregate share one sort."""
    ev = T(spark, sf_dir, "events").where(F.col("event_type") == "error")
    s = ev.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tu"),
        "value",
    )
    w = Window.partitionBy("user_id").orderBy("tu", "value")
    led = s.withColumn("nxt", F.lead("tu").over(w))
    a = led.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.sum(
            F.when(F.col("nxt").isNull(), 0.0).otherwise(
                F.col("value") * (F.col("nxt") - F.col("tu")).cast("double")
            )
        ).alias("num"),
        F.sum(
            F.when(F.col("nxt").isNull(), F.lit(0)).otherwise(
                F.col("nxt") - F.col("tu")
            )
        ).alias("span_us"),
    )
    return a.where(F.col("span_us") > 0).select(
        "user_id",
        "n_samples",
        "span_us",
        F.round(F.col("num") / F.col("span_us").cast("double"), 6).alias(
            "twa"
        ),
    )


# ---------------------------------------------------------------------------
# TS8 — heartbeat / uptime aggregation (TimescaleDB heartbeat_agg)
# ---------------------------------------------------------------------------

_HB_US = 30 * 60 * 1_000_000  # liveness window per heartbeat: 30 min


@register(
    "heartbeat_agg",
    oracle=f"""
    WITH s AS (
      SELECT user_id, epoch_us(ts) AS tu
      FROM events WHERE event_type = 'signup'
    ),
    l AS (
      SELECT *, lead(tu) OVER (PARTITION BY user_id ORDER BY tu) AS nxt
      FROM s
    )
    SELECT user_id,
           count(*) AS n_beats,
           coalesce(max(nxt - tu), 0)::BIGINT AS longest_gap_us,
           (sum(CASE WHEN nxt IS NULL THEN {_HB_US}
                     ELSE least(nxt - tu, {_HB_US}) END))::BIGINT
             AS uptime_us,
           (max(tu) - min(tu) + {_HB_US})::BIGINT AS span_us,
           (CAST(sum(CASE WHEN nxt IS NULL THEN {_HB_US}
                          ELSE least(nxt - tu, {_HB_US}) END) AS DOUBLE)
            * CAST(100 AS DOUBLE))
             / CAST(max(tu) - min(tu) + {_HB_US} AS DOUBLE) AS uptime_pct
    FROM l GROUP BY user_id
    """,
)
def heartbeat_agg(spark, sf_dir):
    """TS8: heartbeat liveness aggregation (TimescaleDB
    ``heartbeat_agg``): each 'signup' event keeps its user live for 30
    minutes; uptime is the measure of the union of those intervals —
    sum(min(delta, T)) over consecutive beats plus T for the last —
    against the covered span. Everything integer microseconds, and the
    final percentage is ONE division of identical exact ints, so every
    column is driver-hashed with no tolerance (longest silent gap
    included — the SLO metric). One shuffle on user_id."""
    ev = T(spark, sf_dir, "events").where(F.col("event_type") == "signup")
    s = ev.select("user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("tu"))
    w = Window.partitionBy("user_id").orderBy("tu")
    led = s.withColumn("nxt", F.lead("tu").over(w))
    up = F.sum(
        F.when(F.col("nxt").isNull(), F.lit(_HB_US)).otherwise(
            F.least(F.col("nxt") - F.col("tu"), F.lit(_HB_US))
        )
    )
    span = F.max("tu") - F.min("tu") + F.lit(_HB_US)
    return led.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_beats"),
        F.coalesce(F.max(F.col("nxt") - F.col("tu")), F.lit(0)).alias(
            "longest_gap_us"
        ),
        up.alias("uptime_us"),
        span.alias("span_us"),
        (
            (up.cast("double") * F.lit(100).cast("double"))
            / span.cast("double")
        ).alias("uptime_pct"),
    )


# ---------------------------------------------------------------------------
# TS9 — M4 downsampling (Jugel et al., VLDB'14)
# ---------------------------------------------------------------------------


@register(
    "m4_downsample",
    oracle="""
    WITH s AS (
      SELECT user_id, date_trunc('day', ts)::TIMESTAMP AS day,
             ts, event_id, value
      FROM events WHERE event_type = 'view'
    ),
    r AS (
      SELECT *,
        row_number() OVER (PARTITION BY user_id, day
                           ORDER BY value, ts, event_id) AS rn_min,
        row_number() OVER (PARTITION BY user_id, day
                           ORDER BY value DESC, ts DESC, event_id DESC)
          AS rn_max,
        row_number() OVER (PARTITION BY user_id, day
                           ORDER BY ts, event_id) AS rn_first,
        row_number() OVER (PARTITION BY user_id, day
                           ORDER BY ts DESC, event_id DESC) AS rn_last
      FROM s
    )
    SELECT user_id, day,
           count(*) AS n,
           max(CASE WHEN rn_min = 1 THEN value END) AS v_min,
           max(CASE WHEN rn_max = 1 THEN value END) AS v_max,
           max(CASE WHEN rn_first = 1 THEN value END) AS v_first,
           max(CASE WHEN rn_last = 1 THEN value END) AS v_last,
           max(CASE WHEN rn_first = 1 THEN ts END)::TIMESTAMP AS ts_first,
           max(CASE WHEN rn_last = 1 THEN ts END)::TIMESTAMP AS ts_last
    FROM r GROUP BY user_id, day
    """,
)
def m4_downsample(spark, sf_dir):
    """TS9: M4 downsampling (Jugel et al., VLDB'14) — per (user, day)
    pixel-bucket keep exactly the min, max, FIRST, and LAST points,
    the four values a line renderer needs for an error-free plot at
    bucket resolution (min/max alone distort edge pixels). Pure
    selection with deterministic tie-breaks — no arithmetic on values,
    so no rounding is needed anywhere. One shuffle on the bucket key;
    the four ranks share the same partitioning."""
    ev = (
        T(spark, sf_dir, "events")
        .where(F.col("event_type") == "view")
        .withColumn("day", F.date_trunc("day", "ts"))
    )
    wmin = Window.partitionBy("user_id", "day").orderBy(
        "value", "ts", "event_id"
    )
    wmax = Window.partitionBy("user_id", "day").orderBy(
        F.col("value").desc(), F.col("ts").desc(), F.col("event_id").desc()
    )
    wfirst = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    wlast = Window.partitionBy("user_id", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = (
        ev.withColumn("rn_min", F.row_number().over(wmin))
        .withColumn("rn_max", F.row_number().over(wmax))
        .withColumn("rn_first", F.row_number().over(wfirst))
        .withColumn("rn_last", F.row_number().over(wlast))
    )
    one = lambda c, rn: F.max(F.when(F.col(rn) == 1, F.col(c)))  # noqa: E731
    return r.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("n"),
        one("value", "rn_min").alias("v_min"),
        one("value", "rn_max").alias("v_max"),
        one("value", "rn_first").alias("v_first"),
        one("value", "rn_last").alias("v_last"),
        one("ts", "rn_first").alias("ts_first"),
        one("ts", "rn_last").alias("ts_last"),
    )


# ---------------------------------------------------------------------------
# R24 — funnel analysis (ordered event-sequence matching)
# ---------------------------------------------------------------------------


@register(
    "funnel_analysis",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t_signup FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t_view
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'view' AND e.ts > s1.t_signup
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t_view
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM s1)::BIGINT AS n_signup,
           (SELECT count(*) FROM s2)::BIGINT AS n_viewed_after,
           (SELECT count(*) FROM s3)::BIGINT AS n_purchased_after,
           (SELECT count(*) FROM s3 JOIN s2 USING (user_id)
            WHERE t_purchase - t_view <= INTERVAL 24 HOUR)::BIGINT
             AS n_converted_24h
    """,
)
def funnel_analysis(spark, sf_dir):
    """R24: funnel analysis — the ordered-sequence product-analytics
    operator: users who signed up, then VIEWED strictly after their
    first signup, then PURCHASED strictly after that first view (plus
    the 24-hour conversion slice). Each stage is a min-timestamp
    aggregate joined forward (monotone chaining — no per-user sort of
    the whole history, three map-side-combinable aggregates and two
    broadcast-size joins), and every comparison is on exact
    timestamps, so the four counts are integer-exact. At 10^12 events
    the stage aggregates shuffle once each on user_id and nothing else
    moves."""
    ev = T(spark, sf_dir, "events")
    s1 = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    s2 = (
        ev.where(F.col("event_type") == "view")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    # one pass over the chained stages: left joins + conditional counts
    # (a single action; the per-stage recompute of the naive
    # four-actions formulation would scan the event stream four times)
    j = s1.join(s2, "user_id", "left").join(s3, "user_id", "left")
    return j.agg(
        F.count(F.lit(1)).alias("n_signup"),
        F.count("t_view").alias("n_viewed_after"),
        F.count("t_purchase").alias("n_purchased_after"),
        F.sum(
            F.when(
                F.col("t_purchase").isNotNull()
                & (
                    F.unix_micros(F.col("t_purchase").cast("timestamp"))
                    - F.unix_micros(F.col("t_view").cast("timestamp"))
                    <= 24 * 3600 * 1_000_000
                ),
                1,
            ).otherwise(0)
        ).alias("n_converted_24h"),
    )


# ---------------------------------------------------------------------------
# R25 — cohort retention matrix
# ---------------------------------------------------------------------------


@register(
    "cohort_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    act AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             datediff('week', f.cohort_week, date_trunc('week', e.ts))
               AS week_no
      FROM events e JOIN first_seen f ON e.user_id = f.user_id
    )
    SELECT cohort_week::TIMESTAMP AS cohort_week, week_no::INT AS week_no,
           count(*)::BIGINT AS n_active,
           max(count(*)) OVER (PARTITION BY cohort_week)::BIGINT
             AS cohort_size
    FROM act GROUP BY cohort_week, week_no
    """,
)
def cohort_retention(spark, sf_dir):
    """R25: cohort retention matrix — users grouped by first-activity
    week, counted in every later week they were active (week 0 = the
    whole cohort, so the per-cohort max doubles as the cohort size).
    One distinct + two grouped aggregates, all counts integer-exact;
    the first-seen dimension broadcasts. The product-analytics
    retention triangle, driver-hashed row for row."""
    ev = T(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    act = (
        ev.join(F.broadcast(first_seen), "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")), F.col("cohort_week")
                )
                / 7
            )
            .cast("int")
            .alias("week_no"),
        )
        .distinct()
    )
    out = act.groupBy("cohort_week", "week_no").agg(
        F.count(F.lit(1)).alias("n_active")
    )
    w = Window.partitionBy("cohort_week")
    return out.withColumn("cohort_size", F.max("n_active").over(w)).select(
        "cohort_week", "week_no", "n_active", "cohort_size"
    )


# ---------------------------------------------------------------------------
# TS17 — Holt-Winters seasonal (triple-exponential) smoothing, additive,
# period m = 8, alpha = beta = gamma = 1/2 (bit-exact list-state fold).
#
# Same exactness recipe as Holt (module docstring): every update is a
# half-sum, so the 10-state recursion [level, trend, s1..s8] walks an
# identical IEEE op sequence in Spark `aggregate` and DuckDB
# `list_reduce`. Init follows the classical convention: level = mean of
# the first period (an integer sum / 8 — exact), trend = 0, seasonals =
# first-period deviations. The season ring rotates so that s1 always
# applies to the NEXT observation, hence forecast1 = level + trend + s1.
# Zero shuffles — the fold runs inside the scan projection.
# ---------------------------------------------------------------------------

_HW_L1_SPARK = (
    "((x - element_at(s, 3)) + (element_at(s, 1) + element_at(s, 2)))"
    " / CAST(2 AS DOUBLE)"
)

_HW_SPARK = f"""
aggregate(
  slice(transform(tokens, t -> CAST(t AS DOUBLE)), 9, n_tok - 8),
  array(l0, CAST(0 AS DOUBLE),
        CAST(element_at(tokens, 1) AS DOUBLE) - l0,
        CAST(element_at(tokens, 2) AS DOUBLE) - l0,
        CAST(element_at(tokens, 3) AS DOUBLE) - l0,
        CAST(element_at(tokens, 4) AS DOUBLE) - l0,
        CAST(element_at(tokens, 5) AS DOUBLE) - l0,
        CAST(element_at(tokens, 6) AS DOUBLE) - l0,
        CAST(element_at(tokens, 7) AS DOUBLE) - l0,
        CAST(element_at(tokens, 8) AS DOUBLE) - l0),
  (s, x) -> array(
    {_HW_L1_SPARK},
    (element_at(s, 2) + ({_HW_L1_SPARK} - element_at(s, 1)))
      / CAST(2 AS DOUBLE),
    element_at(s, 4), element_at(s, 5), element_at(s, 6),
    element_at(s, 7), element_at(s, 8), element_at(s, 9),
    element_at(s, 10),
    ((x - ({_HW_L1_SPARK})) + element_at(s, 3)) / CAST(2 AS DOUBLE)))
"""

_HW_L1_DUCK = "((e[1] - s[3]) + (s[1] + s[2])) / CAST(2 AS DOUBLE)"

_HW_DUCK = f"""
list_reduce(list_prepend(
  [l0, CAST(0 AS DOUBLE),
   tokens[1]::DOUBLE - l0, tokens[2]::DOUBLE - l0,
   tokens[3]::DOUBLE - l0, tokens[4]::DOUBLE - l0,
   tokens[5]::DOUBLE - l0, tokens[6]::DOUBLE - l0,
   tokens[7]::DOUBLE - l0, tokens[8]::DOUBLE - l0],
  list_transform(tokens[9:n_tok], t -> [t::DOUBLE])),
  (s, e) -> [
    {_HW_L1_DUCK},
    (s[2] + ({_HW_L1_DUCK} - s[1])) / CAST(2 AS DOUBLE),
    s[4], s[5], s[6], s[7], s[8], s[9], s[10],
    ((e[1] - ({_HW_L1_DUCK})) + s[3]) / CAST(2 AS DOUBLE)])
"""

# DuckDB `st[k]` is 1-based; Spark's bracket indexing is 0-based, so the
# Spark projection uses element_at (1-based) for the identical columns.
_HW_OUT = (
    "st[1] AS level, st[2] AS trend, st[1] + st[2] + st[3] AS forecast1, "
    "st[3] AS s1, st[4] AS s2, st[5] AS s3, st[6] AS s4, "
    "st[7] AS s5, st[8] AS s6, st[9] AS s7, st[10] AS s8"
)

_HW_OUT_SPARK = [
    "element_at(st, 1) AS level",
    "element_at(st, 2) AS trend",
    "element_at(st, 1) + element_at(st, 2) + element_at(st, 3) AS forecast1",
] + [f"element_at(st, {k + 2}) AS s{k}" for k in range(1, 9)]


@register(
    "holt_winters_smooth",
    oracle=synth_sql(_N)
    + f"""
    , hw0 AS (
      SELECT doc_id, n_tok, tokens,
        (tokens[1]+tokens[2]+tokens[3]+tokens[4]
         +tokens[5]+tokens[6]+tokens[7]+tokens[8])::DOUBLE
          / CAST(8 AS DOUBLE) AS l0
      FROM synth
    ),
    hw AS (SELECT doc_id, n_tok, {_HW_DUCK} AS st FROM hw0)
    SELECT doc_id, n_tok, {_HW_OUT} FROM hw
    """,
)
def holt_winters_smooth(spark, sf_dir):
    """TS17: Holt-Winters additive seasonal smoothing per series at
    period 8 — level, trend, the one-step forecast level+trend+s1, and
    all eight terminal seasonal components, every double bit-identical
    across engines (no rounding tolerance anywhere; see the section
    comment for the init/rotation conventions)."""
    df = synth.sequences_df(spark, _N).withColumn(
        "l0",
        F.expr(
            "CAST(aggregate(slice(tokens, 1, 8), CAST(0 AS BIGINT),"
            " (a, t) -> a + t) AS DOUBLE) / CAST(8 AS DOUBLE)"
        ),
    )
    return df.select(
        "doc_id", "n_tok", F.expr(_HW_SPARK).alias("st")
    ).selectExpr("doc_id", "n_tok", *_HW_OUT_SPARK)


# ---------------------------------------------------------------------------
# TS18 — OHLC / candlestick aggregate (TimescaleDB `candlestick_agg`):
# open/high/low/close per (event_type, day). Open/close are selected by
# the total order (ts, event_id) — microsecond ties broken by event_id —
# via two row_number windows sharing one hash shuffle on the bucket key.
# High/low/n are order-free; the volume sum is the one cross-row float
# fold, so it alone carries round(6) (module-docstring rationale).
# ---------------------------------------------------------------------------


@register(
    "ohlc_candlestick",
    oracle="""
    WITH s AS (
      SELECT event_type, date_trunc('day', ts)::TIMESTAMP AS bucket,
             epoch_us(ts) AS tu, event_id, value
      FROM events
    ),
    r AS (
      SELECT *,
        row_number() OVER (PARTITION BY event_type, bucket
                           ORDER BY tu, event_id) AS rn1,
        row_number() OVER (PARTITION BY event_type, bucket
                           ORDER BY tu DESC, event_id DESC) AS rn2
      FROM s
    )
    SELECT event_type, bucket,
           count(*) AS n_events,
           max(CASE WHEN rn1 = 1 THEN value END) AS open,
           max(value) AS high, min(value) AS low,
           max(CASE WHEN rn2 = 1 THEN value END) AS close,
           round(sum(value), 6) AS volume
    FROM r GROUP BY event_type, bucket
    """,
)
def ohlc_candlestick(spark, sf_dir):
    """TS18: candlestick_agg analog — first/last (by the (ts, event_id)
    total order), min/max, count, and value-volume per event_type per
    day. open/high/low/close hash-match with NO tolerance (selection,
    not arithmetic); only the volume sum is rounded. Plan: one shuffle
    onto (event_type, day); both row_number windows and the final
    aggregate reuse that exchange."""
    ev = T(spark, sf_dir, "events")
    s = ev.select(
        "event_type",
        F.date_trunc("day", "ts").alias("bucket"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tu"),
        "event_id",
        "value",
    )
    wkey = ["event_type", "bucket"]
    w1 = Window.partitionBy(*wkey).orderBy("tu", "event_id")
    w2 = Window.partitionBy(*wkey).orderBy(
        F.col("tu").desc(), F.col("event_id").desc()
    )
    r = s.withColumn("rn1", F.row_number().over(w1)).withColumn(
        "rn2", F.row_number().over(w2)
    )
    return r.groupBy(*wkey).agg(
        F.count("*").alias("n_events"),
        F.max(F.when(F.col("rn1") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn2") == 1, F.col("value"))).alias("close"),
        F.round(F.sum("value"), 6).alias("volume"),
    )


# ---------------------------------------------------------------------------
# TS19 — state aggregate (TimescaleDB `state_agg` / `duration_in`):
# LOCF state semantics — each event's type is the user's state until the
# next event of ANY type — so duration-in-state is the lead() delta
# summed per (user, state), and n_entries counts transitions INTO the
# state (lag() change points). Pure integer-microsecond arithmetic:
# every output column hash-matches with no tolerance.
# ---------------------------------------------------------------------------


@register(
    "state_durations",
    oracle="""
    WITH s AS (
      SELECT user_id, epoch_us(ts) AS tu, event_id, event_type
      FROM events
    ),
    l AS (
      SELECT *,
        lead(tu) OVER (PARTITION BY user_id ORDER BY tu, event_id) AS nxt,
        lag(event_type) OVER (PARTITION BY user_id ORDER BY tu, event_id)
          AS prev_state
      FROM s
    )
    SELECT user_id, event_type AS state,
           count(*) AS n_events,
           sum(CASE WHEN prev_state IS NULL
                     OR prev_state <> event_type THEN 1 ELSE 0 END)::BIGINT
             AS n_entries,
           sum(CASE WHEN nxt IS NULL THEN 0 ELSE nxt - tu END)::BIGINT
             AS duration_us
    FROM l GROUP BY user_id, event_type
    """,
)
def state_durations(spark, sf_dir):
    """TS19: state_agg / duration_in analog — per user and state, the
    total microseconds spent in the state (LOCF hold until the next
    event), the number of entries into the state, and the event count.
    One shuffle on user_id: lead(), lag(), and the re-key to
    (user, state) share the same sorted exchange (the (user, state)
    aggregate is a hash agg over already-colocated rows). Integer
    epochs end to end — bit-exact oracle."""
    ev = T(spark, sf_dir, "events")
    s = ev.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tu"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("tu", "event_id")
    l = s.withColumn("nxt", F.lead("tu").over(w)).withColumn(
        "prev_state", F.lag("event_type").over(w)
    )
    return l.groupBy(
        "user_id", F.col("event_type").alias("state")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(
            F.when(
                F.col("prev_state").isNull()
                | (F.col("prev_state") != F.col("event_type")),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias("n_entries"),
        F.sum(
            F.when(F.col("nxt").isNull(), F.lit(0)).otherwise(
                F.col("nxt") - F.col("tu")
            )
        ).alias("duration_us"),
    )


# ---------------------------------------------------------------------------
# TS21 — stats_agg: the mergeable moment-vector aggregate (TimescaleDB
# `stats_agg` + `rollup()`). The sketch is (n, Σx, Σx², Σx³, Σx⁴) in
# EXACT arithmetic — int64 where it fits (x ≤ 50256 keeps x², and even
# per-element x⁴ ≈ 6.4e18, inside int64), DECIMAL(38,0) for the Σx³/Σx⁴
# cross-row sums that don't. Addition is associative/commutative, so
# per-partition partial vectors roll up exactly (the merge-check
# contract); mean/variance/skewness/kurtosis come from ONE shared float
# tree over the exact moments (skew uses sqrt(m2)*m2, never pow(x,1.5),
# because sqrt and * are correctly-rounded IEEE ops while pow is not
# guaranteed identical across libms). Scale shape: per-row moments are
# scan-side HOF folds; ONE map-side-combined sum aggregate onto source —
# five numbers per group cross the shuffle regardless of input size.
# ---------------------------------------------------------------------------

# shared float tail (valid in BOTH dialects): population moments from
# the exact sums, every op parenthesized so the IEEE tree is identical.
_ST_ND = "CAST(n AS DOUBLE)"
_ST_MEAN = f"(CAST(s1 AS DOUBLE) / {_ST_ND})"
_ST_R2 = f"(CAST(s2 AS DOUBLE) / {_ST_ND})"
_ST_R3 = f"(CAST(s3 AS DOUBLE) / {_ST_ND})"
_ST_R4 = f"(CAST(s4 AS DOUBLE) / {_ST_ND})"
_ST_M2 = f"({_ST_R2} - ({_ST_MEAN} * {_ST_MEAN}))"
_ST_M3 = (
    f"(({_ST_R3} - ((3.0 * {_ST_MEAN}) * {_ST_R2}))"
    f" + ((2.0 * {_ST_MEAN}) * ({_ST_MEAN} * {_ST_MEAN})))"
)
_ST_M4 = (
    f"((({_ST_R4} - ((4.0 * {_ST_MEAN}) * {_ST_R3}))"
    f" + ((6.0 * ({_ST_MEAN} * {_ST_MEAN})) * {_ST_R2}))"
    f" - (3.0 * (({_ST_MEAN} * {_ST_MEAN}) * ({_ST_MEAN} * {_ST_MEAN}))))"
)
_ST_TAIL = [
    f"{_ST_MEAN} AS mean",
    f"{_ST_M2} AS var_pop",
    f"({_ST_M3} / (sqrt({_ST_M2}) * {_ST_M2})) AS skew",
    f"({_ST_M4} / ({_ST_M2} * {_ST_M2})) AS kurt",
]

_ST_SPARK_ROW = [
    "CAST(n_tok AS BIGINT) AS rn",
    "aggregate(tokens, 0L, (s, x) -> s + CAST(x AS BIGINT)) AS r1",
    "aggregate(tokens, 0L, (s, x) -> s + CAST(x AS BIGINT) * x) AS r2",
    "aggregate(tokens, CAST(0 AS DECIMAL(38,0)), (s, x) ->"
    " s + CAST(CAST(x AS BIGINT) * x * x AS DECIMAL(38,0))) AS r3",
    "aggregate(tokens, CAST(0 AS DECIMAL(38,0)), (s, x) ->"
    " s + CAST(CAST(x AS BIGINT) * x * x * x AS DECIMAL(38,0))) AS r4",
]

_ST_DUCK_ROW = """
SELECT source, doc_id, n_tok::BIGINT AS rn,
  list_sum(tokens)::BIGINT AS r1,
  list_sum(list_transform(tokens, x -> x::BIGINT * x))::BIGINT AS r2,
  list_sum(list_transform(tokens, x -> x::HUGEINT * x * x)) AS r3,
  list_sum(list_transform(tokens, x -> x::HUGEINT * x * x * x)) AS r4
FROM synth
"""

_ST_DUCK_AGG = """
SELECT source, sum(rn)::BIGINT AS n, sum(r1)::BIGINT AS s1,
       sum(r2)::BIGINT AS s2, sum(r3)::DECIMAL(38,0) AS s3,
       sum(r4)::DECIMAL(38,0) AS s4
"""


@register(
    "stats_moments_agg",
    oracle=synth_sql(_N)
    + f"""
    , mrow AS ({_ST_DUCK_ROW}),
    magg AS ({_ST_DUCK_AGG} FROM mrow GROUP BY source)
    SELECT source, n, s1, s2,
           s3::VARCHAR AS s3, s4::VARCHAR AS s4, {", ".join(_ST_TAIL)}
    FROM magg
    """,
)
def stats_moments_agg(spark, sf_dir):
    """TS21: per-source mergeable moment vector (n, Σx, Σx², Σx³, Σx⁴ —
    exact int64/DECIMAL(38,0)) plus population mean / variance /
    skewness / raw kurtosis (m4/m2², not excess) from the shared float
    tree. All columns hash-match DuckDB with no tolerance: the sums are
    exact, the tails are identical IEEE trees (see the section comment
    for the sqrt(m2)*m2 spelling). One map-side-combined shuffle; five
    numbers per source cross it."""
    df = synth.sequences_df(spark, _N).select("source", "tokens", "n_tok")
    rows = df.selectExpr("source", *_ST_SPARK_ROW)
    agg = rows.groupBy("source").agg(
        F.sum("rn").alias("n"),
        F.sum("r1").alias("s1"),
        F.sum("r2").alias("s2"),
        F.sum("r3").cast("decimal(38,0)").alias("s3"),
        F.sum("r4").cast("decimal(38,0)").alias("s4"),
    )
    # s3/s4 cross the compare as exact digit STRINGS: Spark keeps
    # DECIMAL(38,0) end to end, but DuckDB's DECIMAL(38) collapses to
    # float64 on the pandas hop (no int128 dtype), silently shaving the
    # low digits — caught by the strict %.6f local gate
    return agg.selectExpr(
        "source", "n", "s1", "s2",
        "CAST(s3 AS STRING) AS s3", "CAST(s4 AS STRING) AS s4",
        *_ST_TAIL,
    )


@register(
    "stats_moments_merge_check",
    oracle=synth_sql(_N)
    + f"""
    , mrow AS ({_ST_DUCK_ROW}),
    parts AS ({_ST_DUCK_AGG},
                substr(doc_id, 4)::BIGINT % 2 AS half
              FROM mrow GROUP BY source, half),
    merged AS (SELECT source, sum(n)::BIGINT AS n, sum(s1)::BIGINT AS s1,
                 sum(s2)::BIGINT AS s2, sum(s3)::DECIMAL(38,0) AS s3,
                 sum(s4)::DECIMAL(38,0) AS s4
               FROM parts GROUP BY source),
    direct AS ({_ST_DUCK_AGG} FROM mrow GROUP BY source)
    SELECT m.source,
           count(*) OVER () = 3 AS three_sources,
           m.n = d.n AND m.s1 = d.s1 AND m.s2 = d.s2
             AND m.s3 = d.s3 AND m.s4 = d.s4 AS merge_equals_direct,
           m.n, m.s1, m.s2,
           m.s3::VARCHAR AS s3, m.s4::VARCHAR AS s4
    FROM merged m JOIN direct d ON m.source = d.source
    """,
)
def stats_moments_merge_check(spark, sf_dir):
    """TS21b: the stats_agg rollup contract — per-(source, doc-parity)
    partial moment vectors summed component-wise equal the vector
    computed directly over all rows, because the sketch is pure
    addition. This is exactly TimescaleDB's rollup(stats_agg(...))
    across continuous-aggregate windows: five numbers per window give
    mean/var/skew/kurt for ANY window union with no raw rescan."""
    df = synth.sequences_df(spark, _N).select(
        "source", "doc_id", "tokens", "n_tok"
    )
    rows = df.selectExpr(
        "source",
        "CAST(substr(doc_id, 4) AS BIGINT) % 2 AS half",
        *_ST_SPARK_ROW,
    )

    def _agg(g):
        return g.agg(
            F.sum("rn").alias("n"),
            F.sum("r1").alias("s1"),
            F.sum("r2").alias("s2"),
            F.sum("r3").cast("decimal(38,0)").alias("s3"),
            F.sum("r4").cast("decimal(38,0)").alias("s4"),
        )

    parts = _agg(rows.groupBy("source", "half"))
    merged = parts.groupBy("source").agg(
        F.sum("n").alias("n"),
        F.sum("s1").alias("s1"),
        F.sum("s2").alias("s2"),
        F.sum("s3").cast("decimal(38,0)").alias("s3"),
        F.sum("s4").cast("decimal(38,0)").alias("s4"),
    )
    direct = _agg(rows.groupBy("source")).select(
        F.col("source").alias("d_source"),
        F.col("n").alias("d_n"),
        F.col("s1").alias("d_s1"),
        F.col("s2").alias("d_s2"),
        F.col("s3").alias("d_s3"),
        F.col("s4").alias("d_s4"),
    )
    j = merged.join(direct, merged.source == direct.d_source)
    nsrc = j.count()
    return j.selectExpr(
        "source",
        f"{nsrc} = 3 AS three_sources",
        "n = d_n AND s1 = d_s1 AND s2 = d_s2 AND s3 = d_s3"
        " AND s4 = d_s4 AS merge_equals_direct",
        "n", "s1", "s2",
        "CAST(s3 AS STRING) AS s3", "CAST(s4 AS STRING) AS s4",
    )


# ---------------------------------------------------------------------------
# TS32 — gauge aggregate (TimescaleDB gauge_agg: delta / idelta / irate
# for series that can go DOWN — no counter reset logic)
# ---------------------------------------------------------------------------

_G_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"
_G_IRATE = (
    "(v_last - v_prev) / (CAST(tu_last - tu_prev AS DOUBLE)"
    " / CAST(1000000 AS DOUBLE))"
)


@register(
    "gauge_agg",
    oracle=f"""
    WITH s AS (
      SELECT event_type, epoch_us(ts) AS tu, event_id, value FROM events
    ),
    l AS (
      SELECT event_type, tu, event_id, value,
             first_value(value) OVER w AS v0,
             lag(value) OVER w AS pv,
             lag(tu) OVER w AS ptu,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY tu DESC, event_id DESC) AS rnd,
             CASE WHEN lag(value) OVER w IS NOT NULL
                       AND value <> lag(value) OVER w
                  THEN 1 ELSE 0 END AS chg
      FROM s
      WINDOW w AS (PARTITION BY event_type ORDER BY tu, event_id)
    ),
    tails AS (
      SELECT event_type, value AS v_last, pv AS v_prev, v0,
             tu AS tu_last, ptu AS tu_prev
      FROM l WHERE rnd = 1
    ),
    aggs AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_samples,
             CAST(sum(chg) AS BIGINT) AS n_changes
      FROM l GROUP BY event_type
    )
    SELECT a.event_type, a.n_samples, a.n_changes,
           t.v_last - t.v0 AS delta,
           t.v_last - t.v_prev AS idelta,
           {_G_F6.format(x=_G_IRATE)} AS irate_per_s
    FROM aggs a JOIN tails t USING (event_type)
    """,
)
def gauge_agg(spark, sf_dir):
    """TS32: TimescaleDB ``gauge_agg`` analog per event_type series —
    delta (last − first), idelta (last instantaneous change), irate
    (idelta over the last gap, per second, floor-1e6), and the number
    of value changes, all under the (tu, event_id) TOTAL order. Gauges
    differ from counters in allowing decreases, so there is no reset
    unwrapping — plain float subtraction on identical doubles, exact
    cross-engine. One exchange on event_type; the asc window, the desc
    row_number, and the aggregate share it."""
    s = T(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tu"),
        "event_id",
        "value",
    )
    w = Window.partitionBy("event_type").orderBy("tu", "event_id")
    wd = Window.partitionBy("event_type").orderBy(
        F.desc("tu"), F.desc("event_id")
    )
    led = s.select(
        "event_type",
        "tu",
        "value",
        F.first("value").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("v0"),
        F.lag("value").over(w).alias("pv"),
        F.lag("tu").over(w).alias("ptu"),
        F.row_number().over(wd).alias("rnd"),
        F.when(
            F.lag("value").over(w).isNotNull()
            & (F.col("value") != F.lag("value").over(w)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("chg"),
    )
    tails = led.where(F.col("rnd") == 1).select(
        "event_type",
        F.col("value").alias("v_last"),
        F.col("pv").alias("v_prev"),
        "v0",
        F.col("tu").alias("tu_last"),
        F.col("ptu").alias("tu_prev"),
    )
    aggs = led.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_samples"),
        F.sum("chg").cast("long").alias("n_changes"),
    )
    return aggs.join(tails, "event_type").select(
        "event_type",
        "n_samples",
        "n_changes",
        (F.col("v_last") - F.col("v0")).alias("delta"),
        (F.col("v_last") - F.col("v_prev")).alias("idelta"),
        F.expr(_G_F6.format(x=_G_IRATE)).alias("irate_per_s"),
    )


# ---------------------------------------------------------------------------
# TS33 — burstiness diagnostics: Fano factor of hourly counts (zero
# hours included via span algebra) + Goh-Barabási B = (σ−μ)/(σ+μ) of
# inter-arrival gaps
# ---------------------------------------------------------------------------

_B_MEAN = "CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)"
_B_SD = (
    "sqrt((CAST(ng AS DOUBLE) * CAST(sg2 AS DOUBLE)"
    " - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))"
    " / (CAST(ng AS DOUBLE) * CAST(ng AS DOUBLE)))"
)


@register(
    "burstiness",
    oracle=f"""
    WITH s AS (
      SELECT event_type, epoch_us(ts) // 1000000 AS tsec, event_id
      FROM events
    ),
    hourly AS (
      SELECT event_type, tsec // 3600 AS h, count(*) AS c
      FROM s GROUP BY 1, 2
    ),
    fano AS (
      SELECT event_type,
             max(h) - min(h) + 1 AS n_hours,
             CAST(sum(c) AS BIGINT) AS sc,
             CAST(sum(c * c) AS BIGINT) AS sc2
      FROM hourly GROUP BY event_type
    ),
    gaps AS (
      SELECT event_type,
             lead(tsec) OVER (PARTITION BY event_type
                              ORDER BY tsec, event_id) - tsec AS g
      FROM s
    ),
    gstat AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(g) AS BIGINT) AS sg,
             CAST(sum(g * g) AS BIGINT) AS sg2
      FROM gaps WHERE g IS NOT NULL GROUP BY event_type
    )
    SELECT f.event_type, f.n_hours, f.sc AS n_events, g.ng AS n_gaps,
           {_G_F6.format(
               x="(CAST(f.n_hours * f.sc2 - f.sc * f.sc AS DOUBLE)"
                 " / CAST(f.n_hours * f.sc AS DOUBLE))"
           )} AS fano,
           {_G_F6.format(x=f"(({_B_SD}) - ({_B_MEAN}))"
                           f" / (({_B_SD}) + ({_B_MEAN}))")} AS burstiness_b
    FROM fano f JOIN gstat g USING (event_type)
    """,
)
def burstiness(spark, sf_dir):
    """TS33: two standard burstiness diagnostics per event-type series.
    Fano factor of hourly counts — computed over the FULL hour span
    (zero-count hours enter via n_hours = max−min+1, never
    materialized), numerator/denominator exact int64, one floor-1e6
    division. Goh & Barabási B = (σ−μ)/(σ+μ) of inter-arrival gaps in
    integer seconds (μs gaps would overflow Σg² in int64; second-grain
    keeps Σg² < 2^35) — B→−1 periodic, ≈0 Poisson, →1 extreme bursts.
    Two map-side-combined aggregates + one per-type lead window."""
    s = T(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 1000000").alias(
            "tsec"
        ),
        "event_id",
    )
    hourly = s.groupBy(
        "event_type", F.expr("tsec DIV 3600").alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    fano = hourly.groupBy("event_type").agg(
        (F.max("h") - F.min("h") + 1).alias("n_hours"),
        F.sum("c").cast("long").alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("sc2"),
    )
    w = Window.partitionBy("event_type").orderBy("tsec", "event_id")
    gaps = s.withColumn("g", F.lead("tsec").over(w) - F.col("tsec"))
    gstat = gaps.where(F.col("g").isNotNull()).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("ng"),
        F.sum("g").cast("long").alias("sg"),
        F.sum(F.col("g") * F.col("g")).cast("long").alias("sg2"),
    )
    return fano.join(gstat, "event_type").select(
        "event_type",
        "n_hours",
        F.col("sc").alias("n_events"),
        F.col("ng").alias("n_gaps"),
        F.expr(
            _G_F6.format(
                x="(CAST(n_hours * sc2 - sc * sc AS DOUBLE)"
                " / CAST(n_hours * sc AS DOUBLE))"
            )
        ).alias("fano"),
        F.expr(
            _G_F6.format(
                x=f"(({_B_SD}) - ({_B_MEAN})) / (({_B_SD}) + ({_B_MEAN}))"
            )
        ).alias("burstiness_b"),
    )


# ---------------------------------------------------------------------------
# TS34 — per-bucket interpolated time-weighted average (TimescaleDB
# interpolated_average): the LOCF integral CLIPPED to calendar buckets,
# with segments carried ACROSS bucket boundaries — the per-day honest
# mean for irregular telemetry, where time_weighted_avg gives only the
# whole-series number.
# ---------------------------------------------------------------------------

_DAY_US = 86_400_000_000


@register(
    "interpolated_daily_avg",
    oracle=f"""
    WITH s AS (
      SELECT user_id, epoch_us(ts) AS tu, event_id, value
      FROM events WHERE event_type = 'error'
    ),
    seg AS (
      SELECT user_id, tu AS s0, value,
             lead(tu) OVER (PARTITION BY user_id ORDER BY tu, event_id)
               AS s1
      FROM s
    ),
    hits AS (
      SELECT user_id, value, s0, s1, b
      FROM (SELECT *, unnest(range(s0 // {_DAY_US},
                                   (s1 - 1) // {_DAY_US} + 1)) AS b
            FROM seg WHERE s1 IS NOT NULL AND s1 > s0)
    ),
    clipped AS (
      SELECT user_id, b,
             least(s1, (b + 1) * {_DAY_US}) - greatest(s0, b * {_DAY_US})
               AS dt,
             value
      FROM hits
    ),
    agg AS (
      SELECT user_id, b AS day_bucket,
             CAST(count(*) AS BIGINT) AS n_segments,
             CAST(sum(dt) AS BIGINT) AS covered_us,
             sum(value * CAST(dt AS DOUBLE)) AS num
      FROM clipped GROUP BY user_id, b
    )
    SELECT user_id, day_bucket, n_segments, covered_us,
           round(num / CAST(covered_us AS DOUBLE), 6) AS avg_interp
    FROM agg WHERE covered_us > 0
    """,
)
def interpolated_daily_avg(spark, sf_dir):
    """TS34: TimescaleDB ``interpolated_average`` analog — per (user,
    day) the time-weighted LOCF mean where each sample's value holds
    into the NEXT day until the next sample: segments from one lead()
    window, clipped to the day buckets they cross (an exploded
    ``sequence`` of bucket ids — bounded by the segment's day span),
    integer-μs overlaps, one (user, day) reduce. The whole-series
    ``time_weighted_avg`` is this query with one bucket; per-bucket
    carry is what a daily SLA/billing rollup actually needs. Final
    ratio round(6) under the module's float-sum precedent."""
    s = T(spark, sf_dir, "events").where(
        F.col("event_type") == "error"
    ).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tu"),
        "event_id",
        "value",
    )
    w = Window.partitionBy("user_id").orderBy("tu", "event_id")
    seg = s.select(
        "user_id",
        F.col("tu").alias("s0"),
        "value",
        F.lead("tu").over(w).alias("s1"),
    ).where(F.col("s1").isNotNull() & (F.col("s1") > F.col("s0")))
    hits = seg.select(
        "user_id",
        "value",
        "s0",
        "s1",
        F.explode(
            F.expr(
                f"sequence(s0 DIV {_DAY_US}, (s1 - 1) DIV {_DAY_US})"
            )
        ).alias("b"),
    )
    clipped = hits.select(
        "user_id",
        "b",
        (
            F.least(F.col("s1"), (F.col("b") + 1) * _DAY_US)
            - F.greatest(F.col("s0"), F.col("b") * _DAY_US)
        ).alias("dt"),
        "value",
    )
    agg = clipped.groupBy("user_id", F.col("b").alias("day_bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_segments"),
        F.sum("dt").cast("long").alias("covered_us"),
        F.sum(F.col("value") * F.col("dt").cast("double")).alias("num"),
    )
    return agg.where(F.col("covered_us") > 0).select(
        "user_id",
        "day_bucket",
        "n_segments",
        "covered_us",
        F.round(F.col("num") / F.col("covered_us").cast("double"), 6).alias(
            "avg_interp"
        ),
    )


# ---------------------------------------------------------------------------
# TS35 — MACD(12, 26, 9) over daily means: per-step EMAs WITHOUT a
# sequential fold. adjust-mode EMA_t = Σ β^(t−k) x_k / Σ β^(t−k)
# = cumsum(x_k β^(−k)) / cumsum(β^(−k)) — the β^t factor cancels, so
# every step is a ratio of two partitioned window cumsums (sequential
# frame order = deterministic float sums in BOTH engines).
# ---------------------------------------------------------------------------


def _ema_cols(x: str, t: str, span: int, prefix: str) -> tuple[str, str]:
    """(u, w) term expressions for the closed-form EMA at `span`."""
    beta = f"(CAST({span - 1} AS DOUBLE) / CAST({span + 1} AS DOUBLE))"
    p = f"pow({beta}, -CAST({t} AS DOUBLE))"
    return f"({x} * {p})", p


@register(
    "macd_signal",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             {_G_F6.format(x="(sum(value) / CAST(count(*) AS DOUBLE))")}
               AS dm
      FROM events GROUP BY 1, 2
    ),
    idx AS (
      SELECT event_type, day, dm,
             row_number() OVER (PARTITION BY event_type ORDER BY day) - 1
               AS t
      FROM daily
    ),
    terms AS (
      SELECT *, {_ema_cols("dm", "t", 12, "a")[0]} AS u12,
                {_ema_cols("dm", "t", 12, "a")[1]} AS w12,
                {_ema_cols("dm", "t", 26, "b")[0]} AS u26,
                {_ema_cols("dm", "t", 26, "b")[1]} AS w26
      FROM idx
    ),
    emas AS (
      SELECT event_type, day, t, dm,
             sum(u12) OVER w / sum(w12) OVER w AS ema12,
             sum(u26) OVER w / sum(w26) OVER w AS ema26
      FROM terms
      WINDOW w AS (PARTITION BY event_type ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    macd AS (
      SELECT *, ema12 - ema26 AS m FROM emas
    ),
    sig AS (
      SELECT *, sum({_ema_cols("m", "t", 9, "c")[0]}) OVER w
                  / sum({_ema_cols("m", "t", 9, "c")[1]}) OVER w AS s9
      FROM macd
      WINDOW w AS (PARTITION BY event_type ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    fin AS (
      SELECT event_type, day, t, dm,
             {_G_F6.format(x="(ema12)")} AS ema12,
             {_G_F6.format(x="(ema26)")} AS ema26,
             {_G_F6.format(x="(m)")} AS macd,
             {_G_F6.format(x="(s9)")} AS signal,
             {_G_F6.format(x="(m - s9)")} AS hist
      FROM sig
    )
    SELECT *, (hist > CAST(0 AS DOUBLE)) <>
              (lag(hist) OVER (PARTITION BY event_type ORDER BY t)
                 > CAST(0 AS DOUBLE)) AS crossover
    FROM fin
    """,
)
def macd_signal(spark, sf_dir):
    """TS35: MACD(12, 26, 9) per event-type daily-mean series — the
    standard momentum indicator (EMA12 − EMA26, its EMA9 signal line,
    histogram, crossover flags). Per-step adjust-mode EMAs are computed
    CLOSED-FORM as ratios of two window cumsums (β^t cancels), so no
    sequential fold, no recursion — two partitioned cumsum windows
    sharing one sort per stage; daily means floor-1e6 first so both
    engines fold identical inputs; crossovers are derived from the
    FLOORED histogram (deterministic booleans). pow() is libm (≤1 ulp
    cross-engine) under the established round-6/floor-1e6 precedent."""
    daily = (
        T(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000")
            .alias("day"),
        )
        .agg(
            F.expr(
                _G_F6.format(x="(sum(value) / CAST(count(1) AS DOUBLE))")
            ).alias("dm")
        )
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    idx = daily.withColumn("t", F.row_number().over(wo) - F.lit(1))
    u12, w12 = _ema_cols("dm", "t", 12, "a")
    u26, w26 = _ema_cols("dm", "t", 26, "b")
    terms = (
        idx.withColumn("u12", F.expr(u12))
        .withColumn("w12", F.expr(w12))
        .withColumn("u26", F.expr(u26))
        .withColumn("w26", F.expr(w26))
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    emas = terms.select(
        "event_type",
        "day",
        "t",
        "dm",
        (F.sum("u12").over(wc) / F.sum("w12").over(wc)).alias("ema12_raw"),
        (F.sum("u26").over(wc) / F.sum("w26").over(wc)).alias("ema26_raw"),
    )
    macd = emas.withColumn("m", F.col("ema12_raw") - F.col("ema26_raw"))
    u9, w9 = _ema_cols("m", "t", 9, "c")
    sig = macd.withColumn("_u9", F.expr(u9)).withColumn("_w9", F.expr(w9))
    sig = sig.withColumn(
        "s9", F.sum("_u9").over(wc) / F.sum("_w9").over(wc)
    )
    fin = sig.select(
        "event_type",
        "day",
        "t",
        "dm",
        F.expr(_G_F6.format(x="(ema12_raw)")).alias("ema12"),
        F.expr(_G_F6.format(x="(ema26_raw)")).alias("ema26"),
        F.expr(_G_F6.format(x="(m)")).alias("macd"),
        F.expr(_G_F6.format(x="(s9)")).alias("signal"),
        F.expr(_G_F6.format(x="(m - s9)")).alias("hist"),
    )
    wl = Window.partitionBy("event_type").orderBy("t")
    return fin.withColumn(
        "crossover",
        (F.col("hist") > 0.0) != (F.lag("hist").over(wl) > 0.0),
    )


# ---------------------------------------------------------------------------
# TS38 — seasonal-naive forecast backtest with MASE (Hyndman & Koehler
# 2006): the no-excuses forecasting baseline + the scale-free error a
# capacity-planning pipeline actually reports.
# ---------------------------------------------------------------------------

_FC_TEST = 7  # held-out days
_FC_P = 7  # weekly seasonality


@register(
    "forecast_backtest",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             {_G_F6.format(x="(sum(value) / CAST(count(*) AS DOUBLE))")}
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
             lag(dm, {_FC_P}) OVER (PARTITION BY event_type ORDER BY t)
               AS fcst,
             abs(dm - lag(dm) OVER (PARTITION BY event_type ORDER BY t))
               AS d1
      FROM idx
    ),
    denom AS (
      SELECT event_type,
             sum(CASE WHEN t < n - {_FC_TEST} THEN d1 ELSE NULL END)
               / CAST(sum(CASE WHEN t < n - {_FC_TEST} AND d1 IS NOT NULL
                           THEN 1 ELSE 0 END) AS DOUBLE) AS mae1
      FROM lagd GROUP BY event_type
    ),
    test AS (
      SELECT l.event_type, l.day, l.dm AS actual, l.fcst,
             abs(l.dm - l.fcst) AS abserr, d.mae1
      FROM lagd l JOIN denom d USING (event_type)
      WHERE l.t >= l.n - {_FC_TEST}
    ),
    scored AS (
      SELECT event_type, day, actual, fcst, abserr, mae1,
             avg(abserr) OVER (PARTITION BY event_type) AS mae_s
      FROM test
    )
    SELECT event_type, day, actual, fcst,
           {_G_F6.format(x="abserr")} AS abs_err,
           {_G_F6.format(x="(mae_s / mae1)")} AS mase
    FROM scored
    """,
)
def forecast_backtest(spark, sf_dir):
    """TS38: seasonal-naive backtest — forecast(d) = dm(d − 7) on the
    last 7 held-out days of each event-type daily-mean series, scored
    with MASE (mean |err| over the test window divided by the TRAINING
    window's naive-1 MAE — the scale-free Hyndman-Koehler error; < 1
    beats drift). Daily means floor-1e6 first, so both engines
    difference identical inputs; per-type windows only. MASE ≈ 1 here:
    the synthetic events have no weekly structure, which is itself the
    correct reading of the diagnostic."""
    daily = (
        T(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000")
            .alias("day"),
        )
        .agg(
            F.expr(
                _G_F6.format(x="(sum(value) / CAST(count(1) AS DOUBLE))")
            ).alias("dm")
        )
    )
    wo = Window.partitionBy("event_type").orderBy("day")
    wt = Window.partitionBy("event_type")
    idx = daily.withColumn("t", F.row_number().over(wo) - F.lit(1)).withColumn(
        "n", F.count(F.lit(1)).over(wt)
    )
    lagd = idx.withColumn("fcst", F.lag("dm", _FC_P).over(wo)).withColumn(
        "d1", F.abs(F.col("dm") - F.lag("dm").over(wo))
    )
    denom = lagd.groupBy("event_type").agg(
        (
            F.sum(
                F.when(F.col("t") < F.col("n") - _FC_TEST, F.col("d1"))
            )
            / F.sum(
                F.when(
                    (F.col("t") < F.col("n") - _FC_TEST)
                    & F.col("d1").isNotNull(),
                    1,
                ).otherwise(0)
            ).cast("double")
        ).alias("mae1")
    )
    test = lagd.join(denom, "event_type").where(
        F.col("t") >= F.col("n") - _FC_TEST
    )
    scored = test.withColumn("mae_s", F.avg(F.abs(F.col("dm") - F.col("fcst"))).over(wt))
    return scored.select(
        "event_type",
        "day",
        F.col("dm").alias("actual"),
        "fcst",
        F.expr(_G_F6.format(x="abs(dm - fcst)")).alias("abs_err"),
        F.expr(_G_F6.format(x="(mae_s / mae1)")).alias("mase"),
    )
