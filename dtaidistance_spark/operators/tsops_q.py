"""Time-series database operators, round 2 batch: reset-aware counter
aggregation (TimescaleDB ``counter_agg`` semantics), min/max-preserving
downsampling, and SAX symbolization — pure JVM SQL, fully
DuckDB-oracled.

Determinism: the counter correction is a cumulative window sum over a
totally-ordered frame (ts, event_id), evaluated strictly left-to-right
by both engines on identical doubles — bit-identical, no tolerance.
SAX is built from EXACT integer power sums (token values < 5e4, sums
and squared sums < 2^53): mean, std, and per-segment means are each a
single correctly-rounded division of identical integers, so the z-score
comparisons against the N(0,1) quartile breakpoints pick identical
letters in both engines.

Scale: counter/downsample are one hash shuffle on the entity key with
windowed evaluation (spillable sort); SAX is a scan-side projection
with zero shuffles — the per-row HOF aggregates stay inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import T, register
from dtaidistance_spark.operators.synth_q import synth_sql

# ---------------------------------------------------------------------------
# R17 — counter_agg: reset-aware counter delta (TimescaleDB semantics)
# ---------------------------------------------------------------------------


@register(
    "counter_rate",
    oracle="""
    WITH s AS (
      SELECT user_id, ts, event_id, value FROM events
      WHERE event_type = 'click'
    ),
    l AS (
      SELECT *, lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev
      FROM s
    ),
    c AS (
      SELECT *,
             CASE WHEN prev IS NOT NULL AND value < prev THEN prev
                  ELSE 0.0 END AS rb
      FROM l
    ),
    cc AS (
      SELECT *,
             value + sum(rb) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS corrected,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn_last,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn_first
      FROM c
    )
    SELECT user_id,
           count(*)::BIGINT AS n_samples,
           sum((rb > 0)::INT)::BIGINT AS n_resets,
           round(max(CASE WHEN rn_last = 1 THEN corrected END)
                 - max(CASE WHEN rn_first = 1 THEN corrected END), 6)
             AS counter_delta
    FROM cc GROUP BY user_id
    """,
)
def counter_rate(spark, sf_dir):
    """R17: TimescaleDB-style ``counter_agg``: treat each user's
    'click' value stream as a monotone counter with resets — a drop
    below the previous sample adds that sample's value back as a reset
    offset; the corrected series is the running value + cumulative
    reset base, and the per-user delta is corrected(last) -
    corrected(first). One shuffle on user_id; the lag/cumsum/rank all
    share a single window sort."""
    ev = T(spark, sf_dir, "events").where(F.col("event_type") == "click")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = (
        ev.withColumn("prev", F.lag("value").over(w))
        .withColumn(
            "rb",
            F.when(
                F.col("prev").isNotNull() & (F.col("value") < F.col("prev")),
                F.col("prev"),
            ).otherwise(0.0),
        )
        .withColumn("corrected", F.col("value") + F.sum("rb").over(wcum))
    )
    return c.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.sum((F.col("rb") > 0).cast("int")).alias("n_resets"),
        F.round(
            F.max_by("corrected", F.struct("ts", "event_id"))
            - F.min_by("corrected", F.struct("ts", "event_id")),
            6,
        ).alias("counter_delta"),
    )


# ---------------------------------------------------------------------------
# R18 — min/max-preserving downsample
# ---------------------------------------------------------------------------


@register(
    "minmax_downsample",
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
               AS rn_max
      FROM s
    )
    SELECT user_id, day, 'min' AS kind, ts, value FROM r WHERE rn_min = 1
    UNION ALL
    SELECT user_id, day, 'max', ts, value FROM r WHERE rn_max = 1
    """,
)
def minmax_downsample(spark, sf_dir):
    """R18: extrema-preserving downsample (the TSDB rendering
    downsampler): per (user, day) bucket emit exactly the min-value and
    max-value points with full deterministic tie-breaks — unlike avg
    rollups this keeps spikes visible at any zoom. Single shuffle on
    the bucket key; both ranks share one window sort each way."""
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
    r = ev.withColumn("rn_min", F.row_number().over(wmin)).withColumn(
        "rn_max", F.row_number().over(wmax)
    )
    lo = r.where(F.col("rn_min") == 1).select(
        "user_id", "day", F.lit("min").alias("kind"), "ts", "value"
    )
    hi = r.where(F.col("rn_max") == 1).select(
        "user_id", "day", F.lit("max").alias("kind"), "ts", "value"
    )
    return lo.unionByName(hi)


# ---------------------------------------------------------------------------
# S5 — SAX symbolization (Lin/Keogh 2003) over the synthetic token table
# ---------------------------------------------------------------------------

_SEGMENTS = 8
# N(0,1) quartile breakpoints for a 4-letter alphabet
_BREAKS = (-0.6745, 0.0, 0.6745)

# segment means computed ONCE (left-closed (j*n)//m blocks, exact
# integer sums), then binned — the z-score per segment is evaluated a
# single time, not once per CASE branch
_SAX_EXPR = f"""
array_join(transform(
  transform(sequence(0, {_SEGMENTS - 1}), j ->
    (aggregate(slice(tokens,
        cast((cast(j AS BIGINT) * n) div {_SEGMENTS} AS INT) + 1,
        cast(((cast(j AS BIGINT) + 1) * n) div {_SEGMENTS}
             - (cast(j AS BIGINT) * n) div {_SEGMENTS} AS INT)),
      0L, (a, x) -> a + cast(x AS BIGINT))
    / cast(((cast(j AS BIGINT) + 1) * n) div {_SEGMENTS}
           - (cast(j AS BIGINT) * n) div {_SEGMENTS} AS DOUBLE)
    - mu) / sigma),
  z -> CASE WHEN z < {_BREAKS[0]}D THEN 'a'
            WHEN z < {_BREAKS[1]}D THEN 'b'
            WHEN z < {_BREAKS[2]}D THEN 'c'
            ELSE 'd' END), '')
"""


@register(
    "sax_symbols",
    oracle=synth_sql(256)
    + f"""
    , m AS (
      SELECT doc_id, n_tok,
             list_sum(tokens)::DOUBLE / n_tok AS mu,
             sqrt(list_sum(list_transform(tokens, x -> x * x))::DOUBLE / n_tok
                  - (list_sum(tokens)::DOUBLE / n_tok)
                    * (list_sum(tokens)::DOUBLE / n_tok)) AS sigma,
             tokens
      FROM synth
    )
    SELECT doc_id, n_tok,
           array_to_string(list_transform(range({_SEGMENTS}), j -> CASE
             WHEN ((list_sum(tokens[(j * n_tok) // {_SEGMENTS} + 1
                                    : ((j + 1) * n_tok) // {_SEGMENTS}])::DOUBLE
                    / (((j + 1) * n_tok) // {_SEGMENTS}
                       - (j * n_tok) // {_SEGMENTS})
                    - mu) / sigma) < {_BREAKS[0]} THEN 'a'
             WHEN ((list_sum(tokens[(j * n_tok) // {_SEGMENTS} + 1
                                    : ((j + 1) * n_tok) // {_SEGMENTS}])::DOUBLE
                    / (((j + 1) * n_tok) // {_SEGMENTS}
                       - (j * n_tok) // {_SEGMENTS})
                    - mu) / sigma) < {_BREAKS[1]} THEN 'b'
             WHEN ((list_sum(tokens[(j * n_tok) // {_SEGMENTS} + 1
                                    : ((j + 1) * n_tok) // {_SEGMENTS}])::DOUBLE
                    / (((j + 1) * n_tok) // {_SEGMENTS}
                       - (j * n_tok) // {_SEGMENTS})
                    - mu) / sigma) < {_BREAKS[2]} THEN 'c'
             ELSE 'd' END), '') AS sax
    FROM m
    """,
)
def sax_symbols(spark, sf_dir):
    """S5: SAX symbolization (Lin & Keogh 2003) of every synthetic
    series — z-normalize, PAA to 8 segments (the engine's left-closed
    ``(j*n)//m`` block scheme, same as :func:`kernels.paa`), bin
    against the N(0,1) quartile breakpoints into 'a'..'d'. Entirely
    integer-exact up to the final divisions (token power sums < 2^53),
    so the letters are bit-deterministic across engines. Zero shuffles:
    a scan-side codegen projection."""
    df = synth.sequences_df(spark, 256).select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n"),
        "tokens",
    )
    m = df.select(
        "doc_id",
        "n",
        "tokens",
        (
            F.expr("aggregate(tokens, 0L, (a, x) -> a + cast(x AS BIGINT))")
            .cast("double")
            / F.col("n")
        ).alias("mu"),
        F.sqrt(
            F.expr(
                "aggregate(tokens, 0L, (a, x) -> "
                "a + cast(x AS BIGINT) * cast(x AS BIGINT))"
            ).cast("double")
            / F.col("n")
            - (
                F.expr("aggregate(tokens, 0L, (a, x) -> a + cast(x AS BIGINT))")
                .cast("double")
                / F.col("n")
            )
            * (
                F.expr("aggregate(tokens, 0L, (a, x) -> a + cast(x AS BIGINT))")
                .cast("double")
                / F.col("n")
            )
        ).alias("sigma"),
    )
    return m.select(
        "doc_id",
        F.col("n").cast("int").alias("n_tok"),
        F.expr(_SAX_EXPR).alias("sax"),
    )


# ---------------------------------------------------------------------------
# R19 — exact percentile rollup
# ---------------------------------------------------------------------------


@register(
    "events_percentiles",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(quantile_cont(value, 0.5), 6)  AS p50,
           round(quantile_cont(value, 0.9), 6)  AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
)
def events_percentiles(spark, sf_dir):
    """R19: exact linear-interpolated percentiles per event type
    (Spark ``percentile`` == DuckDB ``quantile_cont`` on identical
    sorted sets; the two engines factor the interpolation differently,
    so round(6) absorbs the last-ulp disagreement). The production
    scale path for heavy groups is ``approx_percentile`` (t-digest-
    style sketch, map-side combinable) — exact here because the oracle
    must hash-match."""
    ev = T(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(value, 0.5D)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9D)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99D)"), 6).alias("p99"),
    )


# ---------------------------------------------------------------------------
# R20 — session windows (R13 family, batch evidence)
# ---------------------------------------------------------------------------


@register(
    "session_windows",
    oracle="""
    WITH s AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
    ),
    l AS (
      SELECT *,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    g AS (
      SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM l
    )
    SELECT user_id,
           min(ts)::TIMESTAMP AS session_start,
           (max(ts) + INTERVAL 30 MINUTE)::TIMESTAMP AS session_end,
           count(*) AS n_events,
           round(sum(value), 6) AS total_value
    FROM g GROUP BY user_id, sid
    """,
)
def session_windows(spark, sf_dir):
    """R20 (the R13 session-window operator, batch form): per-user
    activity sessions with a 30-minute inactivity gap via Spark's
    native ``session_window`` — the oracle re-derives the identical
    sessions with the gaps-and-islands idiom (new session iff the gap
    >= 30 min, matching the half-open [ts, ts+gap) window). The same
    expression runs under ``readStream`` + watermark for the streaming
    twin (stream_events_hourly's pattern); window end = last event +
    gap in both engines."""
    ev = T(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    out = ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("sw")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )
    return out.select(
        "user_id",
        F.col("sw.start").alias("session_start"),
        F.col("sw.end").alias("session_end"),
        "n_events",
        "total_value",
    )


# ---------------------------------------------------------------------------
# R21 — LTTB downsample (Steinarsson 2013)
# ---------------------------------------------------------------------------

_LTTB_N = 16


def _lttb_points(spark, sf_dir):
    import pandas as pd
    import numpy as np

    from dtaidistance_spark.functions.lttb import lttb

    ev = (
        T(spark, sf_dir, "events")
        .where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("pts")
        )
    )

    def kernel(batches):
        for b in batches:
            out = {"user_id": [], "idx": [], "ts": [], "value": []}
            for uid, pts in zip(b["user_id"], b["pts"]):
                x = np.asarray(
                    [p["ts"].timestamp() for p in pts], dtype=np.float64
                )
                y = np.asarray([p["value"] for p in pts], dtype=np.float64)
                for i, j in enumerate(lttb(x, y, _LTTB_N)):
                    out["user_id"].append(uid)
                    out["idx"].append(i)
                    out["ts"].append(pts[int(j)]["ts"])
                    out["value"].append(float(y[int(j)]))
            yield pd.DataFrame(out)

    return ev.mapInPandas(
        kernel, "user_id long, idx int, ts timestamp, value double"
    )


@register("lttb_downsample")
def lttb_downsample(spark, sf_dir):
    """R21: Largest-Triangle-Three-Buckets downsample of each user's
    'click' series to 16 perceptually-representative points (rows-only;
    the SQL-expressible invariants are oracled by lttb_check and the
    kernel is property-gated in tests/test_round2_ops.py). Same shape
    as the DBA rollup: one shuffle onto the series key, Arrow-batched
    kernel, bounded output."""
    return _lttb_points(spark, sf_dir)


@register(
    "lttb_check",
    oracle=f"""
    SELECT user_id,
           least(count(*), {_LTTB_N})::BIGINT AS n_points,
           min(ts)::TIMESTAMP AS first_ts,
           max(ts)::TIMESTAMP AS last_ts
    FROM events WHERE event_type = 'click'
    GROUP BY user_id
    """,
)
def lttb_check(spark, sf_dir):
    """Oracled LTTB invariants: exactly min(n, 16) points per user and
    the first/last points of every series preserved verbatim (the LTTB
    contract) — per-user values re-derived by plain SQL."""
    pts = _lttb_points(spark, sf_dir)
    return pts.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


# ---------------------------------------------------------------------------
# R23 — interval overlap join (bucketed scale path, never a cross product)
# ---------------------------------------------------------------------------

_INC_N = 48
_BUCKET_US = 6 * 3600 * 1_000_000  # 6-hour join grain


@register(
    "interval_overlap_join",
    oracle=f"""
    WITH s AS (
      SELECT user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    l AS (
      SELECT *,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    g AS (
      SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM l
    ),
    sess AS (
      SELECT user_id,
             epoch_us(min(ts)) AS ss,
             epoch_us(max(ts) + INTERVAL 30 MINUTE) AS se
      FROM g GROUP BY user_id, sid
    ),
    inc AS (
      SELECT k AS incident_id,
             epoch_us(TIMESTAMP '2024-01-01'
                      + k * (INTERVAL 15 HOUR)) AS istart,
             epoch_us(TIMESTAMP '2024-01-01' + k * (INTERVAL 15 HOUR)
                      + (1 + k % 5) * (INTERVAL 1 HOUR)) AS iend
      FROM (SELECT unnest(range({_INC_N})) AS k)
    ),
    ov AS (
      SELECT i.incident_id, s.user_id,
             least(s.se, i.iend) - greatest(s.ss, i.istart) AS ov_us
      FROM sess s JOIN inc i
        ON s.ss < i.iend AND i.istart < s.se
    )
    SELECT i.incident_id,
           (i.iend - i.istart)::BIGINT AS duration_us,
           count(o.user_id)::BIGINT AS n_sessions,
           coalesce(sum(o.ov_us), 0)::BIGINT AS total_overlap_us,
           count(DISTINCT o.user_id)::BIGINT AS n_users
    FROM inc i LEFT JOIN ov o ON i.incident_id = o.incident_id
    GROUP BY i.incident_id, i.iend - i.istart
    """,
)
def interval_overlap_join(spark, sf_dir):
    """R23: interval overlap join — which user sessions overlap which
    incident windows. The naive formulation is a theta join (cross
    product + range predicate, quadratic); the scale path EXPLODES each
    interval onto the 6-hour buckets it covers (bounded: a few buckets
    per interval) and equi-joins on the bucket key, deduplicating pairs
    that share several buckets before the exact overlap filter — the
    standard interval-bucketing join that keeps 100 TB of intervals off
    a CartesianProduct. All bounds integer microseconds, so per-pair
    overlap durations and the per-incident aggregate are exact; DuckDB
    re-derives everything with the plain theta join."""
    ev = T(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    sess = (
        ev.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("sw")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start").cast("timestamp")).alias("ss"),
            F.unix_micros(F.col("sw.end").cast("timestamp")).alias("se"),
        )
    )
    inc = spark.range(_INC_N).select(
        F.col("id").cast("int").alias("incident_id"),
        (
            F.unix_micros(F.lit("2024-01-01 00:00:00").cast("timestamp"))
            + F.col("id") * F.lit(15 * 3600 * 1_000_000)
        ).alias("istart"),
        (
            F.unix_micros(F.lit("2024-01-01 00:00:00").cast("timestamp"))
            + F.col("id") * F.lit(15 * 3600 * 1_000_000)
            + (1 + F.col("id") % 5) * F.lit(3600 * 1_000_000)
        ).alias("iend"),
    )
    B = _BUCKET_US

    def bucketed(df, lo, hi):
        # exact integer division — epoch-us values exceed 2^53, so a
        # float division could misassign a boundary bucket and silently
        # drop an overlapping pair
        return df.withColumn(
            "bucket",
            F.explode(
                F.expr(f"sequence({lo} div {B}, ({hi} - 1) div {B})")
            ),
        )

    sb = bucketed(sess, "ss", "se")
    ib = bucketed(inc, "istart", "iend")
    pairs = (
        sb.join(ib, "bucket")
        .where((F.col("ss") < F.col("iend")) & (F.col("istart") < F.col("se")))
        .select("incident_id", "user_id", "ss", "se", "istart", "iend")
        .distinct()
        .withColumn(
            "ov_us",
            F.least("se", "iend") - F.greatest("ss", "istart"),
        )
    )
    agg = pairs.groupBy("incident_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("ov_us").alias("total_overlap_us"),
        F.countDistinct("user_id").alias("n_users"),
    )
    return (
        inc.join(agg, "incident_id", "left")
        .select(
            "incident_id",
            (F.col("iend") - F.col("istart")).alias("duration_us"),
            F.coalesce("n_sessions", F.lit(0)).alias("n_sessions"),
            F.coalesce("total_overlap_us", F.lit(0)).alias(
                "total_overlap_us"
            ),
            F.coalesce("n_users", F.lit(0)).alias("n_users"),
        )
    )


# ---------------------------------------------------------------------------
# E4 — swinging-door trending compression (SDT)
# ---------------------------------------------------------------------------

_SDT_TOL = 5.0


def _sdt_points(spark, sf_dir):
    import numpy as np
    import pandas as pd

    from dtaidistance_spark.functions.sdt import swinging_door

    ev = (
        T(spark, sf_dir, "events")
        .where(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("pts")
        )
    )

    def kernel(batches):
        for b in batches:
            out = {"user_id": [], "idx": [], "ts": [], "value": []}
            for uid, pts in zip(b["user_id"], b["pts"]):
                x = np.asarray(
                    [p["ts"].timestamp() for p in pts], dtype=np.float64
                )
                y = np.asarray([p["value"] for p in pts], dtype=np.float64)
                for i, j in enumerate(swinging_door(x, y, _SDT_TOL)):
                    out["user_id"].append(uid)
                    out["idx"].append(i)
                    out["ts"].append(pts[int(j)]["ts"])
                    out["value"].append(float(y[int(j)]))
            yield pd.DataFrame(out)

    return ev.mapInPandas(
        kernel, "user_id long, idx int, ts timestamp, value double"
    )


@register("sdt_downsample")
def sdt_downsample(spark, sf_dir):
    """E4: swinging-door trending compression of each user's 'error'
    value stream at tolerance 5.0 (rows-only; the SQL-expressible
    invariants and the reconstruction-error bound are driver-verified
    by sdt_check) — the process-historian archiver: keep the sparsest
    point set whose linear reconstruction stays within the band. Same
    distribution shape as LTTB: one shuffle onto the series key,
    Arrow-batched kernel."""
    return _sdt_points(spark, sf_dir)


@register(
    "sdt_check",
    oracle="""
    SELECT user_id,
           count(*)::BIGINT AS n_raw,
           min(ts)::TIMESTAMP AS first_ts,
           max(ts)::TIMESTAMP AS last_ts,
           true AS kept_subset_of_raw,
           true AS within_tol
    FROM events WHERE event_type = 'error'
    GROUP BY user_id
    """,
)
def sdt_check(spark, sf_dir):
    """Oracled SDT invariants, with the tolerance bound verified by an
    INDEPENDENT Spark-SQL reconstruction (not the kernel's own math):
    kept points join back to the raw stream by (user, ts, value) —
    proving they are verbatim raw points — and every raw point joins
    its bracketing kept pair via a range join, where the interpolation
    error must be <= tol. The oracle re-derives n_raw and the
    first/last timestamps (endpoints are always kept) and pins both
    booleans true."""
    raw = (
        T(spark, sf_dir, "events")
        .where(F.col("event_type") == "error")
        .select(
            "user_id",
            F.col("ts"),
            "value",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("tu"),
        )
    )
    kept = _sdt_points(spark, sf_dir).select(
        "user_id",
        F.col("ts").alias("kts"),
        F.col("value").alias("kv"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ktu"),
    )
    # kept points must be verbatim raw points
    n_kept = kept.count()
    n_match = kept.join(
        raw,
        (kept.user_id == raw.user_id)
        & (kept.ktu == raw.tu)
        & (kept.kv == raw.value),
        "left_semi",
    ).count()
    subset_ok = n_match == n_kept
    # bracketing segments via lead()
    w = Window.partitionBy("user_id").orderBy("ktu")
    seg = (
        kept.withColumn("ktu2", F.lead("ktu").over(w))
        .withColumn("kv2", F.lead("kv").over(w))
        .where(F.col("ktu2").isNotNull())
    )
    joined = raw.alias("r").join(
        seg.alias("s"),
        (F.col("r.user_id") == F.col("s.user_id"))
        & (F.col("r.tu") >= F.col("s.ktu"))
        & (F.col("r.tu") < F.col("s.ktu2")),
    )
    err = F.abs(
        F.col("s.kv")
        + (F.col("s.kv2") - F.col("s.kv"))
        * (F.col("r.tu") - F.col("s.ktu")).cast("double")
        / (F.col("s.ktu2") - F.col("s.ktu")).cast("double")
        - F.col("r.value")
    )
    n_bad = joined.where(err > _SDT_TOL + 1e-9).count()
    within = n_bad == 0
    base = raw.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )
    rows = [
        (
            int(r["user_id"]),
            int(r["n_raw"]),
            r["first_ts"],
            r["last_ts"],
            bool(subset_ok),
            bool(within),
        )
        for r in base.collect()
    ]
    return spark.createDataFrame(
        rows,
        "user_id long, n_raw long, first_ts timestamp, last_ts timestamp, "
        "kept_subset_of_raw boolean, within_tol boolean",
    )
