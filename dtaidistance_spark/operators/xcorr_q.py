"""Cross-correlation lead-lag detection between event-type series
(TS27) — "does `click` volume lead `purchase` volume, and by how many
hours?", the standard ops/analytics question a funnel count can't
answer.  Both queries are bit-exact oracled on the REAL events table.

The statistic avoids every float trap: for each ordered type pair and
lag k ∈ [−24, 24], the mean-adjusted cross-covariance over the
overlap window is

    c_k = m·Σ x[t]·y[t+k] − (Σ x over overlap)·(Σ y over overlap)

with m = n − |k| — every term an exact int64 over hourly COUNT series
(counts ≤ ~3k/hour even at sf10 keep m·Σxy ≤ 4e12, far inside int64).
argmax_k c_k (ties → smallest k) is then a comparison over exact
integers, so the detected lead/lag is deterministic cross-engine; the
one float (the normalized Pearson r at the best lag) divides c by
sqrt(vx·vy) of exact integer variances with the identical op tree and
the floor(x·1e6+0.5)/1e6 rounding spelling.

Scale shape: the raw 100 TB event stream is reduced by ONE map-side-
combined (event_type, hour) count shuffle to a |types|×|hours| table;
the dense per-type arrays, the tiny type-pair cross join (broadcast),
and the 49-lag HOF sums all operate on that bounded table — corpus
size never appears again after the first aggregate.  Hour indexing
uses unix_micros (Spark) == epoch_us (DuckDB) DIV 3.6e9, exact int64.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import T, register
from dtaidistance_spark.operators.synth_q import synth_sql

_L = 24                      # max lead/lag in hours
_HUS = 3_600_000_000         # microseconds per hour

# shared per-lag exact sums (Spark spelling; 0-based indexing).
_SUMS_SPARK = {
    "sxy": "aggregate(sequence(0, m - 1), 0L,"
           " (a, u) -> a + xa[a0 + u] * xb[b0 + u])",
    "sx": "aggregate(slice(xa, a0 + 1, m), 0L, (a, v) -> a + v)",
    "sy": "aggregate(slice(xb, b0 + 1, m), 0L, (a, v) -> a + v)",
    "sxx": "aggregate(slice(xa, a0 + 1, m), 0L, (a, v) -> a + v * v)",
    "syy": "aggregate(slice(xb, b0 + 1, m), 0L, (a, v) -> a + v * v)",
}

# DuckDB CTE chain shared by both oracles: hourly counts -> dense
# per-type arrays on the global hour spine -> type pairs x lag grid ->
# exact per-lag sums (1-based indexing, same arithmetic).
_LAGS_DUCK = f"""
WITH hb AS (
  SELECT event_type, epoch_us(ts) // {_HUS} AS h, count(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2
),
bd AS (SELECT min(h) AS hmin, max(h) AS hmax FROM hb),
sp AS (
  SELECT t.event_type, u.g
  FROM (SELECT DISTINCT event_type FROM hb) t
  CROSS JOIN (SELECT unnest(range(0,
      (SELECT hmax - hmin + 1 FROM bd))) AS g) u
),
dn AS (
  SELECT sp.event_type, sp.g, coalesce(hb2.cnt, 0)::BIGINT AS cnt
  FROM sp LEFT JOIN (
    SELECT event_type, h - (SELECT hmin FROM bd) AS g, cnt FROM hb
  ) hb2 USING (event_type, g)
),
ar AS (
  SELECT event_type, list(cnt ORDER BY g) AS x FROM dn GROUP BY 1
),
pr AS (
  SELECT a.event_type AS ta, b.event_type AS tb,
         a.x AS xa, b.x AS xb, len(a.x)::INT AS n
  FROM ar a JOIN ar b ON a.event_type < b.event_type
),
lg AS (
  SELECT ta, tb, xa, xb, n, t.k0::INT AS k,
         (n - abs(t.k0))::INT AS m,
         greatest(0, -t.k0)::INT AS a0, greatest(0, t.k0)::INT AS b0
  FROM pr, unnest(range(-{_L}, {_L + 1})) AS t(k0)
),
sm AS (
  SELECT ta, tb, k, m,
    list_sum(list_transform(range(0, m),
      u -> xa[a0 + u + 1] * xb[b0 + u + 1]))::BIGINT AS sxy,
    list_sum(xa[a0 + 1 : a0 + m])::BIGINT AS sx,
    list_sum(xb[b0 + 1 : b0 + m])::BIGINT AS sy,
    list_sum(list_transform(xa[a0 + 1 : a0 + m], v -> v * v))::BIGINT
      AS sxx,
    list_sum(list_transform(xb[b0 + 1 : b0 + m], v -> v * v))::BIGINT
      AS syy
  FROM lg
),
cc AS (
  SELECT ta, tb, k, m::BIGINT AS m, sxy, sx, sy, sxx, syy,
         (m::BIGINT * sxy - sx * sy)::BIGINT AS c,
         (m::BIGINT * sxx - sx * sx)::BIGINT AS vx,
         (m::BIGINT * syy - sy * sy)::BIGINT AS vy
  FROM sm
)
"""


def _lags_df(spark, sf_dir):
    """Spark side of the shared per-lag table (columns of cc above)."""
    ev = T(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_HUS}").alias("h"),
    )
    hb = ev.groupBy("event_type", "h").agg(F.count(F.lit(1)).alias("cnt"))
    bd = hb.agg(F.min("h").alias("hmin"), F.max("h").alias("hmax"))
    types = hb.select("event_type").distinct()
    sp = types.crossJoin(F.broadcast(bd)).select(
        "event_type",
        F.explode(F.expr("sequence(CAST(0 AS BIGINT), hmax - hmin)")).alias(
            "g"
        ),
    )
    hb2 = hb.crossJoin(F.broadcast(bd)).select(
        "event_type", (F.col("h") - F.col("hmin")).alias("g"), "cnt"
    )
    dn = sp.join(hb2, ["event_type", "g"], "left").select(
        "event_type", "g", F.coalesce("cnt", F.lit(0)).cast("long").alias(
            "cnt"
        )
    )
    ar = dn.groupBy("event_type").agg(
        F.expr("transform(sort_array(collect_list(struct(g, cnt))),"
               " e -> e.cnt)").alias("x")
    )
    a = ar.select(F.col("event_type").alias("ta"), F.col("x").alias("xa"))
    b = ar.select(F.col("event_type").alias("tb"), F.col("x").alias("xb"))
    pr = a.join(F.broadcast(b), F.col("ta") < F.col("tb")).withColumn(
        "n", F.size("xa")
    )
    lg = pr.select(
        "ta", "tb", "xa", "xb", "n",
        F.explode(F.expr(f"sequence({-_L}, {_L})")).alias("k"),
    ).select(
        "ta", "tb", "xa", "xb", "k",
        (F.col("n") - F.abs("k")).alias("m"),
        F.greatest(F.lit(0), -F.col("k")).alias("a0"),
        F.greatest(F.lit(0), F.col("k")).alias("b0"),
    )
    sm = lg.select(
        "ta", "tb", "k", "m",
        *[F.expr(e).alias(name) for name, e in _SUMS_SPARK.items()],
    )
    mL = F.col("m").cast("long")
    return sm.select(
        "ta", "tb", "k", mL.alias("m"), "sxy", "sx", "sy", "sxx", "syy",
        (mL * F.col("sxy") - F.col("sx") * F.col("sy")).alias("c"),
        (mL * F.col("sxx") - F.col("sx") * F.col("sx")).alias("vx"),
        (mL * F.col("syy") - F.col("sy") * F.col("sy")).alias("vy"),
    )


@register(
    "xcorr_lags",
    oracle=_LAGS_DUCK
    + """
    SELECT ta, tb, k, m, sxy, sx, sy, sxx, syy, c FROM cc
    """,
)
def xcorr_lags(spark, sf_dir):
    """TS27a: the full exact cross-covariance table — one row per
    ordered event-type pair and lag k ∈ [−24, 24] hours, carrying the
    overlap length and every integer sufficient statistic plus the
    mean-adjusted cross-covariance c_k (see module docstring).  All
    int64, bit-exact.  Plan: one map-side-combined (type, hour) count
    shuffle reduces the corpus; the spine join, pair cross join
    (broadcast), and 49-lag HOF sums run on the bounded count table."""
    return _lags_df(spark, sf_dir).select(
        "ta", "tb", "k", "m", "sxy", "sx", "sy", "sxx", "syy", "c"
    )


@register(
    "xcorr_best_lag",
    oracle=_LAGS_DUCK
    + """
    , rk AS (
      SELECT ta, tb, k, m, c, vx, vy,
             row_number() OVER (PARTITION BY ta, tb
                                ORDER BY c DESC, k ASC) AS rn
      FROM cc
    )
    SELECT ta, tb, k AS best_k, m, c,
           CASE WHEN vx * vy = 0 THEN CAST(0 AS DOUBLE)
                ELSE CAST(floor(CAST(c AS DOUBLE)
                     / sqrt(CAST(vx AS DOUBLE) * CAST(vy AS DOUBLE))
                     * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE))
                     AS DOUBLE) / CAST(1000000.0 AS DOUBLE) END AS r
    FROM rk WHERE rn = 1
    """,
)
def xcorr_best_lag(spark, sf_dir):
    """TS27b: the lead-lag verdict — per type pair, the lag maximizing
    the exact cross-covariance (ties break to the smallest lag, a
    comparison over exact integers, so the argmax is deterministic
    cross-engine), with the normalized Pearson r at that lag as the
    one float column (identical op tree + floor-rounding spelling;
    vx·vy = 0 guard for degenerate constant series).  best_k > 0 means
    ta leads tb by best_k hours.  Plan: adds only a partitioned window
    over the 490-row lag table."""
    cc = _lags_df(spark, sf_dir)
    w = Window.partitionBy("ta", "tb").orderBy(
        F.col("c").desc(), F.col("k").asc()
    )
    rk = cc.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    r = (
        F.floor(
            F.col("c").cast("double")
            / F.sqrt(F.col("vx").cast("double") * F.col("vy").cast("double"))
            * 1000000.0
            + 0.5
        ).cast("double")
        / 1000000.0
    )
    return rk.select(
        "ta", "tb", F.col("k").alias("best_k"), "m", "c",
        F.when(F.col("vx") * F.col("vy") == 0, F.lit(0.0))
        .otherwise(r)
        .alias("r"),
    )


# ---------------------------------------------------------------------------
# TS28 — per-series autocorrelation diagnostics at dyadic lags
# ---------------------------------------------------------------------------

_ACF_N = 256
_ACF_LAGS = [1, 2, 4, 8, 16, 32, 64]

# per-lag exact sufficient statistics over the overlap window of a
# single series x (0-based Spark / 1-based DuckDB indexing); the
# overlap-mean formulation keeps every term inside int64 even at
# vocab-scale values: m·Σxy ≤ 8192·2.1e13 ≈ 1.7e17, (Σx)² ≤ 1.7e17.
_ACF_SPARK = {
    "sxy": "aggregate(sequence(0, m - 1), 0L,"
           " (a, u) -> a + CAST(x[u] AS BIGINT) * CAST(x[u + k] AS BIGINT))",
    "sh": "aggregate(slice(x, 1, m), 0L, (a, v) -> a + CAST(v AS BIGINT))",
    "st": "aggregate(slice(x, k + 1, m), 0L, (a, v) -> a + CAST(v AS BIGINT))",
    "shh": "aggregate(slice(x, 1, m), 0L,"
           " (a, v) -> a + CAST(v AS BIGINT) * CAST(v AS BIGINT))",
    "stt": "aggregate(slice(x, k + 1, m), 0L,"
           " (a, v) -> a + CAST(v AS BIGINT) * CAST(v AS BIGINT))",
}
_ACF_DUCK = {
    "sxy": "list_sum(list_transform(range(0, m),"
           " u -> x[u + 1]::BIGINT * x[u + k + 1]::BIGINT))::BIGINT",
    "sh": "list_sum(list_transform(x[1 : m], v -> v::BIGINT))::BIGINT",
    "st": "list_sum(list_transform(x[k + 1 : k + m], v -> v::BIGINT))"
          "::BIGINT",
    "shh": "list_sum(list_transform(x[1 : m], v -> v::BIGINT * v::BIGINT))"
           "::BIGINT",
    "stt": "list_sum(list_transform(x[k + 1 : k + m],"
           " v -> v::BIGINT * v::BIGINT))::BIGINT",
}

_R_SHARED = (
    "CASE WHEN vh = 0 OR vt = 0 THEN CAST(0 AS DOUBLE)"
    " ELSE CAST(floor(CAST(c AS DOUBLE)"
    " / sqrt(CAST(vh AS DOUBLE) * CAST(vt AS DOUBLE))"
    " * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE)"
    " / CAST(1000000.0 AS DOUBLE) END"
)


@register(
    "series_acf",
    oracle=synth_sql(_ACF_N)
    + f"""
    , lg AS (
      SELECT doc_id, source, tokens AS x, n_tok,
             t.k0::INT AS k, (n_tok - t.k0)::INT AS m
      FROM synth, unnest([{", ".join(str(k) for k in _ACF_LAGS)}]) AS t(k0)
    ),
    sm AS (
      SELECT doc_id, source, k, m,
             {", ".join(f"{e} AS {n}" for n, e in _ACF_DUCK.items())}
      FROM lg
    ),
    cc AS (
      SELECT doc_id, source, k, m::BIGINT AS m,
             (m::BIGINT * sxy - sh * st)::BIGINT AS c,
             (m::BIGINT * shh - sh * sh)::BIGINT AS vh,
             (m::BIGINT * stt - st * st)::BIGINT AS vt
      FROM sm
    ),
    rr AS (
      SELECT doc_id, source, k, m, c, vh, vt, {_R_SHARED} AS r FROM cc
    )
    SELECT doc_id, source, k, m, c, vh, vt, r,
           (row_number() OVER (PARTITION BY doc_id
                               ORDER BY r DESC, k ASC) = 1) AS is_dominant
    FROM rr
    """,
)
def series_acf(spark, sf_dir):
    """TS28: per-series autocorrelation diagnostics at dyadic lags
    k ∈ {{1,2,4,8,16,32,64}} — the periodicity fingerprint a rollup
    planner reads before choosing a downsample window.  (On the raw
    synth tokens the modular ramp decorrelates every lag — mean r stays
    within ±0.04 — so the verdicts here exercise determinism, not a
    planted period; the pytest proves exact parity per lag.)  Same
    exact algebra as TS27 applied within one series:
    the overlap-mean cross-covariance c_k = m·Σ x_t·x_{{t+k}} −
    S_head·S_tail and both variance terms are exact int64 even at
    vocab-scale values (≤ 1.7e17), so the dominant-lag verdict (max r,
    ties smallest k — via a PARTITIONED window) is deterministic; the
    normalized r is the one float, shared op tree + floor-1e6.  Plan:
    zero shuffles for the statistics (scan-side HOFs per row), one
    doc-keyed exchange for the dominant-lag window over the 7-row
    groups."""
    docs = synth.sequences_df(spark, _ACF_N).select(
        "doc_id", "source", F.col("tokens").alias("x"), "n_tok"
    )
    lg = docs.select(
        "doc_id", "source", "x",
        F.explode(
            F.array(*[F.lit(k) for k in _ACF_LAGS])
        ).alias("k"),
        "n_tok",
    ).select(
        "doc_id", "source", "x", "k",
        (F.col("n_tok") - F.col("k")).alias("m"),
    )
    sm = lg.select(
        "doc_id", "source", "k", "m",
        *[F.expr(e).alias(n) for n, e in _ACF_SPARK.items()],
    )
    mL = F.col("m").cast("long")
    cc = sm.select(
        "doc_id", "source", "k", mL.alias("m"),
        (mL * F.col("sxy") - F.col("sh") * F.col("st")).alias("c"),
        (mL * F.col("shh") - F.col("sh") * F.col("sh")).alias("vh"),
        (mL * F.col("stt") - F.col("st") * F.col("st")).alias("vt"),
    )
    rr = cc.withColumn("r", F.expr(_R_SHARED))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("r").desc(), F.col("k").asc()
    )
    return rr.withColumn(
        "is_dominant", F.row_number().over(w) == 1
    )


# ---------------------------------------------------------------------------
# TS36 — rolling 24 h Pearson correlation between two event-type count
# series, with ZERO window functions: each hour's (cx, cy) row is
# exploded to the 24 window ids it participates in and ONE map-side-
# combined aggregate collects the five correlation sums — hours where
# both series are 0 contribute nothing to any sum, so the (sparse)
# count table needs no zero-filling and n is the constant 24.
# ---------------------------------------------------------------------------

_RC_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"
_RC_R = (
    "(CAST(24 * sxy - sx * sy AS DOUBLE)"
    " / (sqrt(CAST(24 * sxx - sx * sx AS DOUBLE))"
    "    * sqrt(CAST(24 * syy - sy * sy AS DOUBLE))))"
)


@register(
    "rolling_correlation",
    oracle=f"""
    WITH s AS (
      SELECT event_type, epoch_us(ts) // 3600000000 AS h FROM events
      WHERE event_type IN ('click', 'view')
    ),
    cnt AS (
      SELECT h,
             CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cx,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cy
      FROM s GROUP BY h
    ),
    lims AS (SELECT min(h) AS h0, max(h) AS h1 FROM cnt),
    contrib AS (
      SELECT unnest(range(h, h + 24)) AS w, cx, cy FROM cnt
    ),
    sums AS (
      SELECT w, CAST(sum(cx) AS BIGINT) AS sx, CAST(sum(cy) AS BIGINT) AS sy,
             CAST(sum(cx * cx) AS BIGINT) AS sxx,
             CAST(sum(cy * cy) AS BIGINT) AS syy,
             CAST(sum(cx * cy) AS BIGINT) AS sxy
      FROM contrib GROUP BY w
    )
    SELECT w AS window_end_h, sx, sy, sxx, syy, sxy,
           {_RC_F6.format(x=_RC_R)} AS r
    FROM sums, lims
    WHERE w >= h0 + 23 AND w <= h1
      AND 24 * sxx - sx * sx > 0 AND 24 * syy - sy * sy > 0
    """,
)
def rolling_correlation(spark, sf_dir):
    """TS36: rolling 24-hour Pearson correlation between the click and
    view hourly count series — the co-movement diagnostic a capacity/
    anomaly dashboard reads. No window functions at all: every hour row
    explodes to the 24 window ids it belongs to (a bounded sequence)
    and ONE map-side-combined aggregate collects (Σx, Σy, Σx², Σy²,
    Σxy) — all exact int64 since inputs are counts; n = 24 is constant
    because all-zero hours contribute nothing to any sum. One float:
    the final r (floor-1e6). Window ids outside full coverage or with
    zero variance are excluded by the int64 guards. 100 TB shape: the
    exchange carries 24 combiner rows per task per window id — never
    the events."""
    s = T(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view")
    ).select(
        "event_type",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000").alias(
            "h"
        ),
    )
    cnt = s.groupBy("h").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("cx"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("cy"),
    )
    lims = cnt.agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    contrib = cnt.select(
        F.explode(F.expr("sequence(h, h + 23)")).alias("w"), "cx", "cy"
    )
    sums = contrib.groupBy("w").agg(
        F.sum("cx").cast("long").alias("sx"),
        F.sum("cy").cast("long").alias("sy"),
        F.sum(F.expr("cx * cx")).cast("long").alias("sxx"),
        F.sum(F.expr("cy * cy")).cast("long").alias("syy"),
        F.sum(F.expr("cx * cy")).cast("long").alias("sxy"),
    )
    return (
        sums.crossJoin(F.broadcast(lims))
        .where(
            (F.col("w") >= F.col("h0") + 23)
            & (F.col("w") <= F.col("h1"))
            & (F.expr("24 * sxx - sx * sx") > 0)
            & (F.expr("24 * syy - sy * sy") > 0)
        )
        .select(
            F.col("w").alias("window_end_h"),
            "sx",
            "sy",
            "sxx",
            "syy",
            "sxy",
            F.expr(_RC_F6.format(x=_RC_R)).alias("r"),
        )
    )
