"""Time-series analytics, round-2 batch 3: autocorrelation /
seasonality detection, EWMA smoothing, CUSUM change-point detection,
seasonal-baseline anomaly ranking, and KMV (theta) distinct sketches
with set operations — every query fully DuckDB-oracled, most of them
BIT-EXACT with no rounding tolerance.

Exactness strategy (the round-2 lever, see BASELINE.md): every
aggregation that crosses rows stays in exact int64 (token values
< 50257, so sums / power sums / lagged cross products over <= 8192
tokens all stay far below 2^53 — integer addition is order-independent,
so shuffle order can't perturb them); the float tail is then ONE shared
expression string evaluated over those identical integers by both
engines, and each IEEE-754 double op (cast, add, mul, div, sqrt) is
correctly rounded deterministically — identical tree, identical bits.
The EWMA folds go further: Spark ``aggregate`` and DuckDB
``list_reduce`` are both strict left folds, so a recursive smoother is
bit-identical too (verified: identical bit patterns for alpha = 1/2 and
1/4, whose divisions are also exact).

Scale notes: ACF / EWMA / seasonality are scan-side HOF projections
with zero shuffles (the per-row lag products are O(n * lags) inside
codegen); CUSUM is one hash shuffle onto the series key with a single
window sort; the KMV sketches reduce the corpus to k=256 hashes per
set BEFORE any cross-set work (the DataSketches theta pattern — at
100 TB the sketch build is one map-side-combinable distinct + top-k
per key, and set algebra runs on kilobyte sketches).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import T, register
from dtaidistance_spark.operators.qutil import global_topk
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 256
_LAGS = (1, 2, 4, 8, 16, 32, 64)

# ---------------------------------------------------------------------------
# ACF — autocorrelation per series at a lag set (bit-exact)
# ---------------------------------------------------------------------------

# shared float tail over exact-int64 columns (sa, qa, pa, ha, ta) and the
# ints (n_tok, k): mu = sa/n; acf_k =
#   (pa - mu*ta - mu*ha + (n-k)*mu^2) / (qa - sa*mu)
# spelled ONE op at a time with full parens so Spark and DuckDB build the
# identical IEEE expression tree.
_MU = "(CAST(sa AS DOUBLE) / CAST(n_tok AS DOUBLE))"
_ACF_EXPR = (
    f"((((CAST(pa AS DOUBLE) - ({_MU} * CAST(ta AS DOUBLE)))"
    f" - ({_MU} * CAST(ha AS DOUBLE)))"
    f" + (CAST(n_tok - k AS DOUBLE) * ({_MU} * {_MU})))"
    f" / (CAST(qa AS DOUBLE) - (CAST(sa AS DOUBLE) * {_MU})))"
)

_ACF_ORACLE_BODY = f"""
, lg AS (SELECT unnest([{", ".join(str(k) for k in _LAGS)}]) AS k),
acfa AS (
  SELECT doc_id, n_tok, k,
    list_sum(tokens)::BIGINT AS sa,
    list_sum(list_transform(tokens, x -> x::BIGINT * x::BIGINT))::BIGINT AS qa,
    list_sum(list_transform(range(1, n_tok - k + 1),
        i -> tokens[i]::BIGINT * tokens[i + k]::BIGINT))::BIGINT AS pa,
    list_sum(tokens[1 : n_tok - k])::BIGINT AS ha,
    list_sum(tokens[k + 1 : n_tok])::BIGINT AS ta
  FROM synth, lg WHERE k < n_tok
),
acfr AS (SELECT doc_id, n_tok, k, {_ACF_EXPR} AS acf FROM acfa)
"""


def _acf_df(spark):
    """Per-(doc, lag) autocorrelation over the synthetic token table —
    exact int64 aggregates via scan-side HOFs (zero shuffles), then the
    shared float tail."""
    df = synth.sequences_df(spark, _N).select("doc_id", "n_tok", "tokens")
    lag = F.explode(F.array(*[F.lit(k) for k in _LAGS])).alias("k")
    df = df.select("doc_id", "n_tok", "tokens", lag).where(
        F.col("k") < F.col("n_tok")
    )
    df = df.select(
        "doc_id",
        "n_tok",
        "k",
        F.expr(
            "aggregate(tokens, 0L, (a, x) -> a + CAST(x AS BIGINT))"
        ).alias("sa"),
        F.expr(
            "aggregate(tokens, 0L, (a, x) -> "
            "a + CAST(x AS BIGINT) * CAST(x AS BIGINT))"
        ).alias("qa"),
        F.expr(
            "aggregate(zip_with("
            "  slice(tokens, 1, n_tok - k), slice(tokens, k + 1, n_tok - k),"
            "  (a, b) -> CAST(a AS BIGINT) * CAST(b AS BIGINT)),"
            " 0L, (s, v) -> s + v)"
        ).alias("pa"),
        F.expr(
            "aggregate(slice(tokens, 1, n_tok - k), 0L,"
            " (a, x) -> a + CAST(x AS BIGINT))"
        ).alias("ha"),
        F.expr(
            "aggregate(slice(tokens, k + 1, n_tok - k), 0L,"
            " (a, x) -> a + CAST(x AS BIGINT))"
        ).alias("ta"),
    )
    return df.select("doc_id", "n_tok", "k", F.expr(_ACF_EXPR).alias("acf"))


@register(
    "acf_per_series",
    oracle=synth_sql(_N)
    + _ACF_ORACLE_BODY
    + """
    SELECT doc_id, k AS lag, acf FROM acfr
    """,
)
def acf_per_series(spark, sf_dir):
    """Autocorrelation function per series at lags 1..64 — the
    sample-ACF estimator r_k = sum((x_i - mu)(x_{i+k} - mu)) / sum((x_i
    - mu)^2), expanded so every cross-row aggregate is an exact int64
    (lagged products, head/tail sums, power sums) and the mean-centering
    happens in one shared float expression tree: 1786 REAL doubles
    hash-match DuckDB with no rounding tolerance. The synthetic series
    carry a period-64 seasonal component next to a modular token ramp;
    both structures show up in the lag profile. Zero shuffles: the lag
    products are per-row HOFs inside codegen."""
    return _acf_df(spark).select("doc_id", F.col("k").alias("lag"), "acf")


@register(
    "seasonality_detect",
    oracle=synth_sql(_N)
    + _ACF_ORACLE_BODY
    + """
    , rk AS (
      SELECT doc_id, n_tok, k, acf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY acf DESC, k) AS rn
      FROM acfr
    )
    SELECT doc_id, n_tok, k AS best_lag, acf AS best_acf
    FROM rk WHERE rn = 1
    """,
)
def seasonality_detect(spark, sf_dir):
    """Dominant-period detection: per series, the lag with the highest
    ACF (ties to the smallest lag). Because the per-(doc, lag) ACF
    doubles are bit-identical across engines, the argmax itself is
    deterministic and driver-hashed. (The modular token ramp dominates
    most docs at short lags; a deterministic minority surfaces the
    planted period-64 sinusoid — both are real structure.)"""
    df = _acf_df(spark)
    w = Window.partitionBy("doc_id").orderBy(F.col("acf").desc(), F.col("k"))
    return (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            "n_tok",
            F.col("k").alias("best_lag"),
            F.col("acf").alias("best_acf"),
        )
    )


# ---------------------------------------------------------------------------
# EWMA — exponentially weighted moving average via left-fold parity
# ---------------------------------------------------------------------------


@register(
    "ewma_smooth",
    oracle=synth_sql(_N)
    + """
    SELECT doc_id, n_tok,
      list_reduce(list_transform(tokens, t -> CAST(t AS DOUBLE)),
        (s, x) -> ((s + x) / CAST(2 AS DOUBLE))) AS ewma_half,
      list_reduce(list_transform(tokens, t -> CAST(t AS DOUBLE)),
        (s, x) -> (s + ((x - s) / CAST(4 AS DOUBLE)))) AS ewma_quarter
    FROM synth
    """,
)
def ewma_smooth(spark, sf_dir):
    """EWMA terminal value per series at alpha = 1/2 and 1/4 — the
    recursive smoother s_t = s_{t-1} + alpha*(x_t - s_{t-1}) computed as
    a strict left fold: Spark ``aggregate`` (init = first element, same
    as DuckDB ``list_reduce``) walks the identical op sequence, and with
    power-of-two alphas the scale step is an EXACT division, so every
    intermediate state is bit-identical across engines — the registry
    hash has no tolerance. Zero shuffles; the fold runs inside the scan
    projection. (A windowed per-position EWMA at 100 TB is the same
    recurrence over a windowed sort — this form pins the arithmetic.)"""
    df = synth.sequences_df(spark, _N)
    xs = "transform(tokens, t -> CAST(t AS DOUBLE))"
    return df.select(
        "doc_id",
        "n_tok",
        F.expr(
            f"aggregate(slice({xs}, 2, n_tok - 1), element_at({xs}, 1),"
            " (s, x) -> ((s + x) / CAST(2 AS DOUBLE)))"
        ).alias("ewma_half"),
        F.expr(
            f"aggregate(slice({xs}, 2, n_tok - 1), element_at({xs}, 1),"
            " (s, x) -> (s + ((x - s) / CAST(4 AS DOUBLE))))"
        ).alias("ewma_quarter"),
    )


# ---------------------------------------------------------------------------
# CUSUM — at-most-one-change mean-shift detection (planted, integer-exact)
# ---------------------------------------------------------------------------

_N_CUSUM = 128
_SHIFT = 20000


@register(
    "cusum_changepoint",
    oracle=synth_sql(_N_CUSUM)
    + f"""
    , ce AS (
      SELECT doc_id, n_tok,
        (CAST(substr(doc_id, 4, 12) AS INT) % 5 = 0) AS injected,
        t.j AS j,
        (tokens[t.j + 1]
         + CASE WHEN (CAST(substr(doc_id, 4, 12) AS INT) % 5 = 0)
                     AND t.j >= n_tok // 2
                THEN {_SHIFT} ELSE 0 END)::BIGINT AS t2
      FROM synth, unnest(range(n_tok)) AS t(j)
    ),
    cc AS (
      SELECT *,
        sum(t2) OVER (PARTITION BY doc_id ORDER BY j
                      ROWS UNBOUNDED PRECEDING)::BIGINT AS cum,
        sum(t2) OVER (PARTITION BY doc_id)::BIGINT AS stot
      FROM ce
    ),
    cs AS (
      SELECT doc_id, n_tok, injected, j + 1 AS k,
             abs(n_tok::BIGINT * cum - (j + 1)::BIGINT * stot)::BIGINT AS stat
      FROM cc WHERE j + 1 < n_tok
    ),
    cr AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY stat DESC, k) AS rn
      FROM cs
    )
    SELECT doc_id, n_tok, injected, k AS cp_pos, stat FROM cr WHERE rn = 1
    """,
)
def cusum_changepoint(spark, sf_dir):
    """CUSUM at-most-one-change detection: the change point of series x
    is argmax_k |n*S_k - k*S_n| (the cumulative-sum deviation statistic,
    scaled by n to stay in exact int64 — tokens < 50257 and n <= 8192
    keep n*cum < 2^53). Every 5th doc gets a deterministic +20000 level
    shift injected in-query over its second half, so the detection path
    is exercised: the argmax must land at the plant boundary. Fully
    integer — the driver hash has no tolerance. One shuffle onto the
    series key; the cumsum, total, and argmax share one window sort."""
    seq = synth.sequences_df(spark, _N_CUSUM)
    e = seq.select(
        "doc_id",
        "n_tok",
        (F.substring("doc_id", 4, 12).cast("int") % 5 == 0).alias("injected"),
        F.posexplode("tokens").alias("j", "tok"),
    ).select(
        "doc_id",
        "n_tok",
        "injected",
        "j",
        (
            F.col("tok").cast("long")
            + F.when(
                F.col("injected") & (F.col("j") >= F.expr("n_tok div 2")),
                F.lit(_SHIFT),
            ).otherwise(F.lit(0))
        ).alias("t2"),
    )
    wcum = (
        Window.partitionBy("doc_id")
        .orderBy("j")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("doc_id")
    c = e.withColumn("cum", F.sum("t2").over(wcum)).withColumn(
        "stot", F.sum("t2").over(wall)
    )
    s = c.where(F.col("j") + 1 < F.col("n_tok")).select(
        "doc_id",
        "n_tok",
        "injected",
        (F.col("j") + 1).alias("k"),
        F.abs(
            F.col("n_tok").cast("long") * F.col("cum")
            - (F.col("j") + 1).cast("long") * F.col("stot")
        ).alias("stat"),
    )
    wr = Window.partitionBy("doc_id").orderBy(F.col("stat").desc(), F.col("k"))
    return (
        s.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select(
            "doc_id", "n_tok", "injected", F.col("k").alias("cp_pos"), "stat"
        )
    )


# ---------------------------------------------------------------------------
# Seasonal-baseline anomaly ranking over the events table
# ---------------------------------------------------------------------------


@register(
    "seasonal_anomaly",
    oracle="""
    WITH b AS (
      SELECT event_type, hour(ts) AS hr,
             round(avg(value), 6) AS baseline, count(*) AS n_base
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT e.event_id, e.event_type, hour(e.ts) AS hr, e.value,
             b.baseline, b.n_base,
             round(e.value - b.baseline, 6) AS residual
      FROM events e JOIN b
        ON e.event_type = b.event_type AND hour(e.ts) = b.hr
    ),
    k AS (
      SELECT *, row_number() OVER (ORDER BY abs(residual) DESC, event_id)
               AS rnk
      FROM r
    )
    SELECT event_id, event_type, hr, round(value, 6) AS value,
           baseline, n_base, residual, rnk
    FROM k WHERE rnk <= 20
    """,
)
def seasonal_anomaly(spark, sf_dir):
    """Seasonal-profile anomaly report: the hour-of-day x event-type
    mean is the seasonal baseline (a 120-row dimension — broadcast);
    each event's residual against its baseline is ranked globally and
    the top 20 anomalies returned. round(6)-before-rank on both sides
    absorbs aggregation-order ulps (the established BM25 pattern);
    ties break on event_id, so the ranking is deterministic. Scale:
    the baseline aggregate is map-side combinable, the join is a
    broadcast, and the global top-k is TakeOrderedAndProject (bounded
    per-partition heaps; the rank is derived on the <=20 survivors) —
    no full sort and no partition-less WindowExec ever materializes
    (gated in tests/test_plans.py)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    b = ev.groupBy(
        "event_type", F.hour("ts").alias("hr")
    ).agg(
        F.round(F.avg("value"), 6).alias("baseline"),
        F.count(F.lit(1)).alias("n_base"),
    )
    r = ev.withColumn("hr", F.hour("ts")).join(
        F.broadcast(b), ["event_type", "hr"]
    ).withColumn("residual", F.round(F.col("value") - F.col("baseline"), 6))
    top = global_topk(
        r.select(
            "event_id",
            "event_type",
            "hr",
            F.round("value", 6).alias("value"),
            "baseline",
            "n_base",
            "residual",
        ),
        [(F.abs(F.col("residual")), True), (F.col("event_id"), False)],
        20,
        rank_col="rnk",
    )
    return top.select(
        "event_id", "event_type", "hr", "value",
        "baseline", "n_base", "residual", "rnk",
    )


# ---------------------------------------------------------------------------
# KMV (theta) distinct sketch + set operations
# ---------------------------------------------------------------------------

_K = 256
_TWO60 = 1 << 60
# shared estimator tail over exact ints (nd = true distinct in exact mode,
# theta = k-th smallest hash): est = (k-1) * 2^60 / theta
_KMV_EST = (
    f"CASE WHEN nd <= {_K} THEN CAST(nd AS DOUBLE)"
    f" ELSE ((CAST({_K - 1} AS DOUBLE) * CAST({_TWO60} AS DOUBLE))"
    f" / CAST(theta AS DOUBLE)) END"
)
# set-op estimator over the sample count below theta
_KMV_SET_EST = (
    "((CAST(cnt AS DOUBLE) * CAST({t60} AS DOUBLE))"
    " / CAST(theta AS DOUBLE))".format(t60=_TWO60)
)

_KMV_HASH_DUCK = (
    "('0x' || substr(md5(CAST(tok AS VARCHAR)), 1, 15))::BIGINT"
)
_KMV_BASE_DUCK = f"""
, kt AS (
  SELECT DISTINCT source, {_KMV_HASH_DUCK} AS hv
  FROM synth, unnest(tokens) AS t(tok)
),
kd AS (
  SELECT source, count(DISTINCT t.tok) AS nd
  FROM synth, unnest(tokens) AS t(tok) GROUP BY source
),
kr AS (
  SELECT source, hv,
         row_number() OVER (PARTITION BY source ORDER BY hv) AS rn
  FROM kt
)
"""


def _kmv_hashes(spark):
    """Distinct (source, 60-bit md5 hash) pairs over the synthetic
    token values — Spark conv() returns STRING, hence the BIGINT cast
    (portable-hash twin convention, FIXTURES.md)."""
    seq = synth.sequences_df(spark, _N)
    return (
        seq.select("source", F.explode("tokens").alias("tok"))
        .select(
            "source",
            F.conv(
                F.substring(F.md5(F.col("tok").cast("string")), 1, 15), 16, 10
            )
            .cast("long")
            .alias("hv"),
            F.col("tok"),
        )
    )


@register(
    "kmv_distinct",
    oracle=synth_sql(_N)
    + _KMV_BASE_DUCK
    + f"""
    SELECT d.source, d.nd AS exact_distinct, r.hv AS theta,
           {_KMV_EST} AS kmv_estimate
    FROM kd d JOIN kr r ON d.source = r.source AND r.rn = {_K}
    """,
)
def kmv_distinct(spark, sf_dir):
    """KMV / theta distinct-count sketch (k=256) per source over the
    synthetic token values: the k-th smallest 60-bit md5 hash of the
    distinct items is theta, and the estimate is (k-1)*2^60/theta —
    integer everywhere until the single shared division, so the REAL
    estimates hash-match DuckDB bit-for-bit next to the exact counts
    (web ~50k true distinct, ~6% expected error at k=256). Scale: the
    sketch build is one distinct + per-key bottom-k — map-side
    combinable, k*8 bytes per key crosses the wire, and that is the
    whole point at 10^12 rows (the exact count here is the small-N
    verification twin)."""
    h = _kmv_hashes(spark)
    kt = h.select("source", "hv").distinct()
    kd = h.groupBy("source").agg(
        F.countDistinct("tok").alias("nd")
    )
    w = Window.partitionBy("source").orderBy("hv")
    kr = kt.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == _K
    )
    j = kd.join(kr, "source").select(
        "source",
        F.col("nd").alias("exact_distinct"),
        F.col("hv").alias("theta"),
        F.expr(_KMV_EST.replace("theta", "hv")).alias("kmv_estimate"),
    )
    return j


@register(
    "kmv_set_ops",
    oracle=synth_sql(_N)
    + _KMV_BASE_DUCK
    + f"""
    , th AS (
      SELECT least(
        max(CASE WHEN source = 'web' THEN hv END),
        max(CASE WHEN source = 'code' THEN hv END)) AS theta
      FROM kr WHERE rn = {_K}
    ),
    uni AS (
      SELECT count(DISTINCT hv) AS cnt FROM kt, th
      WHERE source IN ('web', 'code') AND hv < theta
    ),
    itr AS (
      SELECT count(*) AS cnt FROM (
        SELECT hv FROM kt, th WHERE source = 'web' AND hv < theta
        INTERSECT
        SELECT hv FROM kt, th WHERE source = 'code' AND hv < theta
      )
    ),
    ex AS (
      SELECT
        (SELECT count(DISTINCT t.tok) FROM synth, unnest(tokens) AS t(tok)
         WHERE source IN ('web', 'code')) AS exact_union,
        (SELECT count(*) FROM (
           SELECT DISTINCT t.tok FROM synth, unnest(tokens) AS t(tok)
           WHERE source = 'web'
           INTERSECT
           SELECT DISTINCT t.tok FROM synth, unnest(tokens) AS t(tok)
           WHERE source = 'code')) AS exact_inter
    )
    SELECT th.theta,
           ex.exact_union,
           (SELECT {_KMV_SET_EST} FROM uni, th) AS est_union,
           ex.exact_inter,
           (SELECT {_KMV_SET_EST} FROM itr, th) AS est_inter
    FROM th, ex
    """,
)
def kmv_set_ops(spark, sf_dir):
    """Theta-sketch set algebra (the DataSketches union/intersection
    rules): with per-set KMV sketches for web and code token sets,
    theta = min(theta_web, theta_code); the union estimate counts
    distinct retained hashes below theta, the intersection estimate
    counts hashes retained by BOTH below theta — each scaled by
    2^60/theta in one shared float expression. Exact counts ride along
    as the verification twin. At scale only the two k-hash sketches
    meet; the corpora never join.

    The exploded (source, tok, hv) base feeds FIVE independent
    aggregate branches (theta, union/intersection retained counts, two
    exact twins), so it is persisted once instead of re-running the
    generator + explode per branch — 26.5s → ~8s at sf0.01."""
    h = _kmv_hashes(spark).where(
        F.col("source").isin("web", "code")
    ).persist()
    kt = h.select("source", "hv").distinct().persist()
    w = Window.partitionBy("source").orderBy("hv")
    kth = (
        kt.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == _K)
        .groupBy()
        .agg(F.min("hv").alias("theta"))
    )
    below = kt.join(F.broadcast(kth), F.col("hv") < F.col("theta")).select(
        "source", "hv"
    )
    uni = below.select("hv").distinct().groupBy().agg(
        F.count(F.lit(1)).alias("cnt")
    )
    itr = (
        below.where(F.col("source") == "web")
        .select("hv")
        .intersect(below.where(F.col("source") == "code").select("hv"))
        .groupBy()
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ex = h.select("tok").distinct().groupBy().agg(
        F.count(F.lit(1)).alias("exact_union")
    )
    exi = (
        h.where(F.col("source") == "web")
        .select("tok")
        .distinct()
        .intersect(h.where(F.col("source") == "code").select("tok").distinct())
        .groupBy()
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    row = (
        kth.crossJoin(ex)
        .crossJoin(uni.select(F.col("cnt").alias("ucnt")))
        .crossJoin(exi)
        .crossJoin(itr.select(F.col("cnt").alias("icnt")))
    )
    return row.select(
        "theta",
        "exact_union",
        F.expr(_KMV_SET_EST.replace("cnt", "ucnt")).alias("est_union"),
        "exact_inter",
        F.expr(_KMV_SET_EST.replace("cnt", "icnt")).alias("est_inter"),
    )


# ---------------------------------------------------------------------------
# TS12 — cross-correlation (CCF) + lead-lag detection between paired series
# ---------------------------------------------------------------------------

_CCF_LAGS = (-32, -16, -8, -4, -2, -1, 0, 1, 2, 4, 8, 16, 32)
_CCF_CAP = 512

# shared float tail over exact ints: corr = num / (sqrt(vx) * sqrt(vy)),
# degenerate variance pinned to 0 exactly like the znorm profile kernel
_CCF_EXPR = (
    "(CASE WHEN vx > 0 AND vy > 0 THEN"
    " (CAST(num AS DOUBLE) / (sqrt(CAST(vx AS DOUBLE))"
    " * sqrt(CAST(vy AS DOUBLE)))) ELSE CAST(0 AS DOUBLE) END)"
)

_CCF_ORACLE_BODY = f"""
, cp AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         least(least(a.n_tok, b.n_tok), {_CCF_CAP}) AS L,
         a.tokens AS ta, b.tokens AS tb
  FROM synth a JOIN synth b
    ON CAST(substr(b.doc_id, 4, 12) AS INT)
       = CAST(substr(a.doc_id, 4, 12) AS INT) + 1
   AND CAST(substr(a.doc_id, 4, 12) AS INT) % 2 = 0
),
cl AS (
  SELECT cp.*, t.k AS lag, abs(t.k) AS s,
         L - abs(t.k) AS n
  FROM cp, unnest([{", ".join(str(k) for k in _CCF_LAGS)}]) AS t(k)
  WHERE L - abs(t.k) > 1
),
cx AS (
  SELECT doc_a, doc_b, lag, n,
    CASE WHEN lag >= 0 THEN ta[1 : n] ELSE ta[s + 1 : s + n] END AS ax,
    CASE WHEN lag >= 0 THEN tb[s + 1 : s + n] ELSE tb[1 : n] END AS bx
  FROM cl
),
cs AS (
  SELECT doc_a, doc_b, lag, n,
    list_sum(ax)::BIGINT AS sx, list_sum(bx)::BIGINT AS sy,
    list_sum(list_transform(range(1, n + 1),
        i -> ax[i]::BIGINT * bx[i]::BIGINT))::BIGINT AS sxy,
    list_sum(list_transform(ax, x -> x::BIGINT * x::BIGINT))::BIGINT AS sxx,
    list_sum(list_transform(bx, x -> x::BIGINT * x::BIGINT))::BIGINT AS syy
  FROM cx
),
cc AS (
  SELECT doc_a, doc_b, lag, n,
         n::BIGINT * sxy - sx * sy AS num,
         n::BIGINT * sxx - sx * sx AS vx,
         n::BIGINT * syy - sy * sy AS vy
  FROM cs
),
ccf AS (SELECT doc_a, doc_b, lag, n, {_CCF_EXPR} AS ccf FROM cc)
"""


def _ccf_df(spark):
    """Per-(pair, lag) cross-correlation over consecutive doc pairs —
    exact int64 overlap sums via scan-side HOFs, shared float tail."""
    df = synth.sequences_df(spark, _N).select(
        "doc_id",
        F.substring("doc_id", 4, 12).cast("int").alias("i"),
        "n_tok",
        "tokens",
    )
    a = df.where(F.col("i") % 2 == 0).select(
        F.col("doc_id").alias("doc_a"),
        F.col("i").alias("ia"),
        F.col("n_tok").alias("na"),
        F.col("tokens").alias("ta"),
    )
    b = df.select(
        F.col("doc_id").alias("doc_b"),
        F.col("i").alias("ib"),
        F.col("n_tok").alias("nb"),
        F.col("tokens").alias("tb"),
    )
    cp = a.join(F.broadcast(b), F.col("ib") == F.col("ia") + 1).select(
        "doc_a",
        "doc_b",
        F.expr(f"least(least(na, nb), {_CCF_CAP})").alias("L"),
        "ta",
        "tb",
    )
    cl = cp.select(
        "doc_a",
        "doc_b",
        "L",
        "ta",
        "tb",
        F.explode(F.array(*[F.lit(k) for k in _CCF_LAGS])).alias("lag"),
    ).select(
        "*",
        F.abs(F.col("lag")).alias("s"),
        (F.col("L") - F.abs(F.col("lag"))).alias("n"),
    ).where(F.col("n") > 1)
    cx = cl.select(
        "doc_a",
        "doc_b",
        "lag",
        "n",
        F.expr(
            "CASE WHEN lag >= 0 THEN slice(ta, 1, n)"
            " ELSE slice(ta, s + 1, n) END"
        ).alias("ax"),
        F.expr(
            "CASE WHEN lag >= 0 THEN slice(tb, s + 1, n)"
            " ELSE slice(tb, 1, n) END"
        ).alias("bx"),
    )
    cs = cx.select(
        "doc_a",
        "doc_b",
        "lag",
        "n",
        F.expr("aggregate(ax, 0L, (a, x) -> a + CAST(x AS BIGINT))").alias("sx"),
        F.expr("aggregate(bx, 0L, (a, x) -> a + CAST(x AS BIGINT))").alias("sy"),
        F.expr(
            "aggregate(zip_with(ax, bx,"
            " (p, q) -> CAST(p AS BIGINT) * CAST(q AS BIGINT)),"
            " 0L, (a, v) -> a + v)"
        ).alias("sxy"),
        F.expr(
            "aggregate(ax, 0L, (a, x) ->"
            " a + CAST(x AS BIGINT) * CAST(x AS BIGINT))"
        ).alias("sxx"),
        F.expr(
            "aggregate(bx, 0L, (a, x) ->"
            " a + CAST(x AS BIGINT) * CAST(x AS BIGINT))"
        ).alias("syy"),
    )
    cc = cs.select(
        "doc_a",
        "doc_b",
        "lag",
        "n",
        (
            F.col("n").cast("long") * F.col("sxy")
            - F.col("sx") * F.col("sy")
        ).alias("num"),
        (
            F.col("n").cast("long") * F.col("sxx")
            - F.col("sx") * F.col("sx")
        ).alias("vx"),
        (
            F.col("n").cast("long") * F.col("syy")
            - F.col("sy") * F.col("sy")
        ).alias("vy"),
    )
    return cc.select(
        "doc_a", "doc_b", "lag", "n", F.expr(_CCF_EXPR).alias("ccf")
    )


@register(
    "ccf_pairs",
    oracle=synth_sql(_N)
    + _CCF_ORACLE_BODY
    + """
    SELECT doc_a, doc_b, lag, n, ccf FROM ccf
    """,
)
def ccf_pairs(spark, sf_dir):
    """TS12: cross-correlation between consecutive doc pairs at 13 lags
    (-32..32): Pearson over the lag-shifted overlap (capped at 512
    points), every cross-sum an exact int64 (n*Sxy - SxSy and both
    variance terms stay under 2^53) and the correlation one shared
    float tail — 832 REAL doubles hash-match DuckDB with no rounding
    tolerance. The pair join broadcasts the (tiny) partner side; the
    lag products are scan-side HOFs."""
    return _ccf_df(spark)


@register(
    "lead_lag_detect",
    oracle=synth_sql(_N)
    + _CCF_ORACLE_BODY
    + """
    , lr AS (
      SELECT doc_a, doc_b, lag, ccf,
             row_number() OVER (PARTITION BY doc_a
                                ORDER BY abs(ccf) DESC, lag) AS rn
      FROM ccf
    )
    SELECT doc_a, doc_b, lag AS best_lag, ccf AS best_ccf
    FROM lr WHERE rn = 1
    """,
)
def lead_lag_detect(spark, sf_dir):
    """TS12b: lead-lag detection — per pair, the lag maximizing |ccf|
    (ties to the smallest lag): which series leads the other and by how
    much. Deterministic because the underlying CCF doubles are
    bit-identical across engines."""
    df = _ccf_df(spark)
    w = Window.partitionBy("doc_a").orderBy(
        F.abs(F.col("ccf")).desc(), F.col("lag")
    )
    return (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_a",
            "doc_b",
            F.col("lag").alias("best_lag"),
            F.col("ccf").alias("best_ccf"),
        )
    )


# ---------------------------------------------------------------------------
# TS13 — Goertzel spectral power at target periods (bit-exact fold)
# ---------------------------------------------------------------------------

# 2*cos(2*pi/P) as shortest round-trip literals: both engines parse the
# string to the identical nearest double
_GOERTZEL = (
    (64, "1.9903694533443939"),
    (32, "1.9615705608064609"),
    (16, "1.8477590650225735"),
    (8, "1.4142135623730951"),
)


def _goertzel_exprs():
    """(period, spark_expr, duck_expr) triples sharing one op tree.
    State [s1, s2]; element [x, 0]; the first element doubles as the
    init because one Goertzel step from (0,0) yields exactly (x1, 0).
    Power = s1^2 + s2^2 - c*s1*s2 over the full-cycle truncation."""
    out = []
    for p, c in _GOERTZEL:
        cc = f"CAST('{c}' AS DOUBLE)"
        step_s = (
            f"(s, x) -> array(((x + ({cc} * element_at(s, 1)))"
            f" - element_at(s, 2)), element_at(s, 1))"
        )
        spark = (
            f"aggregate(slice(xs, 2, nc - 1),"
            f" array(element_at(xs, 1), CAST(0 AS DOUBLE)), {step_s})"
        )
        duck = (
            f"list_reduce(list_transform(xs, x -> [x, CAST(0 AS DOUBLE)]),"
            f" (s, e) -> [((e[1] + ({cc} * s[1])) - s[2]), s[1]])"
        )
        pw = (
            "(((element_at(st, 1) * element_at(st, 1))"
            " + (element_at(st, 2) * element_at(st, 2)))"
            f" - (({cc} * element_at(st, 1)) * element_at(st, 2)))"
        )
        pw_d = (
            f"(((st[1] * st[1]) + (st[2] * st[2]))"
            f" - (({cc} * st[1]) * st[2]))"
        )
        out.append((p, spark, duck, pw, pw_d))
    return out


_G_DUCK_BODY = "\n".join(
    f"""
    , g{p} AS (
      SELECT doc_id, nc, {duck} AS st FROM gx
    ),
    p{p} AS (SELECT doc_id, {p} AS period, {pw_d} AS power FROM g{p})"""
    for p, _s, duck, _pw, pw_d in _goertzel_exprs()
)

_G_UNION = "\n    UNION ALL\n    ".join(
    f"SELECT doc_id, period, power FROM p{p}" for p, *_ in _GOERTZEL
)


@register(
    "goertzel_power",
    oracle=synth_sql(_N)
    + f"""
    , gx AS (
      SELECT doc_id, n_tok - n_tok % 64 AS nc,
        list_transform(tokens[1 : n_tok - n_tok % 64],
                       t -> CAST(t AS DOUBLE)) AS xs
      FROM synth
    ){_G_DUCK_BODY}
    {_G_UNION}
    """,
)
def goertzel_power(spark, sf_dir):
    """TS13: Goertzel single-bin DFT power at periods 64/32/16/8 over
    the full-cycle truncation of every series — the DSP way to probe
    known frequencies without an FFT. The two-state recursion s1' =
    x + c*s1 - s2 folds left with a list state (same engine-parity
    argument as Holt; the first [x, 0] element doubles as the init
    because one step from (0,0) is exactly (x1, 0)); the coefficients
    are shortest-round-trip literals so both engines hold the identical
    double. 1024 REAL powers hash-match with no tolerance — the
    planted period-64 sinusoid is visible at its bin next to the
    stronger broad-spectrum modular ramp. Zero shuffles."""
    df = synth.sequences_df(spark, _N).select(
        "doc_id",
        F.expr("n_tok - n_tok % 64").alias("nc"),
        F.expr(
            "transform(slice(tokens, 1, n_tok - n_tok % 64),"
            " t -> CAST(t AS DOUBLE))"
        ).alias("xs"),
    )
    parts = []
    for p, spark_fold, _duck, pw, _pw_d in _goertzel_exprs():
        parts.append(
            df.select(
                "doc_id",
                F.lit(p).alias("period"),
                F.expr(spark_fold).alias("st"),
            ).select("doc_id", "period", F.expr(pw).alias("power"))
        )
    out = parts[0]
    for x in parts[1:]:
        out = out.unionByName(x)
    return out


@register(
    "dominant_period",
    oracle=synth_sql(_N)
    + f"""
    , gx AS (
      SELECT doc_id, n_tok - n_tok % 64 AS nc,
        list_transform(tokens[1 : n_tok - n_tok % 64],
                       t -> CAST(t AS DOUBLE)) AS xs
      FROM synth
    ){_G_DUCK_BODY}
    , allp AS ({_G_UNION}),
    rk AS (
      SELECT doc_id, period, power,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY power DESC, period) AS rn
      FROM allp
    )
    SELECT doc_id, period AS dominant_period, power AS peak_power
    FROM rk WHERE rn = 1
    """,
)
def dominant_period(spark, sf_dir):
    """TS13b: dominant-frequency detection — per series, the probed
    period with the highest Goertzel power (ties to the smallest
    period). Deterministic because the powers are bit-identical. (The
    broad-spectrum modular ramp out-powers the planted sinusoid for
    most docs; a deterministic minority still peaks at the planted
    period 64 — both are real spectral structure.)"""
    base = goertzel_power(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy(
        F.col("power").desc(), F.col("period")
    )
    return (
        base.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("period").alias("dominant_period"),
            F.col("power").alias("peak_power"),
        )
    )


# ---------------------------------------------------------------------------
# TS14 — Mann-Kendall trend test + Sen's slope (bit-exact)
# ---------------------------------------------------------------------------

_DAY_US = 86_400_000_000


def _med_spark(s: str, n: str) -> str:
    return (
        f"(CASE WHEN {n} % 2 = 1 "
        f"THEN element_at({s}, CAST(({n} + 1) div 2 AS INT)) "
        f"ELSE (element_at({s}, CAST({n} div 2 AS INT))"
        f" + element_at({s}, CAST({n} div 2 + 1 AS INT)))"
        f" / CAST(2 AS DOUBLE) END)"
    )


def _med_duckdb(s: str, n: str) -> str:
    return (
        f"(CASE WHEN {n} % 2 = 1 THEN {s}[({n} + 1) // 2] "
        f"ELSE ({s}[{n} // 2] + {s}[{n} // 2 + 1]) / CAST(2 AS DOUBLE) END)"
    )


_MK_Z = (
    "(CASE WHEN s_stat > 0 THEN (CAST(s_stat - 1 AS DOUBLE) / sqrt(mk_var))"
    " WHEN s_stat < 0 THEN (CAST(s_stat + 1 AS DOUBLE) / sqrt(mk_var))"
    " ELSE CAST(0 AS DOUBLE) END)"
)
_MK_TREND = (
    "(CASE WHEN z > CAST(1.96 AS DOUBLE) THEN 'increasing'"
    " WHEN z < CAST(-1.96 AS DOUBLE) THEN 'decreasing'"
    " ELSE 'none' END)"
)


def _mk_base(spark, sf_dir):
    """The per-user time-ordered value/time arrays shared by the
    verification-tier and scale-tier Mann-Kendall queries: one shuffle
    onto the user key, deterministic (ts, event_id, value) sort."""
    ev = T(spark, sf_dir, "events").where(F.col("event_type") == "view")
    g = (
        ev.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "value"))
            ).alias("pts"),
            F.count(F.lit(1)).alias("n"),
        )
        .where(F.col("n") >= 2)
    )
    return g.select(
        "user_id",
        F.col("n").cast("int").alias("n"),
        F.expr("transform(pts, p -> p.value)").alias("vs"),
        F.expr(
            "transform(pts, p -> unix_micros(CAST(p.ts AS TIMESTAMP)))"
        ).alias("tu"),
    )


_MK_ORACLE_BASE = """
    WITH mk0a AS (
      SELECT user_id,
             list_sort(list({'ts': ts, 'event_id': event_id,
                             'value': value})) AS srt,
             count(*) AS n
      FROM events WHERE event_type = 'view'
      GROUP BY user_id HAVING count(*) >= 2
    ),
    mk0 AS (
      SELECT user_id, n,
             list_transform(srt, r -> r.value) AS vs,
             list_transform(srt, r -> epoch_us(r.ts)) AS tu
      FROM mk0a
    )
"""


@register(
    "mann_kendall_trend",
    oracle=f"""
    WITH mk0a AS (
      SELECT user_id,
             list_sort(list({{'ts': ts, 'event_id': event_id,
                             'value': value}})) AS srt,
             count(*) AS n
      FROM events WHERE event_type = 'view'
      GROUP BY user_id HAVING count(*) >= 2
    ),
    mk0 AS (
      SELECT user_id, n,
             list_transform(srt, r -> r.value) AS vs,
             list_transform(srt, r -> epoch_us(r.ts)) AS tu
      FROM mk0a
    ),
    mk1 AS (
      SELECT user_id, n,
        list_sum(flatten(list_transform(range(0, n - 1), i ->
          list_transform(range(i + 1, n), j ->
            CASE WHEN vs[j + 1] > vs[i + 1] THEN 1
                 WHEN vs[j + 1] < vs[i + 1] THEN -1 ELSE 0 END))))::BIGINT
          AS s_stat,
        list_sum(flatten(list_transform(range(0, n - 1), i ->
          list_transform(range(i + 1, n), j ->
            CASE WHEN vs[j + 1] = vs[i + 1] THEN 1 ELSE 0 END))))::BIGINT
          AS n_tied_pairs,
        (n * (n - 1) * (2 * n + 5))::BIGINT AS var_num,
        list_sort(list_filter(flatten(list_transform(range(0, n - 1), i ->
          list_transform(range(i + 1, n), j ->
            CASE WHEN tu[j + 1] = tu[i + 1] THEN CAST(NULL AS DOUBLE)
                 ELSE ((vs[j + 1] - vs[i + 1])
                       / (CAST(tu[j + 1] - tu[i + 1] AS DOUBLE)
                          / CAST({_DAY_US} AS DOUBLE))) END))),
          x -> x IS NOT NULL)) AS slopes
      FROM mk0
    ),
    mk2 AS (
      SELECT user_id, n, s_stat, n_tied_pairs,
             CAST(var_num AS DOUBLE) / CAST(18 AS DOUBLE) AS mk_var,
             {_med_duckdb("slopes", "length(slopes)")} AS sens_slope
      FROM mk1
    ),
    mk3 AS (SELECT *, {_MK_Z} AS z FROM mk2)
    SELECT user_id, n::BIGINT AS n, s_stat, n_tied_pairs, mk_var, z,
           sens_slope, {_MK_TREND} AS trend
    FROM mk3
    """,
)
def mann_kendall_trend(spark, sf_dir):
    """TS14: Mann-Kendall nonparametric trend test + Sen's slope per
    user value stream — the standard environmental/SLO trend detector.
    S = sum of pairwise sign comparisons (integer-exact), variance
    n(n-1)(2n+5)/18 (tie-uncorrected; the tied-pair count rides along
    and is zero on this continuous-valued corpus), the normalized Z in
    one shared float tree, and Sen's slope as the POSITIONAL median of
    the pairwise per-day slopes (equal-time pairs excluded) — sorted
    identical doubles, so every column is bit-exact cross-engine, trend
    labels included. One shuffle onto the user key; the O(n²) pair
    lists are per-row HOFs (n ≈ tens here — this is the verification
    tier; the scale tier is :func:`mann_kendall_scaled`: exact
    merge-count S in O(n log² n) + the deterministic sampled-pairs Sen
    estimator, shared-column equality gated in tests)."""
    g = _mk_base(spark, sf_dir)
    sgn = (
        "aggregate(flatten(transform(sequence(0, n - 2), i ->"
        " transform(sequence(i + 1, n - 1), j ->"
        " CASE WHEN element_at(vs, j + 1) > element_at(vs, i + 1) THEN 1"
        " WHEN element_at(vs, j + 1) < element_at(vs, i + 1) THEN -1"
        " ELSE 0 END))), 0L, (a, x) -> a + x)"
    )
    tied = (
        "aggregate(flatten(transform(sequence(0, n - 2), i ->"
        " transform(sequence(i + 1, n - 1), j ->"
        " CASE WHEN element_at(vs, j + 1) = element_at(vs, i + 1)"
        " THEN 1 ELSE 0 END))), 0L, (a, x) -> a + x)"
    )
    slopes = (
        "array_sort(filter(flatten(transform(sequence(0, n - 2), i ->"
        " transform(sequence(i + 1, n - 1), j ->"
        " CASE WHEN element_at(tu, j + 1) = element_at(tu, i + 1)"
        " THEN CAST(NULL AS DOUBLE)"
        " ELSE ((element_at(vs, j + 1) - element_at(vs, i + 1))"
        " / (CAST(element_at(tu, j + 1) - element_at(tu, i + 1) AS DOUBLE)"
        f" / CAST({_DAY_US} AS DOUBLE))) END))), x -> x IS NOT NULL))"
    )
    m1 = g.select(
        "user_id",
        "n",
        F.expr(sgn).alias("s_stat"),
        F.expr(tied).alias("n_tied_pairs"),
        F.expr(
            "CAST(n AS BIGINT) * (n - 1) * (2 * n + 5)"
        ).alias("var_num"),
        F.expr(slopes).alias("slopes"),
    )
    m2 = m1.select(
        "user_id",
        "n",
        "s_stat",
        "n_tied_pairs",
        F.expr("CAST(var_num AS DOUBLE) / CAST(18 AS DOUBLE)").alias(
            "mk_var"
        ),
        F.expr(_med_spark("slopes", "size(slopes)")).alias("sens_slope"),
    )
    m3 = m2.withColumn("z", F.expr(_MK_Z))
    return m3.select(
        "user_id",
        F.col("n").cast("long").alias("n"),
        "s_stat",
        "n_tied_pairs",
        "mk_var",
        "z",
        "sens_slope",
        F.expr(_MK_TREND).alias("trend"),
    )


# ---------------------------------------------------------------------------
# TS15 — Spearman rank correlation between paired series (bit-exact)
# ---------------------------------------------------------------------------

# Pearson over DOUBLED average ranks: 2*rank(x_i) = 2*c_less + c_tie + 1
# (c_less = values strictly below, c_tie = values equal incl. self) is an
# INTEGER, and rho is scale-invariant, so every cross-sum stays exact
# int64 and the correlation is one shared float tail.
_SP_EXPR = (
    "(CASE WHEN vx > 0 AND vy > 0 THEN"
    " (CAST(num AS DOUBLE) / (sqrt(CAST(vx AS DOUBLE))"
    " * sqrt(CAST(vy AS DOUBLE)))) ELSE CAST(0 AS DOUBLE) END)"
)


_SPEARMAN_ORACLE = (
    synth_sql(_N)
    + f"""
    , sp0 AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             least(least(a.n_tok, b.n_tok), {_CCF_CAP}) AS n,
             a.tokens[1 : least(least(a.n_tok, b.n_tok), {_CCF_CAP})] AS xa,
             b.tokens[1 : least(least(a.n_tok, b.n_tok), {_CCF_CAP})] AS xb
      FROM synth a JOIN synth b
        ON CAST(substr(b.doc_id, 4, 12) AS INT)
           = CAST(substr(a.doc_id, 4, 12) AS INT) + 1
       AND CAST(substr(a.doc_id, 4, 12) AS INT) % 2 = 0
    ),
    sp1 AS (
      SELECT doc_a, doc_b, n,
        list_transform(xa, v ->
          2 * length(list_filter(xa, u -> u < v))
          + length(list_filter(xa, u -> u = v)) + 1) AS ra,
        list_transform(xb, v ->
          2 * length(list_filter(xb, u -> u < v))
          + length(list_filter(xb, u -> u = v)) + 1) AS rb
      FROM sp0
    ),
    sp2 AS (
      SELECT doc_a, doc_b, n,
        list_sum(ra)::BIGINT AS sx, list_sum(rb)::BIGINT AS sy,
        list_sum(list_transform(range(1, n + 1),
            i -> ra[i]::BIGINT * rb[i]::BIGINT))::BIGINT AS sxy,
        list_sum(list_transform(ra, r -> r::BIGINT * r::BIGINT))::BIGINT
          AS sxx,
        list_sum(list_transform(rb, r -> r::BIGINT * r::BIGINT))::BIGINT
          AS syy
      FROM sp1
    ),
    sp3 AS (
      SELECT doc_a, doc_b, n,
             n::BIGINT * sxy - sx * sy AS num,
             n::BIGINT * sxx - sx * sx AS vx,
             n::BIGINT * syy - sy * sy AS vy
      FROM sp2
    )
    SELECT doc_a, doc_b, n, {_SP_EXPR} AS rho FROM sp3
    """
)


def _spearman_base(spark):
    """The (doc_a, doc_b, n, xa, xb) consecutive-pair table shared by
    the verification-tier and scale-tier Spearman queries: even-index
    docs paired with their successor, both series truncated to the
    common capped length."""
    df = synth.sequences_df(spark, _N).select(
        "doc_id",
        F.substring("doc_id", 4, 12).cast("int").alias("i"),
        "n_tok",
        "tokens",
    )
    a = df.where(F.col("i") % 2 == 0).select(
        F.col("doc_id").alias("doc_a"),
        F.col("i").alias("ia"),
        F.col("n_tok").alias("na"),
        F.col("tokens").alias("ta"),
    )
    b = df.select(
        F.col("doc_id").alias("doc_b"),
        F.col("i").alias("ib"),
        F.col("n_tok").alias("nb"),
        F.col("tokens").alias("tb"),
    )
    return a.join(F.broadcast(b), F.col("ib") == F.col("ia") + 1).select(
        "doc_a",
        "doc_b",
        F.expr(f"least(least(na, nb), {_CCF_CAP})").alias("n"),
        F.expr(f"slice(ta, 1, least(least(na, nb), {_CCF_CAP}))").alias("xa"),
        F.expr(f"slice(tb, 1, least(least(na, nb), {_CCF_CAP}))").alias("xb"),
    )


@register("spearman_pairs", oracle=_SPEARMAN_ORACLE)
def spearman_pairs(spark, sf_dir):
    """TS15: Spearman rank correlation between consecutive doc pairs
    (512-point truncation) — Pearson over DOUBLED average ranks, which
    are integers even under ties (2·rank = 2·|below| + |tied| + 1), so
    all cross-sums stay exact int64 and rho is one shared float tail:
    128 REAL correlations hash-match with no tolerance. Rank counting
    is O(n²) per-row HOFs here (the verification tier); the scale path
    is :func:`spearman_scaled` — same statistic via one window-rank
    sort per series, bit-equal output (gated in tests/test_tsanalytics).
    Broadcast pair join, zero other shuffles."""
    sp0 = _spearman_base(spark)
    rank = (
        "transform({x}, v -> 2 * size(filter({x}, u -> u < v))"
        " + size(filter({x}, u -> u = v)) + 1)"
    )
    sp1 = sp0.select(
        "doc_a",
        "doc_b",
        "n",
        F.expr(rank.format(x="xa")).alias("ra"),
        F.expr(rank.format(x="xb")).alias("rb"),
    )
    sp2 = sp1.select(
        "doc_a",
        "doc_b",
        "n",
        F.expr("aggregate(ra, 0L, (a, x) -> a + CAST(x AS BIGINT))").alias("sx"),
        F.expr("aggregate(rb, 0L, (a, x) -> a + CAST(x AS BIGINT))").alias("sy"),
        F.expr(
            "aggregate(zip_with(ra, rb,"
            " (p, q) -> CAST(p AS BIGINT) * CAST(q AS BIGINT)),"
            " 0L, (a, v) -> a + v)"
        ).alias("sxy"),
        F.expr(
            "aggregate(ra, 0L, (a, x) ->"
            " a + CAST(x AS BIGINT) * CAST(x AS BIGINT))"
        ).alias("sxx"),
        F.expr(
            "aggregate(rb, 0L, (a, x) ->"
            " a + CAST(x AS BIGINT) * CAST(x AS BIGINT))"
        ).alias("syy"),
    )
    sp3 = sp2.select(
        "doc_a",
        "doc_b",
        "n",
        (
            F.col("n").cast("long") * F.col("sxy")
            - F.col("sx") * F.col("sy")
        ).alias("num"),
        (
            F.col("n").cast("long") * F.col("sxx")
            - F.col("sx") * F.col("sx")
        ).alias("vx"),
        (
            F.col("n").cast("long") * F.col("syy")
            - F.col("sy") * F.col("sy")
        ).alias("vy"),
    )
    return sp3.select("doc_a", "doc_b", "n", F.expr(_SP_EXPR).alias("rho"))


@register("spearman_scaled", oracle=_SPEARMAN_ORACLE)
def spearman_scaled(spark, sf_dir):
    """TS15 SCALE path: the identical Spearman statistic computed with
    ONE window-rank sort per series instead of the twin's O(n²) per-row
    rank-counting HOFs. Each pair's series explode to rows; the doubled
    average rank is 2·rank() + |tie class| − 1 (rank() = |strictly
    below| + 1, tie size from a count window over the same partition) —
    an INTEGER equal to the twin's 2·|below| + |tied incl. self| + 1,
    so all cross-sums stay exact int64 and rho shares the twin's float
    tail bit-for-bit (equality gated in tests/test_tsanalytics.py; the
    oracle SQL is the twin's verbatim). Plan: both value windows share
    one hash exchange on the pair key, then one map-side-combinable
    sum aggregate — O(n log n) per series, no quadratic anything."""
    sp0 = _spearman_base(spark)
    long = sp0.select(
        "doc_a",
        "doc_b",
        "n",
        F.posexplode(F.arrays_zip("xa", "xb")).alias("pos", "pq"),
    ).select(
        "doc_a",
        "doc_b",
        "n",
        "pos",
        F.col("pq.xa").alias("va"),
        F.col("pq.xb").alias("vb"),
    )
    wa = Window.partitionBy("doc_a").orderBy("va")
    wb = Window.partitionBy("doc_a").orderBy("vb")
    ca = Window.partitionBy("doc_a", "va")
    cb = Window.partitionBy("doc_a", "vb")
    ranked = long.select(
        "doc_a",
        "doc_b",
        "n",
        (
            2 * F.rank().over(wa).cast("long")
            + F.count(F.lit(1)).over(ca)
            - 1
        ).alias("dra"),
        (
            2 * F.rank().over(wb).cast("long")
            + F.count(F.lit(1)).over(cb)
            - 1
        ).alias("drb"),
    )
    sp2 = ranked.groupBy("doc_a", "doc_b", "n").agg(
        F.sum("dra").alias("sx"),
        F.sum("drb").alias("sy"),
        F.sum(F.col("dra") * F.col("drb")).alias("sxy"),
        F.sum(F.col("dra") * F.col("dra")).alias("sxx"),
        F.sum(F.col("drb") * F.col("drb")).alias("syy"),
    )
    sp3 = sp2.select(
        "doc_a",
        "doc_b",
        "n",
        (
            F.col("n").cast("long") * F.col("sxy")
            - F.col("sx") * F.col("sy")
        ).alias("num"),
        (
            F.col("n").cast("long") * F.col("sxx")
            - F.col("sx") * F.col("sx")
        ).alias("vx"),
        (
            F.col("n").cast("long") * F.col("syy")
            - F.col("sy") * F.col("sy")
        ).alias("vy"),
    )
    return sp3.select("doc_a", "doc_b", "n", F.expr(_SP_EXPR).alias("rho"))


# ---------------------------------------------------------------------------
# TS14 SCALE tier — exact merge-count S + deterministic sampled-pairs Sen
# ---------------------------------------------------------------------------

_MK_K = 201  # Sen sample size (odd, so the positional median is one pick)

# md5-derived pair indices both engines re-derive identically: for sample
# k, i = hex[1:15] % n and j = hex[17:31] % n of md5(user_id || ':' || k)
_MK_I_SPARK = (
    "(CAST(conv(substr(md5(concat(user_id, ':', CAST(k AS STRING))),"
    " 1, 15), 16, 10) AS BIGINT) % n)"
)
_MK_J_SPARK = (
    "(CAST(conv(substr(md5(concat(user_id, ':', CAST(k AS STRING))),"
    " 17, 15), 16, 10) AS BIGINT) % n)"
)
_MK_SLOPES_SPARK = (
    f"array_sort(filter(transform(sequence(0, {_MK_K - 1}), k -> "
    f"CASE WHEN {_MK_I_SPARK} = {_MK_J_SPARK}"
    f" OR element_at(tu, CAST({_MK_I_SPARK} + 1 AS INT))"
    f"    = element_at(tu, CAST({_MK_J_SPARK} + 1 AS INT))"
    " THEN CAST(NULL AS DOUBLE)"
    f" ELSE ((element_at(vs, CAST({_MK_J_SPARK} + 1 AS INT))"
    f" - element_at(vs, CAST({_MK_I_SPARK} + 1 AS INT)))"
    f" / (CAST(element_at(tu, CAST({_MK_J_SPARK} + 1 AS INT))"
    f" - element_at(tu, CAST({_MK_I_SPARK} + 1 AS INT)) AS DOUBLE)"
    f" / CAST({_DAY_US} AS DOUBLE))) END), x -> x IS NOT NULL))"
)

_MK_I_DUCK = (
    "(('0x' || substr(md5(user_id || ':' || k::VARCHAR), 1, 15))::BIGINT % n)"
)
_MK_J_DUCK = (
    "(('0x' || substr(md5(user_id || ':' || k::VARCHAR), 17, 15))::BIGINT % n)"
)
_MK_SLOPES_DUCK = (
    f"list_sort(list_filter(list_transform(range(0, {_MK_K}), k -> "
    f"CASE WHEN {_MK_I_DUCK} = {_MK_J_DUCK}"
    f" OR tu[{_MK_I_DUCK} + 1] = tu[{_MK_J_DUCK} + 1]"
    " THEN CAST(NULL AS DOUBLE)"
    f" ELSE ((vs[{_MK_J_DUCK} + 1] - vs[{_MK_I_DUCK} + 1])"
    f" / (CAST(tu[{_MK_J_DUCK} + 1] - tu[{_MK_I_DUCK} + 1] AS DOUBLE)"
    f" / CAST({_DAY_US} AS DOUBLE))) END), x -> x IS NOT NULL))"
)


@register(
    "mann_kendall_scaled",
    oracle=_MK_ORACLE_BASE
    + f"""
    , mks1 AS (
      SELECT user_id, n,
        list_sum(flatten(list_transform(range(0, n - 1), i ->
          list_transform(range(i + 1, n), j ->
            CASE WHEN vs[j + 1] > vs[i + 1] THEN 1
                 WHEN vs[j + 1] < vs[i + 1] THEN -1 ELSE 0 END))))::BIGINT
          AS s_stat,
        list_sum(flatten(list_transform(range(0, n - 1), i ->
          list_transform(range(i + 1, n), j ->
            CASE WHEN vs[j + 1] = vs[i + 1] THEN 1 ELSE 0 END))))::BIGINT
          AS n_tied_pairs,
        (n * (n - 1) * (2 * n + 5))::BIGINT AS var_num,
        {_MK_SLOPES_DUCK} AS slopes
      FROM mk0
    ),
    mks2 AS (
      SELECT user_id, n, s_stat, n_tied_pairs,
             CAST(var_num AS DOUBLE) / CAST(18 AS DOUBLE) AS mk_var,
             CASE WHEN length(slopes) = 0 THEN CAST(NULL AS DOUBLE)
                  ELSE {_med_duckdb("slopes", "length(slopes)")}
             END AS sens_slope_est
      FROM mks1
    ),
    mks3 AS (SELECT *, {_MK_Z} AS z FROM mks2)
    SELECT user_id, n::BIGINT AS n, s_stat, n_tied_pairs, mk_var, z,
           sens_slope_est, {_MK_TREND} AS trend
    FROM mks3
    """,
)
def mann_kendall_scaled(spark, sf_dir):
    """TS14 SCALE path: the identical Mann-Kendall statistic without
    the twin's O(n²) per-row pair lists. S and the tied-pair count come
    from :func:`dtaidistance_spark.kernels.mk_s_stat` /
    :func:`~.kernels.mk_tied_pairs` — exact merge-count inversion
    counting in O(n log² n) inside ONE Arrow-batched mapInPandas (the
    repo's standard per-series kernel shape; fuzz-gated equal to the
    O(n²) sum in tests). Variance, Z, and the trend label ride the
    twin's shared float strings, so those columns are BIT-EQUAL to
    mann_kendall_trend (gated in tests/test_tsanalytics.py). Sen's
    slope — whose exact form is inherently all-pairs — becomes the
    standard sampled-pairs estimator over {_MK_K} md5-derived index
    pairs that DuckDB re-derives verbatim, so even the estimator column
    is bit-exact oracled (honest rename: ``sens_slope_est``). Plan: one
    shuffle onto the user key, zero quadratic HOFs anywhere."""
    import pandas as pd

    from dtaidistance_spark import kernels as K

    g = _mk_base(spark, sf_dir).withColumn(
        "slopes_s", F.expr(_MK_SLOPES_SPARK)
    )
    g = g.select(
        "user_id",
        "n",
        "vs",
        "tu",
        F.expr(
            "CASE WHEN size(slopes_s) = 0 THEN CAST(NULL AS DOUBLE) ELSE "
            + _med_spark("slopes_s", "size(slopes_s)")
            + " END"
        ).alias("sens_slope_est"),
    )

    def kern(it):
        for pdf in it:
            yield pd.DataFrame(
                {
                    "user_id": pdf["user_id"],
                    "n": pdf["n"],
                    "s_stat": [K.mk_s_stat(v) for v in pdf["vs"]],
                    "n_tied_pairs": [K.mk_tied_pairs(v) for v in pdf["vs"]],
                    "sens_slope_est": pdf["sens_slope_est"],
                }
            )

    res = g.mapInPandas(
        kern,
        "user_id bigint, n int, s_stat bigint, n_tied_pairs bigint,"
        " sens_slope_est double",
    )
    m2 = res.select(
        "user_id",
        "n",
        "s_stat",
        "n_tied_pairs",
        F.expr(
            "CAST(CAST(n AS BIGINT) * (n - 1) * (2 * n + 5) AS DOUBLE)"
            " / CAST(18 AS DOUBLE)"
        ).alias("mk_var"),
        "sens_slope_est",
    )
    m3 = m2.withColumn("z", F.expr(_MK_Z))
    return m3.select(
        "user_id",
        F.col("n").cast("long").alias("n"),
        "s_stat",
        "n_tied_pairs",
        "mk_var",
        "z",
        "sens_slope_est",
        F.expr(_MK_TREND).alias("trend"),
    )


# ---------------------------------------------------------------------------
# TS16 — classical seasonal decomposition (trend / seasonal / remainder)
# ---------------------------------------------------------------------------

_DEC_P = 64  # the generator's planted period
_DEC_H = _DEC_P // 2
_DEC_CAP = 512

# 128*trend[t] = sum(x[t-32..t+31]) + sum(x[t-31..t+32]) — the classical
# centered 2x64-MA with half-weight ends, scaled to stay exact int64.
_DEC_TREND_SPARK = (
    f"transform(sequence({_DEC_H + 1}, n - {_DEC_H}), t ->"
    f" aggregate(slice(xs, t - {_DEC_H}, {_DEC_P}), 0L,"
    "  (a, x) -> a + CAST(x AS BIGINT))"
    f" + aggregate(slice(xs, t - {_DEC_H - 1}, {_DEC_P}), 0L,"
    "  (a, x) -> a + CAST(x AS BIGINT)))"
)
_DEC_TREND_DUCK = (
    f"list_transform(range({_DEC_H + 1}, n - {_DEC_H - 1}), t ->"
    f" list_sum(xs[t - {_DEC_H} : t + {_DEC_H - 1}])::BIGINT"
    f" + list_sum(xs[t - {_DEC_H - 1} : t + {_DEC_H}])::BIGINT)"
)
# 128*detrended[t] (int64), indexed by interior offset i = t - 32
_DEC_D128_SPARK = (
    f"transform(sequence({_DEC_H + 1}, n - {_DEC_H}), t ->"
    f" 128 * CAST(element_at(xs, CAST(t AS INT)) AS BIGINT)"
    f" - element_at(tr, CAST(t - {_DEC_H} AS INT)))"
)
_DEC_D128_DUCK = (
    f"list_transform(range({_DEC_H + 1}, n - {_DEC_H - 1}), t ->"
    f" 128 * xs[t] - tr[t - {_DEC_H}])"
)
# per phase k: exact int64 sum + count of d128 over interior positions
# with (t-1) % 64 == k, then one float division per phase
_DEC_SEAS_SPARK = (
    f"transform(sequence(0, {_DEC_P - 1}), k ->"
    " CAST(aggregate("
    f"   filter(sequence({_DEC_H + 1}, n - {_DEC_H}), t -> (t - 1) % {_DEC_P} = k),"
    f"   0L, (a, t) -> a + element_at(d128, CAST(t - {_DEC_H} AS INT)))"
    " AS DOUBLE) / CAST(size("
    f"   filter(sequence({_DEC_H + 1}, n - {_DEC_H}), t -> (t - 1) % {_DEC_P} = k)"
    ") AS DOUBLE))"
)
_DEC_SEAS_DUCK = (
    f"list_transform(range(0, {_DEC_P}), k ->"
    " CAST(list_sum(list_transform("
    f"   list_filter(range({_DEC_H + 1}, n - {_DEC_H - 1}), t -> (t - 1) % {_DEC_P} = k),"
    f"   t -> d128[t - {_DEC_H}]))::BIGINT"
    " AS DOUBLE) / CAST(len("
    f"   list_filter(range({_DEC_H + 1}, n - {_DEC_H - 1}), t -> (t - 1) % {_DEC_P} = k)"
    ") AS DOUBLE))"
)
# center = left-fold mean of the 64 phase means (same order both engines;
# 0.0 + s1 == s1 in IEEE for these non-negative-zero values)
_DEC_C_SPARK = (
    "aggregate(seas, CAST(0 AS DOUBLE), (a, v) -> a + v)"
    f" / CAST({_DEC_P} AS DOUBLE)"
)
_DEC_C_DUCK = (
    "list_reduce(seas, (a, v) -> a + v)"
    f" / CAST({_DEC_P} AS DOUBLE)"
)


@register(
    "seasonal_decompose",
    oracle=synth_sql(_N)
    + f"""
    , dec0 AS (
      SELECT doc_id,
             tokens[1 : least(n_tok, {_DEC_CAP})] AS xs,
             least(n_tok, {_DEC_CAP}) AS n
      FROM synth WHERE n_tok >= {2 * _DEC_P}
    ),
    dec1 AS (SELECT doc_id, xs, n, {_DEC_TREND_DUCK} AS tr FROM dec0),
    dec2 AS (SELECT *, {_DEC_D128_DUCK} AS d128 FROM dec1),
    dec3 AS (SELECT *, {_DEC_SEAS_DUCK} AS seas FROM dec2),
    dec4 AS (SELECT *, {_DEC_C_DUCK} AS c FROM dec3),
    dec5 AS (
      SELECT doc_id, c, seas, d128, tr,
             unnest(range({_DEC_H + 1}, n - {_DEC_H - 1})) AS t
      FROM dec4
    )
    SELECT doc_id, CAST(t AS INT) AS pos,
           CAST(tr[t - {_DEC_H}] AS DOUBLE) / CAST(128 AS DOUBLE) AS trend,
           (seas[((t - 1) % {_DEC_P}) + 1] - c) / CAST(128 AS DOUBLE)
             AS seasonal,
           (CAST(d128[t - {_DEC_H}] AS DOUBLE)
             - (seas[((t - 1) % {_DEC_P}) + 1] - c)) / CAST(128 AS DOUBLE)
             AS remainder
    FROM dec5
    """,
)
def seasonal_decompose(spark, sf_dir):
    """TS16: classical seasonal decomposition at the generator's
    planted period 64 — trend = centered 2x64 moving average
    (half-weight ends, the textbook even-period convention), seasonal =
    centered per-phase means of the detrended series, remainder = the
    rest. Everything cross-row is EXACT int64 (the 2xMA is a sum of two
    64-term integer sums; 128·detrended stays integer), so the only
    float steps are one division per phase, the order-pinned 64-term
    center fold, and the per-row output scalings — identical trees in
    the DuckDB oracle, hence every trend/seasonal/remainder double
    hash-matches bit-exactly (~95k rows). Zero shuffles: per-series
    HOFs on the distributed generator, explode is a Generate node.
    Scale note: the O(n·p) per-row slice sums are the verification
    spelling; at longer n the same integers come from one cumsum window
    (documented, same statistic)."""
    df = synth.sequences_df(spark, _N).where(
        F.col("n_tok") >= 2 * _DEC_P
    ).select(
        "doc_id",
        F.expr(f"slice(tokens, 1, least(n_tok, {_DEC_CAP}))").alias("xs"),
        F.expr(f"CAST(least(n_tok, {_DEC_CAP}) AS INT)").alias("n"),
    )
    df = df.withColumn("tr", F.expr(_DEC_TREND_SPARK))
    df = df.withColumn("d128", F.expr(_DEC_D128_SPARK))
    df = df.withColumn("seas", F.expr(_DEC_SEAS_SPARK))
    df = df.withColumn("c", F.expr(_DEC_C_SPARK))
    out = df.select(
        "doc_id",
        "c",
        "seas",
        "d128",
        "tr",
        F.posexplode(F.expr(f"sequence({_DEC_H + 1}, n - {_DEC_H})")).alias(
            "_i", "t"
        ),
    )
    return out.select(
        "doc_id",
        F.col("t").cast("int").alias("pos"),
        F.expr(
            f"CAST(element_at(tr, _i + 1) AS DOUBLE) / CAST(128 AS DOUBLE)"
        ).alias("trend"),
        F.expr(
            f"(element_at(seas, CAST((t - 1) % {_DEC_P} AS INT) + 1) - c)"
            " / CAST(128 AS DOUBLE)"
        ).alias("seasonal"),
        F.expr(
            f"(CAST(element_at(d128, _i + 1) AS DOUBLE)"
            f" - (element_at(seas, CAST((t - 1) % {_DEC_P} AS INT) + 1) - c))"
            " / CAST(128 AS DOUBLE)"
        ).alias("remainder"),
    )


@register(
    "seasonal_decompose_scaled",
    oracle=synth_sql(_N)
    + f"""
    , dec0 AS (
      SELECT doc_id,
             tokens[1 : least(n_tok, {_DEC_CAP})] AS xs,
             least(n_tok, {_DEC_CAP}) AS n
      FROM synth WHERE n_tok >= {2 * _DEC_P}
    ),
    dec1 AS (SELECT doc_id, xs, n, {_DEC_TREND_DUCK} AS tr FROM dec0),
    dec2 AS (SELECT *, {_DEC_D128_DUCK} AS d128 FROM dec1),
    dec3 AS (SELECT *, {_DEC_SEAS_DUCK} AS seas FROM dec2),
    dec4 AS (SELECT *, {_DEC_C_DUCK} AS c FROM dec3),
    dec5 AS (
      SELECT doc_id, c, seas, d128, tr,
             unnest(range({_DEC_H + 1}, n - {_DEC_H - 1})) AS t
      FROM dec4
    )
    SELECT doc_id, CAST(t AS INT) AS pos,
           CAST(tr[t - {_DEC_H}] AS DOUBLE) / CAST(128 AS DOUBLE) AS trend,
           (seas[((t - 1) % {_DEC_P}) + 1] - c) / CAST(128 AS DOUBLE)
             AS seasonal,
           (CAST(d128[t - {_DEC_H}] AS DOUBLE)
             - (seas[((t - 1) % {_DEC_P}) + 1] - c)) / CAST(128 AS DOUBLE)
             AS remainder
    FROM dec5
    """,
)
def seasonal_decompose_scaled(spark, sf_dir):
    """TS16 SCALE tier: the identical decomposition computed ROW-
    parallel — the twin's O(n·p) per-row slice sums become two framed
    window sums over exploded rows, so per-row work is O(1) and a
    million-point series costs a sort, not 64M interpreted HOF ops.

    Plan: explode once; the two 64-row-frame integer sums (the 2×MA
    halves) share ONE hash exchange on the doc key; the per-phase sums
    ride a second exchange on (doc, phase); the 64 phase means fold
    back per doc in phase order (the twin's exact float order) and
    rejoin the rows on the doc key. All cross-row arithmetic stays
    int64, the float tail is the twin's tree verbatim — every output
    double is BIT-EQUAL to ``seasonal_decompose`` (gated) and the
    oracle SQL is the twin's, so the driver hash must match too."""
    base = (
        synth.sequences_df(spark, _N)
        .where(F.col("n_tok") >= 2 * _DEC_P)
        .select(
            "doc_id",
            F.expr(f"CAST(least(n_tok, {_DEC_CAP}) AS INT)").alias("n"),
            F.posexplode(
                F.expr(f"slice(tokens, 1, least(n_tok, {_DEC_CAP}))")
            ).alias("_i", "x"),
        )
        .select(
            "doc_id", "n", (F.col("_i") + 1).alias("t"),
            F.col("x").cast("long").alias("x"),
        )
    )
    wd = Window.partitionBy("doc_id").orderBy("t")
    rows = base.select(
        "doc_id",
        "n",
        "t",
        "x",
        (
            F.sum("x").over(wd.rowsBetween(-_DEC_H, _DEC_H - 1))
            + F.sum("x").over(wd.rowsBetween(-(_DEC_H - 1), _DEC_H))
        ).alias("trend128"),
    ).where(
        (F.col("t") >= _DEC_H + 1) & (F.col("t") <= F.col("n") - _DEC_H)
    )
    rows = rows.select(
        "doc_id",
        "t",
        ((F.col("t") - 1) % _DEC_P).alias("phase"),
        (128 * F.col("x") - F.col("trend128")).alias("d128"),
        "trend128",
    )
    wp = Window.partitionBy("doc_id", "phase")
    rows = rows.withColumn(
        "seas128",
        F.sum("d128").over(wp).cast("double")
        / F.count(F.lit(1)).over(wp).cast("double"),
    )
    cper = (
        rows.groupBy("doc_id", "phase")
        .agg(F.first("seas128").alias("s"))
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("phase", "s"))).alias("ps")
        )
        .select(
            "doc_id",
            F.expr(
                "aggregate(ps, CAST(0 AS DOUBLE), (a, v) -> a + v.s)"
                f" / CAST({_DEC_P} AS DOUBLE)"
            ).alias("c"),
        )
    )
    out = rows.join(cper, "doc_id")
    return out.select(
        "doc_id",
        F.col("t").cast("int").alias("pos"),
        F.expr(
            "CAST(trend128 AS DOUBLE) / CAST(128 AS DOUBLE)"
        ).alias("trend"),
        F.expr("(seas128 - c) / CAST(128 AS DOUBLE)").alias("seasonal"),
        F.expr(
            "(CAST(d128 AS DOUBLE) - (seas128 - c)) / CAST(128 AS DOUBLE)"
        ).alias("remainder"),
    )


# ---------------------------------------------------------------------------
# TS20 — ASAP-style auto-window smoothing (Rong & Bailis, VLDB'17 shape):
# per series, pick the moving-average window w = the ACF-argmax lag
# (>= 2, ties to the smallest — the ASAP candidate rule), then report the
# smoothing diagnostics WITHOUT materializing the smoothed array. The
# key identity: consecutive MA diffs telescope, ma[i+1] - ma[i] =
# (x[i+w] - x[i]) / w, so MA roughness needs only the offset-w integer
# squared-diff sum; the MA mean needs only the coverage-weighted token
# sum (weight_j = min(j, w, m, n-j+1)). Everything is an exact int64
# scan-side HOF plus a short shared float tail — bit-exact cross-engine,
# and O(n) per series where the naive smoothed-array route is O(n·w).
# Zero shuffles on the series side; the per-doc best-lag join is a
# 256-row broadcast.
# ---------------------------------------------------------------------------

_ASAP_ROUGH_RAW = "sqrt(CAST(ssd_raw AS DOUBLE) / CAST(n_tok - 1 AS DOUBLE))"
_ASAP_ROUGH_MA = (
    "(sqrt(CAST(ssd_w AS DOUBLE) / CAST(n_tok - w AS DOUBLE))"
    " / CAST(w AS DOUBLE))"
)
_ASAP_FLOATS = [
    f"{_ASAP_ROUGH_RAW} AS rough_raw",
    f"{_ASAP_ROUGH_MA} AS rough_ma",
    f"CASE WHEN ssd_w = 0 THEN NULL"
    f" ELSE ({_ASAP_ROUGH_RAW} / {_ASAP_ROUGH_MA}) END AS gain",
    "(CAST(sfirst AS DOUBLE) / CAST(w AS DOUBLE)) AS ma_first",
    "(CAST(slast AS DOUBLE) / CAST(w AS DOUBLE)) AS ma_last",
    "(CAST(wsum AS DOUBLE) / CAST(m * w AS DOUBLE)) AS ma_mean",
]


@register(
    "asap_smooth",
    oracle=synth_sql(_N)
    + _ACF_ORACLE_BODY
    + f"""
    , best AS (
      SELECT doc_id, k AS w FROM (
        SELECT doc_id, k, row_number() OVER (PARTITION BY doc_id
                 ORDER BY acf DESC, k) AS rn
        FROM acfr WHERE k >= 2) q
      WHERE rn = 1),
    abase AS (
      SELECT s.doc_id, s.n_tok, s.tokens, b.w, s.n_tok - b.w + 1 AS m
      FROM synth s JOIN best b USING (doc_id)),
    ints AS (
      SELECT doc_id, n_tok, w, m,
        list_sum(list_transform(range(1, n_tok), i ->
          (tokens[i + 1]::BIGINT - tokens[i]::BIGINT)
          * (tokens[i + 1]::BIGINT - tokens[i]::BIGINT)))::BIGINT AS ssd_raw,
        list_sum(list_transform(range(1, n_tok - w + 1), i ->
          (tokens[i + w]::BIGINT - tokens[i]::BIGINT)
          * (tokens[i + w]::BIGINT - tokens[i]::BIGINT)))::BIGINT AS ssd_w,
        list_sum(list_transform(range(1, n_tok + 1), j ->
          least(j, w, n_tok - w + 1, n_tok - j + 1)::BIGINT
          * tokens[j]::BIGINT))::BIGINT AS wsum,
        list_sum(tokens[1 : w])::BIGINT AS sfirst,
        list_sum(tokens[n_tok - w + 1 : n_tok])::BIGINT AS slast
      FROM abase)
    SELECT doc_id, n_tok, w, m, ssd_raw, ssd_w, wsum,
           {", ".join(_ASAP_FLOATS)}
    FROM ints
    """,
)
def asap_smooth(spark, sf_dir):
    """TS20: ASAP-style auto-window smoothing diagnostics per series —
    the chosen window w (ACF argmax over lags >= 2, ties smallest),
    MA point count m, the raw vs smoothed roughness (std of consecutive
    diffs; the MA diff telescopes to (x[i+w]-x[i])/w so no smoothed
    array is ever built), the roughness-reduction gain, and the MA
    first/last/mean from exact integer window sums. All floats are
    short shared trees over int64 HOF aggregates — bit-exact oracle,
    no tolerance. O(n) per series, zero shuffles on the token side."""
    acf = _acf_df(spark).where(F.col("k") >= 2)
    wbest = Window.partitionBy("doc_id").orderBy(
        F.col("acf").desc(), F.col("k")
    )
    best = (
        acf.withColumn("rn", F.row_number().over(wbest))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("k").alias("w"))
    )
    base = (
        synth.sequences_df(spark, _N)
        .select("doc_id", "n_tok", "tokens")
        .join(F.broadcast(best), "doc_id")
        .withColumn("m", F.col("n_tok") - F.col("w") + F.lit(1))
    )
    ints = base.selectExpr(
        "doc_id",
        "n_tok",
        "w",
        "m",
        "aggregate(zip_with(slice(tokens, 1, n_tok - 1),"
        " slice(tokens, 2, n_tok - 1), (a, b) ->"
        " (CAST(b AS BIGINT) - CAST(a AS BIGINT))"
        " * (CAST(b AS BIGINT) - CAST(a AS BIGINT))), 0L,"
        " (s, v) -> s + v) AS ssd_raw",
        "aggregate(zip_with(slice(tokens, 1, n_tok - w),"
        " slice(tokens, w + 1, n_tok - w), (a, b) ->"
        " (CAST(b AS BIGINT) - CAST(a AS BIGINT))"
        " * (CAST(b AS BIGINT) - CAST(a AS BIGINT))), 0L,"
        " (s, v) -> s + v) AS ssd_w",
        "aggregate(zip_with(sequence(1, n_tok), tokens, (j, x) ->"
        " CAST(least(j, w, n_tok - w + 1, n_tok - j + 1) AS BIGINT)"
        " * CAST(x AS BIGINT)), 0L, (s, v) -> s + v) AS wsum",
        "aggregate(slice(tokens, 1, w), 0L,"
        " (s, x) -> s + CAST(x AS BIGINT)) AS sfirst",
        "aggregate(slice(tokens, n_tok - w + 1, w), 0L,"
        " (s, x) -> s + CAST(x AS BIGINT)) AS slast",
    )
    return ints.selectExpr(
        "doc_id", "n_tok", "w", "m", "ssd_raw", "ssd_w", "wsum",
        *_ASAP_FLOATS,
    )


# ---------------------------------------------------------------------------
# R34 — event-type Markov transition matrix (product-analytics staple)
# ---------------------------------------------------------------------------

_MK_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


@register(
    "markov_transitions",
    oracle=f"""
    WITH s AS (
      SELECT user_id, epoch_us(ts) AS tu, event_id, event_type FROM events
    ),
    tr AS (
      SELECT event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY tu, event_id) AS nxt
      FROM s
    ),
    cnt AS (
      SELECT cur, nxt, count(*) AS n FROM tr WHERE nxt IS NOT NULL
      GROUP BY cur, nxt
    ),
    tot AS (SELECT cur, CAST(sum(n) AS BIGINT) AS row_n FROM cnt GROUP BY cur)
    SELECT c.cur, c.nxt, CAST(c.n AS BIGINT) AS n, t.row_n,
           {_MK_F6.format(
               x="(CAST(c.n AS DOUBLE) / CAST(t.row_n AS DOUBLE))")} AS p
    FROM cnt c JOIN tot t USING (cur)
    """,
)
def markov_transitions(spark, sf_dir):
    """R34: first-order Markov transition matrix over per-user event
    streams under the (tu, event_id) total order — counts int64, row-
    conditional probabilities one floor-1e6 division. One user exchange
    for the lead window, one map-side-combined (cur, nxt) count, one
    broadcast row-total join — the stream itself crosses the wire
    once."""
    s = T(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tu"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("tu", "event_id")
    tr = s.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    cnt = tr.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.groupBy("cur").agg(F.sum("n").cast("long").alias("row_n"))
    return cnt.join(F.broadcast(tot), "cur").select(
        "cur",
        "nxt",
        F.col("n").cast("long").alias("n"),
        "row_n",
        F.expr(
            _MK_F6.format(x="(CAST(n AS DOUBLE) / CAST(row_n AS DOUBLE))")
        ).alias("p"),
    )


# ---------------------------------------------------------------------------
# TS37 — Kaplan-Meier survival curve (signup -> first purchase), with
# right-censoring at the end of observation. No window functions: the
# risk set n_t and the survival product both come from tiny day-axis
# joins (the day table is bounded), so nothing global ever sorts.
# ---------------------------------------------------------------------------

_KM_DAY = 86_400_000_000


@register(
    "km_survival",
    oracle=f"""
    WITH s AS (
      SELECT user_id, epoch_us(ts) AS tu, event_type FROM events
    ),
    t0 AS (
      SELECT user_id, min(tu) AS t0 FROM s WHERE event_type = 'signup'
      GROUP BY user_id
    ),
    obs_end AS (SELECT max(tu) AS tmax FROM s),
    tp AS (
      SELECT s.user_id, min(s.tu) AS tp
      FROM s JOIN t0 USING (user_id)
      WHERE s.event_type = 'purchase' AND s.tu > t0.t0
      GROUP BY s.user_id
    ),
    subj AS (
      SELECT t0.user_id,
             CASE WHEN tp.tp IS NOT NULL THEN (tp.tp - t0.t0) // {_KM_DAY}
                  ELSE (o.tmax - t0.t0) // {_KM_DAY} END AS dur,
             CASE WHEN tp.tp IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM t0 LEFT JOIN tp ON t0.user_id = tp.user_id, obs_end o
    ),
    ntot AS (SELECT CAST(count(*) AS BIGINT) AS n_subj FROM subj),
    leavers AS (
      SELECT dur AS d, CAST(count(*) AS BIGINT) AS lv,
             CAST(sum(ev) AS BIGINT) AS dv
      FROM subj GROUP BY dur
    ),
    evdays AS (SELECT d AS t FROM leavers WHERE dv > 0),
    risk AS (
      SELECT e.t,
             (SELECT n_subj FROM ntot)
               - CAST(coalesce(sum(l.lv), 0) AS BIGINT) AS n_t
      FROM evdays e LEFT JOIN leavers l ON l.d < e.t
      GROUP BY e.t
    ),
    km AS (
      SELECT r.t, r.n_t, le.dv AS d_t,
             (SELECT CASE WHEN max(CASE WHEN l2.dv >= r2.n_t THEN 1 ELSE 0
                                   END) = 1 THEN CAST(0 AS DOUBLE)
                  ELSE exp(sum(CASE WHEN l2.dv >= r2.n_t
                    THEN CAST(0 AS DOUBLE)
                    ELSE ln(CAST(1 AS DOUBLE)
                    - CAST(l2.dv AS DOUBLE) / CAST(r2.n_t AS DOUBLE)) END))
                  END
              FROM risk r2 JOIN leavers l2 ON l2.d = r2.t
              WHERE r2.t <= r.t) AS s_raw
      FROM risk r JOIN leavers le ON le.d = r.t
    )
    SELECT t AS day, d_t AS n_events, n_t AS n_at_risk,
           {_MK_F6.format(x="s_raw")} AS s_km
    FROM km
    """,
)
def km_survival(spark, sf_dir):
    """TS37: Kaplan-Meier estimator for time from signup to first
    purchase, right-censored at the end of observation: per event day
    t, the risk set n_t (subjects with duration ≥ t — censored
    subjects count while at risk), deaths d_t, and
    S(t) = Π_{u≤t}(1 − d_u/n_u) computed as exp(Σ ln(·)) over the
    BOUNDED day table — risk sets and the survival product are both
    small day-axis joins, zero window functions, so nothing
    corpus-sized ever sorts globally. Counts/durations int64; the one
    float chain (ln/exp, libm ≤1 ulp) lands on floor-1e6."""
    s = T(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tu"),
        "event_type",
    )
    t0 = s.where(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("tu").alias("t0")
    )
    tmax = s.agg(F.max("tu").alias("tmax"))
    tp = (
        s.join(t0, "user_id")
        .where((F.col("event_type") == "purchase") & (F.col("tu") > F.col("t0")))
        .groupBy("user_id")
        .agg(F.min("tu").alias("tp"))
    )
    subj = (
        t0.join(tp, "user_id", "left")
        .crossJoin(F.broadcast(tmax))
        .select(
            "user_id",
            F.expr(
                f"CASE WHEN tp IS NOT NULL THEN (tp - t0) DIV {_KM_DAY}"
                f" ELSE (tmax - t0) DIV {_KM_DAY} END"
            ).alias("dur"),
            F.expr("CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END").alias("ev"),
        )
    )
    ntot = subj.agg(F.count(F.lit(1)).cast("long").alias("n_subj"))
    leavers = subj.groupBy(F.col("dur").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("lv"),
        F.sum("ev").cast("long").alias("dv"),
    )
    evdays = leavers.where(F.col("dv") > 0).select(F.col("d").alias("t"))
    risk = (
        evdays.join(
            leavers.select(F.col("d").alias("ld"), "lv"),
            F.col("ld") < F.col("t"),
            "left",
        )
        .groupBy("t")
        .agg(F.coalesce(F.sum("lv"), F.lit(0)).cast("long").alias("gone"))
        .crossJoin(F.broadcast(ntot))
        .select("t", (F.col("n_subj") - F.col("gone")).alias("n_t"))
    )
    terms = risk.join(
        leavers.select(F.col("d").alias("t"), "dv"), "t"
    ).select(
        "t",
        "n_t",
        "dv",
        F.expr(
            "CASE WHEN dv >= n_t THEN CAST(NULL AS DOUBLE)"
            " ELSE ln(CAST(1 AS DOUBLE)"
            " - CAST(dv AS DOUBLE) / CAST(n_t AS DOUBLE)) END"
        ).alias("lnterm"),
        F.expr("CASE WHEN dv >= n_t THEN 1 ELSE 0 END").alias("iszero"),
    )
    ta = terms.select(
        F.col("t").alias("t2"),
        F.col("lnterm").alias("lnterm2"),
        F.col("iszero").alias("iszero2"),
    )
    km = (
        terms.drop("lnterm", "iszero")
        .join(ta, F.col("t2") <= F.col("t"))
        .groupBy("t", "n_t", "dv")
        .agg(
            F.expr(
                "CASE WHEN max(iszero2) = 1 THEN CAST(0 AS DOUBLE)"
                " ELSE exp(sum(lnterm2)) END"
            ).alias("s_raw")
        )
    )
    return km.select(
        F.col("t").alias("day"),
        F.col("dv").alias("n_events"),
        F.col("n_t").alias("n_at_risk"),
        F.expr(_MK_F6.format(x="s_raw")).alias("s_km"),
    )
