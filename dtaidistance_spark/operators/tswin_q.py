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

# Theil-Sen: exact tier caps the pair set at the series prefix m<=64
# (2016 slopes/row); the scale tier samples pairs at dyadic gaps.
_TS_M = 64
_TS_GAPS = (1, 2, 4, 8, 16, 32, 64)

# ---------------------------------------------------------------------------
# TS22 — Hampel filter (rolling median / MAD despike)
# ---------------------------------------------------------------------------

_HALF = 5  # centered window: 5 preceding + current + 5 following
_K_SIGMA = "CAST(3 AS DOUBLE) * CAST(1.4826 AS DOUBLE)"


_HAMPEL_ORACLE = f"""
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
    """


@register("hampel_filter", oracle=_HAMPEL_ORACLE)
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


# ---------------------------------------------------------------------------
# TS24 — Theil-Sen robust slope (exact prefix tier + dyadic-gap scale tier)
# ---------------------------------------------------------------------------

# Every slope is ONE subtraction + ONE division on exact token ints, the
# median a positional pick over sorted identical doubles — bit-exact.

_TSEN_SLOPES_SPARK = f"""
flatten(transform(sequence(0, m - 2), i ->
  transform(sequence(i + 1, m - 1), j ->
    (CAST(element_at(tokens, j + 1) AS DOUBLE)
     - CAST(element_at(tokens, i + 1) AS DOUBLE))
    / CAST(j - i AS DOUBLE))))
"""

_TSEN_SLOPES_DUCK = """
flatten(list_transform(range(m - 1), i ->
  list_transform(range(i + 1, m), j ->
    (tokens[j + 1]::DOUBLE - tokens[i + 1]::DOUBLE)
    / (j - i)::DOUBLE)))
"""


@register(
    "theil_sen_slope",
    oracle=synth_sql(_N)
    + f"""
    , tm AS (
      SELECT doc_id, n_tok, least(n_tok, {_TS_M}) AS m, tokens FROM synth
    ),
    sl AS (
      SELECT doc_id, n_tok, m,
             list_sort({_TSEN_SLOPES_DUCK}) AS slopes,
             tokens
      FROM tm
    ),
    md AS (
      SELECT doc_id, n_tok, m,
             len(slopes) AS n_pairs,
             slopes[(len(slopes) + 1) // 2] AS slope,
             tokens
      FROM sl
    ),
    ic AS (
      SELECT doc_id, n_tok, m, n_pairs, slope,
             list_sort(list_transform(range(m), i ->
               tokens[i + 1]::DOUBLE - slope * i::DOUBLE)) AS resid
      FROM md
    )
    SELECT doc_id, n_tok, m, n_pairs, slope,
           resid[(m + 1) // 2] AS intercept
    FROM ic
    """,
)
def theil_sen_slope(spark, sf_dir):
    """TS24 (exact tier): Theil-Sen robust trend per series — the lower
    median of all pairwise slopes (x_j − x_i)/(j − i) over the first
    m = min(n_tok, 64) tokens, intercept the lower median of
    x_i − slope·i (the Siegel/Theil-Sen intercept convention).  The
    m ≤ 64 prefix bounds the exact tier at m(m−1)/2 = 2016 slopes per
    row; ``theil_sen_scaled`` is the full-length estimator.  Each slope
    is one subtraction + one division on exact ints, both medians are
    positional picks over sorted bit-identical doubles — no rounding
    anywhere.  Zero shuffles (scan-side HOFs, whole-stage codegen)."""
    df = synth.sequences_df(spark, _N).withColumn(
        "m", F.expr(f"least(n_tok, {_TS_M})")
    )
    sl = df.select(
        "doc_id",
        "n_tok",
        "m",
        "tokens",
        F.expr(f"array_sort({_TSEN_SLOPES_SPARK})").alias("slopes"),
    )
    md = sl.select(
        "doc_id",
        "n_tok",
        "m",
        "tokens",
        F.size("slopes").alias("n_pairs"),
        F.expr(
            "element_at(slopes, CAST((size(slopes) + 1) DIV 2 AS INT))"
        ).alias("slope"),
    )
    return md.select(
        "doc_id",
        "n_tok",
        "m",
        "n_pairs",
        "slope",
        F.expr(
            "element_at(array_sort(transform(sequence(0, m - 1), i -> "
            "CAST(element_at(tokens, i + 1) AS DOUBLE)"
            " - slope * CAST(i AS DOUBLE))), CAST((m + 1) DIV 2 AS INT))"
        ).alias("intercept"),
    )


_TSEN_GAP_SPARK = f"""
flatten(transform(
  filter(array{_TS_GAPS}, d -> d < n_tok),
  d -> transform(sequence(0, n_tok - 1 - d), i ->
    (CAST(element_at(tokens, i + d + 1) AS DOUBLE)
     - CAST(element_at(tokens, i + 1) AS DOUBLE))
    / CAST(d AS DOUBLE))))
"""

_TSEN_GAP_DUCK = f"""
flatten(list_transform(
  list_filter({list(_TS_GAPS)}, d -> d < n_tok),
  d -> list_transform(range(n_tok - d), i ->
    (tokens[i + d + 1]::DOUBLE - tokens[i + 1]::DOUBLE)
    / d::DOUBLE)))
"""


@register(
    "theil_sen_scaled",
    oracle=synth_sql(_N)
    + f"""
    , sl AS (
      SELECT doc_id, n_tok, list_sort({_TSEN_GAP_DUCK}) AS slopes
      FROM synth
    )
    SELECT doc_id, n_tok, len(slopes) AS n_pairs,
           slopes[(len(slopes) + 1) // 2] AS slope
    FROM sl
    """,
)
def theil_sen_scaled(spark, sf_dir):
    """TS24 (scale tier): Theil-Sen over the FULL series with the pair
    set sampled at dyadic gaps d ∈ {1,2,4,8,16,32,64} — O(n·7) slopes
    instead of O(n²), the standard sparse-pair Theil-Sen estimator
    (cf. Siegel's repeated-median lineage), keeping multi-scale gap
    coverage so seasonal structure can't bias the median the way a
    single-gap difference would.  Worst-case scratch per row is
    7·8192 ≈ 57k doubles — bounded regardless of corpus size, which is
    what makes this the 100 TB tier while ``theil_sen_slope`` stays
    the verification tier.  Same bit-exact positional-median contract;
    zero shuffles."""
    df = synth.sequences_df(spark, _N)
    sl = df.select(
        "doc_id",
        "n_tok",
        F.expr(f"array_sort({_TSEN_GAP_SPARK})").alias("slopes"),
    )
    return sl.select(
        "doc_id",
        "n_tok",
        F.size("slopes").alias("n_pairs"),
        F.expr(
            "element_at(slopes, CAST((size(slopes) + 1) DIV 2 AS INT))"
        ).alias("slope"),
    )


# ---------------------------------------------------------------------------
# TS25 — single best-split changepoint (exact SSE argmin via prefix sums)
# ---------------------------------------------------------------------------


@register(
    "best_split_changepoint",
    oracle=synth_sql(_N)
    + """
    , ex AS (
      SELECT doc_id, n_tok, j AS pos, tokens[j + 1]::BIGINT AS x
      FROM synth, unnest(range(n_tok)) AS t(j)
    ),
    cum AS (
      SELECT doc_id, n_tok, pos, x,
        sum(x) OVER (PARTITION BY doc_id ORDER BY pos)::BIGINT AS s1l,
        sum(x * x) OVER (PARTITION BY doc_id ORDER BY pos)::BIGINT AS s2l,
        sum(x) OVER (PARTITION BY doc_id)::BIGINT AS s1,
        sum(x * x) OVER (PARTITION BY doc_id)::BIGINT AS s2
      FROM ex
    ),
    cost AS (
      SELECT doc_id, n_tok, pos, s1l, s1, s2,
        (CAST(s2l AS DOUBLE)
         - (CAST(s1l AS DOUBLE) * CAST(s1l AS DOUBLE))
           / CAST(pos + 1 AS DOUBLE))
        + (CAST(s2 - s2l AS DOUBLE)
           - (CAST(s1 - s1l AS DOUBLE) * CAST(s1 - s1l AS DOUBLE))
             / CAST(n_tok - pos - 1 AS DOUBLE)) AS sse
      FROM cum WHERE pos <= n_tok - 2
    ),
    best AS (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY sse, pos) AS rn
      FROM cost
    )
    SELECT doc_id, n_tok, pos AS split_last_left, sse,
           CAST(s1l AS DOUBLE) / CAST(pos + 1 AS DOUBLE) AS mean_left,
           CAST(s1 - s1l AS DOUBLE) / CAST(n_tok - pos - 1 AS DOUBLE)
             AS mean_right,
           (CAST(s2 AS DOUBLE)
            - (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
              / CAST(n_tok AS DOUBLE)) - sse AS gain
    FROM best WHERE rn = 1
    """,
)
def best_split_changepoint(spark, sf_dir):
    """TS25: single best-split changepoint per series — the split k
    minimizing SSE_left + SSE_right for a piecewise-constant fit (the
    first recursion step of binary segmentation, cf. Scott & Knott;
    PELT's cost primitive).  Prefix sums Σx, Σx² are EXACT int64 over
    posexploded tokens (x < 50 257 ⇒ Σx² < 2¹⁴⁵? no — < 2.1·10¹³ at
    n = 8192, well inside int64), so every candidate SSE is the same
    short float tree on identical ints in both engines and the argmin
    (ties → smallest k) is deterministic with NO tolerance.  Plan: one
    hash shuffle on doc_id; the cumulative window, the full-partition
    totals, and the argmin row_number all share that single exchange.
    At 100 TB this is the scalable changepoint shape: O(n) per series,
    no per-row quadratic scan, no driver participation."""
    df = synth.sequences_df(spark, _N)
    ex = df.select(
        "doc_id", "n_tok", F.posexplode("tokens").alias("pos", "xi")
    ).select(
        "doc_id", "n_tok", "pos", F.col("xi").cast("bigint").alias("x")
    )
    wc = Window.partitionBy("doc_id").orderBy("pos")
    wf = Window.partitionBy("doc_id")
    cum = ex.select(
        "doc_id",
        "n_tok",
        "pos",
        F.sum("x").over(wc).alias("s1l"),
        F.sum(F.col("x") * F.col("x")).over(wc).alias("s2l"),
        F.sum("x").over(wf).alias("s1"),
        F.sum(F.col("x") * F.col("x")).over(wf).alias("s2"),
    ).where(F.col("pos") <= F.col("n_tok") - 2)
    sse = (
        F.col("s2l").cast("double")
        - (F.col("s1l").cast("double") * F.col("s1l").cast("double"))
        / (F.col("pos") + 1).cast("double")
    ) + (
        (F.col("s2") - F.col("s2l")).cast("double")
        - (
            (F.col("s1") - F.col("s1l")).cast("double")
            * (F.col("s1") - F.col("s1l")).cast("double")
        )
        / (F.col("n_tok") - F.col("pos") - 1).cast("double")
    )
    cost = cum.withColumn("sse", sse)
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy("sse", "pos")
    )
    best = cost.withColumn("rn", rn).where(F.col("rn") == 1)
    return best.select(
        "doc_id",
        "n_tok",
        F.col("pos").alias("split_last_left"),
        "sse",
        (F.col("s1l").cast("double") / (F.col("pos") + 1).cast("double")).alias(
            "mean_left"
        ),
        (
            (F.col("s1") - F.col("s1l")).cast("double")
            / (F.col("n_tok") - F.col("pos") - 1).cast("double")
        ).alias("mean_right"),
        (
            (
                F.col("s2").cast("double")
                - (F.col("s1").cast("double") * F.col("s1").cast("double"))
                / F.col("n_tok").cast("double")
            )
            - F.col("sse")
        ).alias("gain"),
    )


# ---------------------------------------------------------------------------
# TS26 — binary segmentation, depth 2 (two changepoints, three segments)
# ---------------------------------------------------------------------------


def _sse(q, s, n):
    """Shared SSE-from-prefix-sums spelling: identical float op tree in
    Spark and DuckDB (q, s are exact int64 expressions)."""
    return (
        f"(CAST({q} AS DOUBLE) - (CAST({s} AS DOUBLE) * CAST({s} AS DOUBLE))"
        f" / CAST({n} AS DOUBLE))"
    )


# level-1 cost at split pos (left [0..pos], right [pos+1..n-1])
_BS_COST1 = (
    _sse("s2l", "s1l", "(pos + 1)")
    + " + "
    + _sse("(s2 - s2l)", "(s1 - s1l)", "(n_tok - pos - 1)")
)

# level-2: splitting the LEFT segment [0..k1] at pos < k1 keeps the right
# segment's SSE; splitting the RIGHT segment [k1+1..n-1] at pos > k1 keeps
# the left's. s1k/s2k are the level-1 winner's prefix sums at k1.
_BS_SSEL1 = _sse("s2k", "s1k", "(k1 + 1)")
_BS_SSER1 = _sse("(s2 - s2k)", "(s1 - s1k)", "(n_tok - k1 - 1)")
_BS_COST2 = f"""CASE WHEN pos < k1 THEN
  {_sse("s2l", "s1l", "(pos + 1)")}
  + {_sse("(s2k - s2l)", "(s1k - s1l)", "(k1 - pos)")}
  + {_BS_SSER1}
ELSE
  {_BS_SSEL1}
  + {_sse("(s2l - s2k)", "(s1l - s1k)", "(pos - k1)")}
  + {_sse("(s2 - s2l)", "(s1 - s1l)", "(n_tok - pos - 1)")}
END"""

_BS_MEANS = """
CAST(CASE WHEN pos < k1 THEN s1l ELSE s1k END AS DOUBLE)
  / CAST(least(pos, k1) + 1 AS DOUBLE) AS mean1,
CAST(CASE WHEN pos < k1 THEN s1k - s1l ELSE s1l - s1k END AS DOUBLE)
  / CAST(greatest(pos, k1) - least(pos, k1) AS DOUBLE) AS mean2,
CAST(s1 - (CASE WHEN pos < k1 THEN s1k ELSE s1l END) AS DOUBLE)
  / CAST(n_tok - 1 - greatest(pos, k1) AS DOUBLE) AS mean3
"""


@register(
    "binseg_changepoints",
    oracle=synth_sql(_N)
    + f"""
    , ex AS (
      SELECT doc_id, n_tok, j AS pos, tokens[j + 1]::BIGINT AS x
      FROM synth, unnest(range(n_tok)) AS t(j)
    ),
    cum AS (
      SELECT doc_id, n_tok, pos,
        sum(x) OVER (PARTITION BY doc_id ORDER BY pos)::BIGINT AS s1l,
        sum(x * x) OVER (PARTITION BY doc_id ORDER BY pos)::BIGINT AS s2l,
        sum(x) OVER (PARTITION BY doc_id)::BIGINT AS s1,
        sum(x * x) OVER (PARTITION BY doc_id)::BIGINT AS s2
      FROM ex
    ),
    c1 AS (
      SELECT *, {_BS_COST1} AS sse1,
        row_number() OVER (PARTITION BY doc_id
                           ORDER BY {_BS_COST1}, pos) AS rn
      FROM cum WHERE pos <= n_tok - 2
    ),
    b1 AS (
      SELECT doc_id, pos AS k1, s1l AS s1k, s2l AS s2k, sse1
      FROM c1 WHERE rn = 1
    ),
    c2 AS (
      SELECT cum.doc_id, cum.n_tok, cum.pos, cum.s1l, cum.s2l,
             cum.s1, cum.s2, b1.k1, b1.s1k, b1.s2k, b1.sse1,
             {_BS_COST2} AS sse2,
        row_number() OVER (PARTITION BY cum.doc_id
                           ORDER BY {_BS_COST2}, cum.pos) AS rn
      FROM cum JOIN b1 USING (doc_id)
      WHERE cum.pos <= cum.n_tok - 2 AND cum.pos <> b1.k1
    )
    SELECT doc_id, n_tok,
           least(pos, k1) AS cp1, greatest(pos, k1) AS cp2,
           sse1, sse2, sse1 - sse2 AS gain2,
           {_BS_MEANS}
    FROM c2 WHERE rn = 1
    """,
)
def binseg_changepoints(spark, sf_dir):
    """TS26: binary segmentation at depth 2 — re-split the better side
    of the TS25 split, yielding two changepoints / three constant
    segments per series.  Level 2 reuses the SAME cumulative table:
    any segment's SSE is a 3-term expression over the global prefix
    sums at its endpoints, so the recursion costs one broadcast-sized
    join (the per-doc level-1 winner) and a second partitioned argmin
    — NO second pass over the raw tokens.  All candidate costs are one
    shared float tree over exact int64 prefix sums (helper `_sse`
    guarantees the identical spelling in both engines), ties break
    (cost, pos) — bit-exact, no tolerance, including the three segment
    means.  Plan: the Spark side has NO join at all — the level-1
    winner's (k1, s1k, s2k, sse1) are rebroadcast to every row of its
    own series by full-partition `max(when(rn = 1, ...))` windows, so
    the cumulative sums, both argmins, and the winner spread all ride
    ONE hash exchange on doc_id (plan-gated: 1 exchange, 0 joins) —
    the multi-changepoint shape that survives 100 TB."""
    return binseg_changepoints_df(synth.sequences_df(spark, _N))


def binseg_changepoints_df(df):
    """Depth-2 binary segmentation over any (doc_id, n_tok, tokens)
    DataFrame — the registry query applies it to the oracled synth
    table; bench.py applies it to the full bench token table to measure
    changepoint throughput through the single-exchange plan."""
    ex = df.select(
        "doc_id", "n_tok", F.posexplode("tokens").alias("pos", "xi")
    ).select(
        "doc_id", "n_tok", "pos", F.col("xi").cast("bigint").alias("x")
    )
    wc = Window.partitionBy("doc_id").orderBy("pos")
    wf = Window.partitionBy("doc_id")
    cum = ex.select(
        "doc_id",
        "n_tok",
        "pos",
        F.sum("x").over(wc).alias("s1l"),
        F.sum(F.col("x") * F.col("x")).over(wc).alias("s2l"),
        F.sum("x").over(wf).alias("s1"),
        F.sum(F.col("x") * F.col("x")).over(wf).alias("s2"),
    )
    c1 = (
        cum.where(F.col("pos") <= F.col("n_tok") - 2)
        .withColumn("sse1c", F.expr(_BS_COST1))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("sse1c", "pos")
            ),
        )
    )
    # spread the level-1 winner across its whole series WITHOUT a join:
    # full-partition max(when(rn = 1, ...)) windows stay on the same
    # doc_id exchange, so level 2 never rescans or reshuffles
    win1 = F.col("rn") == 1
    b = c1.select(
        "doc_id",
        "n_tok",
        "pos",
        "s1l",
        "s2l",
        "s1",
        "s2",
        F.max(F.when(win1, F.col("pos"))).over(wf).alias("k1"),
        F.max(F.when(win1, F.col("s1l"))).over(wf).alias("s1k"),
        F.max(F.when(win1, F.col("s2l"))).over(wf).alias("s2k"),
        F.max(F.when(win1, F.col("sse1c"))).over(wf).alias("sse1"),
    )
    c2 = (
        b.where(F.col("pos") != F.col("k1"))
        .withColumn("sse2", F.expr(_BS_COST2))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("sse2", "pos")
            ),
        )
    )
    return c2.where(F.col("rn") == 1).selectExpr(
        "doc_id",
        "n_tok",
        "least(pos, k1) AS cp1",
        "greatest(pos, k1) AS cp2",
        "sse1",
        "sse2",
        "sse1 - sse2 AS gain2",
        *[x.strip() for x in _BS_MEANS.strip().split(",\n")],
    )


# ---------------------------------------------------------------------------
# R29 — as-of join, scale tier: union-merge + LOCF (no join, one exchange)
# ---------------------------------------------------------------------------


@register(
    "asof_join_scaled",
    oracle="""
    SELECT event_id, user_id, o_orderkey AS last_orderkey,
           round(o_totalprice, 2) AS last_order_total
    FROM (
        SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
               row_number() OVER (PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM events e
        LEFT JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    ) WHERE rn = 1
    """,
)
def asof_join_scaled(spark, sf_dir):
    """R29 (R4's 100 TB tier): the as-of join as a union-merge — tag
    orders kind=0 and events kind=1, interleave them per user in
    (time, kind, orderkey) order, and LOCF the last non-null order
    fields onto each event with ``last(..., ignorenulls)`` over the
    running frame.  Sorting orders ascending by (date, orderkey) makes
    the carried row exactly the backward winner (max date, then max
    orderkey — the same tie rule as R4's row_number DESC), so the
    output equals ``asof_join`` row-for-row and shares its oracle.
    Why this shape: the R4 formulation joins every event to ALL its
    customer's earlier orders and ranks them (fan-out × orders), which
    needs the dim side broadcastable; the union-merge moves each input
    row across the wire ONCE and plans as a single user_id exchange +
    one sort, no join operator at all — the canonical streaming-merge
    as-of that survives both sides being 100 TB facts (plan-gated: 1
    exchange, 0 joins)."""
    ev = T(spark, sf_dir, "events").select(
        F.col("user_id").alias("uid"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tu"),
        F.lit(1).alias("kind"),
        "event_id",
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    o = T(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("uid"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("tu"),
        F.lit(0).alias("kind"),
        F.lit(None).cast("bigint").alias("event_id"),
        "o_orderkey",
        "o_totalprice",
    )
    w = (
        Window.partitionBy("uid")
        .orderBy("tu", "kind", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = ev.unionByName(o).select(
        "kind",
        "event_id",
        F.col("uid").alias("user_id"),
        F.last("o_orderkey", ignorenulls=True).over(w).alias("last_orderkey"),
        F.round(
            F.last("o_totalprice", ignorenulls=True).over(w), 2
        ).alias("last_order_total"),
    )
    return merged.where(F.col("kind") == 1).select(
        "event_id", "user_id", "last_orderkey", "last_order_total"
    )


# ---------------------------------------------------------------------------
# TS29 — PAA downsample fidelity audit (exact per-tier variance retention)
# ---------------------------------------------------------------------------

_PAA_WS = (4, 16, 64)

# per (doc, w): residual sum of squares of the PAA reconstruction,
# w²-scaled so it stays integral (block mean = S/w, residual x − S/w,
# w·residual = w·x − S exact int64; Σ(w·x − S)² ≤ 8192·(64·50256)² ≈
# 8.5e16, inside int64).  Block sums ride a first transform so the
# per-position pass reads them O(1).
_PAA_SSE_SPARK = """
aggregate(
  zip_with(
    slice(x, 1, nb * w),
    flatten(transform(bs, s -> array_repeat(s, w))),
    (v, s) -> (CAST(w AS BIGINT) * CAST(v AS BIGINT) - s)
              * (CAST(w AS BIGINT) * CAST(v AS BIGINT) - s)),
  0L, (a, e) -> a + e)
"""
_PAA_SSE_DUCK = """
list_sum(
  list_transform(range(0, nb * w),
    j -> (w::BIGINT * x[j + 1]::BIGINT - bs[j // w + 1])
         * (w::BIGINT * x[j + 1]::BIGINT - bs[j // w + 1])))::BIGINT
"""

_BS_SPARK = (
    "transform(sequence(0, nb - 1), b -> aggregate(slice(x, b * w + 1, w),"
    " 0L, (a, v) -> a + CAST(v AS BIGINT)))"
)
_BS_DUCK = (
    "list_transform(range(0, nb),"
    " b -> list_sum(x[b * w + 1 : b * w + w])::BIGINT)"
)

_RATIO_SHARED = (
    "CASE WHEN mm * sxx - sx * sx = 0 THEN CAST(0 AS DOUBLE)"
    " ELSE CAST(floor((CAST(1 AS DOUBLE)"
    " - (CAST(sse_num AS DOUBLE) / (CAST(w AS DOUBLE) * CAST(w AS DOUBLE)))"
    "   / ((CAST(mm AS DOUBLE) * CAST(sxx AS DOUBLE)"
    "       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    "      / CAST(mm AS DOUBLE)))"
    " * CAST(1000000.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE)"
    " / CAST(1000000.0 AS DOUBLE) END"
)


@register(
    "paa_fidelity",
    oracle=synth_sql(_N)
    + f"""
    , lg AS (
      SELECT doc_id, source, tokens AS x, n_tok,
             t.w0::INT AS w, (n_tok // t.w0)::INT AS nb
      FROM synth, unnest([{", ".join(str(w) for w in _PAA_WS)}]) AS t(w0)
    ),
    wb AS (SELECT *, {_BS_DUCK} AS bs FROM lg),
    sm AS (
      SELECT doc_id, source, w, nb, (nb * w)::BIGINT AS mm,
             {_PAA_SSE_DUCK} AS sse_num,
             list_sum(list_transform(x[1 : nb * w],
               v -> v::BIGINT * v::BIGINT))::BIGINT AS sxx,
             list_sum(x[1 : nb * w])::BIGINT AS sx
      FROM wb
    )
    SELECT doc_id, source, w, nb::BIGINT AS n_blocks, mm AS m_covered,
           sse_num, sxx, sx, {_RATIO_SHARED} AS var_retained
    FROM sm
    """,
)
def paa_fidelity(spark, sf_dir):
    """TS29: downsample fidelity audit — for each series and each PAA
    tier width w ∈ {4, 16, 64}, EXACTLY how much variance the rollup
    tier retains (1 − SSE/TSS over the covered prefix).  This is the
    number a retention policy should read before choosing tier widths,
    and it is exact: the PAA block mean S/w is rational, so residuals
    are w-scaled to integers (w·x − S) and the SSE numerator is a pure
    int64 HOF sum (≤ 8.5e16 at w=64, vocab-scale values); TSS comes
    from the same exact (m·Σx² − (Σx)²)/m algebra as TS28.  The one
    float (variance-retained ratio) shares its op tree cross-engine
    with floor-1e6 rounding.  Plan: zero shuffles — block sums ride
    one transform so the per-position residual pass reads them O(1)
    (flatten/array_repeat in Spark, j div w indexing in DuckDB; both
    evaluate the block-sum array once per row)."""
    docs = synth.sequences_df(spark, _N).select(
        "doc_id", "source", F.col("tokens").alias("x"), "n_tok"
    )
    lg = docs.select(
        "doc_id", "source", "x",
        F.explode(F.array(*[F.lit(w) for w in _PAA_WS])).alias("w"),
        "n_tok",
    ).select(
        "doc_id", "source", "x", "w",
        F.expr("CAST(n_tok DIV w AS INT)").alias("nb"),
    )
    wb = lg.withColumn("bs", F.expr(_BS_SPARK))
    sm = wb.select(
        "doc_id", "source", "w", "nb",
        (F.col("nb") * F.col("w")).cast("long").alias("mm"),
        F.expr(_PAA_SSE_SPARK).alias("sse_num"),
        F.expr(
            "aggregate(slice(x, 1, nb * w), 0L,"
            " (a, v) -> a + CAST(v AS BIGINT) * CAST(v AS BIGINT))"
        ).alias("sxx"),
        F.expr(
            "aggregate(slice(x, 1, nb * w), 0L,"
            " (a, v) -> a + CAST(v AS BIGINT))"
        ).alias("sx"),
    )
    return sm.select(
        "doc_id", "source", "w",
        F.col("nb").cast("long").alias("n_blocks"),
        F.col("mm").alias("m_covered"),
        "sse_num", "sxx", "sx",
        F.expr(_RATIO_SHARED).alias("var_retained"),
    )


@register("stream_hampel_despike", oracle=_HAMPEL_ORACLE)
def stream_hampel_despike_q(spark, sf_dir):
    """R59: STREAMING Hampel despike (the 12th applyInPandasWithState
    operator; ``streaming/continuous.stream_hampel_despike``) — the
    live twin of TS22's batch ``hampel_filter``: per-user centered
    11-frame positional median/MAD despiking of the 'click' value
    stream, state buffering the user's triples and the event-time
    timeout draining the exact frame algebra in numpy.  Positional
    picks and single-op float expressions only, so the drained rows
    are BIT-IDENTICAL to the batch operator and THIS QUERY SHARES THE
    BATCH ORACLE VERBATIM — the stream_ses/stream_scd2 pattern:
    fully oracled stateful streaming.  Replayed file-by-file
    (maxFilesPerTrigger=1), closed by the far-future row."""
    import shutil
    import tempfile

    from dtaidistance_spark.operators.qutil import detach

    ev = (
        T(spark, sf_dir, "events")
        .where(F.col("event_type") == "click")
        .select(
            F.col("ts").cast("timestamp").alias("ts"),
            F.col("event_id").cast("long").alias("event_id"),
            F.col("user_id").cast("long").alias("user_id"),
            F.col("value").cast("double").alias("value"),
        )
    )
    root = tempfile.mkdtemp(prefix="stream_hampel_")
    src, sink, ckpt = f"{root}/src", f"{root}/sink", f"{root}/ckpt"

    def drain():
        from dtaidistance_spark.streaming import continuous as S

        stream = (
            spark.readStream.schema(
                "ts timestamp, event_id long, user_id long, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            S.stream_hampel_despike(stream, watermark="30 minutes")
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    try:
        # Event-time-ordered single part file: with maxFilesPerTrigger=1
        # the watermark advances per micro-batch, so a hash-partitioned
        # multi-file write would let the watermark jump past later files'
        # rows and silently drop them as late (the replay contract
        # documented in tests/test_streaming.py). One sorted file keeps
        # the contract regardless of ev's input partitioning.
        ev.repartition(1).sortWithinPartitions("ts").write.parquet(src)
        drain()
        spark.sql(
            "SELECT timestamp'2030-01-01 00:00:00' AS ts,"
            " CAST(-1 AS BIGINT) AS event_id,"
            " CAST(-1 AS BIGINT) AS user_id, CAST(0.0 AS DOUBLE) AS value"
        ).write.mode("append").parquet(src)
        drain()
        out = (
            spark.read.parquet(sink)
            .where(F.col("user_id") >= 0)
            .select(
                "event_id",
                "user_id",
                "tu",
                "value",
                "frame_n",
                "med",
                "mad",
                "dev",
                "is_spike",
            )
        )
        return detach(spark, out)
    finally:
        shutil.rmtree(root, ignore_errors=True)
