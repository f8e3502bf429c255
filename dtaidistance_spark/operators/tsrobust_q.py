"""Trend extraction + robust anomaly scoring, round-2 batch 5 — both
queries BIT-EXACT driver-oracled (no rounding tolerance anywhere).

TS10 — piecewise-linear approximation by per-block least squares: with
a fixed block width w=16 and local positions j=0..15, the OLS slope is
(w·Σjx − Sj·Σx) / (w·Sjj − Sj²) where Σx and Σjx are exact int64 and
the denominator is the constant 5440 — ONE correctly-rounded division;
the intercept (Σx − b·Sj)/w divides by 16 (exact). Every residual
x_j − (a + b·j) is then the same op tree in both engines, and max /
argmax over bit-identical doubles are deterministic.

TS11 — robust z-scores via median/MAD computed POSITIONALLY: the
median of an int array is sorted[(n+1)/2] (odd) or
(sorted[n/2]+sorted[n/2+1])/2 (even — exact: integer sum, /2) — no
engine-specific quantile interpolation to reconcile, just
array_sort == list_sort on identical values. |x − med| lands on exact
halves, its median on exact quarters, so MAD is exact too; the robust
z (x − med)/(1.4826·MAD) is one shared expression tree. Outlier counts
at |z| > 3.5 follow from comparisons on identical doubles.

Both are scan-side HOF pipelines — zero shuffles, whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import T, register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 128
_W = 16
_SJ = sum(range(_W))            # 120
_SJJ = sum(j * j for j in range(_W))  # 1240
_DEN = _W * _SJJ - _SJ * _SJ    # 5440

# ---------------------------------------------------------------------------
# TS10 — PLA: per-block OLS line + max residual
# ---------------------------------------------------------------------------

# shared float tail over exact ints (sx, sjx) and the block slice
_SLOPE = f"(CAST({_W} * sjx - {_SJ} * sx AS DOUBLE) / CAST({_DEN} AS DOUBLE))"
_ICEPT = f"((CAST(sx AS DOUBLE) - ({_SLOPE} * CAST({_SJ} AS DOUBLE))) / CAST({_W} AS DOUBLE))"


@register(
    "pla_blocks",
    oracle=synth_sql(_N)
    + f"""
    , pb AS (
      SELECT doc_id, t.b AS block_id,
             tokens[t.b * {_W} + 1 : t.b * {_W} + {_W}] AS blk
      FROM synth, unnest(range(n_tok // {_W})) AS t(b)
    ),
    ps AS (
      SELECT doc_id, block_id,
        list_sum(blk)::BIGINT AS sx,
        list_sum(list_transform(range({_W}),
            j -> j::BIGINT * blk[j + 1]::BIGINT))::BIGINT AS sjx,
        blk
      FROM pb
    ),
    pr AS (
      SELECT doc_id, block_id, {_SLOPE} AS slope, {_ICEPT} AS icept,
        list_transform(range({_W}), j ->
          CAST(blk[j + 1] AS DOUBLE)
          - ({_ICEPT} + ({_SLOPE} * CAST(j AS DOUBLE)))) AS res
      FROM ps
    ),
    pm AS (
      SELECT doc_id, block_id, slope, icept,
             list_max(list_transform(res, r -> abs(r))) AS max_abs_resid,
             res
      FROM pr
    )
    SELECT doc_id, block_id, slope, icept, max_abs_resid,
           list_filter(range({_W}),
                       j -> abs(res[j + 1]) = max_abs_resid)[1] AS argmax_j
    FROM pm
    """,
)
def pla_blocks(spark, sf_dir):
    """TS10: piecewise-linear approximation — every full 16-token block
    of every series gets its OLS line (slope, intercept), the max
    absolute residual, and the position that attains it (first on
    ties). All cross-position aggregates are exact int64; the float
    tail is one shared expression tree (see module docstring), so 8k+
    REAL doubles hash-match DuckDB with no tolerance. This is the
    compression/trend primitive under PLA archivers: keep (a, b,
    max_err) per block, reconstruct within max_err. Zero shuffles."""
    df = synth.sequences_df(spark, _N).select("doc_id", "n_tok", "tokens")
    pb = df.select(
        "doc_id",
        F.explode(F.expr(f"sequence(0, n_tok div {_W} - 1)")).alias(
            "block_id"
        ),
        "tokens",
    ).select(
        "doc_id",
        "block_id",
        F.expr(f"slice(tokens, block_id * {_W} + 1, {_W})").alias("blk"),
    )
    ps = pb.select(
        "doc_id",
        "block_id",
        F.expr("aggregate(blk, 0L, (a, x) -> a + CAST(x AS BIGINT))").alias(
            "sx"
        ),
        F.expr(
            f"aggregate(zip_with(sequence(0, {_W - 1}), blk,"
            " (j, x) -> CAST(j AS BIGINT) * CAST(x AS BIGINT)),"
            " 0L, (a, v) -> a + v)"
        ).alias("sjx"),
        "blk",
    )
    pr = ps.select(
        "doc_id",
        "block_id",
        F.expr(_SLOPE).alias("slope"),
        F.expr(_ICEPT).alias("icept"),
        F.expr(
            f"transform(sequence(0, {_W - 1}), j ->"
            f" CAST(element_at(blk, j + 1) AS DOUBLE)"
            f" - ({_ICEPT} + ({_SLOPE} * CAST(j AS DOUBLE))))"
        ).alias("res"),
    )
    pm = pr.select(
        "doc_id",
        "block_id",
        "slope",
        "icept",
        F.expr("array_max(transform(res, r -> abs(r)))").alias(
            "max_abs_resid"
        ),
        "res",
    )
    return pm.select(
        "doc_id",
        "block_id",
        "slope",
        "icept",
        "max_abs_resid",
        F.expr(
            f"element_at(filter(sequence(0, {_W - 1}),"
            " j -> abs(element_at(res, j + 1)) = max_abs_resid), 1)"
        ).alias("argmax_j"),
    )


# ---------------------------------------------------------------------------
# TS11 — robust z-score outliers (median / MAD)
# ---------------------------------------------------------------------------

# positional median of a SORTED double array s of length n — exact for
# integer/half-integer inputs, identical spelling both engines
def _med(s: str, n: str) -> str:
    return (
        f"(CASE WHEN {n} % 2 = 1 "
        f"THEN element_at({s}, CAST(({n} + 1) div 2 AS INT)) "
        f"ELSE (element_at({s}, CAST({n} div 2 AS INT))"
        f" + element_at({s}, CAST({n} div 2 + 1 AS INT)))"
        f" / CAST(2 AS DOUBLE) END)"
    )


def _med_duck(s: str, n: str) -> str:
    return (
        f"(CASE WHEN {n} % 2 = 1 THEN {s}[({n} + 1) // 2] "
        f"ELSE ({s}[{n} // 2] + {s}[{n} // 2 + 1]) / CAST(2 AS DOUBLE) END)"
    )


@register(
    "robust_outliers",
    oracle=synth_sql(256)
    + f"""
    , r1 AS (
      SELECT doc_id, n_tok,
        {_med_duck("list_sort(list_transform(tokens, x -> CAST(x AS DOUBLE)))", "n_tok")}
          AS med,
        tokens
      FROM synth
    ),
    r2 AS (
      SELECT doc_id, n_tok, med,
        {_med_duck("list_sort(list_transform(tokens, x -> abs(CAST(x AS DOUBLE) - med)))", "n_tok")}
          AS mad,
        tokens
      FROM r1
    )
    SELECT doc_id, n_tok, med, mad,
      length(list_filter(tokens, x ->
        abs((CAST(x AS DOUBLE) - med)
            / (CAST(1.4826 AS DOUBLE) * mad)) > CAST(3.5 AS DOUBLE)))
        AS n_outliers,
      list_max(list_transform(tokens, x ->
        abs((CAST(x AS DOUBLE) - med)
            / (CAST(1.4826 AS DOUBLE) * mad)))) AS max_abs_rz
    FROM r2
    """,
)
def robust_outliers(spark, sf_dir):
    """TS11: robust per-series outlier scoring — median and MAD
    computed POSITIONALLY from the sorted array (no quantile
    interpolation to reconcile across engines; median of ints is exact,
    MAD lands on exact binary fractions), then the robust z-score
    (x − med)/(1.4826·MAD) and the count of |z| > 3.5. Every emitted
    double is bit-identical across engines — the classic
    consistency-based outlier detector, shuffle-free."""
    df = synth.sequences_df(spark, 256).select("doc_id", "n_tok", "tokens")
    sorted_x = "array_sort(transform(tokens, x -> CAST(x AS DOUBLE)))"
    r1 = df.select(
        "doc_id",
        "n_tok",
        F.expr(_med(sorted_x, "n_tok")).alias("med"),
        "tokens",
    )
    sorted_d = "array_sort(transform(tokens, x -> abs(CAST(x AS DOUBLE) - med)))"
    r2 = r1.select(
        "doc_id",
        "n_tok",
        "med",
        F.expr(_med(sorted_d, "n_tok")).alias("mad"),
        "tokens",
    )
    rz = (
        "abs((CAST(x AS DOUBLE) - med)"
        " / (CAST(1.4826 AS DOUBLE) * mad))"
    )
    return r2.select(
        "doc_id",
        "n_tok",
        "med",
        "mad",
        F.expr(f"size(filter(tokens, x -> {rz} > CAST(3.5 AS DOUBLE)))").alias(
            "n_outliers"
        ),
        F.expr(f"array_max(transform(tokens, x -> {rz}))").alias(
            "max_abs_rz"
        ),
    )


# ---------------------------------------------------------------------------
# S6 — winsorization (percentile clamp; all-integer, bit-exact)
# ---------------------------------------------------------------------------


@register(
    "winsorize_series",
    oracle=synth_sql(256)
    + """
    , wz AS (
      SELECT doc_id, n_tok, tokens,
             list_sort(tokens) AS st,
             (n_tok * 5 + 99) // 100 AS i_lo,
             (n_tok * 95 + 99) // 100 AS i_hi
      FROM synth
    ),
    wb AS (
      SELECT doc_id, n_tok, tokens,
             st[greatest(1, i_lo)] AS lo, st[i_hi] AS hi
      FROM wz
    )
    SELECT doc_id, n_tok, lo::INT AS lo, hi::INT AS hi,
           length(list_filter(tokens, x -> x < lo))::BIGINT AS n_below,
           length(list_filter(tokens, x -> x > hi))::BIGINT AS n_above,
           md5(array_to_string(
             list_transform(tokens, x -> greatest(lo, least(hi, x))), ','))
             AS clamped_md5
    FROM wb
    """,
)
def winsorize_series(spark, sf_dir):
    """S6: winsorization — clamp each series at its nearest-rank 5th /
    95th percentiles, the robust-preprocessing step real pipelines run
    before means and regressions. The percentile INDICES are pure
    integer arithmetic (ceil(n·q) as (n·q + 99) div 100), the bounds
    are positional picks from the sorted int array, and the clamped
    output is md5-hashed — not a single float anywhere, so the whole
    query is exact by construction. Zero shuffles."""
    df = synth.sequences_df(spark, 256).select("doc_id", "n_tok", "tokens")
    wz = df.select(
        "doc_id",
        "n_tok",
        "tokens",
        F.expr("array_sort(tokens)").alias("st"),
        F.expr("CAST((n_tok * 5 + 99) div 100 AS INT)").alias("i_lo"),
        F.expr("CAST((n_tok * 95 + 99) div 100 AS INT)").alias("i_hi"),
    )
    wb = wz.select(
        "doc_id",
        "n_tok",
        "tokens",
        F.expr("element_at(st, greatest(1, i_lo))").alias("lo"),
        F.expr("element_at(st, i_hi)").alias("hi"),
    )
    return wb.select(
        "doc_id",
        "n_tok",
        "lo",
        "hi",
        F.expr("CAST(size(filter(tokens, x -> x < lo)) AS BIGINT)").alias(
            "n_below"
        ),
        F.expr("CAST(size(filter(tokens, x -> x > hi)) AS BIGINT)").alias(
            "n_above"
        ),
        F.md5(
            F.array_join(
                F.expr(
                    "transform(tokens, x -> greatest(lo, least(hi, x)))"
                ).cast("array<string>"),
                ",",
            )
        ).alias("clamped_md5"),
    )


# ---------------------------------------------------------------------------
# TS39 — Benford first-digit conformance (data-quality / fraud screen)
# ---------------------------------------------------------------------------

_BF_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"
# expected Benford mass for digit d, identical tree both engines
_BF_P = "log10(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE) / CAST(d AS DOUBLE))"


@register(
    "benford_digit_test",
    oracle=f"""
    WITH cents AS (
      SELECT event_type,
             CAST(floor(value * CAST(100 AS DOUBLE)
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS c
      FROM events WHERE value > 0
    ),
    digits AS (
      SELECT event_type,
             CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS d
      FROM cents WHERE c > 0
    ),
    obs AS (
      SELECT event_type, d, CAST(count(*) AS BIGINT) AS n_obs
      FROM digits GROUP BY event_type, d
    ),
    tot AS (
      SELECT event_type, CAST(sum(n_obs) AS BIGINT) AS n FROM obs
      GROUP BY event_type
    ),
    scored AS (
      SELECT o.event_type, o.d, o.n_obs, t.n,
             {_BF_P} AS p,
             (CAST(o.n_obs AS DOUBLE) - CAST(t.n AS DOUBLE) * ({_BF_P}))
               * (CAST(o.n_obs AS DOUBLE) - CAST(t.n AS DOUBLE) * ({_BF_P}))
               / (CAST(t.n AS DOUBLE) * ({_BF_P})) AS term
      FROM obs o JOIN tot t USING (event_type)
    )
    SELECT event_type, d AS digit, n_obs, n,
           {_BF_F6.format(x="p")} AS p_benford,
           {_BF_F6.format(x="term")} AS chi2_term,
           {_BF_F6.format(
               x="sum(term) OVER (PARTITION BY event_type)")} AS chi2
    FROM scored
    """,
)
def benford_digit_test(spark, sf_dir):
    """TS39: Benford first-significant-digit conformance per event
    type — the classic data-quality / fraud screen. Digit extraction
    is INTEGER-exact: values are 2-dp, so cents = floor(100v + 0.5) is
    an exact int64 and the leading digit is the first character of its
    digit string (no float log10 near power-of-ten boundaries).
    Expected mass log10(1 + 1/d) and the χ² terms share one verbatim
    float tree; per-type χ² via a type-partitioned window over ≤ 9
    rows. Two map-side-combined aggregates, nothing global."""
    cents = (
        T(spark, sf_dir, "events")
        .where(F.col("value") > 0)
        .select(
            "event_type",
            F.expr(
                "CAST(floor(value * CAST(100 AS DOUBLE)"
                " + CAST(0.5 AS DOUBLE)) AS BIGINT)"
            ).alias("c"),
        )
        .where(F.col("c") > 0)
    )
    digits = cents.select(
        "event_type",
        F.expr("CAST(substring(CAST(c AS STRING), 1, 1) AS BIGINT)").alias(
            "d"
        ),
    )
    obs = digits.groupBy("event_type", "d").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs")
    )
    tot = obs.groupBy("event_type").agg(
        F.sum("n_obs").cast("long").alias("n")
    )
    term = (
        "(CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * ({p}))"
        " * (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * ({p}))"
        " / (CAST(n AS DOUBLE) * ({p}))"
    ).format(p=_BF_P)
    scored = obs.join(F.broadcast(tot), "event_type").withColumn(
        "term", F.expr(term)
    )
    w = Window.partitionBy("event_type")
    return scored.select(
        "event_type",
        F.col("d").alias("digit"),
        "n_obs",
        "n",
        F.expr(_BF_F6.format(x=_BF_P)).alias("p_benford"),
        F.expr(_BF_F6.format(x="term")).alias("chi2_term"),
        F.expr(_BF_F6.format(x="sum(term) OVER (PARTITION BY event_type)")).alias(
            "chi2"
        ),
    )
