"""TS54/TS55 — heavy-tail and random-walk diagnostics:

TS54 ``hill_tail_index`` (Hill Annals'75; the peaks-over-threshold
tail estimator): per event type, α̂ = k / Σᵢ ln(x₍ᵢ₎/x₍ₖ₊₁₎) over the
top k = 64 order statistics of the value distribution — THE number a
capacity/risk pipeline reads to know whether extremes have finite
variance (α > 2) or not.  Values integerized to cents (exact), the
top-(k+1) per type selected with (cents DESC, event_id) total-order
ties and collected into ONE rank-sorted array, so the Σ of k logs is
an ORDER-PINNED fold — no float aggregate; α floor-1e6.

TS55 ``variance_ratio`` (Lo & MacKinlay RFS'88): per series,
VR(q) = [Σ(x_{t+q}−x_t)²/(n−q)] / [q·Σ(x_{t+1}−x_t)²/(n−1)] at
q ∈ {2,4,8,16} — the classic random-walk test (VR ≈ 1 under i.i.d.
increments; < 1 mean-reverting, > 1 trending).  Both Σ are pure int64
(diff² ≤ 50256²·8192 ≈ 2e13), so each VR is ONE float expression over
two int64s and two literals — bit-exact, floor-1e6.  ZERO exchanges.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import T, register
from dtaidistance_spark.operators.synth_q import synth_sql

_K = 64  # Hill order statistics
_N = 512
_QS = (2, 4, 8, 16)

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _hill_fold(eng: str) -> str:
    """Σ_{i=1..k} ln(top[i]/top[k+1]) over the rank-sorted cents
    array ``top`` (length k+1)."""
    sp = eng == "spark"
    el = (
        (lambda i: f"element_at(top, {i})")
        if sp
        else (lambda i: f"top[{i}]")
    )
    term = (
        f"ln(CAST({el('k + 1')} AS DOUBLE)"
        f" / CAST({el(f'{_K} + 1')} AS DOUBLE))"
    )
    seq = f"sequence(0, {_K} - 1)" if sp else f"range({_K})"
    if sp:
        return (
            f"aggregate({seq}, CAST(0 AS DOUBLE), (a, k) -> a + {term})"
        )
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE),"
        f" list_transform({seq}, k -> {term})), (a, x) -> a + x)"
    )


_ALPHA = (
    f"CASE WHEN hsum > CAST(0 AS DOUBLE)"
    f" THEN CAST({_K} AS DOUBLE) / hsum ELSE CAST(NULL AS DOUBLE) END"
)


@register(
    "hill_tail_index",
    oracle=f"""
    WITH c AS (
      SELECT event_type,
             CAST(floor(100.0 * value + 0.5) AS BIGINT) AS cents,
             event_id
      FROM events WHERE value > 0.0
    ),
    rk AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cents DESC, event_id) AS rn
      FROM c
    ),
    packed AS (
      SELECT event_type, list(cents ORDER BY rn) AS top,
             CAST(count(*) AS BIGINT) AS k1
      FROM rk WHERE rn <= {_K} + 1 GROUP BY event_type
      HAVING count(*) = {_K} + 1
    ),
    h AS (
      SELECT event_type, top[{_K} + 1] AS xmin_cents,
             {_hill_fold('duck')} AS hsum
      FROM packed
    )
    SELECT event_type, xmin_cents,
           {_F6.format(x="hsum")} AS hill_sum,
           {_F6.format(x=_ALPHA)} AS alpha
    FROM h
    """,
)
def hill_tail_index(spark, sf_dir):
    """TS54: Hill tail-index per event type (module header) — top-65
    order statistics by (cents DESC, event_id), one rank-sorted array
    collect, order-pinned log fold, α = k/Σ floor-1e6."""
    from pyspark.sql import Window

    c = (
        T(spark, sf_dir, "events")
        .where(F.col("value") > 0.0)
        .select(
            "event_type",
            F.expr(
                "CAST(floor(100.0 * value + CAST(0.5 AS DOUBLE))"
                " AS BIGINT)"
            ).alias("cents"),
            "event_id",
        )
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("cents").desc(), "event_id"
    )
    rk = c.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= _K + 1
    )
    packed = (
        rk.groupBy("event_type")
        .agg(
            F.expr(
                "transform(array_sort(collect_list("
                "struct(rn, cents AS cc))), z -> z.cc)"
            ).alias("top"),
            F.count(F.lit(1)).cast("long").alias("k1"),
        )
        .where(F.col("k1") == _K + 1)
    )
    h = packed.select(
        "event_type",
        F.expr(f"element_at(top, {_K} + 1)").alias("xmin_cents"),
        F.expr(_hill_fold("spark")).alias("hsum"),
    )
    return h.select(
        "event_type",
        "xmin_cents",
        F.expr(_F6.format(x="hsum")).alias("hill_sum"),
        F.expr(_F6.format(x=_ALPHA)).alias("alpha"),
    )


# ---------------------------------------------------------------------------
# TS55 — Lo-MacKinlay variance ratio per series
# ---------------------------------------------------------------------------


def _ssd_q(eng: str, q: int) -> str:
    sp = eng == "spark"
    el = (
        (lambda i: f"CAST(element_at(tokens, {i}) AS BIGINT)")
        if sp
        else (lambda i: f"CAST(tokens[{i}] AS BIGINT)")
    )
    d = f"({el(f't + {q} + 1')} - {el('t + 1')})"
    body = f"{d} * {d}"
    if sp:
        return (
            f"aggregate(sequence(0, n_tok - {q} - 1), CAST(0 AS BIGINT),"
            f" (a, t) -> a + {body})"
        )
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" list_transform(range(n_tok - {q}), t -> {body})),"
        f" (a, x) -> a + x)"
    )


def _vr(q: int) -> str:
    return (
        f"(CAST(ssd_{q} AS DOUBLE) / CAST(n_tok - {q} AS DOUBLE))"
        f" / (CAST({q} AS DOUBLE) * CAST(ssd_1 AS DOUBLE)"
        f" / CAST(n_tok - 1 AS DOUBLE))"
    )


@register(
    "variance_ratio",
    oracle=synth_sql(_N)
    + f"""
    , s1 AS (
      SELECT doc_id, n_tok,
             {_ssd_q('duck', 1)} AS ssd_1,
             {", ".join(f"{_ssd_q('duck', q)} AS ssd_{q}" for q in _QS)}
      FROM synth
    )
    SELECT doc_id, n_tok, ssd_1,
           {", ".join(f"ssd_{q}" for q in _QS)},
           {", ".join(_F6.format(x=_vr(q)) + f" AS vr_{q}" for q in _QS)}
    FROM s1
    """,
)
def variance_ratio(spark, sf_dir):
    """TS55: Lo-MacKinlay variance ratios at q ∈ {2,4,8,16} per
    series (module header) — both Σ int64-exact, each VR one float
    tree, floor-1e6.  Plan: ZERO exchanges — a pure map job."""
    docs = synth.sequences_df(spark, _N).select("doc_id", "n_tok", "tokens")
    s1 = docs.select(
        "doc_id",
        "n_tok",
        F.expr(_ssd_q("spark", 1)).alias("ssd_1"),
        *[F.expr(_ssd_q("spark", q)).alias(f"ssd_{q}") for q in _QS],
    )
    return s1.select(
        "doc_id",
        "n_tok",
        "ssd_1",
        *[f"ssd_{q}" for q in _QS],
        *[
            F.expr(_F6.format(x=_vr(q))).alias(f"vr_{q}")
            for q in _QS
        ],
    )
