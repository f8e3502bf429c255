"""TS123 — tabular CUSUM control chart per series (Page
Biometrika'54; the k = 0.5σ, h = 5σ design per Montgomery, SQC
ch. 9): the SPC sibling the EWMA chart (TS77) was missing — the
chart that accumulates small persistent shifts the Shewhart/EWMA
family reacts to slowly:

    C⁺_t = max(0, C⁺_{t−1} + z_t − k),
    C⁻_t = max(0, C⁻_{t−1} − z_t − k),   alarm at C± > h

with z standardized against IN-CONTROL parameters estimated on the
first 20% of the series (the declared Phase-I window — SPC's
calibration discipline, the same honest split TS118 uses).

Engine form — the recursion is NOT folded: the classical identity

    C⁺_t = S_t − min_{0≤j≤t} S_j,   S_t = Σ_{i≤t}(z_i − k)

turns both one-sided CUSUMs into a windowed cumsum + running-min —
expressible as PARTITIONED window functions in both engines, which
(a) sidesteps the TS120 DuckDB list_reduce cross-row corruption
with no workaround needed, and (b) is the shuffle-once scale shape
anyway.  Window cumsums evaluate in pinned position order, so the
float chains agree cross-engine without array folds.

Emitted per doc: Phase-I μ̂/σ̂, max C⁺, max C⁻, the FIRST alarm
index each side (smallest t, pinned), and n_alarm_points.
floor-1e6; guard n ≥ 50 and σ̂ > 0.

Honest (gated) reading — measured, and the corpus split is the
inverse of the draft's guess: 442 of 512 series NEVER alarm —
because the rotation OSCILLATES around the ring rather than
walking away, the +k and −k drifts cancel inside the CUSUM and
the chart correctly refuses a stationary-though-structured stream
(the discipline that separates CUSUM from a naive drift alarm) —
while the 70 that do alarm do so at once (median first alarm
t = 9.5): these are the slow-wrap/ramp docs whose Phase-II level
departs monotonically from the Phase-I window from the first
steps, the TS118 phase-rotation mechanism caught by the chart
built to catch it.  An 86/14 split with immediate detection in
the firing minority is exactly what a mean-shift chart should do
on this generator.  The ARL story is
gated on planted data instead — and its own first gate was wrong
in the instructive direction: asserting "no false alarm in 800
points" forgets that two-sided ARL₀ ≈ 465 makes one false alarm
over 800 points MORE likely than not; the corrected gate MEASURES
the mean first-alarm time on in-control LCG noise and bands it
around the operating point, while a planted 1σ step shift alarms
with median delay ≈ 10 points (ARL₁, the chart's design
detection speed).  Gates: the identity C⁺ = S − cummin(S)
vs the recursive definition on random streams (exact); planted
in-control no-alarm; planted 1σ-shift detection delay band;
numpy recompute per doc; the corpus alarm-rate + median pins.

Scale shape: one hash exchange on doc, two ordered window passes
inside it, one aggregate — no folds, no collects.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dtaidistance_spark import synth
from dtaidistance_spark.operators.queries import register
from dtaidistance_spark.operators.synth_q import synth_sql

_N = 512
_KREF = 0.5
_H = 5.0

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _phase1_folds(eng: str) -> dict[str, str]:
    sp = eng == "spark"
    el = (lambda i: f"element_at(v, {i})") if sp else (lambda i: f"v[{i}]")

    def fold(term: str) -> str:
        if sp:
            return (
                "aggregate(sequence(1, CAST(m0 AS INT)),"
                f" CAST(0 AS BIGINT), (a, t) -> a + ({term}))"
            )
        return (
            "list_reduce(list_prepend(CAST(0 AS BIGINT),"
            " list_transform(range(1, CAST(m0 AS INT) + 1),"
            f" t -> CAST(({term}) AS BIGINT))), (a, q) -> a + q)"
        )

    return {"sy": fold(el("t")), "syy": fold(f"{el('t')} * {el('t')}")}


@register(
    "spc_cusum_chart",
    oracle=synth_sql(_N)
    + f"""
    , docs AS (
      SELECT doc_id, CAST(n_tok AS BIGINT) AS n,
             CAST(floor(0.2 * n_tok) AS BIGINT) AS m0,
             list_transform(tokens, y -> CAST(y AS BIGINT)) AS v
      FROM synth
    ),
    p1 AS (
      SELECT docs.*,
             {", ".join(f"{x} AS {k}"
                        for k, x in _phase1_folds("duck").items())}
      FROM docs
    ),
    prm AS (
      SELECT doc_id, n, m0, v,
             CAST(sy AS DOUBLE) / m0 AS mu,
             sqrt((CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * sy / m0) / m0) AS sig
      FROM p1
    ),
    long AS (
      SELECT doc_id, n, mu, sig, CAST(t.j AS BIGINT) + 1 AS t,
             (v[t.j + 1] - mu) / sig AS z
      FROM prm, LATERAL unnest(range(len(v))) AS t(j)
      WHERE sig > 0
    ),
    s AS (
      SELECT doc_id, n, t,
        sum(z - {_KREF}) OVER w AS sp,
        sum(0.0 - z - {_KREF}) OVER w AS sm
      FROM long
      WINDOW w AS (PARTITION BY doc_id ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    cus AS (
      SELECT doc_id, n, t,
        sp - least(0.0, min(sp) OVER w2) AS cp,
        sm - least(0.0, min(sm) OVER w2) AS cm
      FROM s
      WINDOW w2 AS (PARTITION BY doc_id ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    agg AS (
      SELECT doc_id, any_value(n) AS n,
        max(cp) AS max_cp, max(cm) AS max_cm,
        min(CASE WHEN cp > {_H} THEN t END) AS t_up,
        min(CASE WHEN cm > {_H} THEN t END) AS t_dn,
        CAST(sum(CASE WHEN cp > {_H} OR cm > {_H} THEN 1 ELSE 0 END)
             AS BIGINT) AS n_alarm_points
      FROM cus GROUP BY doc_id
    )
    SELECT agg.doc_id, agg.n,
           {_F6.format(x="prm.mu")} AS mu_phase1,
           {_F6.format(x="prm.sig")} AS sigma_phase1,
           {_F6.format(x="max_cp")} AS max_cusum_up,
           {_F6.format(x="max_cm")} AS max_cusum_dn,
           CAST(t_up AS BIGINT) AS first_alarm_up,
           CAST(t_dn AS BIGINT) AS first_alarm_dn,
           n_alarm_points,
           CAST(CASE WHEN t_up IS NOT NULL OR t_dn IS NOT NULL
                THEN 1 ELSE 0 END AS BIGINT) AS alarmed
    FROM agg JOIN prm ON prm.doc_id = agg.doc_id
    WHERE agg.n >= 50
    """,
)
def spc_cusum_chart(spark, sf_dir):
    """TS123: tabular CUSUM (k = 0.5, h = 5) per series via the
    windowed S − cummin(S) identity (module header) — Phase-I
    calibration on the first 20%, two ordered window passes,
    floor-1e6."""
    docs = synth.sequences_df(spark, _N).select(
        "doc_id",
        F.expr("CAST(n_tok AS BIGINT)").alias("n"),
        F.expr("CAST(floor(0.2 * n_tok) AS BIGINT)").alias("m0"),
        F.expr("transform(tokens, y -> CAST(y AS BIGINT))").alias("v"),
    )
    p1 = docs.select(
        "*",
        *[
            F.expr(x).alias(k)
            for k, x in _phase1_folds("spark").items()
        ],
    )
    prm = p1.selectExpr(
        "doc_id",
        "n",
        "m0",
        "v",
        "CAST(sy AS DOUBLE) / m0 AS mu",
        "sqrt((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / m0)"
        " / m0) AS sig",
    )
    long = (
        prm.where(F.col("sig") > 0)
        .select(
            "doc_id",
            "n",
            "mu",
            "sig",
            F.posexplode("v").alias("j", "y"),
        )
        .selectExpr(
            "doc_id",
            "n",
            "mu",
            "sig",
            "CAST(j AS BIGINT) + 1 AS t",
            "(y - mu) / sig AS z",
        )
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    s = long.select(
        "doc_id",
        "n",
        "t",
        F.sum(F.expr(f"z - {_KREF}")).over(w).alias("sp"),
        F.sum(F.expr(f"0.0 - z - {_KREF}")).over(w).alias("sm"),
    )
    cus = s.select(
        "doc_id",
        "n",
        "t",
        (
            F.col("sp")
            - F.least(F.lit(0.0), F.min("sp").over(w))
        ).alias("cp"),
        (
            F.col("sm")
            - F.least(F.lit(0.0), F.min("sm").over(w))
        ).alias("cm"),
    )
    agg = cus.groupBy("doc_id").agg(
        F.expr("any_value(n)").alias("n"),
        F.max("cp").alias("max_cp"),
        F.max("cm").alias("max_cm"),
        F.min(F.expr(f"CASE WHEN cp > {_H} THEN t END")).alias(
            "t_up"
        ),
        F.min(F.expr(f"CASE WHEN cm > {_H} THEN t END")).alias(
            "t_dn"
        ),
        F.sum(
            F.expr(
                f"CASE WHEN cp > {_H} OR cm > {_H} THEN 1 ELSE 0 END"
            )
        )
        .cast("long")
        .alias("n_alarm_points"),
    )
    prm_s = prm.select(
        F.col("doc_id").alias("pid"), "mu", "sig"
    )
    return (
        agg.where(F.col("n") >= 50)
        .join(prm_s, F.col("doc_id") == F.col("pid"))
        .selectExpr(
            "doc_id",
            "n",
            _F6.format(x="mu") + " AS mu_phase1",
            _F6.format(x="sig") + " AS sigma_phase1",
            _F6.format(x="max_cp") + " AS max_cusum_up",
            _F6.format(x="max_cm") + " AS max_cusum_dn",
            "CAST(t_up AS BIGINT) AS first_alarm_up",
            "CAST(t_dn AS BIGINT) AS first_alarm_dn",
            "n_alarm_points",
            "CAST(CASE WHEN t_up IS NOT NULL OR t_dn IS NOT NULL"
            " THEN 1 ELSE 0 END AS BIGINT) AS alarmed",
        )
    )
