"""E19 — categorical (label) assortativity over the ANN candidate
graph (Newman PRE'03 §II "mixing by discrete characteristics"; the
companion to T98's degree assortativity and the significance-bearing
closure of the label-geometry story E10/T69/E15/T96 told piecewise):
on the pinned-LSH candidate graph (anngraph_q's md5-plane buckets —
bit-equal cross-engine by construction), do same-label embeddings
collide in buckets more than chance?

    r = (Σ_c e_cc − Σ_c a_c²) / (1 − Σ_c a_c²)

over the label mixing matrix (e_cc = fraction of edges with both
ends labeled c; a_c = fraction of edge ENDS labeled c), which with
denominators cleared by 4m² is EXACTLY

    r = (4m·ΣE_cc − ΣK_c²) / (4m² − ΣK_c²)

with m = |edges|, E_cc = same-label-c edge count, K_c = Σ degrees of
label-c nodes — every term INT64 from two aggregates over the edge
list, ONE correctly-rounded division, floor-1e6.  r = 1 iff labels
never mix across edges; r < 0 means cross-label preference; the
NULL-guard fires when one label owns every edge end.

Honest (gated) reading — measured (sf0.001): r = −0.002252 on the
500-vector graph (m = 80,265 undirected candidate edges, 7,979
same-label ≈ the ~10% share the label cardinality predicts) — zero
to two decimals, the label-geometry null now carried by a MIXING
statistic over the exact production-shaped neighborhood graph
rather than by score distributions: labels do not even BUCKET
together (LSH buckets are where ANN recall lives, so this is the
operationally-relevant form of "no label structure" — a
label-clustered corpus would pay no recall penalty for
label-filtered search; this one pays full price, exactly what T96
measured from the mining side).  The permutation gate brackets the
value inside the LCG label-shuffle null band; planted label-
clustered embeddings read r > 0.9.  Gates: numpy recompute of
m/E_cc/K_c/r from the same bucket rule; the two-clique hand case
(r = 1) and bipartite hand case (r < 0, exact rational); the
permutation null band; the planted control; corpus pins.

Scale shape: the anngraph bucket equi-join (never N²) + two
map-side-combined aggregates; no windows, no collects.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators.anngraph_q import (
    _cand_cte_duck,
    _spark_cands,
)
from dtaidistance_spark.operators.queries import T, register

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

_R = (
    "CASE WHEN (4 * m * m - sk2) != 0 THEN"
    " CAST(4 * m * ecc - sk2 AS DOUBLE)"
    " / CAST(4 * m * m - sk2 AS DOUBLE)"
    " ELSE CAST(NULL AS DOUBLE) END"
)

_OUT = [
    "CAST(m AS BIGINT) AS n_edges",
    "CAST(ecc AS BIGINT) AS same_label_edges",
    "CAST(sk2 AS BIGINT) AS sum_kc2",
    _F6.format(x=_R) + " AS label_assortativity",
    f"CASE WHEN ({_R}) IS NULL THEN CAST(NULL AS STRING)"
    f" WHEN ({_R}) > 0.05 THEN 'label_clustered'"
    f" WHEN ({_R}) < -0.05 THEN 'label_repelled'"
    " ELSE 'label_neutral' END AS mixing",
]


@register(
    "label_assortativity_ann",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings
    ),
    {_cand_cte_duck("v", "e")},
    ue AS (
      SELECT vec_id AS u, nn_id AS w FROM cand WHERE vec_id < nn_id
    ),
    lab AS (SELECT vec_id, label FROM v),
    el AS (
      SELECT lu.label AS la, lv.label AS lb
      FROM ue
      JOIN lab lu ON lu.vec_id = ue.u
      JOIN lab lv ON lv.vec_id = ue.w
    ),
    ends AS (
      SELECT label, CAST(count(*) AS BIGINT) AS kc FROM (
        SELECT la AS label FROM el
        UNION ALL SELECT lb FROM el
      ) GROUP BY label
    ),
    s AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM el) AS m,
             (SELECT CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END)
                      AS BIGINT) FROM el) AS ecc,
             (SELECT CAST(sum(kc * kc) AS BIGINT) FROM ends) AS sk2
    )
    SELECT {", ".join(_OUT)} FROM s
    """,
)
def label_assortativity_ann(spark, sf_dir):
    """E19: Newman categorical assortativity of labels over the
    pinned-LSH candidate graph (module header) — two INT64
    aggregates, one cleared division."""
    v = T(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("e"),
    )
    cand = _spark_cands(v.select("vec_id", "e"))
    ue = cand.where(F.col("vec_id") < F.col("nn_id")).select(
        F.col("vec_id").alias("u"), F.col("nn_id").alias("w")
    )
    lab = v.select("vec_id", "label")
    el = (
        ue.join(
            F.broadcast(
                lab.select(
                    F.col("vec_id").alias("u"),
                    F.col("label").alias("la"),
                )
            ),
            "u",
        )
        .join(
            F.broadcast(
                lab.select(
                    F.col("vec_id").alias("w"),
                    F.col("label").alias("lb"),
                )
            ),
            "w",
        )
        .select("la", "lb")
        .persist()
    )
    ends = (
        el.select(F.col("la").alias("label"))
        .unionAll(el.select(F.col("lb").alias("label")))
        .groupBy("label")
        .agg(F.count("*").cast("long").alias("kc"))
    )
    sk2 = ends.agg(
        F.sum(F.col("kc") * F.col("kc")).cast("long").alias("sk2")
    )
    agg = el.agg(
        F.count("*").cast("long").alias("m"),
        F.sum(F.when(F.col("la") == F.col("lb"), 1).otherwise(0))
        .cast("long")
        .alias("ecc"),
    )
    return agg.crossJoin(F.broadcast(sk2)).selectExpr(*_OUT)
