"""E11 — Levina–Bickel intrinsic-dimension MLE per embedding point
(Levina–Bickel NIPS'04; MacKay–Ghahramani'05 inverse-averaging
comment): how many degrees of freedom does the embedding cloud
LOCALLY use?  The embedding-audit family so far reads neighbor
pathology (E7 hubness), the global spectrum (E8), projection
distortion (E9), and label geometry (E10); intrinsic dimension is
the LOCAL measure — a 64-D space whose points live on a d≪64
manifold retrieves, clusters, and compresses like a d-dimensional
space, and the MLE reads d from nothing but sorted neighbor
distances:

    m̂(x) = (k−1) / Σ_{j=1}^{k−1} ln( T_k(x) / T_j(x) )

with T_j(x) the distance to x's j-th nearest neighbor, k = 10.
Distances are unit-sphere chords (the cosine-space convention of
this table, E10's premise): d² = 2 − 2·cos, so ln(T_k/T_j) =
(ln d²_k − ln d²_j)/2 and the per-point inverse sum is

    invsum(x) = ((k−1)·ln d²_k − Σ_{j<k} ln d²_j) / 2.

Exactness: neighbor identity/rank comes from the certified brute
cosine top-k (E7's machinery, nn_id tiebreak); each pair's d² is
recomputed by ORDER-PINNED indexed folds (dot and both norms as
fixed-order 64-term left folds — identical float tree both engines,
the E10 convention) and round(12)-pinned before the ln; the MLE is
one shared double tree, floor-1e6; NULL-guarded if any of the k
neighbor d² ≤ 0 (a duplicate point makes ln diverge).

Per-point rows (vec_id, d²_k, invsum, m̂); the global readings —
the Levina–Bickel mean of m̂ and the MacKay–Ghahramani corrected
n(k−1)/Σ invsum·2 (average the INVERSES, not the estimates) — are
pytest gates over this output.

Honest (gated) reading — measured: these near-isotropic synthetic
vectors genuinely fill their 64 ambient dimensions, and the
estimator reads high-and-noisy exactly as published: per-point m̂
spans 17–131 (heavy right tail — single points CANNOT resolve
d ≈ 64 from 10 neighbors) with Levina–Bickel mean ≈ 36 and the
MacKay–Ghahramani inverse-average ≈ 33, both far above any
manifold collapse and below the ambient 64 (the documented
finite-sample compression at large d, visible live), while the
planted manifold controls in pytest read their true dimension —
including the subtlety the first draft missed: the chord metric
lives on the unit SPHERE, so a rank-r linear subspace reads r−1
(a plane through the origin normalizes to a great circle, m̂ ≈ 1 —
both the r = 3 → 2 and r = 2 → 1 readings pinned).  LOW readings are trustworthy, HIGH readings
saturate — that asymmetry is the estimator's published character
and exactly what the audit needs (a low m̂ on a real corpus means
collapse, and collapse is the failure being screened for).

Scale shape: the brute top-k is the declared verification tier
(n = 500); at corpus scale the SAME per-point formula runs over
IVF/LSH candidate lists — the MLE consumes only each point's own
k-NN distances, so it inherits whatever neighbor engine the
pipeline already runs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators import ann as A
from dtaidistance_spark.operators.queries import T, register

_K = 10
_D = 64

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _fold(eng: str, term: str) -> str:
    """Order-pinned 64-term DOUBLE left fold over index i."""
    if eng == "spark":
        return (
            f"aggregate(sequence(1, {_D}), CAST(0 AS DOUBLE),"
            f" (a, i) -> a + ({term}))"
        )
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE),"
        f" list_transform(range(1, {_D} + 1),"
        f" i -> CAST({term} AS DOUBLE))), (a, q) -> a + q)"
    )


def _d2(eng: str) -> str:
    el = (
        (lambda arr: f"element_at({arr}, CAST(i AS INT))")
        if eng == "spark"
        else (lambda arr: f"{arr}[i]")
    )
    dot = _fold(eng, f"{el('qe')} * {el('ce')}")
    nq = _fold(eng, f"{el('qe')} * {el('qe')}")
    nc = _fold(eng, f"{el('ce')} * {el('ce')}")
    return (
        f"round(CAST(2 AS DOUBLE) - CAST(2 AS DOUBLE) * ({dot})"
        f" / (sqrt({nq}) * sqrt({nc})), 12)"
    )


# per-query MLE from the k ranked d² values
_INVSUM = f"(({_K} - 1) * ln(dk2) - sumln) / CAST(2 AS DOUBLE)"
_MLE = f"(CAST({_K} - 1 AS DOUBLE) / ({_INVSUM}))"
_G = "mind2 > 0"

_OUT = [
    f"CASE WHEN {_G} THEN {_F6.format(x='dk2')}"
    " ELSE CAST(NULL AS DOUBLE) END AS d2_kth",
    f"CASE WHEN {_G} THEN {_F6.format(x=_INVSUM)}"
    " ELSE CAST(NULL AS DOUBLE) END AS mle_inv",
    f"CASE WHEN {_G} THEN {_F6.format(x=_MLE)}"
    " ELSE CAST(NULL AS DOUBLE) END AS mle_dim",
]


_BRUTE_SCORED_CTE = """scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS nn_id,
             list_inner_product(q.e, c.e)
               / (sqrt(list_inner_product(q.e, q.e))
                  * sqrt(list_inner_product(c.e, c.e))) AS cos,
             q.e AS qe, c.e AS ce
      FROM v q JOIN v c ON q.vec_id != c.vec_id
    )"""


def _oracle(scored_cte: str) -> str:
    """Full MLE oracle from a ``scored`` CTE producing
    ``(query_id, nn_id, cos, qe, ce)`` — parameterized so the
    ANN-graph tier (anngraph_q) swaps only the pair enumeration."""
    return f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    {scored_cte},
    ranked AS (
      SELECT query_id, nn_id, qe, ce,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, nn_id ASC) AS rank
      FROM scored
    ),
    dists AS (
      SELECT query_id, rank, {_d2("duck")} AS d2
      FROM ranked WHERE rank <= {_K}
    ),
    agg AS (
      SELECT query_id AS vec_id,
             CAST(min(d2) AS DOUBLE) AS mind2,
             CAST(max(CASE WHEN rank = {_K} THEN d2 END) AS DOUBLE)
               AS dk2,
             CAST(sum(CASE WHEN rank < {_K} THEN ln(d2) END) AS DOUBLE)
               AS sumln
      FROM dists GROUP BY query_id
    )
    SELECT vec_id, CAST({_K} AS BIGINT) AS k,
           {", ".join(_OUT)}
    FROM agg
    """


@register("intrinsic_dim_mle", oracle=_oracle(_BRUTE_SCORED_CTE))
def intrinsic_dim_mle(spark, sf_dir):
    """E11: Levina–Bickel intrinsic-dimension MLE per point (module
    header) — certified brute top-k neighbors, order-pinned d² folds
    round(12)-pinned, one shared double tree, floor-1e6."""
    emb = T(spark, sf_dir, "embeddings")
    topk = A.brute_cosine_topk(emb, emb, k=_K).select(
        "query_id", "nn_id", "rank"
    )
    return mle_from_topk(emb, topk)


def mle_from_topk(emb, topk):
    """The Levina–Bickel algebra from a ranked neighbor stream
    ``(query_id, nn_id, rank)`` onward — shared by the brute tier
    above and the ANN-graph composition (anngraph_q)."""
    v = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    pairs = (
        topk.join(
            F.broadcast(v.select(F.col("vec_id").alias("query_id"),
                                 F.col("e").alias("qe"))),
            "query_id",
        )
        .join(
            F.broadcast(v.select(F.col("vec_id").alias("nn_id"),
                                 F.col("e").alias("ce"))),
            "nn_id",
        )
        .select("query_id", "rank", F.expr(_d2("spark")).alias("d2"))
    )
    agg = pairs.groupBy(F.col("query_id").alias("vec_id")).agg(
        F.min("d2").cast("double").alias("mind2"),
        F.max(F.when(F.col("rank") == _K, F.col("d2")))
        .cast("double")
        .alias("dk2"),
        F.sum(F.when(F.col("rank") < _K, F.log(F.col("d2"))))
        .cast("double")
        .alias("sumln"),
    )
    return agg.selectExpr(
        "vec_id", f"CAST({_K} AS BIGINT) AS k", *_OUT
    )
