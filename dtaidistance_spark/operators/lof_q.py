"""E14 — Local Outlier Factor over the embedding table (Breunig–
Kriegel–Ng–Sander SIGMOD'00): the DENSITY-relative outlier score
the registry's distance dials can't express — robust_outliers and
the Mahalanobis lane flag points far from the GLOBAL center, but a
point on the edge of a tight cluster can be a stronger anomaly than
a point in the middle of a diffuse one; LOF scores each point by
the ratio of its neighbors' local reachability density to its own
(≈ 1 inlier, ≫ 1 outlier), which is exactly the calibration a
mixed-density embedding corpus needs.

Definition (declared conventions): k = 10; neighborhoods are
EXACT-k with the (distance, vec_id) pinned tie-break (row_number,
not the tie-inclusive N_k of the paper — the standard
implementation choice, stated); euclidean distance via the pinned
index-order fold (the euclidean_knn posture);
reach_k(p←o) = max(kdist(o), d(p,o));  lrd(p) = k / Σ reach;
LOF(p) = mean_o lrd(o) / lrd(p).  Both k-sums evaluate as
PINNED-ORDER folds over rank-sorted neighbor arrays, so the float
chains are bit-identical cross-engine; outputs floor-1e6; flag at
LOF > 1.5 (the conventional screen).

First 200 vec_ids (the euclidean_knn bounded-subset posture: the
N² pair join is the declared verification tier; at corpus scale
the SAME lrd/LOF algebra runs over the ANN stack's kNN graph —
T8–T11 provide it — which is the production composition).

Honest (gated) reading — measured, and FAR more extreme than the
draft guessed: LOF collapses to [0.9907, 1.0137], median 1.0009 —
a ±1.4% band where the planted-outlier gates show the dial
swinging past 2 easily — zero of 200 points flagged, top score
1.0137 (vec_id 184).  This is not merely "no outliers": it is
DISTANCE CONCENTRATION, the curse-of-dimensionality signature —
for ~isotropic high-dimensional embeddings every point's kNN ball
looks like every other's, so density ratios cancel to 1 ± O(1/√d)
— the same phenomenon E6's hubness and the intrinsic-dimension
dial read from other angles, here measured as near-total loss of
LOF contrast.  The operational lesson the gate pins: on raw
isotropic embeddings a LOF screen at 1.5 can never fire, and a
pipeline that wants density anomalies must first project to the
data manifold (PCA lane) or use calibrated quantiles, not fixed
thresholds.  Gates: planted dense-cluster + far singleton (LOF of
the singleton ≫ 2, cluster members ≈ 1); planted two-density
corpus (edge-of-tight-cluster point scores above the diffuse
cluster's members — the defining LOF property); uniform-grid null
(all LOF ≈ 1); the k-sum fold identity vs numpy; the corpus
concentration band [0.99, 1.02] + top-score pin.

Scale shape: one broadcast N² pair join (declared tier), two
windowed rank passes inside one exchange, two rank-array folds —
no collects; the ANN-graph composition carries the operator to
100 TB.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_K = 10
_NV = 200

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

# pinned index-order euclidean fold (the euclidean_knn posture)
_EUC_SPARK = (
    "sqrt(aggregate(zip_with(a_emb, b_emb, (x, y) -> (x - y) * (x - y)),"
    " 0D, (acc, v) -> acc + v))"
)
_EUC_DUCK = (
    "sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),"
    " list_transform(range(1, len(a_emb) + 1),"
    " i -> (a_emb[i] - b_emb[i]) * (a_emb[i] - b_emb[i]))),"
    " (acc, v) -> acc + v))"
)


def _oracle(pairs_cte: str) -> str:
    """Full LOF oracle from a ``pairs`` CTE producing
    ``(vec_id, nn_id, d)`` — parameterized so the ANN-graph tier
    (anngraph_q) swaps ONLY the pair enumeration."""
    return f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
      FROM embeddings WHERE vec_id < {_NV}
    ),
    {pairs_cte},
    knn AS (
      SELECT * FROM (
        SELECT vec_id, nn_id, d,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d, nn_id) AS rank
        FROM pairs
      ) WHERE rank <= {_K}
    ),
    kd AS (
      SELECT vec_id, d AS k_dist FROM knn WHERE rank = {_K}
    ),
    reach AS (
      SELECT knn.vec_id, knn.rank,
             CASE WHEN kd.k_dist > knn.d THEN kd.k_dist
                  ELSE knn.d END AS r
      FROM knn JOIN kd ON kd.vec_id = knn.nn_id
    ),
    lrd AS (
      SELECT vec_id,
             CAST({_K} AS DOUBLE) / list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                 list(r ORDER BY rank)),
               (acc, v) -> acc + v) AS lrd
      FROM reach GROUP BY vec_id
    ),
    lof AS (
      SELECT knn.vec_id,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list(lo.lrd ORDER BY knn.rank)),
               (acc, v) -> acc + v)
               / CAST({_K} AS DOUBLE) / any_value(lp.lrd) AS lof
      FROM knn
      JOIN lrd lo ON lo.vec_id = knn.nn_id
      JOIN lrd lp ON lp.vec_id = knn.vec_id
      GROUP BY knn.vec_id
    )
    SELECT lof.vec_id,
           {_F6.format(x="kd.k_dist")} AS k_dist,
           {_F6.format(x="lrd.lrd")} AS lrd,
           {_F6.format(x="lof.lof")} AS lof,
           CAST(CASE WHEN lof.lof > 1.5 THEN 1 ELSE 0 END AS BIGINT)
             AS is_outlier
    FROM lof
    JOIN kd ON kd.vec_id = lof.vec_id
    JOIN lrd ON lrd.vec_id = lof.vec_id
    """


_BRUTE_PAIRS_CTE = f"""pairs AS (
      SELECT a.vec_id, b.vec_id AS nn_id, {_EUC_DUCK.replace(
          "a_emb", "a.emb").replace("b_emb", "b.emb")} AS d
      FROM e a JOIN e b ON a.vec_id <> b.vec_id
    )"""


@register("lof_embeddings", oracle=_oracle(_BRUTE_PAIRS_CTE))
def lof_embeddings(spark, sf_dir):
    """E14: LOF(k=10) over the first 200 embeddings (module header)
    — pinned euclidean folds, exact-k pinned-tie-break
    neighborhoods, rank-ordered k-sum folds, floor-1e6."""
    e = (
        T(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < _NV)
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("emb"),
        )
    )
    a = e.select("vec_id", F.col("emb").alias("a_emb"))
    b = e.select(
        F.col("vec_id").alias("nn_id"), F.col("emb").alias("b_emb")
    )
    pairs = a.join(
        F.broadcast(b), F.col("vec_id") != F.col("nn_id")
    ).select("vec_id", "nn_id", F.expr(_EUC_SPARK).alias("d"))
    return lof_from_pairs(pairs)


def lof_from_pairs(pairs):
    """The LOF algebra from a scored pair stream ``(vec_id, nn_id,
    d)`` onward — shared by the brute verification tier above and the
    ANN-graph composition (anngraph_q.lof_ann), which differ ONLY in
    how the pair stream is enumerated."""
    w = Window.partitionBy("vec_id").orderBy("d", "nn_id")
    knn = (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _K)
        .persist()  # three downstream consumers share the kNN graph
    )
    kd = knn.where(F.col("rank") == _K).select(
        "vec_id", F.col("d").alias("k_dist")
    )
    kd_o = kd.select(
        F.col("vec_id").alias("nn_id"),
        F.col("k_dist").alias("kd_o"),
    )
    reach = knn.join(F.broadcast(kd_o), "nn_id").select(
        "vec_id",
        "rank",
        F.greatest("kd_o", "d").alias("r"),
    )
    lrd = reach.groupBy("vec_id").agg(
        F.expr(
            f"CAST({_K} AS DOUBLE) / aggregate("
            "transform(array_sort(collect_list(struct(rank, r))),"
            " s -> s.r), 0D, (acc, v) -> acc + v)"
        ).alias("lrd")
    )
    lrd_o = lrd.select(
        F.col("vec_id").alias("nn_id"), F.col("lrd").alias("lrd_o")
    )
    lrd_p = lrd.select(
        F.col("vec_id").alias("vec_id"), F.col("lrd").alias("lrd_p")
    )
    lof = (
        knn.join(F.broadcast(lrd_o), "nn_id")
        .join(F.broadcast(lrd_p), "vec_id")
        .groupBy("vec_id")
        .agg(
            F.expr(
                "aggregate(transform(array_sort("
                "collect_list(struct(rank, lrd_o))), s -> s.lrd_o),"
                f" 0D, (acc, v) -> acc + v) / CAST({_K} AS DOUBLE)"
                " / any_value(lrd_p)"
            ).alias("lof")
        )
    )
    return (
        lof.join(kd, "vec_id")
        .join(lrd, "vec_id")
        .selectExpr(
            "vec_id",
            _F6.format(x="k_dist") + " AS k_dist",
            _F6.format(x="lrd") + " AS lrd",
            _F6.format(x="lof") + " AS lof",
            "CAST(CASE WHEN lof > 1.5 THEN 1 ELSE 0 END AS BIGINT)"
            " AS is_outlier",
        )
    )
