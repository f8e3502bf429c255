"""E15 — k-NN leave-one-out label probe over the embedding table
(Cover–Hart IEEE-IT'67 nearest-neighbor rule; the LOO probe as the
standard representation-quality / label-leakage check): train
nothing, hold out each point, predict its label by majority vote
of its k nearest neighbors, compare to the majority-class
baseline.  A curation pipeline runs exactly this before trusting
an embedding space: LIFT over baseline means the space encodes the
label (useful structure — or leakage, if the label was supposed to
be held out); chance means the labels are orthogonal to the
geometry.

Conventions (declared): euclidean distance via the pinned
index-order fold (the euclidean_knn posture); neighborhoods
exact-k with (distance, vec_id) tie-break; votes tie-break to the
SMALLEST label (pinned); k ∈ {1, 5, 10}; first 300 vec_ids (the
bounded N² verification tier — at corpus scale the vote runs over
the ANN stack's kNN graph exactly as E14 documents).

Honest (gated) reading — measured: the label column is orthogonal
to the embedding geometry — LOO accuracy reads 11.0% (k=1), 12.0%
(k=5), 11.0% (k=10) against a 12.0% majority baseline, i.e. lift
0.92 / 1.00 / 0.92 — chance at every k — consistent with E14's
distance-concentration read: a space whose kNN balls are all
alike cannot encode anything, and the probe correctly reports
"no leakage, no structure".  The operational value is the direction of the gate:
when this dial reads lift ≫ 1 on a supposedly label-free
embedding, that IS the leakage alarm.  Gates: planted separated
Gaussian blobs (accuracy > 0.95 at every k, lift ≈ 9×); planted
label-shuffle of the same blobs collapsing to chance; the
1-NN-degeneracy identity (planted duplicate pairs force 1-NN
accuracy 1.0); numpy recompute of all three k rows; the corpus
chance-band reads pinned.

Scale shape: one broadcast pair join (declared tier), one rank
window, one vote aggregate per k — no collects, no partition-less
windows.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_KS = (1, 5, 10)
_NV = 300

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"

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


def _oracle(pairs_cte: str = "") -> str:
    """Full LOO oracle; ``pairs_cte`` overrides the brute pair
    enumeration (the ANN-graph tier in anngraph_q passes a
    candidate-restricted one) — everything downstream is shared."""
    per_k = []
    for k in _KS:
        per_k.append(
            f"""
    votes_{k} AS (
      SELECT vec_id, true_label, nn_label,
             CAST(count(*) AS BIGINT) AS cnt
      FROM knn WHERE rank <= {k}
      GROUP BY vec_id, true_label, nn_label
    ),
    pred_{k} AS (
      SELECT vec_id, true_label, nn_label AS pred FROM (
        SELECT vec_id, true_label, nn_label,
               row_number() OVER (PARTITION BY vec_id
                 ORDER BY cnt DESC, nn_label ASC) AS rn
        FROM votes_{k}
      ) WHERE rn = 1
    ),
    acc_{k} AS (
      SELECT CAST({k} AS BIGINT) AS k,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN pred = true_label THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_correct
      FROM pred_{k}
    )"""
        )
    rows = " UNION ALL ".join(
        f"""SELECT k, n, n_correct,
           {_F6.format(x="(CAST(n_correct AS DOUBLE) / CAST(n AS DOUBLE))")}
             AS accuracy,
           {_F6.format(x="(CAST(base.n_maj AS DOUBLE) / CAST(n AS DOUBLE))")}
             AS majority_baseline,
           {_F6.format(
               x="(CAST(n_correct AS DOUBLE) / CAST(base.n_maj AS DOUBLE))")}
             AS lift
        FROM acc_{k}, base"""
        for k in _KS
    )
    if not pairs_cte:
        pairs_cte = f"""pairs AS (
      SELECT a.vec_id, a.label AS true_label,
             b.label AS nn_label, b.vec_id AS nn_id,
             {_EUC_DUCK.replace("a_emb", "a.emb")
                       .replace("b_emb", "b.emb")} AS d
      FROM e a JOIN e b ON a.vec_id <> b.vec_id
    )"""
    return f"""
    WITH e AS (
      SELECT vec_id, label,
             CAST(embedding AS DOUBLE[]) AS emb
      FROM embeddings WHERE vec_id < {_NV}
    ),
    base AS (
      SELECT CAST(max(c) AS BIGINT) AS n_maj
      FROM (SELECT count(*) AS c FROM e GROUP BY label)
    ),
    {pairs_cte},
    knn AS (
      SELECT * FROM (
        SELECT vec_id, true_label, nn_label, d,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d, nn_id) AS rank
        FROM pairs
      ) WHERE rank <= {max(_KS)}
    ),
    {", ".join(per_k).lstrip(", ")}
    {rows}
    """


@register("knn_loo_classifier", oracle=_oracle())
def knn_loo_classifier(spark, sf_dir):
    """E15: k-NN leave-one-out label probe at k ∈ {1, 5, 10}
    (module header) — pinned euclidean folds, exact-k pinned
    tie-breaks, smallest-label vote tie-break, floor-1e6."""
    e = (
        T(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < _NV)
        .select(
            "vec_id",
            "label",
            F.col("embedding").cast("array<double>").alias("emb"),
        )
    )
    base = (
        e.groupBy("label")
        .agg(F.count("*").alias("c"))
        .agg(F.max("c").cast("long").alias("n_maj"))
    )
    a = e.select(
        "vec_id",
        F.col("label").alias("true_label"),
        F.col("emb").alias("a_emb"),
    )
    b = e.select(
        F.col("vec_id").alias("nn_id"),
        F.col("label").alias("nn_label"),
        F.col("emb").alias("b_emb"),
    )
    pairs = a.join(
        F.broadcast(b), F.col("vec_id") != F.col("nn_id")
    ).select(
        "vec_id",
        "true_label",
        "nn_label",
        "nn_id",
        F.expr(_EUC_SPARK).alias("d"),
    )
    return loo_from_pairs(pairs, base)


def loo_from_pairs(pairs, base):
    """The vote/accuracy algebra from a labeled scored pair stream
    ``(vec_id, true_label, nn_label, nn_id, d)`` onward — shared by
    the brute tier above and the ANN-graph composition
    (anngraph_q.knn_loo_ann)."""
    w = Window.partitionBy("vec_id").orderBy("d", "nn_id")
    knn = (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= max(_KS))
        .persist()
    )
    parts = []
    for k in _KS:
        votes = (
            knn.where(F.col("rank") <= k)
            .groupBy("vec_id", "true_label", "nn_label")
            .agg(F.count("*").cast("long").alias("cnt"))
        )
        wv = Window.partitionBy("vec_id").orderBy(
            F.col("cnt").desc(), F.col("nn_label").asc()
        )
        pred = (
            votes.withColumn("rn", F.row_number().over(wv))
            .where(F.col("rn") == 1)
            .select("vec_id", "true_label", F.col("nn_label").alias("pred"))
        )
        acc = pred.agg(
            F.lit(k).cast("long").alias("k"),
            F.count("*").cast("long").alias("n"),
            F.sum(
                F.when(F.col("pred") == F.col("true_label"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_correct"),
        )
        parts.append(
            acc.crossJoin(F.broadcast(base)).selectExpr(
                "k",
                "n",
                "n_correct",
                _F6.format(
                    x="(CAST(n_correct AS DOUBLE) / CAST(n AS DOUBLE))"
                )
                + " AS accuracy",
                _F6.format(
                    x="(CAST(n_maj AS DOUBLE) / CAST(n AS DOUBLE))"
                )
                + " AS majority_baseline",
                _F6.format(
                    x="(CAST(n_correct AS DOUBLE)"
                    " / CAST(n_maj AS DOUBLE))"
                )
                + " AS lift",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
