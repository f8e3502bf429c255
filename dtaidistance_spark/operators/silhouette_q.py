"""T69 — silhouette coefficient (Rousseeuw JCAM'87): the standard
cluster-quality score, run here on the embedding table's PLANTED
labels — a LABEL-COHERENCE audit ("do the labels correspond to
geometric structure at all?") that a curation pipeline runs before
trusting label-stratified sampling, and the missing validity metric
next to the C1/C4/C6 clusterers themselves.

s(i) = (b_i − a_i)/max(a_i, b_i) with a_i = mean distance to own-label
points and b_i = the smallest mean distance to another label.

Exactness: pair distances are order-pinned 64-term folds + one sqrt
(engine-identical doubles); each per-(point, label) mean is a fold
over the ib-SORTED distance array (order-pinned — no float
aggregate); b_i = MIN over ≤ 9 label means (min is order-free);
nearest_label breaks ties to the smaller label via a PARTITIONED
row_number.  a/b/s floor-1e6.

The honest reading (gated): this corpus' labels are nearly geometric
noise — mean s ≈ 0 with both signs present — which is EXACTLY what
the audit exists to reveal (label-stratified geometric sampling would
be unjustified here).

Scale shape: the exact tier crossJoins the 500-vector sample with a
broadcast build side (the C6 shape); at corpus scale per-label
centroids/medoids summarize the far side first.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dtaidistance_spark.operators.queries import T, register

_F6 = "CAST(floor({x} * 1000000.0 + CAST(0.5 AS DOUBLE)) / 1000000.0 AS DOUBLE)"


def _mean_fold(eng: str) -> str:
    """Order-pinned mean of the double list ``dl``."""
    if eng == "spark":
        return (
            "aggregate(dl, CAST(0 AS DOUBLE), (a, x) -> a + x)"
            " / CAST(size(dl) AS DOUBLE)"
        )
    return (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), dl),"
        " (a, x) -> a + x) / CAST(len(dl) AS DOUBLE)"
    )


_S_TREE = (
    "CASE WHEN greatest(a_i, b_i) > CAST(0 AS DOUBLE) THEN"
    " (b_i - a_i) / greatest(a_i, b_i) ELSE CAST(0 AS DOUBLE) END"
)


@register(
    "silhouette_labels",
    oracle=f"""
    WITH v AS (SELECT vec_id, label, embedding FROM embeddings),
    prs AS MATERIALIZED (
      SELECT a.vec_id AS ia, a.label AS la,
             b.vec_id AS ib, b.label AS lb,
             sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(range(64), k ->
                 (CAST(a.embedding[k + 1] AS DOUBLE)
                  - CAST(b.embedding[k + 1] AS DOUBLE))
                 * (CAST(a.embedding[k + 1] AS DOUBLE)
                    - CAST(b.embedding[k + 1] AS DOUBLE)))),
               (s, x) -> s + x)) AS d
      FROM v a JOIN v b ON a.vec_id != b.vec_id
    ),
    grp AS (
      SELECT ia, la, lb, list(d ORDER BY ib) AS dl
      FROM prs GROUP BY ia, la, lb
    ),
    mn AS (
      SELECT ia, la, lb, {_mean_fold('duck')} AS m FROM grp
    ),
    ab AS (
      SELECT own.ia, own.la AS label, own.m AS a_i,
             oth.lb AS nearest_label, oth.m AS b_i,
             row_number() OVER (PARTITION BY own.ia
                                ORDER BY oth.m, oth.lb) AS rn
      FROM (SELECT * FROM mn WHERE lb = la) own
      JOIN (SELECT * FROM mn WHERE lb != la) oth ON oth.ia = own.ia
    )
    SELECT ia AS vec_id, label, nearest_label,
           {_F6.format(x="a_i")} AS a_i,
           {_F6.format(x="b_i")} AS b_i,
           {_F6.format(x=_S_TREE)} AS s
    FROM ab WHERE rn = 1
    """,
)
def silhouette_labels(spark, sf_dir):
    """T69: per-point silhouette of the planted label structure
    (module header) — order-pinned pair-distance and group-mean folds,
    min-over-labels b_i, deterministic nearest-label ties."""
    v = T(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    a = v.select(
        F.col("vec_id").alias("ia"),
        F.col("label").alias("la"),
        F.col("e").alias("ea"),
    )
    b = v.select(
        F.col("vec_id").alias("ib"),
        F.col("label").alias("lb"),
        F.col("e").alias("eb"),
    )
    d = F.sqrt(
        F.aggregate(
            F.zip_with("ea", "eb", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    prs = (
        a.crossJoin(F.broadcast(b))
        .where(F.col("ia") != F.col("ib"))
        .select("ia", "la", "ib", "lb", d.alias("d"))
    )
    grp = prs.groupBy("ia", "la", "lb").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(ib, d AS dd))),"
            " z -> z.dd)"
        ).alias("dl")
    )
    mn = grp.select(
        "ia", "la", "lb", F.expr(_mean_fold("spark")).alias("m")
    )
    own = mn.where(F.col("lb") == F.col("la")).select(
        "ia", F.col("la").alias("label"), F.col("m").alias("a_i")
    )
    oth = mn.where(F.col("lb") != F.col("la")).select(
        "ia", F.col("lb").alias("nearest_label"), F.col("m").alias("b_i")
    )
    w = Window.partitionBy("ia").orderBy("b_i", "nearest_label")
    ab = (
        own.join(oth, "ia")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    return ab.select(
        F.col("ia").alias("vec_id"),
        "label",
        "nearest_label",
        F.expr(_F6.format(x="a_i")).alias("a_i"),
        F.expr(_F6.format(x="b_i")).alias("b_i"),
        F.expr(_F6.format(x=_S_TREE)).alias("s"),
    )
