"""Registry queries for the clustering drivers (C1/C2/A3). DTW-kernel
outputs are rows-only here; exact Spark-vs-local parity is gated in
tests/test_clustering.py."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from dtaidistance_spark import kernels as K
from dtaidistance_spark import synth
from dtaidistance_spark.clustering import hierarchical as H
from dtaidistance_spark.clustering import kmeans as KM
from dtaidistance_spark.operators import pairs as P
from dtaidistance_spark.operators.queries import register


def _series(spark, n):
    pdf = synth.sequences_local(n)
    pdf["tokens"] = pdf["tokens"].map(
        lambda t: K.paa(np.asarray(t, dtype=np.float64), 64)
    )
    return spark.createDataFrame(pdf[["doc_id", "tokens", "source"]])


@register("kmeans_dtw")
def kmeans_dtw(spark, sf_dir):
    """DTW k-means with DBA means over 160 synthetic series (k=3)."""
    df = _series(spark, 160)
    assigned, _centers = KM.dtw_kmeans(df, k=3, max_it=2, length=64, window=8)
    return assigned.select(
        "doc_id", "cluster", F.round("dist", 4).alias("dist")
    ).orderBy("doc_id")


@register("kmeans_centers")
def kmeans_centers(spark, sf_dir):
    """The learned DBA centroids themselves (k rows of 64 points)."""
    df = _series(spark, 160)
    _assigned, centers = KM.dtw_kmeans(df, k=3, max_it=2, length=64, window=8)
    rows = [
        (int(c), [float(round(x, 4)) for x in centers[c]]) for c in range(len(centers))
    ]
    return spark.createDataFrame(rows, "cluster int, center array<double>")


@register("hierarchical_dtw")
def hierarchical_dtw(spark, sf_dir):
    """Single-linkage agglomerative clusters at DTW distance <= 6000
    (LB-cascade pairs distributed, union-find on survivors)."""
    df = _series(spark, 120)
    prs = P.dtw_pairs(df, threshold=6000.0, window=8)
    out = H.hierarchical_clusters(prs, df.select("doc_id"), max_dist=6000.0)
    return out.orderBy("doc_id")


@register("medoid_per_source")
def medoid_per_source(spark, sf_dir):
    """Per-source medoid (A3): min row-sum of pair distances within
    each source group, pure DataFrame aggregation."""
    df = _series(spark, 90)
    prs = P.dtw_pairs(df, threshold=1e12, window=8)
    by = df.select("doc_id", F.col("source").alias("cluster"))
    return H.medoids(prs, by=by).withColumn(
        "sum_dist", F.round("sum_dist", 4)
    ).orderBy("cluster")
