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
from dtaidistance_spark.operators import qutil as Q
from dtaidistance_spark.operators.queries import register


def _series(spark, n):
    return Q.paa_series_df(spark, n, length=64, with_source=True)


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
    return Q.jsonify_complex(
        spark.createDataFrame(rows, "cluster int, center array<double>")
    )


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


@register("kmedoids_dtw")
def kmedoids_dtw(spark, sf_dir):
    """C4 full PAM: k-medoids over the distributed DTW pair list
    (assign/update iterate driver-side on the collected sparse pairs)."""
    df = _series(spark, 90)
    prs = P.dtw_pairs(df, threshold=1e12, window=8)
    ids = [r.doc_id for r in df.select("doc_id").collect()]
    assign, cost = H.kmedoids(prs.collect(), ids, k=3)
    rows = sorted(assign.items())
    out = spark.createDataFrame(rows, "doc_id string, medoid string")
    return out.orderBy("doc_id")


@register("local_concurrences_seq")
def local_concurrences_seq(spark, sf_dir):
    """M6: motif discovery — strongest non-trivial self-similarity paths
    per synthetic series (Arrow-batched affinity DP per row)."""
    import pandas as pd

    df = _series(spark, 12).select("doc_id", "tokens")

    def kernel(batches):
        for b in batches:
            out = {"doc_id": [], "rank": [], "score": [], "i0": [],
                   "j0": [], "i1": [], "j1": [], "path_len": []}
            for doc, toks in zip(b["doc_id"], b["tokens"]):
                s = np.asarray(toks, dtype=np.float64)
                s = (s - s.mean()) / (s.std() + 1e-9)
                lcs = K.local_concurrences(
                    s, gamma=0.5, tau=0.6, penalty=1.0, min_len=8, k=2,
                )
                for rank, lc in enumerate(lcs):
                    (i0, j0), (i1, j1) = lc["path"][0], lc["path"][-1]
                    out["doc_id"].append(doc)
                    out["rank"].append(rank)
                    out["score"].append(round(lc["score"], 4))
                    out["i0"].append(i0); out["j0"].append(j0)
                    out["i1"].append(i1); out["j1"].append(j1)
                    out["path_len"].append(len(lc["path"]))
            yield pd.DataFrame(out)

    return df.mapInPandas(
        kernel,
        "doc_id string, rank int, score double, i0 int, j0 int, "
        "i1 int, j1 int, path_len int",
    ).orderBy("doc_id", "rank")


@register("linkage_tree")
def linkage_tree(spark, sf_dir):
    """C3 (computation half): single-linkage dendrogram in scipy
    Z-format over the DTW pair distances of 80 synthetic series —
    distributed LB-cascade pairs, driver-side union-find merges (the
    plotting wrapper remains out of scope). Rows-only."""
    # integer string ids '0'..'79' for Z-format numbering
    n = 80
    pdf = synth.sequences_local(n)
    data = [
        (str(i), [float(x) for x in K.paa(np.asarray(t, dtype=np.float64), 64)])
        for i, t in enumerate(pdf["tokens"])
    ]
    df = spark.createDataFrame(data, "doc_id string, tokens array<double>")
    rows = P.dtw_pairs(df, threshold=float("inf"), window=8).collect()
    Z = H.linkage_matrix([r.asDict() for r in rows], n)
    out = [
        (int(i), float(a), float(b), round(float(d), 4), int(s))
        for i, (a, b, d, s) in enumerate(Z.tolist())
    ]
    return spark.createDataFrame(
        out, "merge int, cluster_a double, cluster_b double, dist double, size int"
    )


@register(
    "kmeans_check",
    oracle="""
    SELECT 160 AS n_docs, 3 AS n_clusters, true AS dists_ok
    """,
)
def kmeans_check(spark, sf_dir):
    """Driver-checkable projection of the DTW k-means driver (C1):
    every one of the 160 series assigned, exactly k=3 non-empty
    clusters on this well-spread synthetic corpus, all assignment
    distances finite and nonnegative."""
    df = _series(spark, 160)
    assigned, _centers = KM.dtw_kmeans(df, k=3, max_it=2, length=64, window=8)
    return assigned.agg(
        F.count(F.lit(1)).cast("int").alias("n_docs"),
        F.countDistinct("cluster").cast("int").alias("n_clusters"),
        (
            F.min("dist") >= 0
        ).__and__(
            F.max(F.isnan("dist").cast("int")) == 0
        ).alias("dists_ok"),
    )


@register(
    "linkage_check",
    oracle="SELECT 79 AS n_merges, 80 AS final_size, true AS sizes_ok",
)
def linkage_check(spark, sf_dir):
    """Invariant projection of the scipy-format linkage (C3): exactly
    n-1 merges, the final merge spans all n leaves, and every merge's
    size is >= 2 and nondecreasing-bounded by n."""
    z = linkage_tree(spark, sf_dir)
    return z.agg(
        F.count(F.lit(1)).cast("int").alias("n_merges"),
        F.max("size").cast("int").alias("final_size"),
        ((F.min("size") >= 2) & (F.max("size") <= 80)).alias("sizes_ok"),
    )


@register(
    "cluster_invariants",
    oracle="""
    SELECT 'hierarchical' AS driver, 120 AS n_assigned, true AS ok
    UNION ALL
    SELECT 'kmedoids', 90, true
    UNION ALL
    SELECT 'medoids', 3, true
    """,
)
def cluster_invariants(spark, sf_dir):
    """Invariant projections of the remaining cluster drivers in one
    oracled query: hierarchical assigns every series to a cluster
    rooted at a member id; kmedoids assigns all 90 series to one of
    exactly 3 medoids; per-source medoids yield one row per source
    with finite nonnegative distance sums."""
    h = hierarchical_dtw(spark, sf_dir)
    h_row = h.agg(
        F.lit("hierarchical").alias("driver"),
        F.count(F.lit(1)).cast("int").alias("n_assigned"),
        (F.sum(F.col("cluster").isNull().cast("int")) == 0).alias("ok"),
    )
    km = kmedoids_dtw(spark, sf_dir)
    km_row = km.agg(
        F.lit("kmedoids").alias("driver"),
        F.count(F.lit(1)).cast("int").alias("n_assigned"),
        (F.countDistinct("medoid") == 3).alias("ok"),
    )
    md = medoid_per_source(spark, sf_dir)
    md_row = md.agg(
        F.lit("medoids").alias("driver"),
        F.count(F.lit(1)).cast("int").alias("n_assigned"),
        ((F.min("sum_dist") >= 0) & (F.countDistinct("cluster") == 3)).alias("ok"),
    )
    return h_row.unionByName(km_row).unionByName(md_row)


@register(
    "local_concurrences_check",
    oracle="SELECT 19 AS n_motifs, 12 AS n_docs, true AS bounds_ok",
)
def local_concurrences_check(spark, sf_dir):
    """Invariant projection of motif discovery (M6): the deterministic
    12-series corpus yields exactly 19 motifs across all 12 docs
    (golden counts), each with rank in {0, 1}, path length >= the
    min_len=8 floor, and monotone endpoints (i0 <= i1, j0 <= j1)."""
    out = local_concurrences_seq(spark, sf_dir)
    return out.agg(
        F.count(F.lit(1)).cast("int").alias("n_motifs"),
        F.countDistinct("doc_id").cast("int").alias("n_docs"),
        (
            (F.max("rank") <= 1)
            & (F.min("path_len") >= 8)
            & (F.sum((F.col("i0") <= F.col("i1")).cast("int")) == F.count(F.lit(1)))
            & (F.sum((F.col("j0") <= F.col("j1")).cast("int")) == F.count(F.lit(1)))
            & (F.min("score") >= 0)
        ).alias("bounds_ok"),
    )


@register("hierarchical_dtw_scaled")
def hierarchical_dtw_scaled(spark, sf_dir):
    """C2-scale (round-3 verdict item #7): the SAME single-linkage
    flat clustering as ``hierarchical_dtw``, computed by large-star/
    small-star contraction over the thresholded pair graph instead of
    a driver-side Kruskal — single-linkage components at threshold τ
    ARE the connected components of the dist ≤ τ graph, so the scale
    tier is exact, capless, and collect-free (O(log d) shuffle
    rounds); gated row-for-row equal to the Kruskal twin."""
    df = _series(spark, 120)
    prs = P.dtw_pairs(df, threshold=6000.0, window=8)
    out = H.hierarchical_clusters_scaled(
        prs, df.select("doc_id"), max_dist=6000.0
    )
    return out.orderBy("doc_id")


@register(
    "hierarchical_scaled_check",
    oracle="""
    SELECT 120 AS n_ids, 120 AS n_match, true AS all_match
    """,
)
def hierarchical_scaled_check(spark, sf_dir):
    """The C2-scale equality contract as a driver-artifact row: the
    star-contraction clustering agrees with the driver-side Kruskal
    on every id (the canonical min-id roots coincide by the
    components identity)."""
    a = hierarchical_dtw(spark, sf_dir).withColumnRenamed(
        "cluster", "c_kruskal"
    )
    b = hierarchical_dtw_scaled(spark, sf_dir).withColumnRenamed(
        "cluster", "c_star"
    )
    j = a.join(b, "doc_id")
    return j.agg(
        F.count(F.lit(1)).cast("int").alias("n_ids"),
        F.sum((F.col("c_kruskal") == F.col("c_star")).cast("int"))
        .cast("int")
        .alias("n_match"),
        (
            F.sum((F.col("c_kruskal") != F.col("c_star")).cast("int"))
            == 0
        ).alias("all_match"),
    )
