"""Clustering gates (C1/C2/A3): Spark k-means == single-process twin
exactly; medoids == brute numpy; single-linkage == naive agglomerative
reference."""

import numpy as np
import pandas as pd
import pytest

from dtaidistance_spark import kernels as K
from dtaidistance_spark import synth
from dtaidistance_spark.clustering import hierarchical as H
from dtaidistance_spark.clustering import kmeans as KM


@pytest.fixture(scope="module")
def series_pdf():
    pdf = synth.sequences_local(80)
    pdf["tokens"] = pdf["tokens"].map(
        lambda t: K.paa(np.asarray(t, dtype=np.float64), 64)
    )
    return pdf[["doc_id", "tokens", "source"]]


def test_kmeans_spark_matches_local_exactly(spark, series_pdf):
    df = spark.createDataFrame(series_pdf)
    assigned, centers = KM.dtw_kmeans(df, k=3, max_it=2, length=64, window=8)
    got = assigned.toPandas().sort_values("doc_id").reset_index(drop=True)

    hashes = {
        r.doc_id: r.h
        for r in spark.createDataFrame(series_pdf[["doc_id"]])
        .selectExpr("doc_id", "xxhash64(doc_id) AS h")
        .collect()
    }
    want, centers_l, _performed = KM.dtw_kmeans_local(
        series_pdf, k=3, max_it=2, length=64, window=8,
        hash_fn=lambda d: hashes[d],
    )
    want = want.sort_values("doc_id").reset_index(drop=True)
    assert list(got["cluster"]) == list(want["cluster"])
    assert np.allclose(got["dist"], want["dist"], rtol=0, atol=0)
    assert np.array_equal(centers, centers_l)
    assert got["cluster"].nunique() > 1  # non-degenerate


def test_medoids_match_numpy(spark, series_pdf):
    from dtaidistance_spark.operators import pairs as P

    sub = series_pdf.head(40)
    df = spark.createDataFrame(sub)
    prs = P.dtw_pairs(df, threshold=1e12, window=8)
    got = H.medoids(prs).collect()[0]

    mats = np.stack([np.asarray(t) for t in sub["tokens"]])
    lens = np.full(len(mats), 64, dtype=np.int64)
    D = np.zeros((len(mats), len(mats)))
    for i in range(len(mats)):
        D[i] = K.dtw_distance_batch(mats[i], mats, lens, window=8)
    sums = D.sum(axis=1)
    want_idx = int(np.argmin(sums))
    assert got["medoid"] == sub["doc_id"].iloc[want_idx]
    assert abs(got["sum_dist"] - sums[want_idx]) < 1e-6


def naive_single_linkage(ids, dist, max_dist):
    clusters = [{i} for i in range(len(ids))]
    while True:
        best = None
        for a in range(len(clusters)):
            for b in range(a + 1, len(clusters)):
                d = min(dist[i][j] for i in clusters[a] for j in clusters[b])
                if d <= max_dist and (best is None or d < best[0]):
                    best = (d, a, b)
        if best is None:
            break
        _, a, b = best
        clusters[a] |= clusters[b]
        del clusters[b]
    out = {}
    for c in clusters:
        root = min(ids[i] for i in c)
        for i in c:
            out[ids[i]] = root
    return out


def test_single_linkage_matches_naive():
    rng = np.random.default_rng(11)
    n = 18
    ids = [f"d{i:02d}" for i in range(n)]
    D = rng.uniform(1, 10, (n, n))
    D = (D + D.T) / 2
    np.fill_diagonal(D, 0)
    rows = [
        {"id_a": ids[i], "id_b": ids[j], "dist": float(D[i, j])}
        for i in range(n)
        for j in range(i + 1, n)
    ]
    for tau in (2.0, 3.5, 6.0):
        roots = H.single_linkage(rows, tau)
        got = {i: roots.get(i, i) for i in ids}
        want = naive_single_linkage(ids, D, tau)
        assert got == want, tau


def test_hierarchical_spark_end_to_end(spark, series_pdf):
    from dtaidistance_spark.operators import pairs as P

    df = spark.createDataFrame(series_pdf)
    prs = P.dtw_pairs(df, threshold=6000.0, window=8)
    out = H.hierarchical_clusters(prs, df.select("doc_id"), max_dist=6000.0)
    pdf = out.toPandas()
    assert len(pdf) == len(series_pdf)  # every doc assigned
    # cluster label is the min doc_id of the cluster
    for c, grp in pdf.groupby("cluster"):
        assert c == grp["doc_id"].min()


def test_linkage_matrix_structure():
    """Z-format invariants + exact merges on a hand-checkable instance:
    points on a line at 0, 1, 10, 12 -> merges (0,1)@1, (10,12)@2,
    then the two clusters @ gap 9."""
    from dtaidistance_spark.clustering.hierarchical import linkage_matrix

    pts = [0.0, 1.0, 10.0, 12.0]
    rows = [
        {"id_a": i, "id_b": j, "dist": abs(pts[i] - pts[j])}
        for i in range(4) for j in range(i + 1, 4)
    ]
    Z = linkage_matrix(rows, 4)
    assert Z.shape == (3, 4)
    assert Z[0].tolist() == [0, 1, 1.0, 2]
    assert Z[1].tolist() == [2, 3, 2.0, 2]
    assert Z[2].tolist() == [4, 5, 9.0, 4]
    # monotone merge distances (single linkage property)
    assert (np.diff(Z[:, 2]) >= 0).all()


def test_kmeanspp_spark_matches_local_and_spreads(spark, series_pdf):
    """Deterministic kmeans++ (farthest-point under DTW): the Spark
    seeding equals the local twin bit-exactly (incl. the largest-id
    tie order), and the full driver accepts init='kmeans++' with
    identical Spark==local results."""
    df = spark.createDataFrame(series_pdf)
    hashes = {
        r.doc_id: r.h
        for r in spark.createDataFrame(series_pdf[["doc_id"]])
        .selectExpr("doc_id", "xxhash64(doc_id) AS h")
        .collect()
    }
    got = KM.init_centers_pp(
        df.selectExpr("doc_id", "cast(tokens as array<double>) tokens"),
        k=3, length=64, window=8,
    )
    want = KM.kmeanspp_centers_local(
        series_pdf, k=3, length=64, window=8, hash_fn=lambda d: hashes[d]
    )
    assert np.array_equal(got, want)
    # seeds are spread: pairwise DTW distances all strictly positive
    for i in range(3):
        for j in range(i + 1, 3):
            assert K.dtw_distance(got[i], got[j], window=8) > 0

    assigned, centers = KM.dtw_kmeans(
        df, k=3, max_it=2, length=64, window=8, init="kmeans++"
    )
    g = assigned.toPandas().sort_values("doc_id").reset_index(drop=True)
    w, centers_l, _ = KM.dtw_kmeans_local(
        series_pdf, k=3, max_it=2, length=64, window=8,
        hash_fn=lambda d: hashes[d], init="kmeans++",
    )
    w = w.sort_values("doc_id").reset_index(drop=True)
    assert list(g["cluster"]) == list(w["cluster"])
    assert np.array_equal(centers, centers_l)
    assert g["cluster"].nunique() > 1


def test_drop_stddev_trims_outlier_from_update(spark):
    """drop_stddev (upstream's per-cluster variance monitor): a far
    outlier is excluded from the DBA update — the k=1 center equals
    the DBA of the tight blob alone — and Spark == local twin."""
    from dtaidistance_spark.operators import rollup as R

    rng = np.random.default_rng(3)
    base = np.sin(np.linspace(0, 6, 64)) * 100
    rows = [(f"d{i:02d}", (base + rng.normal(0, 1, 64)).tolist()) for i in range(20)]
    rows.append(("d99", (base + 5000.0).tolist()))  # extreme outlier
    pdf = pd.DataFrame({"doc_id": [r[0] for r in rows], "tokens": [r[1] for r in rows]})
    df = spark.createDataFrame(
        [(a, [float(x) for x in b]) for a, b in rows],
        "doc_id string, tokens array<double>",
    )
    _assigned, centers = KM.dtw_kmeans(
        df, k=1, max_it=1, length=64, window=8, drop_stddev=2.0
    )
    blob = [np.asarray(b, dtype=np.float64) for a, b in rows if a != "d99"]
    want, _, _ = R.rollup_group(blob, max_members=256, dba_window=8,
                                dba_max_it=2, barycenter_len=64)
    np.testing.assert_array_equal(centers[0], want)

    hashes = {
        r.doc_id: r.h
        for r in df.selectExpr("doc_id", "xxhash64(doc_id) AS h").collect()
    }
    _w, centers_l, _ = KM.dtw_kmeans_local(
        pdf, k=1, max_it=1, length=64, window=8,
        hash_fn=lambda d: hashes[d], drop_stddev=2.0,
    )
    np.testing.assert_allclose(centers, centers_l, rtol=0, atol=1e-9)

    # without the trim the outlier drags the center
    _a2, centers_raw = KM.dtw_kmeans(df, k=1, max_it=1, length=64, window=8)
    assert np.abs(centers_raw[0] - want).max() > 10


def test_hierarchical_driver_cap_guard(spark, series_pdf):
    """Loose thresholds must fail loudly before collecting O(N^2) rows
    to the driver — and below the cap the prefiltered collect must give
    the identical clustering."""
    from dtaidistance_spark.operators import pairs as P

    df = spark.createDataFrame(series_pdf[["doc_id", "tokens"]])
    prs = P.dtw_pairs(df, threshold=1e12, window=8)
    ids = df.select("doc_id")
    with pytest.raises(ValueError, match="merge-relevant"):
        H.hierarchical_clusters(prs, ids, max_dist=1e12, max_pairs=10)
    a = {
        (r["doc_id"], r["cluster"])
        for r in H.hierarchical_clusters(prs, ids, max_dist=6000.0).collect()
    }
    b = {
        (r["doc_id"], r["cluster"])
        for r in H.hierarchical_clusters(
            prs, ids, max_dist=6000.0, max_pairs=100_000
        ).collect()
    }
    assert a == b and len(a) > 0


def test_kmedoids_driver_cap_guard():
    rows = [
        {"id_a": str(i), "id_b": str(j), "dist": 1.0}
        for i in range(20)
        for j in range(i + 1, 20)
    ]
    with pytest.raises(ValueError, match="small-N driver cap"):
        H.kmedoids(rows, [str(i) for i in range(20)], k=2, max_pairs=50)


def test_hierarchical_scaled_equals_kruskal(spark, sf_dir):
    """C2-scale: star-contraction flat clustering == driver Kruskal,
    row for row, on the corpus pair graph."""
    from dtaidistance_spark.operators.clustering_q import (
        hierarchical_dtw,
        hierarchical_dtw_scaled,
    )

    a = hierarchical_dtw(spark, sf_dir).toPandas()
    b = hierarchical_dtw_scaled(spark, sf_dir).toPandas()
    assert a.equals(b)


def test_hierarchical_scaled_deep_chain_and_no_cap(spark):
    """The two properties the scale tier exists for: (a) a 300-node
    PATH graph (component diameter 300 — label propagation would need
    300 rounds; star contraction converges in O(log d)) clusters to
    ONE component with the min-id root; (b) more than 100k merge-
    relevant pairs — where hierarchical_clusters fails loudly by
    design — processes fine with the capless tier."""
    import pytest
    from pyspark.sql import functions as F

    from dtaidistance_spark.clustering.hierarchical import (
        hierarchical_clusters,
        hierarchical_clusters_scaled,
    )

    # (a) deep chain
    chain = spark.range(299).selectExpr(
        "format_string('n%03d', CAST(id AS INT)) AS id_a",
        "format_string('n%03d', CAST(id + 1 AS INT)) AS id_b",
        "CAST(1.0 AS DOUBLE) AS dist",
    )
    ids = spark.range(300).selectExpr(
        "format_string('n%03d', CAST(id AS INT)) AS doc_id"
    )
    out = hierarchical_clusters_scaled(chain, ids, max_dist=2.0).toPandas()
    assert (out.cluster == "n000").all()

    # (b) capless: ~125k pairs (500 ids x 500 sampled partners)
    big = (
        spark.range(500)
        .selectExpr("CAST(id AS STRING) AS id_a")
        .crossJoin(
            spark.range(500).selectExpr("CAST(id AS STRING) AS id_b")
        )
        .where("id_a < id_b")
        .withColumn("dist", F.lit(1.0))
    )
    assert big.count() > 100_000
    ids2 = spark.range(500).selectExpr("CAST(id AS STRING) AS doc_id")
    with pytest.raises(ValueError, match="more than 100000"):
        hierarchical_clusters(big, ids2, max_dist=2.0)
    out2 = hierarchical_clusters_scaled(big, ids2, max_dist=2.0)
    assert out2.where("cluster != '0'").count() == 0  # one component
