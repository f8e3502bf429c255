"""Agglomerative clustering + medoids (SURVEY §2 C2/A3/C4;
``ref:dtaidistance/clustering/hierarchical.py::Hierarchical`` and
``ref:dtaidistance/clustering/medoids.py`` semantics).

Division of labor at scale (the design the reference's N² loop can't
reach): the PAIRS DataFrame is produced distributed by the LB-cascade
join (:func:`dtaidistance_spark.operators.pairs.dtw_pairs` — length
bucketing, LB_Kim/LB_Keogh pruning, banded DTW only on survivors), and
only the surviving sparse pair list is collected for the driver-side
union-find — single-linkage agglomeration below ``max_dist`` needs
exactly those pairs and nothing else (merging in ascending-distance
order over the sparse edge set is Kruskal's algorithm: components at
threshold tau equal single-linkage clusters at tau).

Medoid: argmin over row-sums of the (sparse-or-dense) distance matrix,
as a pure DataFrame aggregation (``min_by`` over the union of both
pair directions) — no driver-side matrix.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def medoids(pairs: DataFrame, by: DataFrame | None = None, id_col: str = "doc_id") -> DataFrame:
    """Medoid = id minimizing the sum of distances to all others.

    ``pairs``: (id_a, id_b, dist) condensed pairs (id_a < id_b).
    ``by``: optional (id, group) assignment — one medoid per group,
    else one global medoid. Pure Spark SQL (union both directions,
    sum, min_by)."""
    both = pairs.select(
        F.col("id_a").alias("_id"), F.col("id_b").alias("_other"), "dist"
    ).unionByName(
        pairs.select(
            F.col("id_b").alias("_id"), F.col("id_a").alias("_other"), "dist"
        )
    )
    if by is not None:
        byr = by.select(F.col(id_col).alias("_id"), "cluster")
        both = both.join(byr, "_id").join(
            byr.withColumnRenamed("_id", "_other").withColumnRenamed(
                "cluster", "_oc"
            ),
            "_other",
        ).where(F.col("cluster") == F.col("_oc"))
        sums = both.groupBy("cluster", "_id").agg(F.sum("dist").alias("_total"))
        return sums.groupBy("cluster").agg(
            F.min_by("_id", F.struct("_total", "_id")).alias("medoid"),
            F.min("_total").alias("sum_dist"),
        )
    sums = both.groupBy("_id").agg(F.sum("dist").alias("_total"))
    return sums.agg(
        F.min_by("_id", F.struct("_total", "_id")).alias("medoid"),
        F.min("_total").alias("sum_dist"),
    )


def single_linkage(pairs_rows, max_dist: float, on_merge=None) -> dict:
    """Driver-side Kruskal/union-find over collected sparse pairs:
    merge ascending by (dist, id_a, id_b) while dist <= max_dist.
    Returns {id: cluster_root} with the root = min id in the cluster
    (canonical, deterministic).

    ``on_merge(merged_root, kept_root, dist)`` is invoked once per
    effective merge in ascending-distance order — the upstream
    ``Hierarchical(merge_hook=...)`` callback surface ([VERIFY] exact
    upstream argument convention once the mount is populated; the
    merged-into-kept direction with the pair distance is the natural
    reading of the public API)."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b, d):
        ra, rb = find(a), find(b)
        if ra == rb:
            return
        lo, hi = (ra, rb) if str(ra) <= str(rb) else (rb, ra)
        parent[hi] = lo
        if on_merge is not None:
            on_merge(hi, lo, d)

    for r in sorted(pairs_rows, key=lambda r: (r["dist"], str(r["id_a"]), str(r["id_b"]))):
        if r["dist"] > max_dist:
            break
        union(r["id_a"], r["id_b"], float(r["dist"]))
    return {x: find(x) for x in list(parent)}


def hierarchical_clusters(
    pairs: DataFrame, all_ids: DataFrame, max_dist: float,
    id_col: str = "doc_id", max_pairs: int = 100_000,
) -> DataFrame:
    """(id, cluster) at threshold ``max_dist``; singletons are their own
    cluster. The pairs side is distributed; only surviving pairs cross
    to the driver.

    Driver-safety: only pairs with ``dist <= max_dist`` are merge-
    relevant for Kruskal, so that filter runs DISTRIBUTED before the
    collect, and a ``limit(max_pairs + 1).count()`` probe fails loudly
    (instead of OOMing the driver) if a loose threshold or weak LB
    prefilter still leaves more than ``max_pairs`` rows — the documented
    recipe then is: rollup/PAA the series first so N is post-aggregation
    small, or tighten ``max_dist``, or raise ``max_pairs`` explicitly."""
    relevant = pairs.select("id_a", "id_b", "dist").where(
        F.col("dist") <= max_dist
    )
    n_probe = relevant.limit(max_pairs + 1).count()
    if n_probe > max_pairs:
        raise ValueError(
            f"hierarchical_clusters: more than {max_pairs} merge-relevant "
            f"pairs would be collected to the driver; rollup the series "
            f"first (small-N post-aggregation regime), tighten max_dist, "
            f"or raise max_pairs explicitly"
        )
    rows = relevant.collect()
    roots = single_linkage(rows, max_dist)
    spark = pairs.sparkSession
    if roots:
        mapping = spark.createDataFrame(
            [(str(k), str(v)) for k, v in roots.items()], f"{id_col} string, cluster string"
        )
    else:
        mapping = spark.createDataFrame([], f"{id_col} string, cluster string")
    return (
        all_ids.select(F.col(id_col).cast("string").alias(id_col))
        .join(mapping, id_col, "left")
        .select(
            id_col,
            F.coalesce("cluster", F.col(id_col)).alias("cluster"),
        )
    )


def hierarchical_clusters_scaled(
    pairs: DataFrame, all_ids: DataFrame, max_dist: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Distributed single-linkage FLAT clustering at threshold — the
    100 TB tier that lifts :func:`hierarchical_clusters`' 100k-pair
    driver cap (round-3 verdict item #7).

    The algebraic identity this rides on: single-linkage clusters at
    threshold τ are EXACTLY the connected components of the graph of
    pairs with dist ≤ τ (Kruskal only ever unions within that edge
    set, and unions everything it connects).  So the scale path is the
    repo's large-star/small-star contraction (``dedup.cc_star`` —
    O(log d) shuffle rounds, one fixed-point aggregate per round, NO
    driver collect, NO pair cap), with the canonical min-id root
    matching ``single_linkage``'s min-string-id convention bit for
    bit.  The driver-side Kruskal stays as the verification twin and
    the dendrogram/merge-hook tier (merge ORDER needs the sorted edge
    stream; the flat cut does not)."""
    from dtaidistance_spark.operators.dedup import cc_star

    relevant = pairs.where(F.col("dist") <= max_dist).select(
        F.col("id_a").cast("string").alias("id_a"),
        F.col("id_b").cast("string").alias("id_b"),
    )
    comp = cc_star(relevant).select(
        F.col("doc_id").alias(id_col),
        F.col("component_id").alias("cluster"),
    )
    return (
        all_ids.select(F.col(id_col).cast("string").alias(id_col))
        .join(comp, id_col, "left")
        .select(
            id_col,
            F.coalesce("cluster", F.col(id_col)).alias("cluster"),
        )
    )


def kmedoids(pairs_rows, ids, k: int = 3, max_it: int = 10,
             max_pairs: int = 100_000):
    """Full PAM iterate (SURVEY C4,
    ``ref:dtaidistance/clustering/kmedoids.py::KMedoids`` semantics) over
    a collected sparse/dense condensed pair list — the post-rollup
    small-N regime, like the agglomerative driver. Missing pairs are
    treated as infinitely far (they were pruned by the LB cascade).

    ``max_pairs`` enforces the small-N contract loudly: PAM is
    driver-side O(N²·k) — past the cap the right move is rolling up the
    series before clustering, not a bigger driver.

    Deterministic: seeds = k ids with smallest (id) after sorting by a
    stable key; ties in assignment go to the lowest medoid id.
    Returns (assignment dict id->medoid, total cost).
    """
    import math

    if max_pairs is not None and len(pairs_rows) > max_pairs:
        raise ValueError(
            f"kmedoids: {len(pairs_rows)} collected pairs exceeds the "
            f"small-N driver cap ({max_pairs}); rollup the series first "
            f"or raise max_pairs explicitly"
        )

    ids = sorted(str(i) for i in ids)
    D: dict = {}
    for r in pairs_rows:
        a, b = str(r["id_a"]), str(r["id_b"])
        D[(a, b)] = D[(b, a)] = float(r["dist"])

    def dist(a, b):
        if a == b:
            return 0.0
        return D.get((a, b), math.inf)

    medoids_ = ids[:k]
    for _ in range(max_it):
        # assign
        assign = {
            i: min(medoids_, key=lambda m: (dist(i, m), m)) for i in ids
        }
        # update: per cluster, the member minimizing summed in-cluster dist
        new = []
        for m in medoids_:
            members = [i for i in ids if assign[i] == m]
            if not members:
                new.append(m)
                continue
            best = min(
                members,
                key=lambda c: (sum(dist(c, x) for x in members), c),
            )
            new.append(best)
        new = sorted(new)
        if new == medoids_:
            break
        medoids_ = new
    assign = {i: min(medoids_, key=lambda m: (dist(i, m), m)) for i in ids}
    cost = sum(dist(i, assign[i]) for i in ids if math.isfinite(dist(i, assign[i])))
    return assign, cost


def linkage_matrix(pairs_rows, n: int):
    """Single-linkage dendrogram in scipy ``linkage`` Z-format (C3,
    ``ref:dtaidistance/clustering/hierarchical.py::LinkageTree`` minus
    the matplotlib wrapper): each of the n-1 rows is
    [cluster_a, cluster_b, dist, size] with new clusters numbered
    n, n+1, ... in merge order. Input: condensed pair rows
    (id_a, id_b, dist) with STRING ids '0'..'n-1' or ints; missing
    pairs are treated as +inf (LB-pruned). Deterministic: ties merge
    the lexicographically smallest pair first.

    Scale shape: like the cluster drivers, this runs post-rollup where
    n is small — the distributed part is producing the (pruned) pairs.
    """
    import numpy as np

    edges = sorted(
        (float(r["dist"]), int(r["id_a"]), int(r["id_b"])) for r in pairs_rows
    )
    parent = list(range(n))
    cluster_of = list(range(n))  # root -> current cluster id
    size = [1] * n
    next_id = n
    Z = []

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def merge(ra, rb, d):
        nonlocal next_id
        ca, cb = cluster_of[ra], cluster_of[rb]
        Z.append([min(ca, cb), max(ca, cb), d, size[ra] + size[rb]])
        parent[ra] = rb
        size[rb] = size[ra] + size[rb]
        cluster_of[rb] = next_id
        next_id += 1

    for d, a, b in edges:
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        merge(ra, rb, d)
        if len(Z) == n - 1:
            break
    # A pruned (disconnected) pair graph runs out of edges early; scipy
    # consumers require exactly n-1 rows, so merge the remaining
    # components at +inf (the documented distance for pruned pairs),
    # smallest root ids first for determinism.
    if len(Z) < n - 1:
        roots = sorted({find(x) for x in range(n)})
        for rb in roots[1:]:
            merge(find(roots[0]), find(rb), float("inf"))
    return np.asarray(Z, dtype=np.float64)


def newick(Z, labels=None) -> str:
    """Serialize a scipy-Z-format linkage matrix as a Newick tree string
    — the rendering half of C3 (``ref:dtaidistance/clustering/
    hierarchical.py::LinkageTree.plot``) without a plotting dependency:
    every standard tree viewer (ete3, iTOL, Bio.Phylo, R ape) reads
    Newick. Branch length = parent merge height − child height (0 for
    leaves); +inf merges (disconnected pruned components) serialize as
    ``inf``. Runs driver-side on the already-tiny post-rollup Z."""
    import numpy as np

    Z = np.asarray(Z, dtype=np.float64)
    n = len(Z) + 1
    if labels is None:
        labels = [str(i) for i in range(n)]

    def height(node):
        return 0.0 if node < n else float(Z[node - n][2])

    def render(node, parent_h):
        bl = parent_h - height(node)
        bls = "inf" if math.isinf(bl) else f"{bl:.6g}"
        if node < n:
            return f"{labels[node]}:{bls}"
        a, b = int(Z[node - n][0]), int(Z[node - n][1])
        h = height(node)
        return f"({render(a, h)},{render(b, h)}):{bls}"

    root = 2 * n - 2
    h = height(root)
    a, b = int(Z[-1][0]), int(Z[-1][1])
    return f"({render(a, h)},{render(b, h)});"


def ascii_dendrogram(Z, labels=None) -> str:
    """Plain-text dendrogram of a scipy-Z linkage matrix (box-drawing
    indentation, children sorted by size then id for a stable layout) —
    the no-dependency stand-in for upstream's matplotlib ``plot``."""
    import numpy as np

    Z = np.asarray(Z, dtype=np.float64)
    n = len(Z) + 1
    if labels is None:
        labels = [str(i) for i in range(n)]
    lines = []

    def walk(node, prefix, tail):
        branch = "└─ " if tail else "├─ "
        if node < n:
            lines.append(prefix + branch + labels[node])
            return
        d = Z[node - n][2]
        ds = "inf" if math.isinf(d) else f"{d:.4g}"
        lines.append(prefix + branch + f"[h={ds}]")
        kids = sorted(
            (int(Z[node - n][0]), int(Z[node - n][1])),
            key=lambda c: (-(1 if c < n else int(Z[c - n][3])), c),
        )
        ext = "   " if tail else "│  "
        for i, k in enumerate(kids):
            walk(k, prefix + ext, i == len(kids) - 1)

    walk(2 * n - 2, "", True)
    return "\n".join(lines)
