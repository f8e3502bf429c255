"""C6 — DBSCAN density clustering over the embedding corpus (Ester et
al. KDD'96): the density-based family the clustering inventory lacked
next to KMeans/KMedoids/Hierarchical — no k, finds noise, and the
core/border/noise trichotomy is exactly what an embedding-curation
pipeline wants (dense regions = redundant mass for SemDeDup-style
thinning; noise = outliers for Mahalanobis-style review).

Determinism: classic DBSCAN's border assignment is order-dependent
("first cluster reached"); here borders attach to the MINIMUM
component id among their core neighbors — a declared deterministic
variant.  Distances are order-pinned 64-term folds over the float32
embeddings cast to double (engine-identical IEEE sequence ⇒ identical
≤ eps² booleans); everything after the threshold is integer algebra.
eps² = 1.36, minPts = 4 (the 0.5%-quantile knee of this corpus'
pair-distance distribution: 206 cores / 191 border / 103 noise, one
dominant dense blob + satellites — the honest near-uniform-corpus
reading, asserted in pytest).

Scale shape: the exact tier self-joins the 500-vector sample with a
broadcast build side; at corpus scale the neighbor candidates come
from the LSH/IVF machinery (T9/T10) exactly as SemDeDup bounds its
pair generation — the kernel and the component/border algebra are
unchanged.  Components use ``dedup.cc_star``
(large-star/small-star, O(log d) rounds with per-round
localCheckpoint) — the epsilon-graph's dense blob is NOT a
near-clique, and label propagation's per-round logical-plan growth on
top of the crossJoin lineage OOMed AQE's plan rendering (observed
live); the oracle recomputes the transitive closure with DuckDB's
recursive CTE (the neardup_components precedent).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators import dedup as D
from dtaidistance_spark.operators.queries import T, register

_EPS2 = "1.36"
_MINNB = 3  # core ⟺ ≥ minPts−1 = 3 neighbors (minPts = 4 incl. self)


def _d2(eng: str) -> str:
    if eng == "spark":
        return (
            "aggregate(sequence(0, 63), CAST(0 AS DOUBLE), (s, k) ->"
            " s + (CAST(element_at(ea, k + 1) AS DOUBLE)"
            " - CAST(element_at(eb, k + 1) AS DOUBLE))"
            " * (CAST(element_at(ea, k + 1) AS DOUBLE)"
            " - CAST(element_at(eb, k + 1) AS DOUBLE)))"
        )
    return (
        "list_reduce(list_prepend(CAST(0 AS DOUBLE),"
        " list_transform(range(64), k ->"
        " (CAST(ea[k + 1] AS DOUBLE) - CAST(eb[k + 1] AS DOUBLE))"
        " * (CAST(ea[k + 1] AS DOUBLE) - CAST(eb[k + 1] AS DOUBLE)))),"
        " (s, x) -> s + x)"
    )


@register(
    "dbscan_embeddings",
    oracle=f"""
    WITH RECURSIVE v AS (
      SELECT vec_id, label, embedding FROM embeddings
    ),
    prs AS MATERIALIZED (
      SELECT a.vec_id AS ia, b.vec_id AS ib
      FROM (SELECT vec_id, embedding AS ea FROM v) a
      JOIN (SELECT vec_id, embedding AS eb FROM v) b
        ON a.vec_id < b.vec_id
      WHERE {_d2('duck')} <= CAST({_EPS2} AS DOUBLE)
    ),
    und AS (
      SELECT ia AS s, ib AS d FROM prs
      UNION ALL SELECT ib, ia FROM prs
    ),
    deg AS (
      SELECT v.vec_id, coalesce(u.c, 0) AS nb_cnt
      FROM v LEFT JOIN (
        SELECT s, CAST(count(*) AS BIGINT) AS c FROM und GROUP BY s
      ) u ON u.s = v.vec_id
    ),
    cores AS (SELECT vec_id FROM deg WHERE nb_cnt >= {_MINNB}),
    ce AS (
      SELECT s, d FROM und
      WHERE s IN (SELECT vec_id FROM cores)
        AND d IN (SELECT vec_id FROM cores)
    ),
    reach(id, r) AS (
      SELECT s, s FROM ce
      UNION
      SELECT s, d FROM ce
      UNION
      SELECT ce.s, reach.r FROM ce JOIN reach ON ce.d = reach.id
    ),
    comp0 AS (SELECT id, min(r) AS comp FROM reach GROUP BY id),
    corec AS (
      SELECT c.vec_id, coalesce(k.comp, c.vec_id) AS comp
      FROM cores c LEFT JOIN comp0 k ON k.id = c.vec_id
    ),
    borderc AS (
      SELECT u.s AS vec_id, min(cc.comp) AS comp
      FROM und u JOIN corec cc ON cc.vec_id = u.d
      WHERE u.s NOT IN (SELECT vec_id FROM cores)
      GROUP BY u.s
    ),
    assign AS (
      SELECT vec_id, comp, 'core' AS role FROM corec
      UNION ALL
      SELECT vec_id, comp, 'border' AS role FROM borderc
    ),
    sizes AS (
      SELECT comp, CAST(count(*) AS BIGINT) AS n_members
      FROM assign GROUP BY comp
    )
    SELECT d.vec_id, v.label, d.nb_cnt,
           coalesce(a.role, 'noise') AS role,
           a.comp AS cluster,
           s.n_members
    FROM deg d
    JOIN v ON v.vec_id = d.vec_id
    LEFT JOIN assign a ON a.vec_id = d.vec_id
    LEFT JOIN sizes s ON s.comp = a.comp
    """,
)
def dbscan_embeddings(spark, sf_dir):
    """C6: DBSCAN(eps²=1.36, minPts=4) over the embedding table
    (module header) — order-pinned fold distances, integer
    core/border/noise algebra, min-label components (the
    cc_star machinery) with isolated cores as their own
    singleton clusters, borders to the MINIMUM core-neighbor
    component (declared deterministic variant)."""
    v = T(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    )
    a = v.select(
        F.col("vec_id").alias("ia"),
        F.col("embedding").cast("array<double>").alias("ea"),
    )
    b = v.select(
        F.col("vec_id").alias("ib"),
        F.col("embedding").cast("array<double>").alias("eb"),
    )
    # crossJoin + where + Column-API lambdas (the cosine_neardup_pairs
    # shape): SQL-parsed lambdas inside a non-equi join condition hit
    # a Catalyst attribute-binding internal error ('Could not find ea'
    # observed live)
    d2 = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    prs = (
        a.crossJoin(F.broadcast(b))
        .where(F.col("ia") < F.col("ib"))
        .withColumn("d2", d2)
        .where(F.col("d2") <= F.expr(f"CAST({_EPS2} AS DOUBLE)"))
        .select("ia", "ib")
        .persist()
    )
    und = prs.union(
        prs.select(F.col("ib").alias("ia"), F.col("ia").alias("ib"))
    )
    deg = (
        v.join(
            und.groupBy(F.col("ia").alias("vec_id")).agg(
                F.count(F.lit(1)).cast("long").alias("nb_cnt")
            ),
            "vec_id",
            "left",
        )
        .select(
            "vec_id",
            "label",
            F.coalesce("nb_cnt", F.lit(0)).cast("long").alias("nb_cnt"),
        )
    )
    cores = deg.where(F.col("nb_cnt") >= _MINNB).select("vec_id")
    ce = (
        prs.join(
            cores.select(F.col("vec_id").alias("ia")), "ia"
        ).join(cores.select(F.col("vec_id").alias("ib")), "ib")
        .select(
            F.col("ia").alias("id_a"), F.col("ib").alias("id_b")
        )
    )
    # cc_star, not label propagation: the epsilon-graph's dense blob
    # is NOT a near-clique — its diameter is long, and propagation's
    # per-round logical-plan growth on top of the crossJoin lineage
    # OOMed AQE's plan rendering (observed live); the star variant
    # localCheckpoints per round and converges in O(log d)
    comp0 = D.cc_star(ce).select(
        F.col("doc_id").alias("vec_id"),
        F.col("component_id").alias("comp"),
    )
    corec = cores.join(comp0, "vec_id", "left").select(
        "vec_id", F.coalesce("comp", F.col("vec_id")).alias("comp")
    )
    borderc = (
        und.join(
            cores.select(F.col("vec_id").alias("ib")), "ib"
        )
        .join(
            cores.select(F.col("vec_id").alias("ia")),
            "ia",
            "left_anti",
        )
        .join(
            corec.select(
                F.col("vec_id").alias("ib"), F.col("comp")
            ),
            "ib",
        )
        .groupBy(F.col("ia").alias("vec_id"))
        .agg(F.min("comp").alias("comp"))
    )
    assign = corec.select(
        "vec_id", "comp", F.lit("core").alias("role")
    ).unionByName(
        borderc.select("vec_id", "comp", F.lit("border").alias("role"))
    )
    sizes = assign.groupBy("comp").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    out = (
        deg.join(assign, "vec_id", "left")
        .join(sizes, "comp", "left")
        .select(
            "vec_id",
            "label",
            "nb_cnt",
            F.coalesce("role", F.lit("noise")).alias("role"),
            F.col("comp").alias("cluster"),
            "n_members",
        )
    )
    return out
