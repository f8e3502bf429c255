"""C6b — EXACT DBSCAN via certificate-based filter-and-verify over
the pinned md5-plane ANN candidate graph (the round-4 verdict's item
#2: "compose C6 over the bit-equal md5-plane ANN graph exactly as
lof_ann does").  The naive composition — run dbscan_q's algebra on
candidate neighbors only — CANNOT meet the verdict's zero-flag-flip
gate on this corpus, and that is measurable, not a guess: the
embeddings are unit-norm isotropic (measured ||x|| = 1 ± 1e-7), so
ε²=1.36 neighbors sit at θ ≈ 1.21 rad vs π/2 random — per-bit
hyperplane disagreement 0.382 vs 0.5 — and the 16×4 graph misses
51/601 ε-edges at sf0.01, flipping 25/206 cores.  No LSH/metric
family prunes AND recalls here (distance concentration: a 1-D
projection of an ε-ball at 71° angular radius spans the data's whole
projected spread — measured: shifted-grid 2eps-cells admit 100% of
all pairs as candidates).

So this module does what the repo's PPJoin/prefix-filter tier does
for Jaccard: makes the pruning stage's errors ONE-SIDED and verifies
the rest exactly, so the output equals the exact tier BY CONSTRUCTION
on ANY input — the zero-flip gate holds as a theorem, with the
isotropy cost showing up honestly in the (oracled) stage accounting
instead of silently in wrong answers.

Stages (Ester et al. KDD'96 semantics; dbscan_q's declared
deterministic min-component variant):

1. CANDIDATES — anngraph_q's pinned 16-table × 4-bit md5-plane
   bucket join (``_spark_cands``), exact pinned-fold d² only on
   candidate pairs → ann ε-edges ⊆ true ε-edges.
2. CERTIFICATES — candidates only under-enumerate, so
   ann_nb_cnt ≥ minPts−1 certifies a TRUE core (no false cores
   possible); measured sf0.01: 181 of 206 cores certified.
3. RESCUE — every uncertified point (|U| = 319/500 at sf0.01 on this
   adversarial corpus, but 13/2000 at sf0.1's denser ε-graph — the
   mass that pays is the SPARSE mass, which is exactly the mass that
   shrinks when clustering is meaningful) gets its full neighbor row
   verified exactly against the corpus: one broadcast-U nested-loop
   join, |U|·N not N².  All non-cores land in U (exact_cnt < minNb ⇒
   ann_cnt < minNb), so every border/noise verdict and every
   border→core attachment edge is exact.
4. COMPONENTS + MERGE-VERIFY — cc_star over the known core-core
   ε-edges (ann edges + rescue edges) can only be FINER than the
   exact components (edges are a subset); per-component
   (rep = min vec_id, radius = max d(rep, member)) gives the triangle
   bound d(a,b) ≥ d(repA,repB) − rA − rB, every component pair the
   bound cannot separate is verified by its exact cross-pair
   distances, and verified merges feed a second cc on the component
   graph.  Finer + all candidate merges verified exactly ⇒ final
   components ≡ exact components (min-of-min ids ⇒ identical ids).
   Measured sf0.01: 7 cc1 components, 15/21 pairs survive the bound,
   1 604 cross pairs verified, 0 merges needed (the missing
   core-core edges were all intra-component).

Exactness: the oracle is the EXACT tier's recursive-CTE DBSCAN (the
dbscan_q machinery minus nb_cnt) — the strongest statement available:
the whole 4-stage machine hash-matches brute-force SQL.  nb_cnt is
deliberately NOT in the output: stage 2 proves ``≥ minNb``, it does
not count certified cores' neighborhoods (the classic range-count vs
range-predicate distinction); dbscan_q keeps the counted tier.

Scale shape: one bucket-key shuffle (stage 1), one broadcast
nested-loop sized |uncertain|·N (stage 3), component-count-sized
crossJoin + verified-pair join (stage 4), cc_star rounds (O(log d),
localCheckpoint per round).  At 100 TB the knobs are (tables, bits)
for the certificate rate and the U-broadcast threshold; every stage
degrades to more exact verification — never to a wrong answer.

Companion ``dbscan_ann_stage_check`` puts the stage accounting in the
driver artifact as a fully-oracled integer row (both engines
re-derive the bucketed enumeration from the pinned plane literals):
candidate mass, ε-edge recall as exact integers with the
integer-cleared ≥0.85 floor verdict (hazard-8e discipline:
20·ann ≥ 17·exact), certificate/rescue counts.

Citation: Ester/Kriegel/Sander/Xu KDD'96 (DBSCAN); Kiveris et al.
SoCC'14 (cc_star); the certificate/filter-verify posture follows the
repo's jaccard_prefix_join (PPJoin, Xiao et al. WWW'08) precedent.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dtaidistance_spark.operators import dedup as D
from dtaidistance_spark.operators.anngraph_q import (
    _cand_cte_duck,
    _spark_cands,
)
from dtaidistance_spark.operators.dbscan_q import _EPS2, _MINNB, _d2
from dtaidistance_spark.operators.queries import T, register

_EPS2D = f"CAST({_EPS2} AS DOUBLE)"


def _pairs_d2(cand, v, left="ia", right="ib"):
    """Exact pinned-fold d² on a pair stream: join both endpoint
    vectors (broadcast — the vector side is the bounded table) and
    fold in index order (the identical IEEE sequence everywhere)."""
    a = v.select(F.col("vec_id").alias(left), F.col("e").alias("ea"))
    b = v.select(F.col("vec_id").alias(right), F.col("e").alias("eb"))
    d2 = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        cand.join(F.broadcast(a), left)
        .join(F.broadcast(b), right)
        .withColumn("d2", d2)
        .drop("ea", "eb")
    )


def _dbscan_ann_frames(v):
    """The 4-stage exact machine over an embedding DataFrame
    ``(vec_id, label, e array<double>)`` — module header.  Returns
    (out, stages) where ``stages`` carries the intermediate frames
    the stage check and the pytest gates assert on."""
    pts = v.select("vec_id", "e")

    # stage 1 — candidates + exact d² → ann ε-edges (undirected)
    cand = (
        _spark_cands(pts)
        .where(F.col("vec_id") < F.col("nn_id"))
        .select(F.col("vec_id").alias("ia"), F.col("nn_id").alias("ib"))
    )
    ann_e = (
        _pairs_d2(cand, pts)
        .where(F.col("d2") <= F.expr(_EPS2D))
        .select("ia", "ib")
        .persist()
    )
    ann_dir = ann_e.union(
        ann_e.select(F.col("ib").alias("ia"), F.col("ia").alias("ib"))
    )
    ann_cnt = ann_dir.groupBy(F.col("ia").alias("vec_id")).agg(
        F.count(F.lit(1)).cast("long").alias("ann_cnt")
    )

    # stage 2 — one-sided certificates
    certified = (
        ann_cnt.where(F.col("ann_cnt") >= _MINNB)
        .select("vec_id")
        .persist()
    )

    # stage 3 — exact rescue of every uncertified point
    unc = pts.join(certified, "vec_id", "left_anti").select(
        F.col("vec_id").alias("uid"), F.col("e").alias("ue")
    )
    ud2 = F.aggregate(
        F.zip_with("ue", "e", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    resc = (
        pts.join(F.broadcast(unc), F.col("uid") != F.col("vec_id"))
        .withColumn("d2", ud2)
        .where(F.col("d2") <= F.expr(_EPS2D))
        .select("uid", F.col("vec_id").alias("xid"))
        .persist()
    )
    resc_core = (
        resc.groupBy("uid")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .where(F.col("c") >= _MINNB)
        .select(F.col("uid").alias("vec_id"))
    )
    cores = certified.union(resc_core).persist()

    # stage 4 — cc over known core-core edges, then merge-verify
    ca = cores.select(F.col("vec_id").alias("ia"))
    cb = cores.select(F.col("vec_id").alias("ib"))
    k1 = ann_e.join(ca, "ia").join(cb, "ib")
    k2 = (
        resc.select(
            F.least("uid", "xid").alias("ia"),
            F.greatest("uid", "xid").alias("ib"),
        )
        .join(ca, "ia")
        .join(cb, "ib")
    )
    known = k1.union(k2).distinct()
    comp0 = D.cc_star(
        known.select(F.col("ia").alias("id_a"), F.col("ib").alias("id_b"))
    ).select(
        F.col("doc_id").alias("vec_id"), F.col("component_id").alias("comp")
    )
    corec = (
        cores.join(comp0, "vec_id", "left")
        .select("vec_id", F.coalesce("comp", F.col("vec_id")).alias("comp"))
        .persist()
    )
    # per-component representative (min vec_id ⇒ comp id itself) and
    # radius = max d(rep, member) — deterministic pinned folds
    memb = corec.join(pts, "vec_id")
    repv = (
        memb.where(F.col("vec_id") == F.col("comp"))
        .select(F.col("comp"), F.col("e").alias("re"))
    )
    rd = F.sqrt(
        F.aggregate(
            F.zip_with("re", "e", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    cstats = (
        memb.join(F.broadcast(repv), "comp")
        .withColumn("dr", rd)
        .groupBy("comp")
        .agg(F.max("dr").alias("radius"))
        .join(repv, "comp")
        .persist()
    )
    l = cstats.select(
        F.col("comp").alias("ca"),
        F.col("radius").alias("ra"),
        F.col("re").alias("rea"),
    )
    r = cstats.select(
        F.col("comp").alias("cb"),
        F.col("radius").alias("rb"),
        F.col("re").alias("reb"),
    )
    lb = F.sqrt(
        F.aggregate(
            F.zip_with("rea", "reb", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    ) - F.col("ra") - F.col("rb")
    surv = (
        l.crossJoin(r)
        .where(F.col("ca") < F.col("cb"))
        .where(lb <= F.sqrt(F.expr(_EPS2D)))
        .select("ca", "cb")
        .persist()
    )
    ma = corec.select(F.col("comp").alias("ca"), F.col("vec_id").alias("ia"))
    mb = corec.select(F.col("comp").alias("cb"), F.col("vec_id").alias("ib"))
    cross = surv.join(ma, "ca").join(mb, "cb").select("ca", "cb", "ia", "ib")
    merges = (
        _pairs_d2(cross, pts)
        .where(F.col("d2") <= F.expr(_EPS2D))
        .select("ca", "cb")
        .distinct()
    )
    comp2 = D.cc_star(
        merges.select(F.col("ca").alias("id_a"), F.col("cb").alias("id_b"))
    ).select(
        F.col("doc_id").alias("comp"), F.col("component_id").alias("fcomp")
    )
    cfinal = (
        corec.join(comp2, "comp", "left")
        .select(
            "vec_id", F.coalesce("fcomp", F.col("comp")).alias("comp")
        )
        .persist()
    )

    # borders: all non-cores are rescued, so their core links are exact
    borderc = (
        resc.join(
            cores.select(F.col("vec_id").alias("uid")), "uid", "left_anti"
        )
        .join(cfinal.select(F.col("vec_id").alias("xid"), "comp"), "xid")
        .groupBy(F.col("uid").alias("vec_id"))
        .agg(F.min("comp").alias("comp"))
    )
    assign = cfinal.select(
        "vec_id", "comp", F.lit("core").alias("role")
    ).unionByName(
        borderc.select("vec_id", "comp", F.lit("border").alias("role"))
    )
    sizes = assign.groupBy("comp").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    out = (
        v.join(assign, "vec_id", "left")
        .join(sizes, "comp", "left")
        .select(
            "vec_id",
            "label",
            F.coalesce("role", F.lit("noise")).alias("role"),
            F.col("comp").alias("cluster"),
            "n_members",
        )
    )
    stages = {
        "ann_edges": ann_e,
        "certified": certified,
        "rescue_edges": resc,
        "cores": cores,
        "cc1": corec,
        "merge_survivors": surv,
        "merges": merges,
    }
    return out, stages


@register(
    "dbscan_ann",
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
    SELECT v.vec_id, v.label,
           coalesce(a.role, 'noise') AS role,
           a.comp AS cluster,
           s.n_members
    FROM v
    LEFT JOIN assign a ON a.vec_id = v.vec_id
    LEFT JOIN sizes s ON s.comp = a.comp
    """,
)
def dbscan_ann(spark, sf_dir):
    """C6b: the certificate filter-and-verify DBSCAN (module header)
    — candidates from the pinned md5-plane graph, one-sided core
    certificates, exact rescue of the uncertain mass, triangle-bound
    merge-verified components.  Oracled against the EXACT tier's
    recursive-CTE DBSCAN: equality is by construction, and the driver
    hash proves it."""
    v = T(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("e"),
    )
    out, _ = _dbscan_ann_frames(v)
    return out


@register(
    "dbscan_ann_stage_check",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ),
    {_cand_cte_duck("v", "emb")},
    cu AS (
      SELECT vec_id AS ia, nn_id AS ib FROM cand WHERE vec_id < nn_id
    ),
    ann_e AS (
      SELECT ia, ib FROM (
        SELECT cu.ia, cu.ib,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(range(1, 65),
                   i -> (a.emb[i] - b.emb[i]) * (a.emb[i] - b.emb[i]))),
                 (s, x) -> s + x) AS d2
        FROM cu
        JOIN v a ON a.vec_id = cu.ia
        JOIN v b ON b.vec_id = cu.ib
      ) WHERE d2 <= CAST({_EPS2} AS DOUBLE)
    ),
    ex_e AS (
      SELECT ia, ib FROM (
        SELECT a.vec_id AS ia, b.vec_id AS ib,
               list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list_transform(range(1, 65),
                   i -> (a.emb[i] - b.emb[i]) * (a.emb[i] - b.emb[i]))),
                 (s, x) -> s + x) AS d2
        FROM v a JOIN v b ON a.vec_id < b.vec_id
      ) WHERE d2 <= CAST({_EPS2} AS DOUBLE)
    ),
    ann_cnt AS (
      SELECT s, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT ia AS s FROM ann_e UNION ALL SELECT ib FROM ann_e
      ) GROUP BY s
    ),
    ex_cnt AS (
      SELECT s, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT ia AS s FROM ex_e UNION ALL SELECT ib FROM ex_e
      ) GROUP BY s
    ),
    cert AS (SELECT s FROM ann_cnt WHERE c >= {_MINNB}),
    excore AS (SELECT s FROM ex_cnt WHERE c >= {_MINNB})
    SELECT
      CAST((SELECT count(*) FROM v) AS BIGINT) AS n_points,
      CAST((SELECT count(*) FROM cu) AS BIGINT) AS n_cand_pairs,
      CAST((SELECT count(*) FROM ann_e) AS BIGINT) AS n_ann_eps_edges,
      CAST((SELECT count(*) FROM ex_e) AS BIGINT) AS n_exact_eps_edges,
      CAST((SELECT count(*) FROM cert) AS BIGINT) AS n_certified_cores,
      CAST((SELECT count(*) FROM excore) AS BIGINT) AS n_exact_cores,
      CAST((SELECT count(*) FROM excore) -
           (SELECT count(*) FROM cert) AS BIGINT) AS n_rescued_cores,
      CAST((SELECT count(*) FROM v) -
           (SELECT count(*) FROM cert) AS BIGINT) AS n_uncertain,
      CAST((SELECT count(*) FROM cert c JOIN excore e ON e.s = c.s)
           AS BIGINT) AS n_cert_and_core,
      (20 * (SELECT count(*) FROM ann_e)
         >= 17 * (SELECT count(*) FROM ex_e)) AS recall_floor_met
    """,
)
def dbscan_ann_stage_check(spark, sf_dir):
    """C6b-check: the stage accounting as a fully-oracled integer row
    (module header) — candidate mass, ε-edge recall numerator/
    denominator, certificate and rescue counts, the one-sided
    property as n_cert_and_core == n_certified_cores, and the
    integer-cleared 0.85 recall-floor verdict (hazard-8e: 20·ann ≥
    17·exact, no float boundary anywhere)."""
    v = T(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("e"),
    )
    pts = v.select("vec_id", "e")
    _, st = _dbscan_ann_frames(v)
    cand = (
        _spark_cands(pts)
        .where(F.col("vec_id") < F.col("nn_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_cand_pairs"))
    )
    ex_e = (
        _pairs_d2(
            pts.select(F.col("vec_id").alias("ia"))
            .crossJoin(pts.select(F.col("vec_id").alias("ib")))
            .where(F.col("ia") < F.col("ib")),
            pts,
        )
        .where(F.col("d2") <= F.expr(_EPS2D))
        .select("ia", "ib")
        .persist()
    )
    ex_dir = ex_e.union(
        ex_e.select(F.col("ib").alias("ia"), F.col("ia").alias("ib"))
    )
    excore = (
        ex_dir.groupBy(F.col("ia").alias("vec_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .where(F.col("c") >= _MINNB)
        .select("vec_id")
        .persist()
    )
    n_pts = v.agg(F.count(F.lit(1)).cast("long").alias("n_points"))
    n_ann = st["ann_edges"].agg(
        F.count(F.lit(1)).cast("long").alias("n_ann_eps_edges")
    )
    n_ex = ex_e.agg(
        F.count(F.lit(1)).cast("long").alias("n_exact_eps_edges")
    )
    n_cert = st["certified"].agg(
        F.count(F.lit(1)).cast("long").alias("n_certified_cores")
    )
    n_core = excore.agg(
        F.count(F.lit(1)).cast("long").alias("n_exact_cores")
    )
    n_both = (
        st["certified"]
        .join(excore, "vec_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_cert_and_core"))
    )
    return (
        n_pts.crossJoin(F.broadcast(cand))
        .crossJoin(F.broadcast(n_ann))
        .crossJoin(F.broadcast(n_ex))
        .crossJoin(F.broadcast(n_cert))
        .crossJoin(F.broadcast(n_core))
        .crossJoin(F.broadcast(n_both))
        .selectExpr(
            "n_points",
            "n_cand_pairs",
            "n_ann_eps_edges",
            "n_exact_eps_edges",
            "n_certified_cores",
            "n_exact_cores",
            "CAST(n_exact_cores - n_certified_cores AS BIGINT)"
            " AS n_rescued_cores",
            "CAST(n_points - n_certified_cores AS BIGINT) AS n_uncertain",
            "n_cert_and_core",
            "20 * n_ann_eps_edges >= 17 * n_exact_eps_edges"
            " AS recall_floor_met",
        )
    )
